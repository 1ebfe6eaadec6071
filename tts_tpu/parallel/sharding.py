"""Tensor-parallel sharding layouts for the autoregressive decoders.

Megatron-style TP over the `tp` mesh axis (SURVEY §2.8 target list):
  * q/k/v projections and fc1 column-sharded (output heads split),
  * o projection and fc2 row-sharded (input split; XLA inserts the psum),
  * the 9 codebook LM heads sharded over their stacked output dim,
  * per-layer cross K/V and the KV cache sharded on the head axis.
Embeddings, norms and positional tables are replicated (they're small).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.parler.model import ParlerLayerWeights, ParlerWeights
from ..ops.quant_matmul import QuantTensor


def _put(mesh, x, spec):
    if x is None:
        return None
    if isinstance(x, QuantTensor):
        # codes_t (.., K, N), scales_t (.., K/32, N): the logical output dim N
        # is the LAST axis of both
        n_axis_spec = spec
        return QuantTensor(
            jax.device_put(x.codes_t, NamedSharding(mesh, n_axis_spec)),
            jax.device_put(x.scales_t, NamedSharding(mesh, n_axis_spec)),
            x.qtype)
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_parler_weights(w: ParlerWeights, mesh: Mesh) -> ParlerWeights:
    """Place ParlerWeights on the mesh with TP shardings.

    Dense layer weights are (L, out, in); QuantTensor layer weights hold
    transposed codes (L, K=in, N=out), so for quantized leaves the
    column/row split maps to the last/middle axis respectively.
    """
    def col(x):  # split output dim
        if isinstance(x, QuantTensor):
            return _put(mesh, x, P(None, None, "tp"))
        return _put(mesh, x, P(None, "tp", None))

    def row(x):  # split input dim
        if isinstance(x, QuantTensor):
            return QuantTensor(
                jax.device_put(x.codes_t, NamedSharding(mesh, P(None, "tp", None))),
                jax.device_put(x.scales_t, NamedSharding(mesh, P(None, "tp", None))),
                x.qtype)
        return _put(mesh, x, P(None, None, "tp"))

    def rep(x):
        return _put(mesh, x, P())

    lw = w.layers
    layers = ParlerLayerWeights(
        ln1_w=rep(lw.ln1_w), ln1_b=rep(lw.ln1_b),
        q_w=col(lw.q_w), k_w=col(lw.k_w), v_w=col(lw.v_w), o_w=row(lw.o_w),
        lnc_w=rep(lw.lnc_w), lnc_b=rep(lw.lnc_b),
        cq_w=col(lw.cq_w), co_w=row(lw.co_w),
        cross_k=_put(mesh, lw.cross_k, P(None, "tp", None, None)),
        cross_v=_put(mesh, lw.cross_v, P(None, "tp", None, None)),
        ln2_w=rep(lw.ln2_w), ln2_b=rep(lw.ln2_b),
        fc1=col(lw.fc1), fc2=row(lw.fc2),
    )
    heads = w.heads
    if isinstance(heads, QuantTensor):
        heads = QuantTensor(
            jax.device_put(heads.codes_t, NamedSharding(mesh, P(None, "tp"))),
            jax.device_put(heads.scales_t, NamedSharding(mesh, P(None, "tp"))),
            heads.qtype)
    else:
        heads = _put(mesh, heads, P("tp", None))
    return ParlerWeights(
        layers=layers,
        embds=rep(w.embds),
        prompt_embd=_put(mesh, w.prompt_embd, P()) if not isinstance(w.prompt_embd, QuantTensor) else w.prompt_embd,
        pos_embd=rep(w.pos_embd),
        final_ln_w=rep(w.final_ln_w), final_ln_b=rep(w.final_ln_b),
        heads=heads,
    )


def shard_parler_kv(kv_k, kv_v, mesh: Mesh):
    """KV cache (L, heads, ctx, D) sharded on the head axis."""
    spec = P(None, "tp", None, None)
    return (jax.device_put(kv_k, NamedSharding(mesh, spec)),
            jax.device_put(kv_v, NamedSharding(mesh, spec)))


def shard_batched_state(st, mesh: Mesh):
    """Shard a BatchedParlerState over the 2D (dp, tp) mesh: batch slots
    split over dp (each dp group serves its own requests), KV heads over tp,
    all per-request vectors over dp. One compiled program then decodes
    n_slots requests across dp*tp chips with weight reads amortized inside
    each dp group."""
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    from ..ops.sampling import BatchedSamplerState
    b = P("dp")
    bh = P("dp", None)
    return st._replace(
        kv_k=put(st.kv_k, P(None, "dp", "tp", None, None)),
        kv_v=put(st.kv_v, P(None, "dp", "tp", None, None)),
        pos=put(st.pos, b), step=put(st.step, b),
        tokens_in=put(st.tokens_in, bh),
        eos_seen=put(st.eos_seen, bh),
        active=put(st.active, b),
        out_tokens=put(st.out_tokens, P("dp", None, None)),
        sampler_state=BatchedSamplerState(
            last_token=put(st.sampler_state.last_token, bh),
            repeat_count=put(st.sampler_state.repeat_count, bh)),
        key=put(st.key, P()),
        do_sample=put(st.do_sample, b),
        temperature=put(st.temperature, b),
        top_k=put(st.top_k, b),
        top_p=put(st.top_p, b),
        repetition_penalty=put(st.repetition_penalty, b),
    )
