"""Tensor parallelism for the QUANTIZED Parler decode step (shard_map).

Two layouts, both operating on block-quantized weights end to end (the fused
Pallas dequant-matmul runs per shard on TPU; the XLA equivalent elsewhere,
e.g. the virtual-CPU test mesh):

1. Megatron TP (`megastep_tp`): qkv / cross-q / fc1 column-sharded by
   attention heads, o / cross-o / fc2 row-sharded, attention computed on
   local heads against a head-sharded KV cache, one psum per projection
   epilogue. Activations replicated. This is SURVEY §2.8's "tensor
   parallelism for the AR decoders" on the fast (quantized) path, replacing
   the reference's backend-scheduler copies (src/tts_model.cpp:53-67).

2. Weight-gather TP (`megastep_weight_gather`): every layer's quantized
   codes/scales live sharded over `tp` (1/tp HBM per chip); the decode scan
   all-gathers layer l+1's INT8 shards while layer l computes — the gather
   has no data dependency on the running layer, so XLA's scheduler overlaps
   the collective with the dequant-matmuls (SURVEY §2.8: "all-gather of
   dequantized weight shards overlapped with Pallas dequant-matmul";
   gathering pre-dequant codes moves 1 byte/weight over ICI instead of 4).
   Pairs with request/data parallelism where each chip decodes different
   batch slots but shares one sharded weight copy.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.parler_megastep import _BIAS, MegaLayers
from ..ops.quant_matmul import QuantTensor, quant_matmul


class TPLayers(NamedTuple):
    """Per-layer quantized weights laid out for megatron TP (leaves stacked
    on L; sharding annotated per leaf by shard_tp_layers)."""

    qkv_c: Any   # (L, H, 3H) packed device-major [q_i|k_i|v_i]; N-sharded
    qkv_s: Any
    o_c: Any     # (L, H, H) K(row)-sharded
    o_s: Any
    cq_c: Any    # (L, H, H) N-sharded (by heads)
    cq_s: Any
    co_c: Any    # (L, H, H) K-sharded
    co_s: Any
    f1_c: Any    # (L, H, F) N-sharded
    f1_s: Any
    f2_c: Any    # (L, F, H) K-sharded
    f2_s: Any
    norms: Any   # (L, 6, H) replicated
    cross_k: Any  # (L, heads, Tc, D) head-sharded
    cross_v: Any


def prep_tp_layers(layers, tp: int) -> tuple[TPLayers, int]:
    """Build TPLayers from stacked ParlerLayerWeights with QuantTensor
    projections. The qkv concat is packed DEVICE-major so a plain last-axis
    split hands each device its own [q_i | k_i | v_i] block."""
    mats = dict(q=layers.q_w, k=layers.k_w, v=layers.v_w, o=layers.o_w,
                cq=layers.cq_w, co=layers.co_w, f1=layers.fc1, f2=layers.fc2)
    if not all(isinstance(m, QuantTensor) for m in mats.values()):
        raise ValueError("TP megastep needs all projections quantized")
    # K-row sharding below is incompatible with the nibble pack-block
    # layout (a 1/tp row shard does not contain whole half-split blocks),
    # so unpack any packed codes first; the gather-mode layout
    # (shard_mega_gather) shards on N and keeps the pack.
    from ..ops.quant_matmul import unpack_codes_t

    def unpack(m: QuantTensor) -> QuantTensor:
        if not m.is_packed:
            return m
        return QuantTensor(
            unpack_codes_t(m.codes_t, m.shape[1]).astype(jnp.int8),
            m.scales_t, m.qtype)

    mats = {k: unpack(m) for k, m in mats.items()}
    qtypes = {m.qtype for m in mats.values()}
    if len(qtypes) != 1 or next(iter(qtypes)) not in _BIAS:
        raise ValueError(f"TP megastep needs one uniform qtype: {qtypes}")
    qtype = next(iter(qtypes))
    h = mats["q"].codes_t.shape[2]
    hl = h // tp

    def pack_qkv(attr):
        chunks = []
        for i in range(tp):
            sl = slice(i * hl, (i + 1) * hl)
            chunks += [getattr(mats[m], attr)[:, :, sl] for m in ("q", "k", "v")]
        return jnp.concatenate(chunks, axis=-1)

    tpl = TPLayers(
        qkv_c=pack_qkv("codes_t").astype(jnp.int8),
        qkv_s=pack_qkv("scales_t").astype(jnp.float32),
        o_c=mats["o"].codes_t.astype(jnp.int8),
        o_s=mats["o"].scales_t.astype(jnp.float32),
        cq_c=mats["cq"].codes_t.astype(jnp.int8),
        cq_s=mats["cq"].scales_t.astype(jnp.float32),
        co_c=mats["co"].codes_t.astype(jnp.int8),
        co_s=mats["co"].scales_t.astype(jnp.float32),
        f1_c=mats["f1"].codes_t.astype(jnp.int8),
        f1_s=mats["f1"].scales_t.astype(jnp.float32),
        f2_c=mats["f2"].codes_t.astype(jnp.int8),
        f2_s=mats["f2"].scales_t.astype(jnp.float32),
        norms=jnp.stack([layers.ln1_w, layers.ln1_b, layers.lnc_w,
                         layers.lnc_b, layers.ln2_w, layers.ln2_b],
                        axis=1).astype(jnp.float32),
        cross_k=layers.cross_k.astype(jnp.float32),
        cross_v=layers.cross_v.astype(jnp.float32),
    )
    return tpl, qtype


TP_SPECS = TPLayers(
    qkv_c=P(None, None, "tp"), qkv_s=P(None, None, "tp"),
    o_c=P(None, "tp", None), o_s=P(None, "tp", None),
    cq_c=P(None, None, "tp"), cq_s=P(None, None, "tp"),
    co_c=P(None, "tp", None), co_s=P(None, "tp", None),
    f1_c=P(None, None, "tp"), f1_s=P(None, None, "tp"),
    f2_c=P(None, "tp", None), f2_s=P(None, "tp", None),
    norms=P(),
    cross_k=P(None, "tp", None, None), cross_v=P(None, "tp", None, None),
)


def shard_tp_layers(tpl: TPLayers, mesh: Mesh) -> TPLayers:
    return TPLayers(*[
        jax.device_put(x, NamedSharding(mesh, s))
        for x, s in zip(tpl, TP_SPECS)])


def _ln(x, w, b, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _attend_local(q, kc, vc, k_row, v_row, pos, d, scale):
    """Self attention on LOCAL heads: q (1, nh_l*d) , kc/vc (nh_l, CTX, D),
    current token's k/v folded analytically (reference megastep math)."""
    nh_l = kc.shape[0]
    qh = q.reshape(nh_l, 1, d) * scale
    kh = kc.astype(jnp.float32)
    s = jnp.einsum("hqd,htd->hqt", qh, kh)
    t = jnp.arange(kc.shape[1])
    s = jnp.where(t[None, None, :] < pos, s, -jnp.inf)
    s_cur = jnp.sum(qh * k_row.reshape(nh_l, 1, d), axis=2, keepdims=True)
    m = jnp.maximum(jnp.max(s, axis=2, keepdims=True), s_cur)
    ph = jnp.exp(s - m)
    pc = jnp.exp(s_cur - m)
    denom = jnp.sum(ph, axis=2, keepdims=True) + pc
    av = jnp.einsum("hqt,htd->hqd", ph, vc.astype(jnp.float32))
    return ((av + pc * v_row.reshape(nh_l, 1, d)) / denom).reshape(1, -1)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "qtype", "use_cross", "n_heads"))
def megastep_tp(tpl: TPLayers, x, kv_k, kv_v, pos, *, mesh: Mesh, qtype: int,
                use_cross: bool, n_heads: int):
    """Megatron-TP quantized decode step over all L layers.

    x (1, H) replicated; kv (L, heads, CTX, D) head-sharded; pos scalar.
    Returns (x_out (1, H) replicated pre-final-norm, k_new/v_new
    (L, H) head-sharded on the feature axis).
    """
    tp = mesh.shape["tp"]
    hidden = x.shape[1]
    hl = hidden // tp
    d = hidden // n_heads
    scale = 1.0 / np.sqrt(d)

    def body(tpl_l, x, kv_k, kv_v, pos):
        def qmm(h, c, s):
            return quant_matmul(h, c, s, qtype)

        def layer(carry, inp):
            xx = carry
            (qkv_c, qkv_s, o_c, o_s, cq_c, cq_s, co_c, co_s, f1_c, f1_s,
             f2_c, f2_s, nm, ck, cv, kc, vc) = inp
            h1 = _ln(xx, nm[0][None], nm[1][None])
            qkv = qmm(h1, qkv_c, qkv_s)                 # (1, 3*hl) local
            q, k_row, v_row = (qkv[:, :hl], qkv[:, hl:2 * hl],
                               qkv[:, 2 * hl:])
            attn = _attend_local(q, kc, vc, k_row, v_row, pos, d, scale)
            o = jax.lax.psum(qmm(attn, o_c, o_s), "tp")
            xx = xx + o
            if use_cross:
                h2 = _ln(xx, nm[2][None], nm[3][None])
                cq = qmm(h2, cq_c, cq_s)                # (1, hl) local heads
                nh_l = ck.shape[0]
                cqh = cq.reshape(nh_l, 1, d) * scale
                s2 = jnp.einsum("hqd,htd->hqt", cqh, ck)
                p2 = jax.nn.softmax(s2, axis=-1)
                ca = jnp.einsum("hqt,htd->hqd", p2, cv).reshape(1, hl)
                co = jax.lax.psum(qmm(ca, co_c, co_s), "tp")
                xx = xx + co
            h3 = _ln(xx, nm[4][None], nm[5][None])
            up = jax.nn.gelu(qmm(h3, f1_c, f1_s), approximate=True)
            down = jax.lax.psum(qmm(up, f2_c, f2_s), "tp")
            xx = xx + down
            return xx, (k_row[0], v_row[0])

        xs = tuple(tpl_l) + (kv_k, kv_v)
        x_out, (k_new, v_new) = jax.lax.scan(layer, x.astype(jnp.float32), xs)
        return x_out, k_new, v_new

    in_specs = (TP_SPECS, P(), P(None, "tp", None, None),
                P(None, "tp", None, None), P())
    out_specs = (P(), P(None, "tp"), P(None, "tp"))
    fn = shard_map(body, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_vma=False)
    return fn(tpl, x, kv_k, kv_v, jnp.asarray(pos, jnp.int32))


# ---------------------------------------------------------------------------
# Weight-gather TP with one-layer-lookahead overlap
# ---------------------------------------------------------------------------

GATHER_SPECS = MegaLayers(
    qkv_codes=P(None, None, "tp"), qkv_scales=P(None, None, "tp"),
    occ_codes=P(None, None, "tp"), occ_scales=P(None, None, "tp"),
    fc1_codes=P(None, None, "tp"), fc1_scales=P(None, None, "tp"),
    fc2_codes=P(None, None, "tp"), fc2_scales=P(None, None, "tp"),
    norms=P(), cross_k=P(None, "tp", None, None),
    cross_v=P(None, "tp", None, None),
)


def shard_mega_gather(mega: MegaLayers, mesh: Mesh) -> MegaLayers:
    """Place MegaLayers with every projection's codes/scales sharded on the
    output axis (1/tp of the weight bytes per chip)."""
    return MegaLayers(*[
        jax.device_put(x, NamedSharding(mesh, s))
        for x, s in zip(mega, GATHER_SPECS)])


@functools.partial(jax.jit,
                   static_argnames=("mesh", "qtype", "use_cross", "n_heads"))
def megastep_weight_gather(mega: MegaLayers, x, kv_k, kv_v, pos, *,
                           mesh: Mesh, qtype: int, use_cross: bool,
                           n_heads: int):
    """Decode step with layer-ahead all-gather of quantized weight shards.

    Per scan step, layer l+1's int8 codes/scale shards are all-gathered
    while layer l's dequant-matmuls run on the previously gathered (full)
    weights — the gather has no data dependency on the compute, so it rides
    ICI concurrently. KV cache and attention replicate (this mode pairs
    with dp over batch slots, not head-split attention).

    Returns (x_out (1, H), k_new (L, H), v_new (L, H)), all replicated.
    """
    from ..ops.parler_megastep import parler_megastep_reference

    L = mega.qkv_codes.shape[0]
    hidden = x.shape[1]

    w_specs = tuple(GATHER_SPECS)
    gathered_axes = [  # which axis of each (unstacked) leaf was sharded
        1, 1, 1, 1, 1, 1, 1, 1, None, 0, 0]

    def body(mega_l, x, kv_k, kv_v, pos):
        def take(l):
            return jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(a, l, 0,
                                                       keepdims=False),
                tuple(mega_l))

        def to_varying(a):
            try:
                return jax.lax.pcast(a, "tp", to="varying")
            except ValueError:          # already varying
                return a

        def gather(shards):
            out = []
            for s, ax in zip(shards, gathered_axes):
                out.append(to_varying(s) if ax is None else
                           jax.lax.all_gather(s, "tp", axis=ax, tiled=True))
            return tuple(out)

        def one_layer(xx, w_full, kc, vc, pos):
            m1 = MegaLayers(*(w[None] for w in w_full[:9]),
                            cross_k=w_full[9][None], cross_v=w_full[10][None])
            return parler_megastep_reference(
                m1, xx, kc[None], vc[None], pos, qtype=qtype,
                use_cross=use_cross, n_heads=n_heads)

        def step(carry, l):
            xx, cur = carry
            # issue the NEXT layer's gather first: independent of this
            # layer's compute, so the collective overlaps the matmuls
            nxt = gather(take(jnp.minimum(l + 1, L - 1)))
            kc = jax.lax.dynamic_index_in_dim(kv_k, l, 0, keepdims=False)
            vc = jax.lax.dynamic_index_in_dim(kv_v, l, 0, keepdims=False)
            xo, kn, vn = one_layer(xx, cur, kc, vc, pos)
            return (xo, nxt), (kn[0], vn[0])

        first = gather(take(0))
        # the carry mixes replicated (x) and gathered values; mark it all
        # device-varying so the scan carry type is stable under jax's VMA
        # replication checking
        carry0 = jax.tree_util.tree_map(to_varying,
                                        (x.astype(jnp.float32), first))
        (x_out, _), (k_new, v_new) = jax.lax.scan(step, carry0,
                                                  jnp.arange(L))
        return x_out, k_new, v_new

    in_specs = (GATHER_SPECS, P(), P(), P(), P())
    out_specs = (P(), P(), P())
    # outputs are replicated by construction (every device runs identical
    # full-weight math after the gather) but the VMA checker cannot infer
    # that through the all-gather carry; check_vma=False opts out
    fn = shard_map(body, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_vma=False)
    return fn(mega, x, kv_k, kv_v, jnp.asarray(pos, jnp.int32))
