"""Tensor parallelism for the QUANTIZED llama (Orpheus-3B) decode step.

Megatron layout over `tp` (shard_map): qkv column-sharded BY HEAD GROUPS
(device i holds q heads [i*nh_l,(i+1)*nh_l) and kv heads
[i*nkv_l,(i+1)*nkv_l) — GQA groups stay device-local so attention needs no
collective), o and down row(K)-sharded with one psum each, gate/up
column-sharded, KV cache sharded on the kv-head axis, activations
replicated. This is SURVEY §2.8's "TP for the AR decoders; KV cache sharded
on the head axis" applied to the model that actually needs multichip
(Orpheus-3B at ~2x RT single-chip); reference GQA layout:
/root/reference/src/models/orpheus/model.cpp:194-228.

Quantized end to end: the Pallas dequant-matmul runs per shard on TPU, the
XLA equivalent elsewhere (virtual-CPU test meshes). N-sharded projections
keep the Q4 nibble pack (the pack is along K); K-sharded ones are unpacked
at prep because a 1/tp row shard does not contain whole half-split blocks.
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

from ..ops.parler_megastep import _BIAS
from ..ops.quant_matmul import QuantTensor, quant_matmul, unpack_codes_t


class LlamaTPLayers(NamedTuple):
    """Stacked per-layer llama weights in megatron-TP layout."""

    qkv_c: Any    # (L, Kc, (nh_l + 2*nkv_l)*d*tp) device-major [q_i|k_i|v_i]
    qkv_s: Any
    o_c: Any      # (L, H, H) K(row)-sharded
    o_s: Any
    gate_c: Any   # (L, Kc, F) N-sharded
    gate_s: Any
    up_c: Any     # (L, Kc, F) N-sharded
    up_s: Any
    down_c: Any   # (L, F, H) K-sharded
    down_s: Any
    norms: Any    # (L, 2, H) replicated


def prep_llama_tp(layers, tp: int, *, n_heads: int, n_kv: int,
                  head_d: int) -> tuple[LlamaTPLayers, int]:
    """Build LlamaTPLayers from a stacked OrpheusLayer with QuantTensor
    projections. qkv is packed DEVICE-major so a plain last-axis split hands
    each device its own [q_i | k_i | v_i] head-group block."""
    mats = dict(q=layers.q, k=layers.k, v=layers.v, o=layers.o,
                gate=layers.gate, up=layers.up, down=layers.down)
    if not all(isinstance(m, QuantTensor) for m in mats.values()):
        raise ValueError("llama TP needs all projections quantized")
    qtypes = {m.qtype for m in mats.values()}
    if len(qtypes) != 1 or next(iter(qtypes)) not in _BIAS:
        raise ValueError(f"llama TP needs one uniform qtype: {qtypes}")
    qtype = next(iter(qtypes))
    if n_heads % tp or n_kv % tp:
        raise ValueError(f"tp={tp} must divide heads {n_heads}/{n_kv}")
    f = mats["down"].shape[1]
    if (n_heads * head_d // tp) % 32 or (f // tp) % 32:
        raise ValueError(
            f"tp={tp}: K-row shards of o ({n_heads * head_d}) and down "
            f"({f}) must contain whole 32-row quant blocks")

    def unpack(m: QuantTensor) -> QuantTensor:
        if not m.is_packed:
            return m
        return QuantTensor(
            unpack_codes_t(m.codes_t, m.shape[1]).astype(jnp.int8),
            m.scales_t, m.qtype)

    # K-sharded mats must be unpacked (see module header); N-sharded keep
    # their pack only if ALL qkv parts share the packing state (they are
    # concatenated below)
    mats["o"] = unpack(mats["o"])
    mats["down"] = unpack(mats["down"])
    if len({mats[m].is_packed for m in ("q", "k", "v")}) != 1:
        mats = {k: (unpack(m) if k in ("q", "k", "v") else m)
                for k, m in mats.items()}

    nh_l, nkv_l = n_heads // tp, n_kv // tp

    def pack_qkv(attr):
        chunks = []
        for i in range(tp):
            qs = slice(i * nh_l * head_d, (i + 1) * nh_l * head_d)
            ks = slice(i * nkv_l * head_d, (i + 1) * nkv_l * head_d)
            chunks += [getattr(mats["q"], attr)[:, :, qs],
                       getattr(mats["k"], attr)[:, :, ks],
                       getattr(mats["v"], attr)[:, :, ks]]
        return jnp.concatenate(chunks, axis=-1)

    tpl = LlamaTPLayers(
        qkv_c=pack_qkv("codes_t").astype(jnp.int8),
        qkv_s=pack_qkv("scales_t").astype(jnp.float32),
        o_c=mats["o"].codes_t.astype(jnp.int8),
        o_s=mats["o"].scales_t.astype(jnp.float32),
        gate_c=mats["gate"].codes_t.astype(jnp.int8),
        gate_s=mats["gate"].scales_t.astype(jnp.float32),
        up_c=mats["up"].codes_t.astype(jnp.int8),
        up_s=mats["up"].scales_t.astype(jnp.float32),
        down_c=mats["down"].codes_t.astype(jnp.int8),
        down_s=mats["down"].scales_t.astype(jnp.float32),
        norms=jnp.stack([layers.in_norm, layers.post_norm],
                        axis=1).astype(jnp.float32),
    )
    return tpl, qtype


LLAMA_TP_SPECS = LlamaTPLayers(
    qkv_c=P(None, None, "tp"), qkv_s=P(None, None, "tp"),
    o_c=P(None, "tp", None), o_s=P(None, "tp", None),
    gate_c=P(None, None, "tp"), gate_s=P(None, None, "tp"),
    up_c=P(None, None, "tp"), up_s=P(None, None, "tp"),
    down_c=P(None, "tp", None), down_s=P(None, "tp", None),
    norms=P(),
)


def shard_llama_tp(tpl: LlamaTPLayers, mesh: Mesh) -> LlamaTPLayers:
    return LlamaTPLayers(*[
        jax.device_put(x, NamedSharding(mesh, s))
        for x, s in zip(tpl, LLAMA_TP_SPECS)])


def _rms(x, w, eps=1e-5):
    ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(ms + eps) * w


@functools.partial(jax.jit,
                   static_argnames=("mesh", "qtype", "n_heads", "n_kv",
                                    "rope_base"))
def llama_megastep_tp(tpl: LlamaTPLayers, x, kv_k, kv_v, pos, inv_freq, *,
                      mesh: Mesh, qtype: int, n_heads: int, n_kv: int,
                      rope_base: float):
    """Megatron-TP quantized llama decode step over all L layers.

    x (1, H) replicated; kv_k/kv_v (L, n_kv, CTX, D) kv-head-sharded;
    pos scalar; inv_freq (1, D//2) replicated (rope_freqs with llama3
    factors folded). Returns (x_out (1, H) replicated pre-final-RMS-norm,
    k_new/v_new (L, n_kv*D) kv-head-sharded on the feature axis).
    """
    tp = mesh.shape["tp"]
    hidden = x.shape[1]
    d = hidden // n_heads
    nh_l, nkv_l = n_heads // tp, n_kv // tp
    g = nh_l // nkv_l
    scale = 1.0 / np.sqrt(d)

    def body(tpl_l, x, kv_k, kv_v, pos, inv):
        ang = pos.astype(jnp.float32) * inv                  # (1, d/2)
        cos, sin = jnp.cos(ang), jnp.sin(ang)

        def rope(y, nh):
            y = y.reshape(nh, d)
            y1, y2 = y[:, : d // 2], y[:, d // 2:]
            return jnp.concatenate([y1 * cos - y2 * sin,
                                    y2 * cos + y1 * sin], axis=1)

        def qmm(h, c, s):
            return quant_matmul(h, c, s, qtype)

        def layer(carry, inp):
            xx = carry
            (qkv_c, qkv_s, o_c, o_s, g_c, g_s, u_c, u_s, d_c, d_s, nm,
             kc, vc) = inp
            h1 = _rms(xx, nm[0][None])
            qkv = qmm(h1, qkv_c, qkv_s)          # (1, (nh_l + 2*nkv_l)*d)
            q = rope(qkv[:, : nh_l * d], nh_l)                # (nh_l, d)
            k = rope(qkv[:, nh_l * d:(nh_l + nkv_l) * d], nkv_l)
            v = qkv[:, (nh_l + nkv_l) * d:].reshape(nkv_l, d)
            # GQA on local heads (groups stay device-local), analytic
            # current-token fold — llama_megastep_reference math
            qh = q.reshape(nkv_l, g, 1, d) * scale
            kh = kc.astype(jnp.float32)                       # (nkv_l,CTX,D)
            s = jnp.einsum("hgqd,htd->hgqt", qh, kh)
            t = jnp.arange(kc.shape[1])
            s = jnp.where(t[None, None, None, :] < pos, s, -jnp.inf)
            kcur = k.reshape(nkv_l, 1, 1, d)
            s_cur = jnp.sum(qh * kcur, axis=3, keepdims=True)
            m = jnp.maximum(jnp.max(s, axis=3, keepdims=True), s_cur)
            ph = jnp.exp(s - m)
            pc = jnp.exp(s_cur - m)
            denom = jnp.sum(ph, axis=3, keepdims=True) + pc
            av = jnp.einsum("hgqt,htd->hgqd", ph, vc.astype(jnp.float32))
            vcur = v.reshape(nkv_l, 1, 1, d)
            attn = ((av + pc * vcur) / denom).reshape(1, nh_l * d)
            o = jax.lax.psum(qmm(attn, o_c, o_s), "tp")
            xx = xx + o
            h2 = _rms(xx, nm[1][None])
            gate = qmm(h2, g_c, g_s)
            up = qmm(h2, u_c, u_s)
            down = jax.lax.psum(qmm(jax.nn.silu(gate) * up, d_c, d_s), "tp")
            xx = xx + down
            return xx, (k.reshape(nkv_l * d), v.reshape(nkv_l * d))

        xs = tuple(tpl_l) + (kv_k, kv_v)
        x_out, (k_new, v_new) = jax.lax.scan(layer, x.astype(jnp.float32), xs)
        return x_out, k_new, v_new

    in_specs = (LLAMA_TP_SPECS, P(), P(None, "tp", None, None),
                P(None, "tp", None, None), P(), P())
    out_specs = (P(), P(None, "tp"), P(None, "tp"))
    fn = shard_map(body, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_vma=False)
    return fn(tpl, x, kv_k, kv_v, jnp.asarray(pos, jnp.int32), inv_freq)
