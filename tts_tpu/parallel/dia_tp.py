"""Megatron tensor parallelism for the QUANTIZED Dia CFG decode step.

Completes SURVEY §2.8's "TP for the AR decoders" across all three
autoregressive models (Parler: tp_megastep, Orpheus: llama_tp, Dia: here).
Layout over `tp` (shard_map): self-attention qkv column-sharded by GQA head
GROUPS (each device's 16/tp query heads attend its own 4/tp kv heads — no
attention collective), cross-attention q column-sharded by heads against
per-request head-sharded cross K/V (incl. the analytic pad-tail fold from
ops/dia_megastep.prep_dia_cross), o/cross_o/wo row-sharded with one psum
each, gate/up column-sharded. The CFG pair rides as two activation rows,
replicated across devices. KV cache sharded on the kv-head axis.

Quantized end to end (per-shard Pallas dequant matmul on TPU, XLA
elsewhere); N-sharded projections keep the Q4 nibble pack, K-sharded ones
unpack at prep.
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
from ..ops.llama_megastep import _inv_freq_row
from ..ops.quant_matmul import QuantTensor, quant_matmul, unpack_codes_t


class DiaTPLayers(NamedTuple):
    qkv_c: Any    # (L, Kc, (nh_l + 2*nkv_l)*d*tp) device-major [q_i|k_i|v_i]
    qkv_s: Any
    o_c: Any      # (L, QH, H) K-sharded (self_o)
    o_s: Any
    cq_c: Any     # (L, Kc, QH) N-sharded by heads (cross_q)
    cq_s: Any
    co_c: Any     # (L, QH, H) K-sharded (cross_o)
    co_s: Any
    gate_c: Any   # (L, Kc, F) N-sharded
    gate_s: Any
    up_c: Any     # (L, Kc, F) N-sharded
    up_s: Any
    wo_c: Any     # (L, F, H) K-sharded
    wo_s: Any
    norms: Any    # (L, 3, H) replicated


def prep_dia_tp(layers, tp: int, *, n_heads: int, n_kv: int,
                head_d: int) -> tuple[DiaTPLayers, int]:
    """Build DiaTPLayers from a stacked DiaDecoderLayer with QuantTensor
    projections; cross_k/cross_v projections are encode-time only and stay
    out of the decode layout."""
    mats = dict(q=layers.self_q, k=layers.self_k, v=layers.self_v,
                o=layers.self_o, cq=layers.cross_q, co=layers.cross_o,
                gate=layers.gate, up=layers.up, wo=layers.wo)
    if not all(isinstance(m, QuantTensor) for m in mats.values()):
        raise ValueError("dia TP needs all decode projections quantized")
    qtypes = {m.qtype for m in mats.values()}
    if len(qtypes) != 1 or next(iter(qtypes)) not in _BIAS:
        raise ValueError(f"dia TP needs one uniform qtype: {qtypes}")
    qtype = next(iter(qtypes))
    if n_heads % tp or n_kv % tp:
        raise ValueError(f"tp={tp} must divide heads {n_heads}/{n_kv}")
    f = mats["wo"].shape[1]
    if (n_heads * head_d // tp) % 32 or (f // tp) % 32:
        raise ValueError(
            f"tp={tp}: K-row shards of o ({n_heads * head_d}) and wo ({f}) "
            f"must contain whole 32-row quant blocks")

    def unpack(m: QuantTensor) -> QuantTensor:
        if not m.is_packed:
            return m
        return QuantTensor(
            unpack_codes_t(m.codes_t, m.shape[1]).astype(jnp.int8),
            m.scales_t, m.qtype)

    mats["o"] = unpack(mats["o"])
    mats["co"] = unpack(mats["co"])
    mats["wo"] = unpack(mats["wo"])
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

    tpl = DiaTPLayers(
        qkv_c=pack_qkv("codes_t").astype(jnp.int8),
        qkv_s=pack_qkv("scales_t").astype(jnp.float32),
        o_c=mats["o"].codes_t.astype(jnp.int8),
        o_s=mats["o"].scales_t.astype(jnp.float32),
        cq_c=mats["cq"].codes_t.astype(jnp.int8),
        cq_s=mats["cq"].scales_t.astype(jnp.float32),
        co_c=mats["co"].codes_t.astype(jnp.int8),
        co_s=mats["co"].scales_t.astype(jnp.float32),
        gate_c=mats["gate"].codes_t.astype(jnp.int8),
        gate_s=mats["gate"].scales_t.astype(jnp.float32),
        up_c=mats["up"].codes_t.astype(jnp.int8),
        up_s=mats["up"].scales_t.astype(jnp.float32),
        wo_c=mats["wo"].codes_t.astype(jnp.int8),
        wo_s=mats["wo"].scales_t.astype(jnp.float32),
        norms=jnp.stack([layers.sa_norm, layers.ca_norm, layers.mlp_norm],
                        axis=1).astype(jnp.float32),
    )
    return tpl, qtype


DIA_TP_SPECS = DiaTPLayers(
    qkv_c=P(None, None, "tp"), qkv_s=P(None, None, "tp"),
    o_c=P(None, "tp", None), o_s=P(None, "tp", None),
    cq_c=P(None, None, "tp"), cq_s=P(None, None, "tp"),
    co_c=P(None, "tp", None), co_s=P(None, "tp", None),
    gate_c=P(None, None, "tp"), gate_s=P(None, None, "tp"),
    up_c=P(None, None, "tp"), up_s=P(None, None, "tp"),
    wo_c=P(None, "tp", None), wo_s=P(None, "tp", None),
    norms=P(),
)


def shard_dia_tp(tpl: DiaTPLayers, mesh: Mesh) -> DiaTPLayers:
    return DiaTPLayers(*[
        jax.device_put(x, NamedSharding(mesh, s))
        for x, s in zip(tpl, DIA_TP_SPECS)])


def shard_dia_cross(ck, cv, vtail, mesh: Mesh):
    """Per-request cross arrays from prep_dia_cross ((L, 2*heads, Sb, D) /
    (L, 2*heads, D)) reshaped to expose the head axis and sharded on it."""
    l, bh, sb, d = ck.shape
    spec4 = NamedSharding(mesh, P(None, None, "tp", None, None))
    spec3 = NamedSharding(mesh, P(None, None, "tp", None))
    h = bh // 2
    return (jax.device_put(ck.reshape(l, 2, h, sb, d), spec4),
            jax.device_put(cv.reshape(l, 2, h, sb, d), spec4),
            jax.device_put(vtail.reshape(l, 2, h, d), spec3))


def _rms(x, w, eps=1e-5):
    ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(ms + eps) * w


@functools.partial(jax.jit,
                   static_argnames=("mesh", "qtype", "n_heads", "n_kv",
                                    "n_tail"))
def dia_megastep_tp(tpl: DiaTPLayers, x, kv_k, kv_v, pos, ck, cv, vtail,
                    n_tail: int, *, mesh: Mesh, qtype: int, n_heads: int,
                    n_kv: int):
    """Megatron-TP quantized Dia CFG decode step over all L layers.

    x (2, H) replicated (CFG rows); kv (L, 2, n_kv, CTX, D) kv-head-sharded;
    ck/cv (L, 2, heads, Sb, D) + vtail (L, 2, heads, D) head-sharded
    (shard_dia_cross). Returns (x_out (2, H) replicated pre-final-norm,
    k_new/v_new (L, 2, n_kv*D) kv-head-sharded on the feature axis)."""
    tp = mesh.shape["tp"]
    hidden = x.shape[1]
    d = kv_k.shape[-1]
    nh_l, nkv_l = n_heads // tp, n_kv // tp
    g = nh_l // nkv_l
    inv = _inv_freq_row(d, 10000.0, None)

    def body(tpl_l, x, kv_k, kv_v, pos, ck, cv, vtail, inv):
        ang = pos.astype(jnp.float32) * inv                  # (1, d/2)
        cos, sin = jnp.cos(ang), jnp.sin(ang)

        def rope(y, nh):                                     # (2, nh*d)
            y = y.reshape(2, nh, d)
            y1, y2 = y[:, :, : d // 2], y[:, :, d // 2:]
            return jnp.concatenate([y1 * cos[None] - y2 * sin[None],
                                    y2 * cos[None] + y1 * sin[None]], axis=2)

        def qmm(h, c, s):
            return quant_matmul(h, c, s, qtype)

        def layer(carry, inp):
            xx = carry                                       # (2, H)
            (qkv_c, qkv_s, o_c, o_s, cq_c, cq_s, co_c, co_s, g_c, g_s,
             u_c, u_s, w_c, w_s, nm, kc, vc, ckl, cvl, vtl) = inp
            h1 = _rms(xx, nm[0][None])
            qkv = qmm(h1, qkv_c, qkv_s)      # (2, (nh_l + 2*nkv_l)*d)
            q = rope(qkv[:, : nh_l * d], nh_l)               # (2, nh_l, d)
            k = rope(qkv[:, nh_l * d:(nh_l + nkv_l) * d], nkv_l)
            v = qkv[:, (nh_l + nkv_l) * d:].reshape(2, nkv_l, d)
            # GQA self attention on local heads, scale 1.0, analytic fold
            qs = q.reshape(2, nkv_l, g, d)
            kh = kc.astype(jnp.float32)                      # (2,nkv_l,CTX,D)
            s = jnp.einsum("bhgd,bhtd->bhgt", qs, kh)
            t = jnp.arange(kc.shape[2])
            s = jnp.where(t[None, None, None, :] < pos, s, -jnp.inf)
            s_cur = jnp.sum(qs * k[:, :, None, :], axis=3, keepdims=True)
            m = jnp.maximum(jnp.max(s, axis=3, keepdims=True), s_cur)
            ph = jnp.exp(s - m)
            pc = jnp.exp(s_cur - m)
            denom = jnp.sum(ph, axis=3, keepdims=True) + pc
            av = jnp.einsum("bhgt,bhtd->bhgd", ph, vc.astype(jnp.float32))
            attn = ((av + pc * v[:, :, None, :]) / denom).reshape(
                2, nh_l * d)
            xx = xx + jax.lax.psum(qmm(attn, o_c, o_s), "tp")
            # cross attention on local heads with the pad-tail fold
            h2 = _rms(xx, nm[1][None])
            cq = rope(qmm(h2, cq_c, cq_s), nh_l)             # (2, nh_l, d)
            cq = cq.reshape(2, nh_l, 1, d)
            ckf = ckl.astype(jnp.float32)                    # (2,nh_l,Sb,D)
            cs = jnp.einsum("bhqd,bhtd->bhqt", cq, ckf)
            m2 = jnp.max(cs, axis=3, keepdims=True)
            if n_tail:
                m2 = jnp.maximum(m2, 0.0)
            cph = jnp.exp(cs - m2)
            cden = jnp.sum(cph, axis=3, keepdims=True)
            cav = jnp.einsum("bhqt,bhtd->bhqd", cph,
                             cvl.astype(jnp.float32))
            if n_tail:
                et = jnp.exp(-m2)
                cden = cden + n_tail * et
                cav = cav + et * vtl[:, :, None, :]
            ca = (cav / cden).reshape(2, nh_l * d)
            xx = xx + jax.lax.psum(qmm(ca, co_c, co_s), "tp")
            h3 = _rms(xx, nm[2][None])
            gate = qmm(h3, g_c, g_s)
            up = qmm(h3, u_c, u_s)
            xx = xx + jax.lax.psum(
                qmm(jax.nn.silu(gate) * up, w_c, w_s), "tp")
            return xx, (k.reshape(2, nkv_l * d), v.reshape(2, nkv_l * d))

        xs = tuple(tpl_l) + (kv_k, kv_v, ck, cv, vtail)
        x_out, (k_new, v_new) = jax.lax.scan(layer, x.astype(jnp.float32), xs)
        return x_out, k_new, v_new

    in_specs = (DIA_TP_SPECS, P(), P(None, None, "tp", None, None),
                P(None, None, "tp", None, None), P(),
                P(None, None, "tp", None, None),
                P(None, None, "tp", None, None),
                P(None, None, "tp", None), P())
    out_specs = (P(), P(None, None, "tp"), P(None, None, "tp"))
    fn = shard_map(body, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_vma=False)
    return fn(tpl, x, kv_k, kv_v, jnp.asarray(pos, jnp.int32), ck, cv,
              vtail, inv)
