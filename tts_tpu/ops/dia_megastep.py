"""Whole-transformer Dia CFG decode megastep — ONE Pallas kernel for all L
decoder layers of Dia (18 layers, hidden 2048, GQA 16q/4kv, NeoX RoPE,
softmax scale 1.0, SiLU-gated MLP, per-layer cross-attention).

Same bandwidth argument as ops/parler_megastep: the decode step is
weight-bound, so the whole layer stack runs in one pallas_call with the
activations in VMEM scratch and the weight DMA of phase p+1 overlapping
phase p's compute. Two Dia twists:

  * CFG batch-2 for free: the conditional and unconditional sequences ride
    as rows 0 and 1 of the (8, H) activation block, so every quantized
    weight is read from HBM ONCE for both sequences (the reference runs
    them as ggml batch dim 2 through the same mul_mats,
    src/models/dia/model.cpp:697-704 — here the sharing is explicit in one
    MXU matmul).
  * cross-attention tail fold: the reference attends the FULL padded
    1024-token encoder context, where K rows past the prompt are zeroed
    (model.cpp:486-500) so every pad position contributes logit exactly 0
    and its (non-zero) V row. We keep only a bucketed prefix of the cross
    K/V on the fast path and fold the [Sb, 1024) tail analytically:
    denom += n_tail * e^{-m}, numer += e^{-m} * sum(V_tail) with the tail
    V-sum precomputed at encode time. Exact up to fp reassociation.

Phases: p0 = self-attention (qkv + o resident), p1 = cross-attention
(cq + co + bucketed bf16 cross-K/V), p2.. = FFN chunks (gate/up (H, fc)
and down (fc, H) slices stream per phase, partial down-projections
accumulate into the residual scratch).

Replaces the per-projection quant matmuls of the previous decode path
(models/dia/model.py _dia_decoder_step); reference hot loop:
src/models/dia/model.cpp:697-721.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..gguf import quants
from .parler_megastep import _BIAS, _dqdot, _qdot_ref
from .llama_megastep import _rope_rows, _inv_freq_row


class DiaMegaLayers(NamedTuple):
    """Stacked per-layer decoder weights in megakernel layout.

    codes transposed-planar int8 (K, N) (nibble-packed Q4: (K//2, N));
    scales f32 (K//32, N). qkv = concat(self_q, self_k, self_v) on N;
    occ = concat(self_o, cross_q, cross_o) on N; norms packs
    (sa_norm, ca_norm, mlp_norm) — RMS, no bias.
    """

    qkv_codes: Any    # (L, Kc, QH + 2*KVH) i8
    qkv_scales: Any   # (L, H//32, QH + 2*KVH) f32
    occ_codes: Any    # (L, Kc, 3*QH) i8
    occ_scales: Any
    gate_codes: Any   # (L, Kc, F) i8
    gate_scales: Any
    up_codes: Any     # (L, Kc, F) i8
    up_scales: Any
    down_codes: Any   # (L, F_kc, H) i8
    down_scales: Any  # (L, F//32, H)
    norms: Any        # (L, 3, H) f32


def prep_dia_mega(layers) -> tuple[DiaMegaLayers, int]:
    """Build DiaMegaLayers from a stacked DiaDecoderLayer whose projections
    are QuantTensors of one shared qtype; ValueError otherwise (caller falls
    back to the per-matmul path). cross_k/cross_v projections are NOT packed
    here — they only run at encode time."""
    from .quant_matmul import QuantTensor

    mats = dict(q=layers.self_q, k=layers.self_k, v=layers.self_v,
                o=layers.self_o, cq=layers.cross_q, co=layers.cross_o,
                gate=layers.gate, up=layers.up, down=layers.wo)
    if not all(isinstance(m, QuantTensor) for m in mats.values()):
        raise ValueError("dia megastep needs all decode projections quantized")
    qtypes = {m.qtype for m in mats.values()}
    if len(qtypes) != 1 or next(iter(qtypes)) not in _BIAS:
        raise ValueError(f"dia megastep needs one uniform qtype, got {qtypes}")
    qtype = next(iter(qtypes))

    def cat(ms):
        return (jnp.concatenate([m.codes_t for m in ms], axis=-1),
                jnp.concatenate([m.scales_t.astype(jnp.bfloat16) for m in ms],
                                axis=-1))

    qkv_c, qkv_s = cat([mats["q"], mats["k"], mats["v"]])
    occ_c, occ_s = cat([mats["o"], mats["cq"], mats["co"]])
    norms = jnp.stack([layers.sa_norm, layers.ca_norm, layers.mlp_norm],
                      axis=1)
    mega = DiaMegaLayers(
        qkv_codes=qkv_c.astype(jnp.int8), qkv_scales=qkv_s,
        occ_codes=occ_c.astype(jnp.int8), occ_scales=occ_s,
        gate_codes=mats["gate"].codes_t.astype(jnp.int8),
        gate_scales=mats["gate"].scales_t.astype(jnp.bfloat16),
        up_codes=mats["up"].codes_t.astype(jnp.int8),
        up_scales=mats["up"].scales_t.astype(jnp.bfloat16),
        down_codes=mats["down"].codes_t.astype(jnp.int8),
        down_scales=mats["down"].scales_t.astype(jnp.bfloat16),
        norms=norms.astype(jnp.float32),
    )
    if (qtype == quants.GGML_TYPE_Q4_0
            and mega.qkv_codes.shape[1] == mega.qkv_scales.shape[1] * 32):
        from .quant_matmul import can_pack, pack_codes_t
        if can_pack(mega.qkv_codes.shape[1]) and \
                can_pack(mega.down_codes.shape[1]):
            mega = mega._replace(
                qkv_codes=pack_codes_t(mega.qkv_codes),
                occ_codes=pack_codes_t(mega.occ_codes),
                gate_codes=pack_codes_t(mega.gate_codes),
                up_codes=pack_codes_t(mega.up_codes),
                down_codes=pack_codes_t(mega.down_codes))
    return mega, qtype


CROSS_BUCKETS = (128, 256, 512, 1024)


def prep_dia_cross(cross_k, cross_v, sentence_length: int,
                   buckets=CROSS_BUCKETS):
    """Pack per-request cross K/V for the megastep fast path.

    cross_k/cross_v: (L, 2, heads, Tc, D) f32 from dia_encode (K rows past
    the prompt already zeroed). Returns (ck bf16 (L, 2*heads, Sb, D),
    cv bf16 same, vtail f32 (L, 2*heads, D) = sum of V rows in [Sb, Tc),
    n_tail) where Sb is the smallest bucket >= sentence_length."""
    tc = cross_k.shape[3]
    sb = next((b for b in buckets if b >= sentence_length and b <= tc), tc)
    l, b2, h, _, d = cross_k.shape
    ck = cross_k[:, :, :, :sb].astype(jnp.bfloat16).reshape(l, b2 * h, sb, d)
    cv = cross_v[:, :, :, :sb].astype(jnp.bfloat16).reshape(l, b2 * h, sb, d)
    vtail = jnp.sum(cross_v[:, :, :, sb:], axis=3,
                    dtype=jnp.float32).reshape(l, b2 * h, d)
    return ck, cv, vtail, tc - sb


def _rms(x, w, eps=1e-5):
    ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(ms + eps) * w


def _dia_kernel(pos_ref, x_ref, inv_ref, qkv_c, qkv_s, occ_c, occ_s,
                g_c, g_s, u_c, u_s, d_c, d_s, norms, ck_ref, cv_ref,
                vtail_ref, kc_ref, vc_ref,
                x_out, k_out, v_out, x_scr, h_scr, att_scr,
                *, n_layers, n_phases, n_heads, n_kv, hidden, head_d,
                n_tail, bias):
    l = pl.program_id(0)
    p = pl.program_id(1)
    pos = pos_ref[0]
    qh_dim = n_heads * head_d
    kv_dim = n_kv * head_d
    g = n_heads // n_kv

    @pl.when(p == 0)
    def _():
        @pl.when(l == 0)
        def _():
            x_scr[:] = x_ref[:]

        nm = norms[0]
        x = x_scr[:]                                           # (8, H)
        h1 = _rms(x, nm[0:1])
        qkv = _dqdot(h1, qkv_c[0], qkv_s[0], bias)             # (8, QH+2KV)
        ang = pos.astype(jnp.float32) * inv_ref[:]             # (1, d/2)
        cos = jnp.broadcast_to(jnp.cos(ang), (8, head_d // 2))
        sin = jnp.broadcast_to(jnp.sin(ang), (8, head_d // 2))
        q = _rope_rows(qkv[:, :qh_dim], cos, sin, n_heads, head_d)
        k = _rope_rows(qkv[:, qh_dim:qh_dim + kv_dim], cos, sin, n_kv,
                       head_d)
        v = qkv[:, qh_dim + kv_dim:]
        k_out[0] = k
        v_out[0] = v
        # self attention over the bf16 cache + current token (analytic
        # fold), CFG rows separately: row b attends cache batch b.
        # Dia softmax scale is 1.0 (model.cpp:399,563).
        for b in range(2):
            for j in range(n_kv):
                kh = kc_ref[0, b * n_kv + j].astype(jnp.float32)  # (CTX, D)
                vh = vc_ref[0, b * n_kv + j].astype(jnp.float32)
                kcur = k[b:b + 1, j * head_d:(j + 1) * head_d]    # (1, D)
                vcur = v[b:b + 1, j * head_d:(j + 1) * head_d]
                for gi in range(g):
                    hh = j * g + gi
                    qh = q[b:b + 1, hh * head_d:(hh + 1) * head_d]
                    s = jax.lax.dot_general(
                        qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)       # (1, CTX)
                    t = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                    s = jnp.where(t < pos, s, -jnp.inf)
                    s_cur = jnp.sum(qh * kcur, axis=1, keepdims=True)
                    m = jnp.maximum(jnp.max(s, axis=1, keepdims=True), s_cur)
                    ph = jnp.exp(s - m)
                    pc = jnp.exp(s_cur - m)
                    denom = jnp.sum(ph, axis=1, keepdims=True) + pc
                    av = jax.lax.dot_general(
                        ph, vh, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)       # (1, D)
                    att_scr[b:b + 1, hh * head_d:(hh + 1) * head_d] = \
                        (av + pc * vcur) / denom
        o = _dqdot(att_scr[:], occ_c[0][:, :qh_dim],
                   occ_s[0][:, :qh_dim], bias)
        x_scr[:] = x + o

    @pl.when(p == 1)
    def _():
        nm = norms[0]
        x = x_scr[:]
        h2 = _rms(x, nm[1:2])
        cq = _dqdot(h2, occ_c[0][:, qh_dim:2 * qh_dim],
                    occ_s[0][:, qh_dim:2 * qh_dim], bias)         # (8, QH)
        ang = pos.astype(jnp.float32) * inv_ref[:]
        cos = jnp.broadcast_to(jnp.cos(ang), (8, head_d // 2))
        sin = jnp.broadcast_to(jnp.sin(ang), (8, head_d // 2))
        cq = _rope_rows(cq, cos, sin, n_heads, head_d)
        # cross attention over the bucketed prefix + analytic pad tail:
        # tail positions have K == 0 exactly, so their logit is 0 and they
        # contribute n_tail * e^{-m} mass with V-sum vtail (module header).
        for b in range(2):
            for hh in range(n_heads):
                qh = cq[b:b + 1, hh * head_d:(hh + 1) * head_d]   # (1, D)
                ckh = ck_ref[0, b * n_heads + hh].astype(jnp.float32)
                cvh = cv_ref[0, b * n_heads + hh].astype(jnp.float32)
                s = jax.lax.dot_general(
                    qh, ckh, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)           # (1, Sb)
                m = jnp.max(s, axis=1, keepdims=True)
                if n_tail:
                    m = jnp.maximum(m, 0.0)
                ph = jnp.exp(s - m)
                denom = jnp.sum(ph, axis=1, keepdims=True)
                av = jax.lax.dot_general(
                    ph, cvh, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)           # (1, D)
                if n_tail:
                    et = jnp.exp(-m)
                    denom = denom + n_tail * et
                    av = av + et * vtail_ref[0, b * n_heads + hh][None, :]
                att_scr[b:b + 1, hh * head_d:(hh + 1) * head_d] = av / denom
        co = _dqdot(att_scr[:], occ_c[0][:, 2 * qh_dim:],
                    occ_s[0][:, 2 * qh_dim:], bias)
        x = x + co
        x_scr[:] = x
        h_scr[:] = _rms(x, nm[2:3])

    @pl.when(p > 1)
    def _():
        h3 = h_scr[:]
        gate = _dqdot(h3, g_c[0], g_s[0], bias)                   # (8, FC)
        up = _dqdot(h3, u_c[0], u_s[0], bias)
        a = jax.nn.silu(gate) * up
        down = _dqdot(a, d_c[0], d_s[0], bias)                    # (8, H)
        x_scr[:] = x_scr[:] + down

        @pl.when((l == n_layers - 1) & (p == n_phases - 1))
        def _():
            x_out[:] = x_scr[:]


def dia_megastep(mega: DiaMegaLayers, x, kv_k, kv_v, pos, ck, cv, vtail,
                 n_tail: int, *, qtype: int, n_heads: int, n_kv: int,
                 fc: int = 2048):  # 2048 measured 1.85 vs 2.40 ms/step at 4096
    """x (2, H) f32 (rows = CFG cond/uncond); kv_k/kv_v (L, 2, n_kv, CTX, D);
    ck/cv (L, 2*heads, Sb, D) bf16 + vtail (L, 2*heads, D) f32 from
    prep_dia_cross; pos = cache row. Returns (x_out (2, H) pre-final-norm,
    k_new (L, 2, KV), v_new (L, 2, KV)); caller writes the cache rows and
    applies final RMS norm + LM heads + CFG merge. Dispatches to the XLA
    reference off-TPU."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    if not on_tpu:
        return dia_megastep_reference(
            mega, x, kv_k, kv_v, pos, ck, cv, vtail, n_tail, qtype=qtype,
            n_heads=n_heads, n_kv=n_kv)
    return _dia_megastep_tpu(
        mega, x, kv_k, kv_v, pos, ck, cv, vtail, n_tail, qtype=qtype,
        n_heads=n_heads, n_kv=n_kv, fc=fc)


@functools.partial(jax.jit, static_argnames=("n_tail", "qtype", "n_heads",
                                             "n_kv", "fc"))
def _dia_megastep_tpu(mega: DiaMegaLayers, x, kv_k, kv_v, pos, ck, cv,
                      vtail, n_tail: int, *, qtype: int, n_heads: int,
                      n_kv: int, fc: int):
    L = mega.qkv_codes.shape[0]
    hidden = mega.qkv_scales.shape[1] * 32
    f = mega.gate_codes.shape[2]
    pk = hidden // mega.qkv_codes.shape[1]   # 2 when nibble-packed, else 1
    _, _, kvh, ctx, d = kv_k.shape
    head_d = hidden // n_heads
    sb = ck.shape[2]
    fc = min(fc, f)
    if pk == 2 and f > fc:
        from .quant_matmul import PACK_BLOCK
        assert fc % PACK_BLOCK == 0, (fc, PACK_BLOCK)
    n_ph = 2 + f // fc
    inv = _inv_freq_row(head_d, 10000.0, None)
    x8 = jnp.zeros((8, hidden), jnp.float32).at[:2].set(
        x.astype(jnp.float32))
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    kv_n = n_heads * head_d + 2 * n_kv * head_d
    kvr = kv_k.reshape(L, 2 * kvh, ctx, d)
    vvr = kv_v.reshape(L, 2 * kvh, ctx, d)

    def at_l(l, p, s):
        return (l, 0, 0)

    def at_l4(l, p, s):
        return (l, 0, 0, 0)

    def ffn_hk(l, p, s):
        return (l, 0, jnp.maximum(p - 2, 0))

    def ffn_kh(l, p, s):
        return (l, jnp.maximum(p - 2, 0), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, n_ph),
        in_specs=[
            pl.BlockSpec((8, hidden), lambda l, p, s: (0, 0)),
            pl.BlockSpec((1, head_d // 2), lambda l, p, s: (0, 0)),
            pl.BlockSpec((1, hidden // pk, kv_n), at_l),
            pl.BlockSpec((1, hidden // 32, kv_n), at_l),
            pl.BlockSpec((1, hidden // pk, 3 * n_heads * head_d), at_l),
            pl.BlockSpec((1, hidden // 32, 3 * n_heads * head_d), at_l),
            pl.BlockSpec((1, hidden // pk, fc), ffn_hk),
            pl.BlockSpec((1, hidden // 32, fc), ffn_hk),
            pl.BlockSpec((1, hidden // pk, fc), ffn_hk),
            pl.BlockSpec((1, hidden // 32, fc), ffn_hk),
            pl.BlockSpec((1, fc // pk, hidden), ffn_kh),
            pl.BlockSpec((1, fc // 32, hidden), ffn_kh),
            pl.BlockSpec((1, 3, hidden), at_l),
            pl.BlockSpec((1, 2 * n_heads, sb, d), at_l4),
            pl.BlockSpec((1, 2 * n_heads, sb, d), at_l4),
            pl.BlockSpec((1, 2 * n_heads, d), at_l),
            pl.BlockSpec((1, 2 * kvh, ctx, d), at_l4),
            pl.BlockSpec((1, 2 * kvh, ctx, d), at_l4),
        ],
        out_specs=[
            pl.BlockSpec((8, hidden), lambda l, p, s: (0, 0)),
            pl.BlockSpec((1, 8, kvh * d), at_l),
            pl.BlockSpec((1, 8, kvh * d), at_l),
        ],
        scratch_shapes=[pltpu.VMEM((8, hidden), jnp.float32),
                        pltpu.VMEM((8, hidden), jnp.float32),
                        pltpu.VMEM((8, n_heads * head_d), jnp.float32)],
    )
    x_out, k_new, v_new = pl.pallas_call(
        functools.partial(_dia_kernel, n_layers=L, n_phases=n_ph,
                          n_heads=n_heads, n_kv=n_kv, hidden=hidden,
                          head_d=head_d, n_tail=n_tail, bias=_BIAS[qtype]),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, hidden), jnp.float32),
            jax.ShapeDtypeStruct((L, 8, kvh * d), jnp.float32),
            jax.ShapeDtypeStruct((L, 8, kvh * d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(pos_arr, x8, inv, mega.qkv_codes, mega.qkv_scales, mega.occ_codes,
      mega.occ_scales, mega.gate_codes, mega.gate_scales, mega.up_codes,
      mega.up_scales, mega.down_codes, mega.down_scales, mega.norms,
      ck, cv, vtail, kvr, vvr)
    kv_dim = n_kv * d
    return (x_out[:2],
            k_new[:, :2, :].reshape(L, 2, kv_dim),
            v_new[:, :2, :].reshape(L, 2, kv_dim))


def dia_megastep_reference(mega: DiaMegaLayers, x, kv_k, kv_v, pos, ck, cv,
                           vtail, n_tail: int, *, qtype: int, n_heads: int,
                           n_kv: int):
    """Pure-XLA mirror of dia_megastep (same bf16 block-dequant math and
    analytic cross-attention tail fold)."""
    L = mega.qkv_codes.shape[0]
    hidden = mega.qkv_scales.shape[1] * 32
    head_d = hidden // n_heads
    g = n_heads // n_kv
    qh_dim = n_heads * head_d
    kv_dim = n_kv * head_d
    bias = _BIAS[qtype]
    inv = _inv_freq_row(head_d, 10000.0, None)
    ang = jnp.asarray(pos, jnp.float32) * inv                 # (1, d/2)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x = x.astype(jnp.float32)                                 # (2, H)

    def rope(y, nh):
        y = y.reshape(2, nh, head_d)
        y1, y2 = y[:, :, :head_d // 2], y[:, :, head_d // 2:]
        return jnp.concatenate(
            [y1 * cos[None], y2 * cos[None]], axis=2) + jnp.concatenate(
            [-y2 * sin[None], y1 * sin[None]], axis=2)

    def layer(carry, inp):
        xx = carry
        (qkv_c, qkv_s, occ_c, occ_s, g_c, g_s, u_c, u_s, d_c, d_s, nm,
         kc, vc, ckl, cvl, vtl) = inp
        h1 = _rms(xx, nm[0][None, :])
        qkv = _qdot_ref(h1, qkv_c, qkv_s, bias)               # (2, QH+2KV)
        q = rope(qkv[:, :qh_dim], n_heads).reshape(2, n_heads, head_d)
        k = rope(qkv[:, qh_dim:qh_dim + kv_dim],
                 n_kv).reshape(2, n_kv, head_d)
        v = qkv[:, qh_dim + kv_dim:].reshape(2, n_kv, head_d)
        # self attention (scale 1.0), kc (2, n_kv, CTX, D)
        qs = q.reshape(2, n_kv, g, head_d)
        kh = kc.astype(jnp.float32)
        s = jnp.einsum("bhgd,bhtd->bhgt", qs, kh)
        t = jnp.arange(kc.shape[2])
        s = jnp.where(t[None, None, None, :] < pos, s, -jnp.inf)
        s_cur = jnp.sum(qs * k[:, :, None, :], axis=3, keepdims=True)
        m = jnp.maximum(jnp.max(s, axis=3, keepdims=True), s_cur)
        ph = jnp.exp(s - m)
        pc = jnp.exp(s_cur - m)
        denom = jnp.sum(ph, axis=3, keepdims=True) + pc
        av = jnp.einsum("bhgt,bhtd->bhgd", ph, vc.astype(jnp.float32))
        attn = ((av + pc * v[:, :, None, :]) / denom).reshape(2, qh_dim)
        xx = xx + _qdot_ref(attn, occ_c[:, :qh_dim], occ_s[:, :qh_dim], bias)
        # cross attention with tail fold; ckl (2*heads, Sb, D)
        h2 = _rms(xx, nm[1][None, :])
        cq = _qdot_ref(h2, occ_c[:, qh_dim:2 * qh_dim],
                       occ_s[:, qh_dim:2 * qh_dim], bias)
        cq = rope(cq, n_heads).reshape(2 * n_heads, 1, head_d)
        ckf = ckl.astype(jnp.float32)
        cs = jnp.einsum("hqd,htd->hqt", cq, ckf)              # (2nh, 1, Sb)
        m = jnp.max(cs, axis=2, keepdims=True)
        if n_tail:
            m = jnp.maximum(m, 0.0)
        cph = jnp.exp(cs - m)
        cden = jnp.sum(cph, axis=2, keepdims=True)
        cav = jnp.einsum("hqt,htd->hqd", cph, cvl.astype(jnp.float32))
        if n_tail:
            et = jnp.exp(-m)
            cden = cden + n_tail * et
            cav = cav + et * vtl[:, None, :]
        ca = (cav / cden).reshape(2, qh_dim)
        xx = xx + _qdot_ref(ca, occ_c[:, 2 * qh_dim:],
                            occ_s[:, 2 * qh_dim:], bias)
        h3 = _rms(xx, nm[2][None, :])
        gate = _qdot_ref(h3, g_c, g_s, bias)
        up = _qdot_ref(h3, u_c, u_s, bias)
        down = _qdot_ref(jax.nn.silu(gate) * up, d_c, d_s, bias)
        xx = xx + down
        return xx, (k.reshape(2, kv_dim), v.reshape(2, kv_dim))

    xs = (mega.qkv_codes, mega.qkv_scales, mega.occ_codes, mega.occ_scales,
          mega.gate_codes, mega.gate_scales, mega.up_codes, mega.up_scales,
          mega.down_codes, mega.down_scales, mega.norms, kv_k, kv_v,
          ck, cv, vtail)
    x_out, (k_new, v_new) = jax.lax.scan(layer, x, xs)
    return x_out, k_new, v_new


# ---------------------------------------------------------------------------
# batched megastep: B CFG-pair slots (2B rows) per step, one weight read
# ---------------------------------------------------------------------------
#
# Port of ops/parler_megastep.parler_megastep_batched to Dia: the 8 f32
# sublane rows carry B=4 slots x 2 CFG rows, so the quantized weight
# stream is read once for every active request (the reference can only
# scale Dia by full replicas, examples/server/server.cpp:885-897).
# Grid (L, n_pages + 1 + n_ffn): per-slot self-attention KV pages fold
# flash-style (page index map clamped at the max live page), one phase
# runs the vectorized cross-attention over per-slot bucketed cross K/V
# with the analytic pad-tail fold, then the FFN streams in fc slices.
# Attention state is h-major so KV/cross blocks reshape to matching rows
# with leading-dim transposes only (no lane/sublane relayouts).


def _dia_batched_kernel(mp_ref, pos_ref, pos_b_ref, x_ref, inv_ref,
                        qkv_c, qkv_s,
                        occ_c, occ_s, g_c, g_s, u_c, u_s, d_c, d_s, norms,
                        ck_ref, cv_ref, vtail_ref, kc_ref, vc_ref,
                        x_out, k_out, v_out,
                        x_scr, h_scr, q_scr, acc_scr, m_scr, l_scr,
                        *, n_layers, n_pages, n_ffn, n_heads, n_kv, hidden,
                        head_d, rows8, page, n_tail, bias):
    l = pl.program_id(0)
    p = pl.program_id(1)
    qh_dim = n_heads * head_d
    kv_dim = n_kv * head_d
    g = n_heads // n_kv
    rows = rows8 * n_heads
    h2d = head_d // 2

    def rope_full(y, nh):
        # NeoX rotation at per-row positions via two lane rolls; the
        # per-row positions come as their OWN (2B, 1) input (pos_ref is
        # head-repeated for the page masks)
        pos_b = pos_b_ref[:].astype(jnp.float32)           # (rows8, 1)
        ang = pos_b * inv_ref[0:1]                         # (rows8, d/2)
        cosd = jnp.concatenate([jnp.cos(ang)] * 2, axis=1)
        sind = jnp.concatenate([jnp.sin(ang)] * 2, axis=1)
        cw = jnp.concatenate([cosd] * nh, axis=1)
        sw = jnp.concatenate([sind] * nh, axis=1)
        rn = pltpu.roll(y, y.shape[1] - h2d, 1)
        rp = pltpu.roll(y, h2d, 1)
        li = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
        return y * cw + jnp.where((li % head_d) < h2d, -rn, rp) * sw

    @pl.when((l == 0) & (p == 0))
    def _():
        x_scr[:] = x_ref[:]

    @pl.when(p == 0)
    def _():
        nm = norms[0]
        x = x_scr[:]                                       # (2B, H)
        h1 = _rms(x, nm[0:1])
        qkv = _dqdot(h1, qkv_c[0], qkv_s[0], bias)         # (2B, QH+2KV)
        q = rope_full(qkv[:, :qh_dim], n_heads)            # scale 1.0
        k_row = rope_full(qkv[:, qh_dim:qh_dim + kv_dim], n_kv)
        v_row = qkv[:, qh_dim + kv_dim:]
        k_out[0] = k_row
        v_out[0] = v_row
        # reshape-128 layout (see llama_megastep batched header): r-major
        # (row, query head) rows via one free reshape; flash state
        # initializes from the current token
        q4 = q.reshape(rows, head_d)
        krep = jnp.concatenate(
            [k_row[:, j * head_d:(j + 1) * head_d]
             for j in range(n_kv) for _ in range(g)], axis=1)
        vrep = jnp.concatenate(
            [v_row[:, j * head_d:(j + 1) * head_d]
             for j in range(n_kv) for _ in range(g)], axis=1)
        k4 = krep.reshape(rows, head_d)
        v4 = vrep.reshape(rows, head_d)
        q_scr[:] = q4
        s_cur = jnp.sum(q4 * k4, axis=1, keepdims=True)
        m_scr[:] = s_cur
        l_scr[:] = jnp.ones((rows, 1), jnp.float32)
        acc_scr[:] = v4

    @pl.when((p < n_pages) & (p <= mp_ref[0]))
    def _():
        cols = rows8 * n_kv * page
        k2 = kc_ref[:].reshape(cols, head_d)               # r-major (r,j,t)
        v2 = vc_ref[:].reshape(cols, head_d)
        s = jax.lax.dot_general(
            q_scr[:].astype(jnp.bfloat16), k2,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (rows, cols)
        ri = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
        t_pos = p * page + (ci % page)
        valid = ((ri // n_heads) == (ci // (n_kv * page))) & \
            (((ri % n_heads) // g) == ((ci // page) % n_kv)) & \
            (t_pos < pos_ref[:])
        s = jnp.where(valid, s, -jnp.inf)
        m_old = m_scr[:]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        pe = jnp.exp(s - m_new)
        av = jax.lax.dot_general(
            pe.astype(jnp.bfloat16), v2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_scr[:] = acc_scr[:] * alpha + av
        l_scr[:] = l_scr[:] * alpha + jnp.sum(pe, axis=1, keepdims=True)
        m_scr[:] = m_new

    @pl.when(p == n_pages - 1)
    def _():
        attn = (acc_scr[:] / l_scr[:]).reshape(rows8, qh_dim)
        o = _dqdot(attn, occ_c[0][:, :qh_dim],
                   occ_s[0][:, :qh_dim], bias)
        x_scr[:] = x_scr[:] + o

    @pl.when(p == n_pages)
    def _():
        nm = norms[0]
        x = x_scr[:]
        h2 = _rms(x, nm[1:2])
        cq = _dqdot(h2, occ_c[0][:, qh_dim:2 * qh_dim],
                    occ_s[0][:, qh_dim:2 * qh_dim], bias)  # (2B, QH)
        cq = rope_full(cq, n_heads)
        sb = ck_ref.shape[2]
        q4 = cq.reshape(rows, head_d)                      # (r, hh) rows
        # per-replica-row cross attention: each CFG row attends its own
        # bucketed cross K/V with the analytic pad-tail fold
        hiota = jax.lax.broadcasted_iota(jnp.int32,
                                         (n_heads, n_heads * sb), 0)
        ciota = jax.lax.broadcasted_iota(jnp.int32,
                                         (n_heads, n_heads * sb), 1)
        blockm = hiota == (ciota // sb)
        parts = []
        for r in range(rows8):
            q_r = q4[r * n_heads:(r + 1) * n_heads, :]     # (nh, d)
            ck_r = ck_ref[0, r * n_heads:(r + 1) * n_heads] \
                .reshape(n_heads * sb, head_d)
            cv_r = cv_ref[0, r * n_heads:(r + 1) * n_heads] \
                .reshape(n_heads * sb, head_d)
            s = jax.lax.dot_general(
                q_r.astype(jnp.bfloat16), ck_r,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (nh, nh*sb)
            s = jnp.where(blockm, s, -jnp.inf)
            m = jnp.max(s, axis=1, keepdims=True)
            if n_tail:
                m = jnp.maximum(m, 0.0)
            ph = jnp.exp(s - m)
            den = jnp.sum(ph, axis=1, keepdims=True)
            av = jax.lax.dot_general(
                ph.astype(jnp.bfloat16), cv_r,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (nh, d)
            if n_tail:
                et = jnp.exp(-m)
                den = den + n_tail * et
                av = av + et * vtail_ref[0, r * n_heads:(r + 1) * n_heads]
            parts.append(av / den)
        ca = jnp.concatenate(parts, axis=0).reshape(rows8, qh_dim)
        co = _dqdot(ca, occ_c[0][:, 2 * qh_dim:],
                    occ_s[0][:, 2 * qh_dim:], bias)
        x = x + co
        x_scr[:] = x
        h_scr[:] = _rms(x, nm[2:3])

    @pl.when(p > n_pages)
    def _():
        h3 = h_scr[:]
        gate = _dqdot(h3, g_c[0], g_s[0], bias)            # (2B, FC)
        up = _dqdot(h3, u_c[0], u_s[0], bias)
        a = jax.nn.silu(gate) * up
        down = _dqdot(a, d_c[0], d_s[0], bias)             # (2B, H)
        x_scr[:] = x_scr[:] + down

        @pl.when((l == n_layers - 1) & (p == n_pages + n_ffn))
        def _():
            x_out[:] = x_scr[:]


def dia_megastep_batched(mega: DiaMegaLayers, x, kv_k, kv_v, pos, ck, cv,
                         vtail, n_tail: int, *, qtype: int, n_heads: int,
                         n_kv: int, page: int = 256, fc: int = 2048):
    """Batched Dia megastep: x (2B, H) f32 (rows = B slots x [cond,
    uncond]); kv_k/kv_v (L, B, 2, n_kv, CTX, D); pos (B,) per-slot cache
    rows; ck/cv (L, B, 2, heads, Sb, D) bf16 + vtail (L, B, 2, heads, D)
    f32 (per-slot prep_dia_cross outputs stacked in state layout).

    Returns (x_out (2B, H) pre-final-norm, k_new (L, 2B, KV), v_new);
    caller writes each slot's cache rows at pos[slot] and applies final
    norm + heads + CFG merge. TPU requires 2B % 8 == 0 and CTX % page == 0;
    otherwise dispatches to a per-slot loop over the XLA reference."""
    b = kv_k.shape[1]
    ctx = kv_k.shape[-2]
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    head_d_chk = x.shape[1] // n_heads
    if not on_tpu or (2 * b) % 8 or ctx % page or head_d_chk % 128:
        return dia_megastep_batched_reference(
            mega, x, kv_k, kv_v, pos, ck, cv, vtail, n_tail, qtype=qtype,
            n_heads=n_heads, n_kv=n_kv)
    return _dia_megastep_batched_tpu(
        mega, x, kv_k, kv_v, pos, ck, cv, vtail, n_tail, qtype=qtype,
        n_heads=n_heads, n_kv=n_kv, page=page, fc=fc)


@functools.partial(jax.jit, static_argnames=("n_tail", "qtype", "n_heads",
                                             "n_kv", "page", "fc"))
def _dia_megastep_batched_tpu(mega: DiaMegaLayers, x, kv_k, kv_v, pos, ck,
                              cv, vtail, n_tail: int, *, qtype: int,
                              n_heads: int, n_kv: int, page: int, fc: int):
    L = mega.qkv_codes.shape[0]
    hidden = mega.qkv_scales.shape[1] * 32
    f = mega.gate_codes.shape[2]
    pk = hidden // mega.qkv_codes.shape[1]
    _, b, _, kvh, ctx, d = kv_k.shape
    rows8 = 2 * b
    head_d = hidden // n_heads
    sb = ck.shape[-2]
    fc = min(fc, f)
    n_ffn = f // fc
    n_pages = ctx // page
    inv = _inv_freq_row(head_d, 10000.0, None)
    kv_n = n_heads * head_d + 2 * n_kv * head_d
    pos = jnp.asarray(pos, jnp.int32)
    pos2 = jnp.repeat(pos, 2)                              # (2B,)
    mp = jnp.max(jnp.maximum(pos2 - 1, 0)) // page
    mp_arr = mp.reshape(1)
    pos_rows = jnp.repeat(pos2, n_heads)[:, None]          # (2B*nh, 1)
    kvr = kv_k.reshape(L, rows8 * kvh, ctx, d)
    vvr = kv_v.reshape(L, rows8 * kvh, ctx, d)
    ckr = ck.reshape(L, rows8 * n_heads, sb, d)
    cvr = cv.reshape(L, rows8 * n_heads, sb, d)
    vtr = vtail.reshape(L, rows8 * n_heads, d)

    def at_l(i, p, s):
        return (i, 0, 0)

    def at_l4(i, p, s):
        return (i, 0, 0, 0)

    def ffn_hk(i, p, s):
        return (i, 0, jnp.maximum(p - n_pages - 1, 0))

    def ffn_kh(i, p, s):
        return (i, jnp.maximum(p - n_pages - 1, 0), 0)

    def kv_map(i, p, s):
        return (i, 0, jnp.minimum(p, s[0]), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, n_pages + 1 + n_ffn),
        in_specs=[
            pl.BlockSpec((rows8 * n_heads, 1), lambda i, p, s: (0, 0)),
            pl.BlockSpec((rows8, 1), lambda i, p, s: (0, 0)),
            pl.BlockSpec((rows8, hidden), lambda i, p, s: (0, 0)),
            pl.BlockSpec((1, head_d // 2), lambda i, p, s: (0, 0)),
            pl.BlockSpec((1, hidden // pk, kv_n), at_l),
            pl.BlockSpec((1, hidden // 32, kv_n), at_l),
            pl.BlockSpec((1, hidden // pk, 3 * n_heads * head_d), at_l),
            pl.BlockSpec((1, hidden // 32, 3 * n_heads * head_d), at_l),
            pl.BlockSpec((1, hidden // pk, fc), ffn_hk),
            pl.BlockSpec((1, hidden // 32, fc), ffn_hk),
            pl.BlockSpec((1, hidden // pk, fc), ffn_hk),
            pl.BlockSpec((1, hidden // 32, fc), ffn_hk),
            pl.BlockSpec((1, fc // pk, hidden), ffn_kh),
            pl.BlockSpec((1, fc // 32, hidden), ffn_kh),
            pl.BlockSpec((1, 3, hidden), at_l),
            pl.BlockSpec((1, rows8 * n_heads, sb, d), at_l4),
            pl.BlockSpec((1, rows8 * n_heads, sb, d), at_l4),
            pl.BlockSpec((1, rows8 * n_heads, d), at_l),
            pl.BlockSpec((1, rows8 * kvh, page, d), kv_map),
            pl.BlockSpec((1, rows8 * kvh, page, d), kv_map),
        ],
        out_specs=[
            pl.BlockSpec((rows8, hidden), lambda i, p, s: (0, 0)),
            pl.BlockSpec((1, rows8, kvh * d), at_l),
            pl.BlockSpec((1, rows8, kvh * d), at_l),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows8, hidden), jnp.float32),          # x residual
            pltpu.VMEM((rows8, hidden), jnp.float32),          # h3
            pltpu.VMEM((rows8 * n_heads, head_d), jnp.float32),  # q rows
            pltpu.VMEM((rows8 * n_heads, head_d), jnp.float32),  # flash acc
            pltpu.VMEM((rows8 * n_heads, 1), jnp.float32),     # flash m
            pltpu.VMEM((rows8 * n_heads, 1), jnp.float32),     # flash l
        ],
    )
    x_out, k_new, v_new = pl.pallas_call(
        functools.partial(_dia_batched_kernel, n_layers=L, n_pages=n_pages,
                          n_ffn=n_ffn, n_heads=n_heads, n_kv=n_kv,
                          hidden=hidden, head_d=head_d, rows8=rows8,
                          page=page, n_tail=n_tail, bias=_BIAS[qtype]),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows8, hidden), jnp.float32),
            jax.ShapeDtypeStruct((L, rows8, kvh * d), jnp.float32),
            jax.ShapeDtypeStruct((L, rows8, kvh * d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(mp_arr, pos_rows.astype(jnp.int32), pos2[:, None], x.astype(jnp.float32),
      inv, mega.qkv_codes,
      mega.qkv_scales, mega.occ_codes, mega.occ_scales, mega.gate_codes,
      mega.gate_scales, mega.up_codes, mega.up_scales, mega.down_codes,
      mega.down_scales, mega.norms, ckr, cvr, vtr, kvr, vvr)
    return x_out, k_new, v_new


def dia_megastep_batched_reference(mega: DiaMegaLayers, x, kv_k, kv_v, pos,
                                   ck, cv, vtail, n_tail: int, *,
                                   qtype: int, n_heads: int, n_kv: int):
    """Per-slot loop over the single-slot reference."""
    pos = jnp.asarray(pos, jnp.int32)
    b = kv_k.shape[1]
    outs = []
    for s in range(b):
        outs.append(dia_megastep_reference(
            mega, x[2 * s:2 * s + 2], kv_k[:, s], kv_v[:, s], pos[s],
            ck[:, s].reshape(ck.shape[0], -1, ck.shape[-2], ck.shape[-1]),
            cv[:, s].reshape(cv.shape[0], -1, cv.shape[-2], cv.shape[-1]),
            vtail[:, s].reshape(vtail.shape[0], -1, vtail.shape[-1]),
            n_tail, qtype=qtype, n_heads=n_heads, n_kv=n_kv))
    return (jnp.concatenate([o[0] for o in outs], axis=0),
            jnp.concatenate([o[1] for o in outs], axis=1),
            jnp.concatenate([o[2] for o in outs], axis=1))
