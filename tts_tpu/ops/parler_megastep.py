"""Whole-transformer decode megastep — ONE Pallas kernel for all L layers.

Why: the decode step is weight-bandwidth-bound (~400 MB of quantized weights
per token), but a per-matmul pallas_call design pays ~5 us of fixed cost per
call (~200 calls/step = ~1 ms) and dequantizing int8 codes to f32 on the VPU
caps the stream at ~170 GB/s. This kernel instead:

  * runs the WHOLE layer stack in one pallas_call with grid=(L,), carrying
    the activation in VMEM scratch — DMA of layer l+1's weights overlaps
    layer l's compute, zero per-call overhead between layers;
  * weights cross HBM quantized (1 byte codes + per-32 f32 scales) and are
    dequantized to bf16 *in VMEM registers* per tile, then fed to ONE dense
    (B, K) x (K, N) bf16 MXU matmul per projection. MXU cost scales with the
    row count B (<= 128), not with K/32 like the earlier block-diagonal int8
    embed, which executed (K/32)/B x the necessary MACs (the round-2
    batched kernel's 6.4x-per-step regression);
  * keeps the KV cache in bf16 and computes attention on the MXU with the
    current token's K/V folded analytically into the softmax, so the cache
    write stays outside (one tiny dynamic_update_slice in XLA).

Reference parity: the math is the reference decode step
(src/models/parler/model.cpp:520-614) with ggml block dequantization
(ggml-quants dequantize_row_q4_0) done at bf16 instead of f32 (documented
divergence: ~2^-9 relative weight rounding, far below the Q4 weight-
quantization noise floor) and activations rounded to bf16 at the MXU input
(8-bit mantissa — strictly more precise than the reference's Q8_0
activation requantization in vec_dot_q4_0_q8_0).
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

QK = 32
_BIAS = {
    quants.GGML_TYPE_Q4_0: 8.0,
    quants.GGML_TYPE_Q5_0: 16.0,
    quants.GGML_TYPE_Q8_0: 0.0,
}


class MegaLayers(NamedTuple):
    """Per-layer weights in megakernel layout (all leaves stacked on L).

    codes are transposed-planar int8 (K, N); scales f32 (K//32, N).
    qkv = concat(q, k, v) on N; occ = concat(o, cq, co) on N.
    norms packs (ln1_w, ln1_b, lnc_w, lnc_b, ln2_w, ln2_b).
    """

    qkv_codes: Any   # (L, H, 3H) i8
    qkv_scales: Any  # (L, H//32, 3H) f32
    occ_codes: Any   # (L, H, 3H) i8
    occ_scales: Any  # (L, H//32, 3H) f32
    fc1_codes: Any   # (L, H, F) i8
    fc1_scales: Any  # (L, H//32, F) f32
    fc2_codes: Any   # (L, F, H) i8
    fc2_scales: Any  # (L, F//32, H) f32
    norms: Any       # (L, 6, H) f32
    cross_k: Any     # (L, heads, Tc, D) f32
    cross_v: Any     # (L, heads, Tc, D) f32


def prep_mega_layers(layers) -> tuple[MegaLayers, int]:
    """Build MegaLayers from stacked ParlerLayerWeights whose 8 projection
    weights are QuantTensors of one shared qtype. Raises ValueError if the
    layout doesn't qualify (caller falls back to the per-matmul path)."""
    from .quant_matmul import QuantTensor

    mats = dict(q=layers.q_w, k=layers.k_w, v=layers.v_w, o=layers.o_w,
                cq=layers.cq_w, co=layers.co_w, f1=layers.fc1, f2=layers.fc2)
    if not all(isinstance(m, QuantTensor) for m in mats.values()):
        raise ValueError("megastep needs all projections quantized")
    qtypes = {m.qtype for m in mats.values()}
    if len(qtypes) != 1 or next(iter(qtypes)) not in _BIAS:
        raise ValueError(f"megastep needs one uniform qtype, got {qtypes}")
    qtype = next(iter(qtypes))

    # scales ship in bf16: halves scale HBM traffic and enables _dqdot's
    # reduced-op fast path (see _dqdot header)
    def cat(ms, axis=-1):
        return (jnp.concatenate([m.codes_t for m in ms], axis=axis),
                jnp.concatenate([m.scales_t.astype(jnp.bfloat16) for m in ms],
                                axis=axis))

    qkv_c, qkv_s = cat([mats["q"], mats["k"], mats["v"]])
    occ_c, occ_s = cat([mats["o"], mats["cq"], mats["co"]])
    norms = jnp.stack([layers.ln1_w, layers.ln1_b, layers.lnc_w,
                       layers.lnc_b, layers.ln2_w, layers.ln2_b], axis=1)
    mega = MegaLayers(
        qkv_codes=qkv_c.astype(jnp.int8), qkv_scales=qkv_s,
        occ_codes=occ_c.astype(jnp.int8), occ_scales=occ_s,
        fc1_codes=mats["f1"].codes_t.astype(jnp.int8),
        fc1_scales=mats["f1"].scales_t.astype(jnp.bfloat16),
        fc2_codes=mats["f2"].codes_t.astype(jnp.int8),
        fc2_scales=mats["f2"].scales_t.astype(jnp.bfloat16),
        norms=norms.astype(jnp.float32),
        cross_k=layers.cross_k.astype(jnp.float32),
        cross_v=layers.cross_v.astype(jnp.float32),
    )
    if (qtype == quants.GGML_TYPE_Q4_0
            and mega.qkv_codes.shape[1] == mega.qkv_scales.shape[1] * QK):
        # nibble-pack Q4 codes (2/byte along K): exact, halves code traffic
        # (skipped when the QuantTensors arrived already packed; all-or-
        # nothing so the kernel dispatch sees one uniform layout)
        from .quant_matmul import can_pack, pack_codes_t
        if can_pack(mega.qkv_codes.shape[1]) and \
                can_pack(mega.fc2_codes.shape[1]):
            mega = mega._replace(
                qkv_codes=pack_codes_t(mega.qkv_codes),
                occ_codes=pack_codes_t(mega.occ_codes),
                fc1_codes=pack_codes_t(mega.fc1_codes),
                fc2_codes=pack_codes_t(mega.fc2_codes))
    return mega, qtype


# ---------------------------------------------------------------------------
# kernel helpers (traced inside the pallas kernel)
# ---------------------------------------------------------------------------

def _ln(x, w, b, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _dqdot(x, codes, scales, bias, *, kc=2048, nc=1024):
    """Dense block-dequant matmul: x (B, K) f32 x codes (K, N) i8 -> (B, N).

    Per (kc, nc) tile: expand the per-32 block scales along the sublane dim,
    dequantize the codes in registers, and run one dense MXU matmul with f32
    accumulation. Tiling bounds the temporaries so the whole-projection
    dequant never spills VMEM.

    Codes may be nibble-packed ((K//2, N), block half-split: within each
    PACK_BLOCK rows, byte row r = logical rows r and r + block/2 — detected
    from the scales shape): each packed block then contributes two plain
    (no interleave) dequant-matmuls against the matching x lanes, which
    measured ~2x faster than any in-register nibble-interleave formulation
    (tools/probe_unpack.py).

    Scales may arrive in bf16 (the megastep prep_* emit them so) purely as
    an HBM-traffic optimization — they are upcast to f32 per tile before
    the expansion, so the dequant MATH is identical for both dtypes (f32
    dequant, f32 scale multiply, one bf16 rounding before the MXU). A
    measured dead end worth recording: bf16 elementwise dequant (direct
    int->bf16 casts, bf16 scale multiply, bias folded into a second MXU dot
    against the scale expansion) is SLOWER on v5e — the legacy f32 path
    runs at ~860 GB/s effective (HBM-bound), the bf16-multiply variants at
    430-600 GB/s, and the bias-fold's extra dot costs a second full MXU
    weight pass (tools/probe_dqdot.py; the round-4 interim bench regressed
    Parler 1.0->1.17 ms/step on it).
    """
    from .quant_matmul import PACK_BLOCK
    n = codes.shape[1]
    k = scales.shape[0] * QK
    packed = codes.shape[0] != k
    nc = min(nc, n)

    def dq_dot(cval, base, rr, n0, nn):
        """One dense dequant dot: int32 codes chunk (rr, nn) at logical K
        offset `base` x the matching x lanes."""
        s = scales[base // QK:(base + rr) // QK, n0:n0 + nn]
        cf = cval.astype(jnp.float32)
        if bias:
            cf = cf - bias
        srep = jax.lax.broadcast_in_dim(
            s.astype(jnp.float32), (rr // QK, QK, nn), (0, 2)).reshape(rr, nn)
        wf = (cf * srep).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            x[:, base:base + rr].astype(jnp.bfloat16), wf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    outs = []
    for n0 in range(0, n, nc):
        nn = min(nc, n - n0)
        acc = None
        if packed:
            for b0 in range(0, k, PACK_BLOCK):
                h = min(PACK_BLOCK, k - b0) // 2
                ci = codes[b0 // 2:b0 // 2 + h, n0:n0 + nn].astype(jnp.int32)
                for half, cval in ((0, ci & 15), (1, (ci >> 4) & 15)):
                    part = dq_dot(cval, b0 + half * h, h, n0, nn)
                    acc = part if acc is None else acc + part
        else:
            kcc = min(kc, k)
            for k0 in range(0, k, kcc):
                kk = min(kcc, k - k0)     # tail when kc doesn't divide
                ci = codes[k0:k0 + kk, n0:n0 + nn].astype(jnp.int32)
                part = dq_dot(ci, k0, kk, n0, nn)
                acc = part if acc is None else acc + part
        outs.append(acc)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _attend_cached(q_row, kc, vc, k_row, v_row, pos, n_heads, d, scale):
    """Single-token attention over a bf16 cache + the current token.

    q_row/k_row/v_row: (1 or 8, H) f32 rows (identical rows); kc/vc:
    (heads, CTX, D). Cache rows [0, pos) are history; the current token's
    K/V are folded analytically (they are not in the cache yet). Returns
    (8, H) f32 attention output (rows identical)."""
    ctx = kc.shape[1]
    outs = []
    for h in range(n_heads):
        qh = q_row[:, h * d:(h + 1) * d] * scale                 # (8, D)
        kh = kc[h].astype(jnp.float32)                           # (CTX, D)
        s = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                  # (8, CTX)
        t = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(t < pos, s, -jnp.inf)
        kcur = k_row[:, h * d:(h + 1) * d]                       # (8, D)
        s_cur = jnp.sum(qh * kcur, axis=1, keepdims=True)        # (8, 1)
        m = jnp.maximum(jnp.max(s, axis=1, keepdims=True), s_cur)
        ph = jnp.exp(s - m)                                      # (8, CTX)
        pc = jnp.exp(s_cur - m)                                  # (8, 1)
        denom = jnp.sum(ph, axis=1, keepdims=True) + pc
        vh = vc[h].astype(jnp.float32)                           # (CTX, D)
        av = jax.lax.dot_general(
            ph, vh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                  # (8, D)
        vcur = v_row[:, h * d:(h + 1) * d]
        outs.append((av + pc * vcur) / denom)
    return jnp.concatenate(outs, axis=1)                         # (8, H)


def _attend_cross(q_row, ck, cv, n_heads, d, scale):
    """Cross attention over precomputed (heads, Tc, D) f32 K/V (full Tc)."""
    outs = []
    for h in range(n_heads):
        qh = q_row[:, h * d:(h + 1) * d] * scale
        s = jax.lax.dot_general(
            qh, ck[h], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                  # (8, Tc)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        outs.append(jax.lax.dot_general(
            p, cv[h], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    return jnp.concatenate(outs, axis=1)


def _megastep_kernel(pos_ref, x_ref, qkv_c, qkv_s, occ_c, occ_s,
                     f1_c, f1_s, f2_c, f2_s, norms, ck_ref, cv_ref,
                     kc_ref, vc_ref,
                     x_out, k_out, v_out, x_scr,
                     *, n_layers, n_heads, hidden, bias, use_cross):
    l = pl.program_id(0)
    d = hidden // n_heads
    scale = 1.0 / np.sqrt(d)
    pos = pos_ref[0]

    @pl.when(l == 0)
    def _():
        x_scr[:] = x_ref[:]

    x = x_scr[:]                                                  # (8, H)
    nm = norms[0]                                                 # (6, H)

    # --- self attention ---
    h1 = _ln(x, nm[0:1], nm[1:2])
    qkv = _dqdot(h1, qkv_c[0], qkv_s[0], bias)                    # (8, 3H)
    q_row = qkv[:, :hidden]
    k_row = qkv[:, hidden:2 * hidden]
    v_row = qkv[:, 2 * hidden:]
    k_out[0] = k_row
    v_out[0] = v_row
    attn = _attend_cached(q_row, kc_ref[0], vc_ref[0], k_row, v_row,
                          pos, n_heads, d, scale)
    o = _dqdot(attn, occ_c[0][:, :hidden], occ_s[0][:, :hidden], bias)
    x = x + o

    # --- cross attention (precomputed K/V) ---
    if use_cross:
        h2 = _ln(x, nm[2:3], nm[3:4])
        cq = _dqdot(h2, occ_c[0][:, hidden:2 * hidden],
                    occ_s[0][:, hidden:2 * hidden], bias)
        ca = _attend_cross(cq, ck_ref[0], cv_ref[0], n_heads, d, scale)
        co = _dqdot(ca, occ_c[0][:, 2 * hidden:],
                    occ_s[0][:, 2 * hidden:], bias)
        x = x + co

    # --- MLP ---
    h3 = _ln(x, nm[4:5], nm[5:6])
    up = _dqdot(h3, f1_c[0], f1_s[0], bias)                       # (8, F)
    up = jax.nn.gelu(up, approximate=True)
    down = _dqdot(up, f2_c[0], f2_s[0], bias)                     # (8, H)
    x = x + down

    x_scr[:] = x

    @pl.when(l == n_layers - 1)
    def _():
        x_out[:] = x


def parler_megastep(mega: MegaLayers, x, kv_k, kv_v, pos, *, qtype: int,
                    use_cross: bool, n_heads: int):
    """x (1, H) f32; kv_k/kv_v (L, heads, CTX, D); pos = current cache row.

    Returns (x_out (1, H) f32 pre-final-norm, k_new (L, H), v_new (L, H)):
    the caller writes k_new/v_new at cache row `pos` and applies the final
    layer norm + LM heads. Dispatches to the pallas kernel on TPU and to the
    XLA reference elsewhere (identical math; lets CPU tests cover the
    integrated path).
    """
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    if not on_tpu:
        return parler_megastep_reference(mega, x, kv_k, kv_v, pos,
                                         qtype=qtype, use_cross=use_cross,
                                         n_heads=n_heads)
    return _parler_megastep_tpu(mega, x, kv_k, kv_v, pos, qtype=qtype,
                                use_cross=use_cross, n_heads=n_heads)


@functools.partial(jax.jit, static_argnames=("qtype", "use_cross", "n_heads"))
def _parler_megastep_tpu(mega: MegaLayers, x, kv_k, kv_v, pos, *, qtype: int,
                         use_cross: bool, n_heads: int):
    L = mega.qkv_codes.shape[0]
    hidden = mega.qkv_scales.shape[1] * QK
    f = mega.fc1_codes.shape[2]
    h_kc = mega.qkv_codes.shape[1]      # hidden, or hidden//2 nibble-packed
    f_kc = mega.fc2_codes.shape[1]      # f, or f//2 nibble-packed
    heads, ctx, d = kv_k.shape[1], kv_k.shape[2], kv_k.shape[3]
    tc = mega.cross_k.shape[2]
    x8 = jnp.broadcast_to(x.astype(jnp.float32), (8, hidden))
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    def at_l(i, p):
        return (i, 0, 0)

    def at_l4(i, p):
        return (i, 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((8, hidden), lambda i, p: (0, 0)),
            pl.BlockSpec((1, h_kc, 3 * hidden), at_l),
            pl.BlockSpec((1, hidden // QK, 3 * hidden), at_l),
            pl.BlockSpec((1, h_kc, 3 * hidden), at_l),
            pl.BlockSpec((1, hidden // QK, 3 * hidden), at_l),
            pl.BlockSpec((1, h_kc, f), at_l),
            pl.BlockSpec((1, hidden // QK, f), at_l),
            pl.BlockSpec((1, f_kc, hidden), at_l),
            pl.BlockSpec((1, f // QK, hidden), at_l),
            pl.BlockSpec((1, 6, hidden), at_l),
            pl.BlockSpec((1, heads, tc, d), at_l4),
            pl.BlockSpec((1, heads, tc, d), at_l4),
            pl.BlockSpec((1, heads, ctx, d), at_l4),
            pl.BlockSpec((1, heads, ctx, d), at_l4),
        ],
        out_specs=[
            pl.BlockSpec((8, hidden), lambda i, p: (0, 0)),
            pl.BlockSpec((1, 8, hidden), at_l),
            pl.BlockSpec((1, 8, hidden), at_l),
        ],
        scratch_shapes=[pltpu.VMEM((8, hidden), jnp.float32)],
    )
    x_out, k_new, v_new = pl.pallas_call(
        functools.partial(_megastep_kernel, n_layers=L, n_heads=n_heads,
                          hidden=hidden, bias=_BIAS[qtype],
                          use_cross=use_cross),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, hidden), jnp.float32),
            jax.ShapeDtypeStruct((L, 8, hidden), jnp.float32),
            jax.ShapeDtypeStruct((L, 8, hidden), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(pos_arr, x8, mega.qkv_codes, mega.qkv_scales, mega.occ_codes,
      mega.occ_scales, mega.fc1_codes, mega.fc1_scales, mega.fc2_codes,
      mega.fc2_scales, mega.norms, mega.cross_k, mega.cross_v, kv_k, kv_v)
    return x_out[:1], k_new[:, 0, :], v_new[:, 0, :]


# ---------------------------------------------------------------------------
# batched megastep: B slots per step, ONE weight read serves all of them
# ---------------------------------------------------------------------------
#
# The single-stream kernel broadcasts one activation row across the 8 f32
# sublanes; the batched variant puts 8 *distinct* batch slots there instead,
# so the weight stream (the dominant HBM cost) is amortized B ways. Per-slot
# KV caches are read page-by-page (grid = (L, n_pages)) with a flash-style
# running max/denominator, and the block index map is clamped at the max
# position across slots so tail pages cost no DMA (same trick as
# ops/decode_attention.py). Replaces the reference's replica-per-thread
# serving model (examples/server/server.cpp:885-897) with one program.


def _megastep_batched_kernel(mp_ref, pos_ref, x_ref, qkv_c, qkv_s, occ_c,
                             occ_s, f1_c, f1_s, f2_c, f2_s, norms, ck_ref,
                             cv_ref, kc_ref, vc_ref,
                             x_out, k_out, v_out,
                             x_scr, q_scr, k_scr, v_scr, att_scr,
                             acc_scr, m_scr, l_scr,
                             *, n_layers, n_heads, hidden, b, page, n_pages,
                             bias, use_cross):
    l = pl.program_id(0)
    p = pl.program_id(1)
    d = hidden // n_heads
    scale = 1.0 / np.sqrt(d)
    rows = b * n_heads

    @pl.when((l == 0) & (p == 0))
    def _():
        x_scr[:] = x_ref[:]

    @pl.when(p == 0)
    def _():
        nm = norms[0]
        x = x_scr[:]                                       # (B, H)
        h1 = _ln(x, nm[0:1], nm[1:2])
        qkv = _dqdot(h1, qkv_c[0], qkv_s[0], bias)         # (B, 3H)
        k_out[0] = qkv[:, hidden:2 * hidden]
        v_out[0] = qkv[:, 2 * hidden:]
        for h in range(n_heads):
            q_scr[:, h, :] = qkv[:, h * d:(h + 1) * d]
            k_scr[:, h, :] = qkv[:, hidden + h * d:hidden + (h + 1) * d]
            v_scr[:, h, :] = qkv[:, 2 * hidden + h * d:
                                 2 * hidden + (h + 1) * d]
        acc_scr[:] = jnp.zeros_like(acc_scr)
        # finite sentinel, NOT -inf: a page can be fully masked for a short
        # slot while a longer slot keeps the grid going; -inf would give
        # exp(-inf - -inf) = NaN. With -1e30 a fully-masked page contributes
        # bounded garbage to acc/l that the finalize alpha = exp(-1e30 - s_cur)
        # = 0 annihilates (the current token's score is always finite).
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)

    @pl.when(p <= mp_ref[0])
    def _():
        # flash accumulation over this KV page, all slots+heads vectorized
        q3 = q_scr[:].reshape(rows, d) * scale             # (B*nh, D)
        k3 = kc_ref[:].astype(jnp.float32).reshape(rows, page, d)
        v3 = vc_ref[:].astype(jnp.float32).reshape(rows, page, d)
        s = jnp.sum(q3[:, None, :] * k3, axis=2)           # (B*nh, PAGE)
        j = p * page + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(j < pos_ref[:], s, -1e30)
        m_prev = m_scr[:, 0]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1))
        alpha = jnp.exp(m_prev - m_new)
        pexp = jnp.exp(s - m_new[:, None])
        l_scr[:, 0] = l_scr[:, 0] * alpha + jnp.sum(pexp, axis=1)
        acc_scr[:] = acc_scr[:] * alpha[:, None] + \
            jnp.sum(pexp[:, :, None] * v3, axis=1)
        m_scr[:, 0] = m_new

    @pl.when(p == n_pages - 1)
    def _():
        nm = norms[0]
        # fold the current token's K/V analytically (not in the cache yet)
        q3 = q_scr[:].reshape(rows, d) * scale
        kcur = k_scr[:].reshape(rows, d)
        vcur = v_scr[:].reshape(rows, d)
        s_cur = jnp.sum(q3 * kcur, axis=1, keepdims=True)  # (B*nh, 1)
        m_f = jnp.maximum(m_scr[:], s_cur)
        alpha = jnp.exp(m_scr[:] - m_f)
        pc = jnp.exp(s_cur - m_f)
        denom = l_scr[:] * alpha + pc
        att = (acc_scr[:] * alpha + pc * vcur) / denom     # (B*nh, D)
        att4 = att.reshape(b, n_heads, d)
        for h in range(n_heads):
            att_scr[:, h * d:(h + 1) * d] = att4[:, h, :]
        o = _dqdot(att_scr[:], occ_c[0][:, :hidden],
                   occ_s[0][:, :hidden], bias)
        x = x_scr[:] + o
        if use_cross:
            h2 = _ln(x, nm[2:3], nm[3:4])
            cq = _dqdot(h2, occ_c[0][:, hidden:2 * hidden],
                        occ_s[0][:, hidden:2 * hidden], bias)
            ca = _attend_cross(cq, ck_ref[0], cv_ref[0], n_heads, d, scale)
            co = _dqdot(ca, occ_c[0][:, 2 * hidden:],
                        occ_s[0][:, 2 * hidden:], bias)
            x = x + co
        h3 = _ln(x, nm[4:5], nm[5:6])
        up = _dqdot(h3, f1_c[0], f1_s[0], bias)            # (B, F)
        up = jax.nn.gelu(up, approximate=True)
        down = _dqdot(up, f2_c[0], f2_s[0], bias)
        x = x + down
        x_scr[:] = x

        @pl.when(l == n_layers - 1)
        def _():
            x_out[:] = x


def parler_megastep_batched(mega: MegaLayers, x, kv_k, kv_v, pos, *,
                            qtype: int, use_cross: bool, n_heads: int,
                            page: int = 256):
    """Batched megastep: x (B, H) f32 — one row per batch slot; kv_k/kv_v
    (L, B, heads, CTX, D); pos (B,) int32 per-slot cache rows.

    Returns (x_out (B, H) pre-final-norm, k_new (L, B, H), v_new (L, B, H));
    the caller writes k/v rows at each slot's `pos` and applies final norm +
    LM heads. TPU requires B % 8 == 0 (f32 sublane tile) and CTX % page == 0;
    otherwise (and on CPU/tests) dispatches to the vmapped XLA reference with
    identical math.
    """
    b = x.shape[0]
    ctx = kv_k.shape[3]
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    if not on_tpu or b % 8 or ctx % page:
        return parler_megastep_batched_reference(
            mega, x, kv_k, kv_v, pos, qtype=qtype, use_cross=use_cross,
            n_heads=n_heads)
    return _parler_megastep_batched_tpu(
        mega, x, kv_k, kv_v, pos, qtype=qtype, use_cross=use_cross,
        n_heads=n_heads, page=page)


@functools.partial(jax.jit, static_argnames=("qtype", "use_cross", "n_heads",
                                             "page"))
def _parler_megastep_batched_tpu(mega: MegaLayers, x, kv_k, kv_v, pos, *,
                                 qtype: int, use_cross: bool, n_heads: int,
                                 page: int):
    L = mega.qkv_codes.shape[0]
    hidden = mega.qkv_scales.shape[1] * QK
    f = mega.fc1_codes.shape[2]
    h_kc = mega.qkv_codes.shape[1]      # hidden, or hidden//2 nibble-packed
    f_kc = mega.fc2_codes.shape[1]      # f, or f//2 nibble-packed
    b, heads, ctx, d = kv_k.shape[1], kv_k.shape[2], kv_k.shape[3], \
        kv_k.shape[4]
    tc = mega.cross_k.shape[2]
    n_pages = ctx // page
    pos = jnp.asarray(pos, jnp.int32)
    # clamp page index at the max needed page across slots: later pages map
    # to the same block index and Mosaic skips the DMA
    mp = jnp.max(jnp.maximum(pos - 1, 0)) // page
    mp_arr = mp.reshape(1)
    pos_rows = jnp.repeat(pos, heads)[:, None]             # (B*nh, 1)
    kv_k4 = kv_k.reshape(L * b, heads, ctx, d)
    kv_v4 = kv_v.reshape(L * b, heads, ctx, d)

    def at_l(i, p, mp):
        return (i, 0, 0)

    def at_l4(i, p, mp):
        return (i, 0, 0, 0)

    def kv_map(i, p, mp):
        return (i, 0, jnp.minimum(p, mp[0]), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, n_pages),
        in_specs=[
            pl.BlockSpec((b * heads, 1), lambda i, p, mp: (0, 0)),
            pl.BlockSpec((b, hidden), lambda i, p, mp: (0, 0)),
            pl.BlockSpec((1, h_kc, 3 * hidden), at_l),
            pl.BlockSpec((1, hidden // QK, 3 * hidden), at_l),
            pl.BlockSpec((1, h_kc, 3 * hidden), at_l),
            pl.BlockSpec((1, hidden // QK, 3 * hidden), at_l),
            pl.BlockSpec((1, h_kc, f), at_l),
            pl.BlockSpec((1, hidden // QK, f), at_l),
            pl.BlockSpec((1, f_kc, hidden), at_l),
            pl.BlockSpec((1, f // QK, hidden), at_l),
            pl.BlockSpec((1, 6, hidden), at_l),
            pl.BlockSpec((1, heads, tc, d), at_l4),
            pl.BlockSpec((1, heads, tc, d), at_l4),
            pl.BlockSpec((b, heads, page, d), kv_map),
            pl.BlockSpec((b, heads, page, d), kv_map),
        ],
        out_specs=[
            pl.BlockSpec((b, hidden), lambda i, p, mp: (0, 0)),
            pl.BlockSpec((1, b, hidden), at_l),
            pl.BlockSpec((1, b, hidden), at_l),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, hidden), jnp.float32),          # x residual
            pltpu.VMEM((b, heads, d), jnp.float32),        # q
            pltpu.VMEM((b, heads, d), jnp.float32),        # k cur
            pltpu.VMEM((b, heads, d), jnp.float32),        # v cur
            pltpu.VMEM((b, hidden), jnp.float32),          # attn out
            pltpu.VMEM((b * heads, d), jnp.float32),       # flash acc
            pltpu.VMEM((b * heads, 1), jnp.float32),       # flash m
            pltpu.VMEM((b * heads, 1), jnp.float32),       # flash l
        ],
    )
    x_out, k_new, v_new = pl.pallas_call(
        functools.partial(_megastep_batched_kernel, n_layers=L,
                          n_heads=n_heads, hidden=hidden, b=b, page=page,
                          n_pages=n_pages, bias=_BIAS[qtype],
                          use_cross=use_cross),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hidden), jnp.float32),
            jax.ShapeDtypeStruct((L, b, hidden), jnp.float32),
            jax.ShapeDtypeStruct((L, b, hidden), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(mp_arr, pos_rows, x.astype(jnp.float32), mega.qkv_codes,
      mega.qkv_scales, mega.occ_codes, mega.occ_scales, mega.fc1_codes,
      mega.fc1_scales, mega.fc2_codes, mega.fc2_scales, mega.norms,
      mega.cross_k, mega.cross_v, kv_k4, kv_v4)
    return x_out, k_new, v_new


def parler_megastep_batched_reference(mega: MegaLayers, x, kv_k, kv_v, pos,
                                      *, qtype: int, use_cross: bool,
                                      n_heads: int):
    """Per-slot loop over the single-slot reference — the batched kernel's
    math is exactly the single kernel's applied independently per slot (the
    dequant matmul has no cross-row coupling), so this IS the spec. An
    explicit loop (not vmap) keeps each slot bit-identical to a single-slot
    call: vmap lowers the dots with a batch dim whose different accumulation
    order is amplified by the fast path's bias-fold subtraction."""
    pos = jnp.asarray(pos, jnp.int32)
    outs = [parler_megastep_reference(
        mega, x[s:s + 1], kv_k[:, s], kv_v[:, s], pos[s], qtype=qtype,
        use_cross=use_cross, n_heads=n_heads) for s in range(x.shape[0])]
    return (jnp.concatenate([o[0] for o in outs], axis=0),
            jnp.stack([o[1] for o in outs], axis=1),
            jnp.stack([o[2] for o in outs], axis=1))


# ---------------------------------------------------------------------------
# XLA reference (same math, no pallas) — used on CPU and in tests
# ---------------------------------------------------------------------------

def _qdot_ref(h_row, codes, scales, bias):
    """h_row (B, K) f32 -> (B, N): same dequant math as the kernel's _dqdot
    (block dequant to f32, f32 scale multiply, bf16 rounding, bf16
    activations, f32 accumulation) in plain XLA. Accumulation order may
    differ from the MXU by float-rounding ULPs. Accepts nibble-packed codes
    (exact unpack, same values) and bf16 scales (upcast, same math)."""
    from .quant_matmul import unpack_codes_t
    k = h_row.shape[1]
    if codes.shape[0] != k:
        cf = unpack_codes_t(codes, k).astype(jnp.float32)
    else:
        cf = codes.astype(jnp.float32)                            # (K, N)
    if bias:
        cf = cf - bias
    srep = jnp.repeat(scales.astype(jnp.float32), QK, axis=0,
                      total_repeat_length=k)                      # (K, N)
    wf = (cf * srep).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        h_row.astype(jnp.bfloat16), wf,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def parler_megastep_reference(mega: MegaLayers, x, kv_k, kv_v, pos, *,
                              qtype: int, use_cross: bool, n_heads: int):
    """Pure-XLA mirror of parler_megastep (same bf16 block-dequant math)."""
    L = mega.qkv_codes.shape[0]
    hidden = mega.qkv_scales.shape[1] * QK
    d = hidden // n_heads
    scale = 1.0 / np.sqrt(d)
    bias = _BIAS[qtype]
    x = x.astype(jnp.float32)

    def ln(xx, w, b):
        return _ln(xx, w[None, :], b[None, :])

    def layer(carry, inp):
        xx = carry
        (qkv_c, qkv_s, occ_c, occ_s, f1_c, f1_s, f2_c, f2_s, nm, ck, cv,
         kc, vc) = inp
        h1 = ln(xx, nm[0], nm[1])
        qkv = _qdot_ref(h1, qkv_c, qkv_s, bias)
        q_row, k_row, v_row = (qkv[:, :hidden], qkv[:, hidden:2 * hidden],
                               qkv[:, 2 * hidden:])
        qh = q_row.reshape(n_heads, 1, d) * scale
        kh = kc.astype(jnp.float32)                               # (heads, CTX, D)
        s = jnp.einsum("hqd,htd->hqt", qh, kh)
        t = jnp.arange(kc.shape[1])
        s = jnp.where(t[None, None, :] < pos, s, -jnp.inf)
        s_cur = jnp.sum(qh * k_row.reshape(n_heads, 1, d), axis=2,
                        keepdims=True)                            # (h,1,1)
        m = jnp.maximum(jnp.max(s, axis=2, keepdims=True), s_cur)
        ph = jnp.exp(s - m)
        pc = jnp.exp(s_cur - m)
        denom = jnp.sum(ph, axis=2, keepdims=True) + pc
        av = jnp.einsum("hqt,htd->hqd", ph, vc.astype(jnp.float32))
        attn = ((av + pc * v_row.reshape(n_heads, 1, d)) / denom)
        attn = attn.reshape(1, hidden)
        o = _qdot_ref(attn, occ_c[:, :hidden], occ_s[:, :hidden], bias)
        xx = xx + o
        if use_cross:
            h2 = ln(xx, nm[2], nm[3])
            cq = _qdot_ref(h2, occ_c[:, hidden:2 * hidden],
                           occ_s[:, hidden:2 * hidden], bias)
            cqh = cq.reshape(n_heads, 1, d) * scale
            s2 = jnp.einsum("hqd,htd->hqt", cqh, ck)
            p2 = jax.nn.softmax(s2, axis=-1)
            ca = jnp.einsum("hqt,htd->hqd", p2, cv).reshape(1, hidden)
            co = _qdot_ref(ca, occ_c[:, 2 * hidden:],
                           occ_s[:, 2 * hidden:], bias)
            xx = xx + co
        h3 = ln(xx, nm[4], nm[5])
        up = _qdot_ref(h3, f1_c, f1_s, bias)
        up = jax.nn.gelu(up, approximate=True)
        down = _qdot_ref(up, f2_c, f2_s, bias)
        xx = xx + down
        return xx, (k_row[0], v_row[0])

    xs = (mega.qkv_codes, mega.qkv_scales, mega.occ_codes, mega.occ_scales,
          mega.fc1_codes, mega.fc1_scales, mega.fc2_codes, mega.fc2_scales,
          mega.norms, mega.cross_k, mega.cross_v, kv_k, kv_v)
    x_out, (k_new, v_new) = jax.lax.scan(layer, x, xs)
    return x_out, k_new, v_new
