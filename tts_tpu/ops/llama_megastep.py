"""Whole-transformer llama decode megastep — ONE Pallas kernel for all L
layers of a llama-family decoder (Orpheus 3B: GQA 24q/8kv, RMS norm, NeoX
RoPE with llama3 freq factors, SiLU-gated MLP).

Same design as ops/parler_megastep (see its header for the bandwidth
argument): the whole layer stack runs in one pallas_call so the weight DMA
of layer l+1 overlaps layer l's compute, weights cross HBM quantized and are
dequantized to bf16 in VMEM registers per tile (_dqdot), and the activation
row rides in VMEM scratch broadcast over the 8 f32 sublanes.

Llama twist: a 3B layer's weights (~100 MB quantized) exceed VMEM, so the
grid is (L, P) with phase 0 = attention (qkv + o resident, ~25 MB) and
phases 1..P-1 = FFN chunks (gate/up (H, FC) + down (FC, H) slices stream per
phase); the FFN down-projection partials accumulate into the residual
scratch. Replaces the reference's per-matmul graph walk
(src/models/orpheus/model.cpp:389-405, hot loop generate_from_batch).

RoPE is applied in-kernel from the prefetched position scalar and a
precomputed inverse-frequency row (freq factors folded in, matching
ops/attention.rope_freqs: reference orpheus/model.cpp:274-277).
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
from .parler_megastep import _BIAS, _dqdot, _qdot_ref, QK


class LlamaMegaLayers(NamedTuple):
    """Stacked per-layer weights in megakernel layout.

    codes transposed-planar int8 (K, N); scales f32 (K//32, N).
    qkv = concat(q, k, v) on N; norms packs (in_norm, post_norm).
    """

    qkv_codes: Any    # (L, H, H + 2*KV) i8
    qkv_scales: Any   # (L, H//32, H + 2*KV) f32
    o_codes: Any      # (L, H, H) i8
    o_scales: Any
    gate_codes: Any   # (L, H, F) i8
    gate_scales: Any
    up_codes: Any     # (L, H, F) i8
    up_scales: Any
    down_codes: Any   # (L, F, H) i8
    down_scales: Any  # (L, F//32, H)
    norms: Any        # (L, 2, H) f32


def prep_llama_mega(layers) -> tuple[LlamaMegaLayers, int]:
    """Build LlamaMegaLayers from a stacked OrpheusLayer whose projections
    are QuantTensors of one shared qtype; ValueError otherwise (caller falls
    back to the per-matmul path)."""
    from .quant_matmul import QuantTensor

    mats = dict(q=layers.q, k=layers.k, v=layers.v, o=layers.o,
                gate=layers.gate, up=layers.up, down=layers.down)
    if not all(isinstance(m, QuantTensor) for m in mats.values()):
        raise ValueError("llama megastep needs all projections quantized")
    qtypes = {m.qtype for m in mats.values()}
    if len(qtypes) != 1 or next(iter(qtypes)) not in _BIAS:
        raise ValueError(f"llama megastep needs one uniform qtype, got {qtypes}")
    qtype = next(iter(qtypes))

    qkv_c = jnp.concatenate([mats["q"].codes_t, mats["k"].codes_t,
                             mats["v"].codes_t], axis=-1)
    qkv_s = jnp.concatenate(
        [mats["q"].scales_t, mats["k"].scales_t, mats["v"].scales_t],
        axis=-1).astype(jnp.float32)
    norms = jnp.stack([layers.in_norm, layers.post_norm], axis=1)
    mega = LlamaMegaLayers(
        qkv_codes=qkv_c.astype(jnp.int8), qkv_scales=qkv_s,
        o_codes=mats["o"].codes_t.astype(jnp.int8),
        o_scales=mats["o"].scales_t.astype(jnp.bfloat16),
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
        # nibble-pack Q4 codes (2/byte along K): exact, halves code traffic
        # (skipped when the QuantTensors arrived already packed; all-or-
        # nothing so the kernel dispatch sees one uniform layout)
        from .quant_matmul import can_pack, pack_codes_t
        if can_pack(mega.qkv_codes.shape[1]) and \
                can_pack(mega.down_codes.shape[1]):
            mega = mega._replace(
                qkv_codes=pack_codes_t(mega.qkv_codes),
                o_codes=pack_codes_t(mega.o_codes),
                gate_codes=pack_codes_t(mega.gate_codes),
                up_codes=pack_codes_t(mega.up_codes),
                down_codes=pack_codes_t(mega.down_codes))
    return mega, qtype


def _rms(x, w, eps=1e-5):
    ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(ms + eps) * w


def _rope_rows(x, cos, sin, n_heads, d):
    """NeoX rotation per head on (8, n_heads*d) rows; cos/sin (8, d//2)."""
    h2 = d // 2
    outs = []
    for h in range(n_heads):
        x1 = x[:, h * d:h * d + h2]
        x2 = x[:, h * d + h2:(h + 1) * d]
        outs.append(jnp.concatenate(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=1))
    return jnp.concatenate(outs, axis=1)


def _llama_kernel(pos_ref, x_ref, inv_ref, qkv_c, qkv_s, o_c, o_s,
                  g_c, g_s, u_c, u_s, d_c, d_s, norms, kc_ref, vc_ref,
                  x_out, k_out, v_out, x_scr, h_scr,
                  *, n_layers, n_phases, n_heads, n_kv, hidden, head_d,
                  bias):
    l = pl.program_id(0)
    p = pl.program_id(1)
    scale = 1.0 / np.sqrt(head_d)
    pos = pos_ref[0]
    kv_h = n_kv * head_d
    g = n_heads // n_kv

    @pl.when(p == 0)
    def _():
        @pl.when(l == 0)
        def _():
            x_scr[:] = x_ref[:]

        nm = norms[0]
        x = x_scr[:]                                          # (8, H)
        h1 = _rms(x, nm[0:1])
        qkv = _dqdot(h1, qkv_c[0], qkv_s[0], bias)            # (8, H+2KV)
        ang = pos.astype(jnp.float32) * inv_ref[:]            # (1, d/2)
        cos = jnp.broadcast_to(jnp.cos(ang), (8, head_d // 2))
        sin = jnp.broadcast_to(jnp.sin(ang), (8, head_d // 2))
        q = _rope_rows(qkv[:, :hidden], cos, sin, n_heads, head_d)
        k = _rope_rows(qkv[:, hidden:hidden + kv_h], cos, sin, n_kv, head_d)
        v = qkv[:, hidden + kv_h:]
        k_out[0] = k
        v_out[0] = v
        # GQA attention over the bf16 cache + the current token (analytic
        # softmax fold; cache row write happens outside in XLA)
        outs = []
        for h in range(n_kv):
            kh = kc_ref[0, h].astype(jnp.float32)             # (CTX, D)
            vh = vc_ref[0, h].astype(jnp.float32)
            kcur = k[:, h * head_d:(h + 1) * head_d]          # (8, D)
            vcur = v[:, h * head_d:(h + 1) * head_d]
            for gi in range(g):
                qh = q[:, (h * g + gi) * head_d:
                       (h * g + gi + 1) * head_d] * scale     # (8, D)
                s = jax.lax.dot_general(
                    qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)       # (8, CTX)
                t = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(t < pos, s, -jnp.inf)
                s_cur = jnp.sum(qh * kcur, axis=1, keepdims=True)
                m = jnp.maximum(jnp.max(s, axis=1, keepdims=True), s_cur)
                ph = jnp.exp(s - m)
                pc = jnp.exp(s_cur - m)
                denom = jnp.sum(ph, axis=1, keepdims=True) + pc
                av = jax.lax.dot_general(
                    ph, vh, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                outs.append((av + pc * vcur) / denom)
        attn = jnp.concatenate(outs, axis=1)                  # (8, H)
        o = _dqdot(attn, o_c[0], o_s[0], bias)
        x = x + o
        x_scr[:] = x
        h_scr[:] = _rms(x, nm[1:2])

    @pl.when(p > 0)
    def _():
        h2 = h_scr[:]
        gate = _dqdot(h2, g_c[0], g_s[0], bias)               # (8, FC)
        up = _dqdot(h2, u_c[0], u_s[0], bias)
        a = jax.nn.silu(gate) * up
        down = _dqdot(a, d_c[0], d_s[0], bias)                # (8, H)
        x_scr[:] = x_scr[:] + down

        @pl.when((l == n_layers - 1) & (p == n_phases - 1))
        def _():
            x_out[:] = x_scr[:]


def llama_megastep(mega: LlamaMegaLayers, x, kv_k, kv_v, pos, *, qtype: int,
                   n_heads: int, n_kv: int, rope_base: float,
                   rope_freq_factors=None, fc: int = 4096):
    """x (1, H) f32; kv_k/kv_v (L, n_kv, CTX, D) bf16/f32; pos = cache row.

    fc: FFN phase slice. The pure-streaming probe favored 2048
    (tools/probe_mega_grid.py) but the REAL Orpheus kernel measured slower
    at 2048 (7.32 vs 6.05 ms/step) — the attention phase dominates its
    pipeline; Dia (smaller hidden, cross-attn phase) wins with 2048.

    Returns (x_out (1, H) pre-final-RMS-norm, k_new (L, KV), v_new (L, KV));
    the caller writes the k/v rows at `pos` and applies final norm + LM
    head. Dispatches to the XLA reference off-TPU.
    """
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    if not on_tpu:
        return llama_megastep_reference(
            mega, x, kv_k, kv_v, pos, qtype=qtype, n_heads=n_heads,
            n_kv=n_kv, rope_base=rope_base,
            rope_freq_factors=rope_freq_factors)
    return _llama_megastep_tpu(
        mega, x, kv_k, kv_v, pos, qtype=qtype, n_heads=n_heads, n_kv=n_kv,
        rope_base=rope_base, rope_freq_factors=rope_freq_factors, fc=fc)


def _inv_freq_row(d, base, freq_factors):
    from .attention import rope_freqs
    return rope_freqs(d, base, freq_factors).reshape(1, -1)


@functools.partial(jax.jit, static_argnames=("qtype", "n_heads", "n_kv",
                                             "rope_base", "fc"))
def _llama_megastep_tpu(mega: LlamaMegaLayers, x, kv_k, kv_v, pos, *,
                        qtype: int, n_heads: int, n_kv: int,
                        rope_base: float, rope_freq_factors, fc: int):
    L = mega.qkv_codes.shape[0]
    hidden = mega.qkv_scales.shape[1] * 32
    f = mega.gate_codes.shape[2]
    pk = hidden // mega.qkv_codes.shape[1]  # 2 when nibble-packed, else 1
    kvh, ctx, d = kv_k.shape[1], kv_k.shape[2], kv_k.shape[3]
    head_d = hidden // n_heads
    fc = min(fc, f)
    if pk == 2 and f > fc:
        # streamed down-projection K-slices must contain whole pack blocks
        from .quant_matmul import PACK_BLOCK
        assert fc % PACK_BLOCK == 0, (fc, PACK_BLOCK)
    n_ph = 1 + f // fc
    inv = _inv_freq_row(head_d, rope_base, rope_freq_factors)
    x8 = jnp.broadcast_to(x.astype(jnp.float32), (8, hidden))
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    kv_n = hidden + 2 * n_kv * head_d

    def at_l(l, p, s):
        return (l, 0, 0)

    def at_l4(l, p, s):
        return (l, 0, 0, 0)

    def ffn_hk(l, p, s):
        return (l, 0, jnp.maximum(p - 1, 0))

    def ffn_kh(l, p, s):
        return (l, jnp.maximum(p - 1, 0), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, n_ph),
        in_specs=[
            pl.BlockSpec((8, hidden), lambda l, p, s: (0, 0)),
            pl.BlockSpec((1, head_d // 2), lambda l, p, s: (0, 0)),
            pl.BlockSpec((1, hidden // pk, kv_n), at_l),
            pl.BlockSpec((1, hidden // 32, kv_n), at_l),
            pl.BlockSpec((1, hidden // pk, hidden), at_l),
            pl.BlockSpec((1, hidden // 32, hidden), at_l),
            pl.BlockSpec((1, hidden // pk, fc), ffn_hk),
            pl.BlockSpec((1, hidden // 32, fc), ffn_hk),
            pl.BlockSpec((1, hidden // pk, fc), ffn_hk),
            pl.BlockSpec((1, hidden // 32, fc), ffn_hk),
            pl.BlockSpec((1, fc // pk, hidden), ffn_kh),
            pl.BlockSpec((1, fc // 32, hidden), ffn_kh),
            pl.BlockSpec((1, 2, hidden), at_l),
            pl.BlockSpec((1, kvh, ctx, d), at_l4),
            pl.BlockSpec((1, kvh, ctx, d), at_l4),
        ],
        out_specs=[
            pl.BlockSpec((8, hidden), lambda l, p, s: (0, 0)),
            pl.BlockSpec((1, 8, kvh * d), at_l),
            pl.BlockSpec((1, 8, kvh * d), at_l),
        ],
        scratch_shapes=[pltpu.VMEM((8, hidden), jnp.float32),
                        pltpu.VMEM((8, hidden), jnp.float32)],
    )
    x_out, k_new, v_new = pl.pallas_call(
        functools.partial(_llama_kernel, n_layers=L, n_phases=n_ph,
                          n_heads=n_heads, n_kv=n_kv, hidden=hidden,
                          head_d=head_d, bias=_BIAS[qtype]),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, hidden), jnp.float32),
            jax.ShapeDtypeStruct((L, 8, kvh * d), jnp.float32),
            jax.ShapeDtypeStruct((L, 8, kvh * d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(pos_arr, x8, inv, mega.qkv_codes, mega.qkv_scales, mega.o_codes,
      mega.o_scales, mega.gate_codes, mega.gate_scales, mega.up_codes,
      mega.up_scales, mega.down_codes, mega.down_scales, mega.norms,
      kv_k, kv_v)
    return x_out[:1], k_new[:, 0, :], v_new[:, 0, :]


def llama_megastep_reference(mega: LlamaMegaLayers, x, kv_k, kv_v, pos, *,
                             qtype: int, n_heads: int, n_kv: int,
                             rope_base: float, rope_freq_factors=None):
    """Pure-XLA mirror of llama_megastep (same bf16 block-dequant math)."""
    L = mega.qkv_codes.shape[0]
    hidden = mega.qkv_scales.shape[1] * 32
    head_d = hidden // n_heads
    g = n_heads // n_kv
    kv_h = n_kv * head_d
    scale = 1.0 / np.sqrt(head_d)
    bias = _BIAS[qtype]
    inv = _inv_freq_row(head_d, rope_base, rope_freq_factors)
    ang = jnp.asarray(pos, jnp.float32) * inv                 # (1, d/2)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x = x.astype(jnp.float32)

    def rope(y, nh):
        y = y.reshape(nh, head_d)
        y1, y2 = y[:, :head_d // 2], y[:, head_d // 2:]
        return jnp.concatenate([y1 * cos - y2 * sin, y2 * cos + y1 * sin],
                               axis=1).reshape(1, nh * head_d)

    def layer(carry, inp):
        xx = carry
        (qkv_c, qkv_s, o_c, o_s, g_c, g_s, u_c, u_s, d_c, d_s, nm,
         kc, vc) = inp
        h1 = _rms(xx, nm[0][None, :])
        qkv = _qdot_ref(h1, qkv_c, qkv_s, bias)
        q = rope(qkv[:, :hidden], n_heads)
        k = rope(qkv[:, hidden:hidden + kv_h], n_kv)
        v = qkv[:, hidden + kv_h:]
        qh = q.reshape(n_kv, g, 1, head_d) * scale
        kh = kc.astype(jnp.float32)                           # (n_kv, CTX, D)
        s = jnp.einsum("hgqd,htd->hgqt", qh, kh)
        t = jnp.arange(kc.shape[1])
        s = jnp.where(t[None, None, None, :] < pos, s, -jnp.inf)
        kcur = k.reshape(n_kv, 1, 1, head_d)
        s_cur = jnp.sum(qh * kcur, axis=3, keepdims=True)
        m = jnp.maximum(jnp.max(s, axis=3, keepdims=True), s_cur)
        ph = jnp.exp(s - m)
        pc = jnp.exp(s_cur - m)
        denom = jnp.sum(ph, axis=3, keepdims=True) + pc
        av = jnp.einsum("hgqt,htd->hgqd", ph, vc.astype(jnp.float32))
        vcur = v.reshape(n_kv, 1, 1, head_d)
        attn = ((av + pc * vcur) / denom).reshape(1, hidden)
        xx = xx + _qdot_ref(attn, o_c, o_s, bias)
        h2 = _rms(xx, nm[1][None, :])
        gate = _qdot_ref(h2, g_c, g_s, bias)
        up = _qdot_ref(h2, u_c, u_s, bias)
        down = _qdot_ref(jax.nn.silu(gate) * up, d_c, d_s, bias)
        xx = xx + down
        return xx, (k[0], v[0])

    xs = (mega.qkv_codes, mega.qkv_scales, mega.o_codes, mega.o_scales,
          mega.gate_codes, mega.gate_scales, mega.up_codes, mega.up_scales,
          mega.down_codes, mega.down_scales, mega.norms, kv_k, kv_v)
    x_out, (k_new, v_new) = jax.lax.scan(layer, x, xs)
    return x_out, k_new, v_new


# ---------------------------------------------------------------------------
# batched megastep: B slots per step, ONE weight read serves all of them
# ---------------------------------------------------------------------------
#
# Port of ops/parler_megastep.parler_megastep_batched to the llama
# architecture (GQA, NeoX rope at per-slot positions, SiLU MLP): the 8 f32
# sublane rows carry 8 DISTINCT batch slots, so the ~1.7 GB/step weight
# stream is amortized B ways — the reference can only scale Orpheus by
# full model replicas (examples/server/server.cpp:885-897). Grid is
# (L, n_pages + n_ffn): per-slot KV pages fold flash-style with the page
# index map clamped at the max live page across slots (dead pages cost no
# DMA), then the FFN streams in fc-wide slices as in the single-stream
# phase kernel. Attention uses the reshape-128 layout (requires head_d a
# multiple of 128, else the XLA reference runs): the (B, n_heads*d)
# activation reshapes FREE to (B*n_heads, d) r-major rows matching the
# KV page block's (B*n_kv*page, d) flat reshape, so each page folds with
# ONE masked bf16 score dot + ONE AV dot — measured: Mosaic 4D
# transposes run at ~0.15 GB/s and per-head loops serialize the weight
# stream; 128-lane reshapes are the only cheap layout moves
# (tools/probe_mosaic3.py).


def _llama_batched_kernel(mp_ref, pos_ref, pos_b_ref, x_ref, inv_ref,
                          qkv_c, qkv_s,
                          o_c, o_s, g_c, g_s, u_c, u_s, d_c, d_s, norms,
                          kc_ref, vc_ref, x_out, k_out, v_out,
                          x_scr, h_scr, q_scr, acc_scr, m_scr, l_scr,
                          *, n_layers, n_pages, n_ffn, n_heads, n_kv,
                          hidden, head_d, b, page, bias):
    l = pl.program_id(0)
    p = pl.program_id(1)
    scale = 1.0 / np.sqrt(head_d)
    g = n_heads // n_kv
    kvh = n_kv * head_d
    rows = b * n_heads
    h2d = head_d // 2

    @pl.when((l == 0) & (p == 0))
    def _():
        x_scr[:] = x_ref[:]

    @pl.when(p == 0)
    def _():
        nm = norms[0]
        x = x_scr[:]                                       # (B, H)
        h1 = _rms(x, nm[0:1])
        qkv = _dqdot(h1, qkv_c[0], qkv_s[0], bias)         # (B, H+2KV)
        # per-slot positions come as their OWN (B, 1) input: pos_ref is
        # head-repeated (row r -> slot r//n_heads) for the page masks,
        # so its first B rows are NOT the B slots' positions
        pos_b = pos_b_ref[:].astype(jnp.float32)           # (B, 1)
        ang = pos_b * inv_ref[0:1]                         # (B, d/2)
        cosd = jnp.concatenate([jnp.cos(ang)] * 2, axis=1)
        sind = jnp.concatenate([jnp.sin(ang)] * 2, axis=1)

        def rope_full(y, nh):
            cw = jnp.concatenate([cosd] * nh, axis=1)
            sw = jnp.concatenate([sind] * nh, axis=1)
            rn = pltpu.roll(y, y.shape[1] - h2d, 1)
            rp = pltpu.roll(y, h2d, 1)
            li = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
            return y * cw + jnp.where((li % head_d) < h2d, -rn, rp) * sw

        q = rope_full(qkv[:, :hidden], n_heads)
        k_row = rope_full(qkv[:, hidden:hidden + kvh], n_kv)
        v_row = qkv[:, hidden + kvh:hidden + 2 * kvh]
        k_out[0] = k_row
        v_out[0] = v_row
        # r-major rows (slot, query head) via one free 128-lane reshape;
        # flash state initializes from the current token (m = s_cur,
        # l = 1, acc = v_cur), so no separate finalize fold is needed
        q4 = (q * scale).reshape(rows, head_d)
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
        cols = b * n_kv * page
        k2 = kc_ref[:].reshape(cols, head_d)               # r-major (b,j,t)
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
        m_old = m_scr[:]                                   # (rows, 1)
        m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        pe = jnp.exp(s - m_new)
        av = jax.lax.dot_general(
            pe.astype(jnp.bfloat16), v2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (rows, d)
        acc_scr[:] = acc_scr[:] * alpha + av
        l_scr[:] = l_scr[:] * alpha + jnp.sum(pe, axis=1, keepdims=True)
        m_scr[:] = m_new

    @pl.when(p == n_pages - 1)
    def _():
        attn = (acc_scr[:] / l_scr[:]).reshape(b, hidden)  # free merge
        o = _dqdot(attn, o_c[0], o_s[0], bias)
        x = x_scr[:] + o
        x_scr[:] = x
        h_scr[:] = _rms(x, norms[0][1:2])

    @pl.when(p >= n_pages)
    def _():
        h2 = h_scr[:]
        gate = _dqdot(h2, g_c[0], g_s[0], bias)            # (B, FC)
        up = _dqdot(h2, u_c[0], u_s[0], bias)
        a = jax.nn.silu(gate) * up
        down = _dqdot(a, d_c[0], d_s[0], bias)             # (B, H)
        x_scr[:] = x_scr[:] + down

        @pl.when((l == n_layers - 1) & (p == n_pages + n_ffn - 1))
        def _():
            x_out[:] = x_scr[:]


def llama_megastep_batched(mega: LlamaMegaLayers, x, kv_k, kv_v, pos, *,
                           qtype: int, n_heads: int, n_kv: int,
                           rope_base: float, rope_freq_factors=None,
                           page: int = 256, fc: int = 2048):
    """Batched llama megastep: x (B, H) f32 — one row per slot; kv_k/kv_v
    (L, B, n_kv, CTX, D); pos (B,) int32 per-slot cache rows.

    Returns (x_out (B, H) pre-final-norm, k_new (L, B, KV), v_new
    (L, B, KV)); the caller writes each slot's cache row at pos[slot] and
    applies final norm + LM head. TPU requires B % 8 == 0 and
    CTX % page == 0; otherwise (and on CPU/tests) dispatches to a per-slot
    loop over the XLA reference with identical math."""
    b = x.shape[0]
    ctx = kv_k.shape[-2]
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    head_d = (x.shape[1]) // n_heads
    if not on_tpu or b % 8 or ctx % page or head_d % 128:
        return llama_megastep_batched_reference(
            mega, x, kv_k, kv_v, pos, qtype=qtype, n_heads=n_heads,
            n_kv=n_kv, rope_base=rope_base,
            rope_freq_factors=rope_freq_factors)
    return _llama_megastep_batched_tpu(
        mega, x, kv_k, kv_v, pos, qtype=qtype, n_heads=n_heads, n_kv=n_kv,
        rope_base=rope_base, rope_freq_factors=rope_freq_factors,
        page=page, fc=fc)


@functools.partial(jax.jit, static_argnames=("qtype", "n_heads", "n_kv",
                                             "rope_base", "page", "fc"))
def _llama_megastep_batched_tpu(mega: LlamaMegaLayers, x, kv_k, kv_v, pos,
                                *, qtype: int, n_heads: int, n_kv: int,
                                rope_base: float, rope_freq_factors,
                                page: int, fc: int):
    L = mega.qkv_codes.shape[0]
    hidden = mega.qkv_scales.shape[1] * QK
    f = mega.gate_codes.shape[2]
    pk = hidden // mega.qkv_codes.shape[1]
    b, kvh_n, ctx, d = kv_k.shape[1], kv_k.shape[2], kv_k.shape[3], \
        kv_k.shape[4]
    head_d = hidden // n_heads
    fc = min(fc, f)
    n_ffn = f // fc
    n_pages = ctx // page
    kv_n = hidden + 2 * n_kv * head_d
    inv = _inv_freq_row(head_d, rope_base, rope_freq_factors)
    pos = jnp.asarray(pos, jnp.int32)
    mp = jnp.max(jnp.maximum(pos - 1, 0)) // page
    mp_arr = mp.reshape(1)
    # r-major rows (slot, query head): row // n_heads = slot
    pos_rows = jnp.repeat(pos, n_heads)[:, None]           # (B*nh, 1)
    kv_k5 = kv_k.reshape(L * b, kvh_n, ctx, d)
    kv_v5 = kv_v.reshape(L * b, kvh_n, ctx, d)

    def at_l(i, p, mp):
        return (i, 0, 0)

    def ffn_hk(i, p, mp):
        return (i, 0, jnp.maximum(p - n_pages, 0))

    def ffn_kh(i, p, mp):
        return (i, jnp.maximum(p - n_pages, 0), 0)

    def kv_map(i, p, mp):
        return (i, 0, jnp.minimum(p, mp[0]), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, n_pages + n_ffn),
        in_specs=[
            pl.BlockSpec((b * n_heads, 1), lambda i, p, mp: (0, 0)),
            pl.BlockSpec((b, 1), lambda i, p, mp: (0, 0)),
            pl.BlockSpec((b, hidden), lambda i, p, mp: (0, 0)),
            pl.BlockSpec((1, head_d // 2), lambda i, p, mp: (0, 0)),
            pl.BlockSpec((1, hidden // pk, kv_n), at_l),
            pl.BlockSpec((1, hidden // QK, kv_n), at_l),
            pl.BlockSpec((1, hidden // pk, hidden), at_l),
            pl.BlockSpec((1, hidden // QK, hidden), at_l),
            pl.BlockSpec((1, hidden // pk, fc), ffn_hk),
            pl.BlockSpec((1, hidden // QK, fc), ffn_hk),
            pl.BlockSpec((1, hidden // pk, fc), ffn_hk),
            pl.BlockSpec((1, hidden // QK, fc), ffn_hk),
            pl.BlockSpec((1, fc // pk, hidden), ffn_kh),
            pl.BlockSpec((1, fc // QK, hidden), ffn_kh),
            pl.BlockSpec((1, 2, hidden), at_l),
            pl.BlockSpec((b, kvh_n, page, d), kv_map),
            pl.BlockSpec((b, kvh_n, page, d), kv_map),
        ],
        out_specs=[
            pl.BlockSpec((b, hidden), lambda i, p, mp: (0, 0)),
            pl.BlockSpec((1, b, n_kv * head_d), at_l),
            pl.BlockSpec((1, b, n_kv * head_d), at_l),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, hidden), jnp.float32),              # x residual
            pltpu.VMEM((b, hidden), jnp.float32),              # h2
            pltpu.VMEM((b * n_heads, head_d), jnp.float32),    # q rows
            pltpu.VMEM((b * n_heads, head_d), jnp.float32),    # flash acc
            pltpu.VMEM((b * n_heads, 1), jnp.float32),         # flash m
            pltpu.VMEM((b * n_heads, 1), jnp.float32),         # flash l
        ],
    )
    x_out, k_new, v_new = pl.pallas_call(
        functools.partial(_llama_batched_kernel, n_layers=L,
                          n_pages=n_pages, n_ffn=n_ffn, n_heads=n_heads,
                          n_kv=n_kv, hidden=hidden, head_d=head_d, b=b,
                          page=page, bias=_BIAS[qtype]),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hidden), jnp.float32),
            jax.ShapeDtypeStruct((L, b, n_kv * head_d), jnp.float32),
            jax.ShapeDtypeStruct((L, b, n_kv * head_d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(mp_arr, pos_rows, pos[:, None], x.astype(jnp.float32), inv,
      mega.qkv_codes,
      mega.qkv_scales.astype(jnp.float32), mega.o_codes, mega.o_scales,
      mega.gate_codes, mega.gate_scales, mega.up_codes, mega.up_scales,
      mega.down_codes, mega.down_scales, mega.norms, kv_k5, kv_v5)
    return x_out, k_new, v_new


def llama_megastep_batched_reference(mega: LlamaMegaLayers, x, kv_k, kv_v,
                                     pos, *, qtype: int, n_heads: int,
                                     n_kv: int, rope_base: float,
                                     rope_freq_factors=None):
    """Per-slot loop over the single-slot reference (the batched kernel is
    the single kernel applied independently per slot)."""
    pos = jnp.asarray(pos, jnp.int32)
    outs = [llama_megastep_reference(
        mega, x[s:s + 1], kv_k[:, s], kv_v[:, s], pos[s], qtype=qtype,
        n_heads=n_heads, n_kv=n_kv, rope_base=rope_base,
        rope_freq_factors=rope_freq_factors) for s in range(x.shape[0])]
    return (jnp.concatenate([o[0] for o in outs], axis=0),
            jnp.stack([o[1] for o in outs], axis=1),
            jnp.stack([o[2] for o in outs], axis=1))
