"""Flat-tile Parler decode megastep: all L decoder layers (self-attention
with paged KV, cross-attention to precomputed T5 K/V, GELU MLP) as ONE
Pallas kernel over a flat stream of uniform weight tiles.

Same design as ops/llama_flat (see its header): uniform (kk x tn)
weight tiles (whole-K by default; K-split selectable), nibble-packed Q4
codes, bf16 scales, prefetched metadata driving roles and dynamic index
maps, and PAGED flash self-attention whose page index maps clamp at
(pos-1)//psz so only the live KV pages cost DMA.

STATUS: at Parler scale the PHASE megastep (ops/parler_megastep) is
FASTER in the full generation loop — 0.816 vs 1.127 ms/step effective
head-to-head on v5e (24 layers x 8.2 MB phases pipeline fine; the fine
grid's per-phase overhead dominates at this size, the opposite of the
Orpheus result). The runner therefore preps the phase kernel; this
module stays as the measured, tested alternative and the template for
scaling the flat design down.

Parler specifics vs llama: LayerNorm with bias (6 norm rows), no RoPE
(learned positional embeddings enter at the embed), MHA (g=1, so flash
rows stay replicated and need no selector dots), a cross-attention
sub-block (cq projection tiles -> one softmax phase over the precomputed
(heads, Tc, D) cross K/V -> co tiles), and the 9 LM heads stay OUTSIDE
the kernel (they are ~2% of the stream; `_logits_last` handles their
per-head vocab padding).

Replaces the reference graph walk src/models/parler/model.cpp:520-614.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..gguf import quants
from .parler_megastep import _BIAS, _dqdot, _ln
from .llama_flat import (_layer_tiles, _layer_tiles_whole, pick_page,
                         pick_tiles)
from .quant_matmul import QK

# roles
(R_QKV, R_O, R_XQ, R_XO, R_FC1, R_FC2, R_ATTP, R_ATTF, R_XATT) = range(9)
# meta rows
(M_ROLE, M_SID, M_LAYER, M_K0, M_N0, M_PG) = range(6)
N_META = 6


class ParlerFlatMega:
    """Stream-ordered half-tiles + schedule (pytree; aux = statics)."""

    def __init__(self, codes0, scales0, codes1, scales1, meta, norms,
                 cross_k, cross_v, *, ffn: int, psz: int, use_cross: bool,
                 kk: int, split: bool = True):
        self.codes0 = codes0
        self.scales0 = scales0
        self.codes1 = codes1
        self.scales1 = scales1
        self.meta = meta
        self.norms = norms          # (L, 6, H)
        self.cross_k = cross_k      # (L, heads, Tc, D) f32
        self.cross_v = cross_v
        self.ffn = ffn
        self.psz = psz
        self.use_cross = use_cross
        self.kk = kk
        self.split = split

    def tree_flatten(self):
        return ((self.codes0, self.scales0, self.codes1, self.scales1,
                 self.meta, self.norms, self.cross_k, self.cross_v),
                (self.ffn, self.psz, self.use_cross, self.kk, self.split))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, ffn=aux[0], psz=aux[1], use_cross=aux[2],
                   kk=aux[3], split=aux[4])


jax.tree_util.register_pytree_node(
    ParlerFlatMega, lambda m: m.tree_flatten(),
    ParlerFlatMega.tree_unflatten)


@functools.lru_cache(maxsize=8)
def build_parler_schedule(L: int, hidden: int, ffn: int, kk: int, tn: int,
                          n_pages: int, use_cross: bool) -> np.ndarray:
    rows = []
    sid = 0

    def mat(role, layer, K, N, pg):
        nonlocal sid
        for n in range(N // tn):
            for k in range(K // kk):
                rows.append([role, sid, layer, k, n, pg])
                sid += 1

    last = n_pages - 1
    for l in range(L):
        mat(R_QKV, l, hidden, 3 * hidden, 0)
        for p in range(n_pages):
            rows.append([R_ATTP, sid, l, p, 0, p])
        rows.append([R_ATTF, sid, l, 0, 0, last])
        mat(R_O, l, hidden, hidden, last)
        if use_cross:
            mat(R_XQ, l, hidden, hidden, last)
            rows.append([R_XATT, sid, l, 0, 0, last])
            mat(R_XO, l, hidden, hidden, last)
        mat(R_FC1, l, hidden, ffn, last)
        mat(R_FC2, l, ffn, hidden, last)
    return np.asarray(rows, np.int32).T.copy()


def prep_parler_flat(mega, qtype: int, ctx: int, use_cross: bool = True,
                     split: bool = False) -> ParlerFlatMega:
    """Build the flat stream from MegaLayers (ops/parler_megastep).

    `ctx` is the KV cache context the decode runs with. Raises ValueError
    when shapes don't admit a uniform tile."""
    L = mega.qkv_codes.shape[0]
    hidden = mega.qkv_scales.shape[1] * QK
    ffn = mega.fc1_codes.shape[2]
    kk, tn = pick_tiles(hidden, 3 * hidden, ffn)
    if not kk or not tn or kk % 128:
        raise ValueError(f"no uniform tile for H={hidden} F={ffn}")
    pack = qtype == quants.GGML_TYPE_Q4_0
    psz = pick_page(ctx)

    @jax.jit
    def build(mega):
        occ_s = mega.occ_scales.astype(jnp.float32)
        mats = [(mega.qkv_codes, mega.qkv_scales.astype(jnp.float32)),
                (mega.occ_codes[:, :, :hidden], occ_s[:, :, :hidden])]
        if use_cross:
            mats += [
                (mega.occ_codes[:, :, hidden:2 * hidden],
                 occ_s[:, :, hidden:2 * hidden]),
                (mega.occ_codes[:, :, 2 * hidden:], occ_s[:, :, 2 * hidden:]),
            ]
        mats += [(mega.fc1_codes, mega.fc1_scales.astype(jnp.float32)),
                 (mega.fc2_codes, mega.fc2_scales.astype(jnp.float32))]
        nparts = 4 if split else 2
        parts = [[] for _ in range(nparts)]
        tiler = _layer_tiles if split else _layer_tiles_whole
        for c, s in mats:
            for i, t in enumerate(tiler(c, s, kk, tn, pack)):
                parts[i].append(t)
        lt = [jnp.concatenate(p, axis=1) for p in parts]
        lt = [a.reshape(-1, a.shape[-2], tn) for a in lt]
        if not split:
            lt += [jnp.zeros((1, 1, tn), jnp.int8),
                   jnp.zeros((1, 1, tn), jnp.bfloat16)]
        return (*lt, mega.norms.astype(jnp.float32))

    c0, s0, c1, s1, nm = build(mega)
    meta = jnp.asarray(build_parler_schedule(L, hidden, ffn, kk, tn,
                                             ctx // psz, use_cross))
    n_weight = int((meta[M_ROLE] < R_ATTP).sum())
    assert n_weight == c0.shape[0], (n_weight, c0.shape)
    return ParlerFlatMega(c0, s0, c1, s1, meta, nm,
                          mega.cross_k.astype(jnp.float32),
                          mega.cross_v.astype(jnp.float32),
                          ffn=ffn, psz=psz, use_cross=use_cross, kk=kk,
                          split=split)


def _pflat_kernel(meta_ref, pos_ref, x_ref, c0_ref, s0_ref, c1_ref, s1_ref,
                  nm_ref, ck_ref, cv_ref, kc_ref, vc_ref, x_out, ko_ref,
                  vo_ref, x_scr, h_scr, qkv_scr, attn_scr, q_scr, m_scr,
                  l_scr, acc_scr, up_scr, *, n_layers, n_heads, hidden,
                  head_d, bias, kk, tn, ffn, psz, use_cross, split):
    t = pl.program_id(0)
    role = meta_ref[M_ROLE, t]
    kidx = meta_ref[M_K0, t]
    k0 = kidx * kk
    n0 = meta_ref[M_N0, t] * tn
    pos = pos_ref[0]
    scale = 1.0 / np.sqrt(head_d)
    h2 = kk // 2

    @pl.when(t == 0)
    def _():
        x_scr[:] = x_ref[:]

    def tile_dot(src_ref, src_off):
        if not split:
            return _dqdot(src_ref[:, pl.ds(src_off, kk)], c0_ref[0],
                          s0_ref[0], bias)
        return (_dqdot(src_ref[:, pl.ds(src_off, h2)], c0_ref[0], s0_ref[0],
                       bias) +
                _dqdot(src_ref[:, pl.ds(src_off + h2, h2)], c1_ref[0],
                       s1_ref[0], bias))

    def accum(dst_ref, part, first):
        prev = dst_ref[:, pl.ds(n0, tn)]
        dst_ref[:, pl.ds(n0, tn)] = jnp.where(first, part, part + prev)

    @pl.when(role == R_QKV)
    def _():
        @pl.when((kidx == 0) & (n0 == 0))
        def _():
            h_scr[:] = _ln(x_scr[:], nm_ref[0, 0:1], nm_ref[0, 1:2])
        accum(qkv_scr, tile_dot(h_scr, k0), kidx == 0)

    # Paged MHA flash attention, vectorized over ALL heads per phase: the
    # per-head state rides the sublane dim ((8*heads, d) scratches) and
    # every page folds with ONE masked score dot + ONE AV dot (the
    # per-head-loop formulation's many small ops serialized the weight
    # stream). g=1: every row group stays replicated, so ATTF assembly is
    # a plain lane concat — no selector dots.
    @pl.when(role == R_ATTP)
    def _():
        # head_d >= 128: all heads in one masked dot (rows on sublanes).
        # head_d == 64 (Parler Mini): Mosaic cannot sublane-concat 64-lane
        # slices at alternating lane offsets, so fold per head — measured
        # equivalent (the weight-DMA pipeline hides either form).
        vec = head_d % 128 == 0

        @pl.when(kidx == 0)
        def _():
            # emit current-token K/V; stage per-head q rows; init flash
            # state from the current token (m = s_cur, l = 1, acc = v)
            k_row = qkv_scr[:, hidden:2 * hidden]
            v_row = qkv_scr[:, 2 * hidden:3 * hidden]
            ko_ref[0] = k_row
            vo_ref[0] = v_row
            for h in range(n_heads):
                sl = slice(h * 8, (h + 1) * 8)
                q8 = qkv_scr[:, h * head_d:(h + 1) * head_d] * scale
                q_scr[sl, :] = q8
                kcur = k_row[:, h * head_d:(h + 1) * head_d]
                s_cur = jnp.sum(q8 * kcur, axis=1, keepdims=True)
                m_scr[sl, :] = jnp.broadcast_to(s_cur, (8, head_d))
                l_scr[sl, :] = jnp.ones((8, head_d), jnp.float32)
                acc_scr[sl, :] = v_row[:, h * head_d:(h + 1) * head_d]

        @pl.when(kidx * psz < pos)
        def _():
            if vec:
                rows = 8 * n_heads
                cols = n_heads * psz
                k2 = kc_ref[0].reshape(cols, head_d).astype(jnp.float32)
                s = jax.lax.dot_general(
                    q_scr[:], k2,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)     # (8h, h*psz)
                ri = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
                ci = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
                valid = ((ri // 8) == (ci // psz)) & \
                    ((kidx * psz + (ci % psz)) < pos)
                s = jnp.where(valid, s, -jnp.inf)
                m_old = m_scr[:, 0:1]
                m_new = jnp.maximum(m_old,
                                    jnp.max(s, axis=1, keepdims=True))
                corr = jnp.exp(m_old - m_new)
                pe = jnp.exp(s - m_new)   # masked cols are exactly 0
                v2 = vc_ref[0].reshape(cols, head_d).astype(jnp.float32)
                av = jax.lax.dot_general(
                    pe, v2, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc_scr[:] = acc_scr[:] * corr + av
                l_scr[:] = l_scr[:] * corr + jnp.sum(pe, axis=1,
                                                     keepdims=True)
                m_scr[:] = jnp.broadcast_to(m_new, (rows, head_d))
            else:
                iota = jax.lax.broadcasted_iota(jnp.int32, (8, psz), 1)
                mask = (kidx * psz + iota) < pos
                for h in range(n_heads):
                    sl = slice(h * 8, (h + 1) * 8)
                    q8 = q_scr[sl, :]
                    kh = kc_ref[0, h].astype(jnp.float32)   # (psz, d)
                    s = jax.lax.dot_general(
                        q8, kh, dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    s = jnp.where(mask, s, -jnp.inf)
                    m_old = m_scr[sl, 0:1]
                    m_new = jnp.maximum(m_old,
                                        jnp.max(s, axis=1, keepdims=True))
                    corr = jnp.exp(m_old - m_new)
                    pe = jnp.exp(s - m_new)
                    vh = vc_ref[0, h].astype(jnp.float32)
                    av = jax.lax.dot_general(
                        pe, vh, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc_scr[sl, :] = acc_scr[sl, :] * corr + av
                    l_scr[sl, :] = l_scr[sl, :] * corr + jnp.sum(
                        pe, axis=1, keepdims=True)
                    m_scr[sl, :] = jnp.broadcast_to(m_new, (8, head_d))

    @pl.when(role == R_ATTF)
    def _():
        attn_scr[:] = jnp.concatenate(
            [acc_scr[h * 8:(h + 1) * 8, :] / l_scr[h * 8:(h + 1) * 8, :]
             for h in range(n_heads)], axis=1)                  # (8, H)

    @pl.when(role == R_O)
    def _():
        part = tile_dot(attn_scr, k0)
        x_scr[:, pl.ds(n0, tn)] = x_scr[:, pl.ds(n0, tn)] + part

    if use_cross:
        # cq accumulates into qkv_scr[:, :H] (free after ATTF); the
        # attended context overwrites attn_scr (free after the o tiles)
        @pl.when(role == R_XQ)
        def _():
            @pl.when((kidx == 0) & (n0 == 0))
            def _():
                h_scr[:] = _ln(x_scr[:], nm_ref[0, 2:3], nm_ref[0, 3:4])
            accum(qkv_scr, tile_dot(h_scr, k0), kidx == 0)

        @pl.when(role == R_XATT)
        def _():
            # per-head softmax over the precomputed cross K/V (see the
            # self-attention head_d gate above for why not one big dot)
            outs = []
            for h in range(n_heads):
                qh = qkv_scr[:, h * head_d:(h + 1) * head_d] * scale
                s = jax.lax.dot_general(
                    qh, ck_ref[0, h],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)         # (8, Tc)
                m = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp(s - m)
                p = p / jnp.sum(p, axis=1, keepdims=True)
                outs.append(jax.lax.dot_general(
                    p, cv_ref[0, h],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            attn_scr[:] = jnp.concatenate(outs, axis=1)

        @pl.when(role == R_XO)
        def _():
            part = tile_dot(attn_scr, k0)
            x_scr[:, pl.ds(n0, tn)] = x_scr[:, pl.ds(n0, tn)] + part

    @pl.when(role == R_FC1)
    def _():
        @pl.when((kidx == 0) & (n0 == 0))
        def _():
            h_scr[:] = _ln(x_scr[:], nm_ref[0, 4:5], nm_ref[0, 5:6])
        part = tile_dot(h_scr, k0)
        prev = up_scr[:, pl.ds(n0, tn)]
        tot = jnp.where(kidx == 0, part, part + prev)

        @pl.when(kidx == hidden // kk - 1)
        def _():
            up_scr[:, pl.ds(n0, tn)] = jax.nn.gelu(tot, approximate=True)

        @pl.when(kidx < hidden // kk - 1)
        def _():
            up_scr[:, pl.ds(n0, tn)] = tot

    @pl.when(role == R_FC2)
    def _():
        part = tile_dot(up_scr, k0)
        x_scr[:, pl.ds(n0, tn)] = x_scr[:, pl.ds(n0, tn)] + part

        @pl.when((meta_ref[M_LAYER, t] == n_layers - 1)
                 & (kidx == ffn // kk - 1)
                 & (n0 == hidden - tn))
        def _():
            x_out[:] = x_scr[:]


@functools.partial(jax.jit, static_argnames=("qtype", "n_heads",
                                             "interpret"))
def parler_flat_megastep(flat: ParlerFlatMega, x, kv_k, kv_v, pos, *,
                         qtype: int, n_heads: int, interpret: bool = False):
    """x (1, H) f32; kv_k/kv_v (L, heads, CTX, D); pos = cache row.

    Returns (x_out (1, H) pre-final-norm, k_new (L, H), v_new (L, H)) —
    same contract as parler_megastep; the caller writes the cache rows and
    applies the final layer norm + LM heads."""
    psz, ffn = flat.psz, flat.ffn
    L = flat.norms.shape[0]
    hidden = flat.norms.shape[2]
    T = flat.meta.shape[1]
    tn = flat.codes0.shape[2]
    kkq = flat.kk
    head_d = hidden // n_heads
    ctx = kv_k.shape[2]
    tc = flat.cross_k.shape[2]
    assert ctx % psz == 0, (ctx, psz)
    x8 = jnp.broadcast_to(x.astype(jnp.float32), (8, hidden))
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    def cmap(t, m, p):
        return (m[M_SID, t], 0, 0)

    def nmmap(t, m, p):
        return (m[M_LAYER, t], 0, 0)

    def xmap(t, m, p):
        return (m[M_LAYER, t], 0, 0, 0)

    def kvmap(t, m, p):
        page = jnp.minimum(m[M_PG, t], jnp.maximum(p[0] - 1, 0) // psz)
        return (m[M_LAYER, t], 0, page, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((8, hidden), lambda t, m, p: (0, 0)),
            pl.BlockSpec((1, flat.codes0.shape[1], tn), cmap),
            pl.BlockSpec((1, flat.scales0.shape[1], tn), cmap),
            pl.BlockSpec((1, flat.codes1.shape[1], tn),
                         cmap if flat.split else (lambda t, m, p: (0, 0, 0))),
            pl.BlockSpec((1, flat.scales1.shape[1], tn),
                         cmap if flat.split else (lambda t, m, p: (0, 0, 0))),
            pl.BlockSpec((1, 6, hidden), nmmap),
            pl.BlockSpec((1, n_heads, tc, head_d), xmap),
            pl.BlockSpec((1, n_heads, tc, head_d), xmap),
            pl.BlockSpec((1, n_heads, psz, head_d), kvmap),
            pl.BlockSpec((1, n_heads, psz, head_d), kvmap),
        ],
        out_specs=[
            pl.BlockSpec((8, hidden), lambda t, m, p: (0, 0)),
            pl.BlockSpec((1, 8, hidden), nmmap),
            pl.BlockSpec((1, 8, hidden), nmmap),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, hidden), jnp.float32),         # x residual
            pltpu.VMEM((8, hidden), jnp.float32),         # ln'd input
            pltpu.VMEM((8, 3 * hidden), jnp.float32),     # qkv / cq acc
            pltpu.VMEM((8, hidden), jnp.float32),         # attn / cross out
            pltpu.VMEM((8 * n_heads, head_d), jnp.float32),  # q rows
            pltpu.VMEM((8 * n_heads, head_d), jnp.float32),  # flash m
            pltpu.VMEM((8 * n_heads, head_d), jnp.float32),  # flash l
            pltpu.VMEM((8 * n_heads, head_d), jnp.float32),  # flash acc
            pltpu.VMEM((8, ffn), jnp.float32),            # fc1 acc / act
        ],
    )
    x_out, k_new, v_new = pl.pallas_call(
        functools.partial(_pflat_kernel, n_layers=L, n_heads=n_heads,
                          hidden=hidden, head_d=head_d, bias=_BIAS[qtype],
                          kk=kkq, tn=tn, ffn=ffn, psz=psz,
                          use_cross=flat.use_cross, split=flat.split),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, hidden), jnp.float32),
            jax.ShapeDtypeStruct((L, 8, hidden), jnp.float32),
            jax.ShapeDtypeStruct((L, 8, hidden), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(flat.meta, pos_arr, x8, flat.codes0, flat.scales0, flat.codes1,
      flat.scales1, flat.norms, flat.cross_k, flat.cross_v, kv_k, kv_v)
    return x_out[:1], k_new[:, 0, :], v_new[:, 0, :]
