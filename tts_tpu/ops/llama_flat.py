"""Flat-tile llama decode megastep: the whole Orpheus decode step — all L
layers (qkv, GQA attention, o, SiLU MLP) PLUS the 272 MB LM head — as ONE
Pallas kernel whose grid is a flat stream of uniform weight tiles.

Why flat: the round-4 (L, phases) megakernel streams weights at only
~355 GB/s because its phases are few huge blocks (the double-buffered DMA
of the next 19-25 MB phase cannot hide behind unbalanced compute), while
the single-call dequant matvec's fine-tile pipeline reaches the chip's
practical streaming rate. Measured on v5e (tools/probe_flat_stream.py):
a flat stream of (512, 1024) packed-Q4 tiles covering the full Orpheus
weight set moves 1.86 GB at 480-512 GB/s with a synthetic attention
bubble every 30 tiles costing ~1% — vs 355 GB/s for the phase grid.

Layout: every weight matrix is cut into (kk logical K rows x tn N cols)
tiles, Q4 codes nibble-packed PER TILE (half-split: byte row r = logical
rows r and r + kk/2, exactly `pack_codes_t` on the slice), scales bf16.
All tiles across all layers and the LM head concatenate into one
(T, kr, tn) codes array + (T, kk//32, tn) scales array in stream order;
a prefetched (8, T) metadata array tells each grid step its role
(qkv/o/gate/up/down/head accumulate, or one of two attention phases),
source/dest lane offsets, and drives the dynamic BlockSpec index maps
(KV cache blocks prefetch at layer start; logits flush per head n-tile).

Attention is vectorized per kv head (one (8, ctx) score dot + one AV dot
per kv head instead of round-4's 48 unrolled per-(head, group) dots), so
its bubble stays ~10 us/layer and the weight DMA — issued one tile ahead
throughout — keeps streaming beneath it.

Replaces the reference's per-matmul graph walk for Orpheus
(/root/reference/src/models/orpheus/model.cpp:389-405) and subsumes the
separate LM-head matvec dispatch (model.cpp:398, lm_head).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..gguf import quants
from .parler_megastep import _BIAS, _dqdot
from .quant_matmul import QK

# roles
R_QKV, R_O, R_GATE, R_UP, R_DOWN, R_HEAD, R_ATTK, R_ATTV = range(8)
# meta rows
M_ROLE, M_SID, M_LAYER, M_K0, M_N0, M_OUTN, M_KL, M_VL = range(8)
N_META = 8


def _rms(x, w, eps=1e-5):
    ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(ms + eps) * w


class LlamaFlatMega:
    """Stream-ordered tiles + schedule for the flat megastep.

    codes (T, kr, tn) int8 (kr = kk//2 for Q4 per-tile half-split, kk
    otherwise); scales (T, kk//QK, tn) bf16; meta (8, T) int32;
    norms (L, 2, H) f32; out_norm (1, H) f32. Registered as a pytree with
    (vocab_pad, ffn) as STATIC aux data so it rides the same `mega=`
    argument as LlamaMegaLayers through jit boundaries.
    """

    def __init__(self, codes, scales, meta, norms, out_norm, *,
                 vocab_pad: int, ffn: int):
        self.codes = codes
        self.scales = scales
        self.meta = meta
        self.norms = norms
        self.out_norm = out_norm
        self.vocab_pad = vocab_pad
        self.ffn = ffn

    def tree_flatten(self):
        return ((self.codes, self.scales, self.meta, self.norms,
                 self.out_norm), (self.vocab_pad, self.ffn))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, vocab_pad=aux[0], ffn=aux[1])


jax.tree_util.register_pytree_node(
    LlamaFlatMega, lambda m: m.tree_flatten(),
    LlamaFlatMega.tree_unflatten)


def pick_tiles(hidden: int, kvn: int, ffn: int) -> tuple[int, int]:
    """Largest (kk, tn) <= 1024 dividing every K / N the stream touches."""
    kk = next((v for v in (1024, 512, 256, 128, 64)
               if hidden % v == 0 and ffn % v == 0), 0)
    tn = next((v for v in (1024, 512, 256, 128)
               if kvn % v == 0 and hidden % v == 0 and ffn % v == 0), 0)
    return kk, tn


@functools.lru_cache(maxsize=8)
def build_schedule(L: int, hidden: int, kvn: int, ffn: int, vocab_pad: int,
                   kk: int, tn: int) -> np.ndarray:
    """(8, T) int32 stream schedule (see module header)."""
    rows = []
    sid = 0

    def mat(role, layer, K, N):
        nonlocal sid
        for n in range(N // tn):
            for k in range(K // kk):
                rows.append([role, sid, layer, k, n, 0, layer, layer])
                sid += 1

    for l in range(L):
        mat(R_QKV, l, hidden, kvn)
        # attention phases carry the NEXT tile's sid so the o-proj tile 0
        # DMA is issued entering ATTK and rides under the attention bubble
        rows.append([R_ATTK, sid, l, 0, 0, 0, l, l])
        rows.append([R_ATTV, sid, l, 0, 0, 0, l, l])
        mat(R_O, l, hidden, hidden)
        mat(R_GATE, l, hidden, ffn)
        mat(R_UP, l, hidden, ffn)
        mat(R_DOWN, l, ffn, hidden)
    for n in range(vocab_pad // tn):
        for k in range(hidden // kk):
            rows.append([R_HEAD, sid, L - 1, k, n, n, L - 1, L - 1])
            sid += 1
    m = np.asarray(rows, np.int32).T.copy()
    # V-cache prefetch staggers a few tiles into each layer so the K and V
    # block DMAs don't collide at the layer boundary
    per_layer = (kvn + hidden + 3 * ffn) // tn * (hidden // kk) + 2
    t0 = 0
    for l in range(L):
        stag = min(4, kvn // tn * (hidden // kk) - 1)
        m[M_VL, t0:t0 + stag] = max(l - 1, 0)
        t0 += per_layer
    return m


def _layer_tiles(codes_t, scales_t, kk: int, tn: int, pack: bool):
    """(L, Kp, N) codes + (L, K//QK, N) scales -> stream-ordered tiles
    (L, nt, kr, tn) / (L, nt, kk//QK, tn), n-outer k-inner order."""
    from .quant_matmul import unpack_codes_t
    L = codes_t.shape[0]
    k = scales_t.shape[1] * QK
    n = codes_t.shape[2]
    c = codes_t
    if c.shape[1] != k:  # globally packed (PACK_BLOCK) -> logical rows
        c = unpack_codes_t(c, k).astype(jnp.int8)
    nk, nn = k // kk, n // tn
    c = c.reshape(L, nk, kk, nn, tn).transpose(0, 3, 1, 2, 4)
    if pack:
        lo = c[..., : kk // 2, :].astype(jnp.uint8)
        hi = c[..., kk // 2:, :].astype(jnp.uint8)
        c = jax.lax.bitcast_convert_type((hi << 4) | lo, jnp.int8)
    c = c.reshape(L, nn * nk, c.shape[-2], tn)
    s = scales_t.reshape(L, nk, kk // QK, nn, tn).transpose(0, 3, 1, 2, 4)
    s = s.reshape(L, nn * nk, kk // QK, tn).astype(jnp.bfloat16)
    return c, s


def prep_llama_flat(mega, head, out_norm, qtype: int, vocab: int,
                    n_heads: int, n_kv: int) -> LlamaFlatMega:
    """Build the flat stream from LlamaMegaLayers + the LM head QuantTensor.

    Raises ValueError when shapes don't admit a uniform tile (caller keeps
    the phase megastep)."""
    from .quant_matmul import QuantTensor
    if not isinstance(head, QuantTensor) or head.qtype != qtype:
        raise ValueError("flat megastep needs a QuantTensor LM head of the "
                         "layer qtype")
    if n_heads // n_kv > 8 or n_heads % n_kv:
        raise ValueError("flat megastep assumes GQA group size <= 8")
    L = mega.qkv_codes.shape[0]
    hidden = mega.qkv_scales.shape[1] * QK
    kvn = mega.qkv_codes.shape[2]
    ffn = mega.gate_codes.shape[2]
    kk, tn = pick_tiles(hidden, kvn, ffn)
    if not kk or not tn or kk % 64:
        raise ValueError(f"no uniform tile for H={hidden} KVN={kvn} F={ffn}")
    pack = qtype == quants.GGML_TYPE_Q4_0
    vocab_pad = -(-vocab // tn) * tn

    @jax.jit
    def build(mega, head_c, head_s):
        parts_c, parts_s = [], []
        for c, s in ((mega.qkv_codes, mega.qkv_scales),
                     (mega.o_codes, mega.o_scales),
                     (mega.gate_codes, mega.gate_scales),
                     (mega.up_codes, mega.up_scales),
                     (mega.down_codes, mega.down_scales)):
            tc, ts = _layer_tiles(c, s.astype(jnp.float32), kk, tn, pack)
            parts_c.append(tc)
            parts_s.append(ts)
        lc = jnp.concatenate(parts_c, axis=1)
        ls = jnp.concatenate(parts_s, axis=1)
        lc = lc.reshape(-1, lc.shape[-2], tn)
        ls = ls.reshape(-1, ls.shape[-2], tn)
        npad = vocab_pad - head_c.shape[-1]
        hc = jnp.pad(head_c, ((0, 0), (0, npad)))
        hs = jnp.pad(head_s, ((0, 0), (0, npad)))
        tc, ts = _layer_tiles(hc[None], hs[None].astype(jnp.float32),
                              kk, tn, pack)
        codes = jnp.concatenate([lc, tc[0]], axis=0)
        scales = jnp.concatenate([ls, ts[0]], axis=0)
        nm = jnp.stack([mega.norms[:, 0], mega.norms[:, 1]], axis=1)
        return codes, scales, nm.astype(jnp.float32)

    codes, scales, nm = build(mega, head.codes_t, head.scales_t)
    meta = jnp.asarray(build_schedule(L, hidden, kvn, ffn, vocab_pad,
                                      kk, tn))
    assert meta.shape[1] - 2 * L == codes.shape[0], \
        (meta.shape, codes.shape)
    onm = jnp.asarray(out_norm, jnp.float32).reshape(1, hidden)
    return LlamaFlatMega(codes, scales, meta, nm, onm,
                         vocab_pad=vocab_pad, ffn=ffn)


def _flat_kernel(meta_ref, pos_ref, x_ref, inv_ref, c_ref, s_ref, nm_ref,
                 onm_ref, kc_ref, vc_ref, lg_ref, ko_ref, vo_ref,
                 x_scr, h_scr, qkv_scr, attn_scr, p_scr, cv_scr, up_scr,
                 gate_scr, *, n_heads, n_kv, hidden, head_d, bias, kk, tn,
                 ffn):
    t = pl.program_id(0)
    role = meta_ref[M_ROLE, t]
    kidx = meta_ref[M_K0, t]
    k0 = kidx * kk
    n0 = meta_ref[M_N0, t] * tn
    pos = pos_ref[0]
    g = n_heads // n_kv
    scale = 1.0 / np.sqrt(head_d)
    kvh = n_kv * head_d

    @pl.when(t == 0)
    def _():
        x_scr[:] = x_ref[:]

    def tile_dot(src_ref, src_off):
        return _dqdot(src_ref[:, pl.ds(src_off, kk)], c_ref[0], s_ref[0],
                      bias)

    def accum(dst_ref, part, first):
        prev = dst_ref[:, pl.ds(n0, tn)]
        dst_ref[:, pl.ds(n0, tn)] = jnp.where(first, part, part + prev)

    @pl.when(role == R_QKV)
    def _():
        @pl.when((kidx == 0) & (n0 == 0))
        def _():
            h_scr[:] = _rms(x_scr[:], nm_ref[0, 0:1])
        accum(qkv_scr, tile_dot(h_scr, k0), kidx == 0)

    # Attention keeps every vector (8, lanes)-shaped with REPLICATED rows
    # (Mosaic rejects (1, x) -> (8, x) sublane broadcasts of computed
    # values): per-head rows are built with row-iota selects and collapsed
    # back to replicated rows by tiny (8,8)x(8,d) selector dots on the MXU.
    @pl.when(role == R_ATTK)
    def _():
        ang = pos.astype(jnp.float32) * inv_ref[0:1]            # (1, d/2)
        cos = jnp.broadcast_to(jnp.cos(ang), (8, head_d // 2))
        sin = jnp.broadcast_to(jnp.sin(ang), (8, head_d // 2))

        def rope8(off):
            x1 = qkv_scr[:, off:off + head_d // 2]
            x2 = qkv_scr[:, off + head_d // 2:off + head_d]
            return jnp.concatenate([x1 * cos - x2 * sin,
                                    x2 * cos + x1 * sin], axis=1)   # (8, d)

        k_row = jnp.concatenate(
            [rope8(hidden + h * head_d) for h in range(n_kv)], axis=1)
        v_row = qkv_scr[:, hidden + kvh:hidden + 2 * kvh]       # (8, KV)
        ko_ref[0] = k_row
        vo_ref[0] = v_row
        ctx = kc_ref.shape[2]
        iota = jax.lax.broadcasted_iota(jnp.int32, (8, ctx), 1)
        mask = iota < pos
        riota = jax.lax.broadcasted_iota(jnp.int32, (8, head_d), 0)
        for h in range(n_kv):
            # q8 row i = query head h*g+i (replicated-row sources selected
            # per row; rows >= g repeat head h*g and are ignored)
            q8 = rope8((h * g + g - 1) * head_d)
            for i in range(g - 2, -1, -1):
                q8 = jnp.where(riota == i, rope8((h * g + i) * head_d), q8)
            q8 = q8 * scale
            kh = kc_ref[0, h].astype(jnp.float32)               # (ctx, d)
            s = jax.lax.dot_general(
                q8, kh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)             # (8, ctx)
            s = jnp.where(mask, s, -jnp.inf)
            kcur = k_row[:, h * head_d:(h + 1) * head_d]        # (8, d)
            s_cur = jnp.sum(q8 * kcur, axis=1, keepdims=True)   # (8, 1)
            m = jnp.maximum(jnp.max(s, axis=1, keepdims=True), s_cur)
            p = jnp.exp(s - m)
            pc = jnp.exp(s_cur - m)
            denom = jnp.sum(p, axis=1, keepdims=True) + pc
            p_scr[h * 8:(h + 1) * 8, :] = p / denom
            vcur = v_row[:, h * head_d:(h + 1) * head_d]        # (8, d)
            cv_scr[h * 8:(h + 1) * 8, :] = (pc / denom) * vcur

    @pl.when(role == R_ATTV)
    def _():
        ciota = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 1)
        outs = []
        for h in range(n_kv):
            vh = vc_ref[0, h].astype(jnp.float32)               # (ctx, d)
            av = jax.lax.dot_general(
                p_scr[h * 8:(h + 1) * 8, :], vh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)             # (8, d)
            av = av + cv_scr[h * 8:(h + 1) * 8]
            for i in range(g):
                # replicate row i across all 8 rows via a selector dot
                sel = (ciota == i).astype(jnp.float32)          # (8, 8)
                outs.append(jax.lax.dot_general(
                    sel, av, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
        attn_scr[:] = jnp.concatenate(outs, axis=1)             # (8, H)

    @pl.when(role == R_O)
    def _():
        part = tile_dot(attn_scr, k0)
        x_scr[:, pl.ds(n0, tn)] = x_scr[:, pl.ds(n0, tn)] + part

    @pl.when(role == R_GATE)
    def _():
        @pl.when((kidx == 0) & (n0 == 0))
        def _():
            h_scr[:] = _rms(x_scr[:], nm_ref[0, 1:2])
        accum(gate_scr, tile_dot(h_scr, k0), kidx == 0)

    @pl.when(role == R_UP)
    def _():
        part = tile_dot(h_scr, k0)
        prev = up_scr[:, pl.ds(n0, tn)]
        tot = jnp.where(kidx == 0, part, part + prev)
        up_scr[:, pl.ds(n0, tn)] = tot

        @pl.when(kidx == hidden // kk - 1)
        def _():
            gv = gate_scr[:, pl.ds(n0, tn)]
            gate_scr[:, pl.ds(n0, tn)] = jax.nn.silu(gv) * tot

    @pl.when(role == R_DOWN)
    def _():
        part = tile_dot(gate_scr, k0)
        x_scr[:, pl.ds(n0, tn)] = x_scr[:, pl.ds(n0, tn)] + part

    @pl.when(role == R_HEAD)
    def _():
        @pl.when((kidx == 0) & (n0 == 0))
        def _():
            h_scr[:] = _rms(x_scr[:], onm_ref[0:1])
        part = tile_dot(h_scr, k0)
        lg_ref[:] = jnp.where(kidx == 0, part, part + lg_ref[:])


@functools.partial(jax.jit, static_argnames=("qtype", "n_heads", "n_kv",
                                             "rope_base", "interpret"))
def llama_flat_megastep(flat: LlamaFlatMega, x, kv_k, kv_v, pos, *,
                        qtype: int, n_heads: int, n_kv: int,
                        rope_base: float, rope_freq_factors=None,
                        interpret: bool = False):
    """x (1, H) f32; kv_k/kv_v (L, n_kv, CTX, D); pos = cache row to attend
    up to (history rows [0, pos)); the current token's K/V fold analytically
    and are returned for the caller to write at `pos`.

    Returns (logits (1, vocab_pad) f32 — caller slices the real vocab,
    k_new (L, KV), v_new (L, KV)). Runs the Pallas kernel on TPU and the
    same kernel in interpret mode elsewhere (tests); production CPU paths
    keep the phase megastep instead.
    """
    from .attention import rope_freqs
    vocab_pad, ffn = flat.vocab_pad, flat.ffn
    L = flat.norms.shape[0]
    hidden = flat.norms.shape[2]
    T = flat.meta.shape[1]
    tn = flat.codes.shape[2]
    kkq = flat.scales.shape[1] * QK
    head_d = hidden // n_heads
    kvh = n_kv * head_d
    kvn_dim = hidden + 2 * kvh
    ctx = kv_k.shape[2]
    inv = rope_freqs(head_d, rope_base, rope_freq_factors).reshape(1, -1)
    x8 = jnp.broadcast_to(x.astype(jnp.float32), (8, hidden))
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    def cmap(t, m, p):
        return (m[M_SID, t], 0, 0)

    def nmmap(t, m, p):
        return (m[M_LAYER, t], 0, 0)

    def kmap(t, m, p):
        return (m[M_KL, t], 0, 0, 0)

    def vmap_(t, m, p):
        return (m[M_VL, t], 0, 0, 0)

    def lgmap(t, m, p):
        return (0, m[M_OUTN, t])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((8, hidden), lambda t, m, p: (0, 0)),
            pl.BlockSpec((1, head_d // 2), lambda t, m, p: (0, 0)),
            pl.BlockSpec((1, flat.codes.shape[1], tn), cmap),
            pl.BlockSpec((1, flat.scales.shape[1], tn), cmap),
            pl.BlockSpec((1, 2, hidden), nmmap),
            pl.BlockSpec((1, hidden), lambda t, m, p: (0, 0)),
            pl.BlockSpec((1, n_kv, ctx, head_d), kmap),
            pl.BlockSpec((1, n_kv, ctx, head_d), vmap_),
        ],
        out_specs=[
            pl.BlockSpec((8, tn), lgmap),
            pl.BlockSpec((1, 8, kvh), nmmap),
            pl.BlockSpec((1, 8, kvh), nmmap),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, hidden), jnp.float32),       # x residual
            pltpu.VMEM((8, hidden), jnp.float32),       # h (rms'd input)
            pltpu.VMEM((8, kvn_dim), jnp.float32),      # qkv accumulator
            pltpu.VMEM((8, hidden), jnp.float32),       # attention out
            pltpu.VMEM((8 * n_kv, ctx), jnp.float32),   # p / denom
            pltpu.VMEM((8 * n_kv, head_d), jnp.float32),  # current-tok av
            pltpu.VMEM((8, ffn), jnp.float32),          # up accumulator
            pltpu.VMEM((8, ffn), jnp.float32),          # gate -> activation
        ],
    )
    logits, k_new, v_new = pl.pallas_call(
        functools.partial(_flat_kernel, n_heads=n_heads, n_kv=n_kv,
                          hidden=hidden, head_d=head_d, bias=_BIAS[qtype],
                          kk=kkq, tn=tn, ffn=ffn),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, vocab_pad), jnp.float32),
            jax.ShapeDtypeStruct((L, 8, kvh), jnp.float32),
            jax.ShapeDtypeStruct((L, 8, kvh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(flat.meta, pos_arr, x8, inv, flat.codes, flat.scales, flat.norms,
      flat.out_norm, kv_k, kv_v)
    return logits[:1], k_new[:, 0, :], v_new[:, 0, :]
