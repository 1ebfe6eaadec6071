"""Flat-tile llama decode megastep: the whole Orpheus decode step — all L
layers (qkv, GQA attention, o, SiLU MLP) PLUS the 272 MB LM head — as ONE
Pallas kernel whose grid is a flat stream of uniform weight tiles.

Why flat: the round-4 (L, phases) megakernel streams weights at only
~355 GB/s because its phases are few huge blocks (the double-buffered DMA
of the next 19-25 MB phase cannot hide behind unbalanced compute), while
a fine-tile pipeline reaches the chip's practical streaming rate
(tools/probe_flat_stream.py: 478-530 GB/s on v5e for the full 1.86 GB
Orpheus set, attention bubbles ~1%, dynamic index maps free). Measured
end state: 4.04-4.09 ms/step vs the phase kernel's 6.0.

Design points:
  * DEFAULT mode "fullk": two streams of whole-K column tiles — stream A
    (K = hidden: qkv/o/gate/up/LM-head n-tiles) and stream B (K = ffn:
    the down projection), whose schedule index advances early so its
    4 MB tiles prefetch under the gate/up phases. Whole-K tiles keep the
    grid at ~1000 phases (k-sliced tiling measured slower purely from
    per-phase overhead at ~3350 phases) and make every phase emit its
    full output slice — no cross-phase accumulation. Q4 codes are
    nibble-packed (pack_codes_t blocks), scales bf16. The k-sliced
    ("whole") and K-split ("split") tilings remain selectable; K-split's
    +8% DMA concurrency loses to its doubled dequant-dot count;
  * all tiles across all layers and the LM head concatenate in stream
    order; a prefetched (8, T) metadata array gives each grid step its
    role, tile indices per stream, and drives the dynamic BlockSpec
    index maps;
  * attention is PAGED flash attention inside the stream: the KV cache
    is read in (psz)-row pages, one phase per page, with the page index
    map clamped at (pos-1)//psz so pages beyond the live context cost
    neither DMA nor compute (dynamic skipping on a static grid). The
    current token's K/V initialize the flash state (m = s_cur, l = 1,
    acc = v_cur), so no separate softmax fold is needed;
  * the LM head rides the same stream as its own tiles with logits as a
    tiled output — the separate head matvec dispatch disappears;
  * BATCHED variant (llama_flat_megastep_batched): the 8 f32 sublane rows
    the single-stream kernel spends on replicas carry B DISTINCT slots
    instead, so every weight phase is unchanged and the whole stream —
    LM head included — is read once for all slots. Only RoPE (per-slot
    positions), the KV page blocks ((B, n_kv, psz, d) per page), and the
    page masks become per-slot. Measured (v5e): 5.0-5.4 ms/step at B=8
    (vs 4.0 single-stream — the KV pages are the only per-slot DMA);
    dead pages in an oversized schedule are ~free (ctx 512 vs 2304 at
    pos 64: 5.38 vs 5.46), live pages cost ~0.33 ms each at B=8, so
    long generations approach 8 ms/step at pos ~2000.

Replaces the reference's per-matmul graph walk for Orpheus
(/root/reference/src/models/orpheus/model.cpp:389-405), subsumes the
separate LM-head matvec (model.cpp:398), and replaces full-model-replica
scaling (examples/server/server.cpp:885-897) with true in-kernel
batching.
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
R_QKV, R_O, R_GATE, R_UP, R_DOWN, R_HEAD, R_ATTP, R_ATTF = range(8)
# meta rows
(M_ROLE, M_SID, M_LAYER, M_K0, M_N0, M_OUTN, M_SID2, M_PG) = range(8)
N_META = 8


def _rms(x, w, eps=1e-5):
    ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(ms + eps) * w


class LlamaFlatMega:
    """Stream-ordered half-tiles + schedule for the flat megastep.

    fullk (default): codes0/scales0 = stream A's whole-K tiles
    (K = hidden; packed Q4 rows kk//2), codes1/scales1 = stream B's
    (down, K = ffn); split: K-split halves of k-sliced tiles; whole:
    single-stream k-sliced tiles with dummy codes1. meta (8, T) int32;
    norms (L, 2, H) f32; out_norm (1, H) f32. Registered as a pytree
    with (vocab_pad, ffn, psz, kk, split, fullk) as STATIC aux data so
    it rides the same `mega=` argument as LlamaMegaLayers through jit.
    """

    def __init__(self, codes0, scales0, codes1, scales1, meta, norms,
                 out_norm, *, vocab_pad: int, ffn: int, psz: int, kk: int,
                 split: bool = True, fullk: bool = False):
        self.codes0 = codes0
        self.scales0 = scales0
        self.codes1 = codes1
        self.scales1 = scales1
        self.meta = meta
        self.norms = norms
        self.out_norm = out_norm
        self.vocab_pad = vocab_pad
        self.ffn = ffn
        self.psz = psz
        self.kk = kk
        self.split = split
        self.fullk = fullk

    def tree_flatten(self):
        return ((self.codes0, self.scales0, self.codes1, self.scales1,
                 self.meta, self.norms, self.out_norm),
                (self.vocab_pad, self.ffn, self.psz, self.kk, self.split,
                 self.fullk))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, vocab_pad=aux[0], ffn=aux[1], psz=aux[2],
                   kk=aux[3], split=aux[4], fullk=aux[5])


jax.tree_util.register_pytree_node(
    LlamaFlatMega, lambda m: m.tree_flatten(),
    LlamaFlatMega.tree_unflatten)


def pick_tiles(hidden: int, kvn: int, ffn: int) -> tuple[int, int]:
    """Largest (kk, tn) <= 1024 dividing every K / N the stream touches."""
    kk = next((v for v in (1024, 512, 256, 128)
               if hidden % v == 0 and ffn % v == 0), 0)
    tn = next((v for v in (1024, 512, 256, 128)
               if kvn % v == 0 and hidden % v == 0 and ffn % v == 0), 0)
    return kk, tn


def pick_page(ctx: int) -> int:
    return next((v for v in (512, 256, 128) if ctx % v == 0), ctx)


@functools.lru_cache(maxsize=8)
def build_schedule(L: int, hidden: int, kvn: int, ffn: int, vocab_pad: int,
                   kk: int, tn: int, n_pages: int) -> np.ndarray:
    """(8, T) int32 stream schedule (see module header).

    M_PG holds the KV page the kc/vc index maps should sit on: 0 through
    the qkv tiles (page-0 prefetch rides under the qkv stream), the page
    number during R_ATTP phases, and n_pages-1 afterwards (clamped by the
    map at the live context so dead pages are never fetched)."""
    rows = []
    sid = 0

    def mat(role, layer, K, N, pg):
        nonlocal sid
        for n in range(N // tn):
            for k in range(K // kk):
                rows.append([role, sid, layer, k, n, 0, layer, pg])
                sid += 1

    last = n_pages - 1
    for l in range(L):
        mat(R_QKV, l, hidden, kvn, 0)
        # attention phases carry the NEXT tile's sid so the o-proj tile 0
        # DMA is issued entering the attention region and rides under it
        for p in range(n_pages):
            rows.append([R_ATTP, sid, l, p, 0, 0, l, p])
        rows.append([R_ATTF, sid, l, 0, 0, 0, l, last])
        mat(R_O, l, hidden, hidden, last)
        mat(R_GATE, l, hidden, ffn, last)
        mat(R_UP, l, hidden, ffn, last)
        mat(R_DOWN, l, ffn, hidden, last)
    for n in range(vocab_pad // tn):
        for k in range(hidden // kk):
            rows.append([R_HEAD, sid, L - 1, k, n, n, L - 1, last])
            sid += 1
    return np.asarray(rows, np.int32).T.copy()


@functools.lru_cache(maxsize=8)
def build_fullk_schedule(L: int, hidden: int, kvn: int, ffn: int,
                         vocab_pad: int, tn: int,
                         n_pages: int) -> np.ndarray:
    """Full-K column-tile schedule: stream A (M_SID) carries whole-K tiles
    of qkv/o/gate/up/head (K = hidden); stream B (M_SID2) carries the
    down projection's whole-K tiles (K = ffn). Outside their windows each
    stream's index points at its NEXT tile so the DMA issues early and
    rides under the other stream's phases (~1000 grid steps for Orpheus
    vs ~3350 k-sliced — per-phase overhead was the residual cost)."""
    rows = []
    sid = [0]
    sid2 = [0]

    def mat(role, layer, N, pg, stream_b=False):
        for n in range(N // tn):
            rows.append([role, sid[0], layer, 0, n, 0, sid2[0], pg])
            if stream_b:
                sid2[0] += 1
            else:
                sid[0] += 1

    last = n_pages - 1
    for l in range(L):
        mat(R_QKV, l, kvn, 0)
        for p in range(n_pages):
            rows.append([R_ATTP, sid[0], l, p, 0, 0, sid2[0], p])
        rows.append([R_ATTF, sid[0], l, 0, 0, 0, sid2[0], last])
        mat(R_O, l, hidden, last)
        mat(R_GATE, l, ffn, last)
        mat(R_UP, l, ffn, last)
        mat(R_DOWN, l, hidden, last, stream_b=True)
    for n in range(vocab_pad // tn):
        rows.append([R_HEAD, sid[0], L - 1, 0, n, n, sid2[0] - 1, last])
        sid[0] += 1
    m = np.asarray(rows, np.int32).T.copy()
    # clamp stream-B index after its final tile (no tile left to prefetch)
    m[M_SID2] = np.minimum(m[M_SID2], sid2[0] - 1)
    return m


def _layer_tiles(codes_t, scales_t, kk: int, tn: int, pack: bool):
    """(L, Kp, N) codes + (L, K//QK, N) scales -> K-split stream tiles
    ((L, nt, kr, tn) x2, (L, nt, kk//2//QK, tn) x2), n-outer k-inner."""
    from .quant_matmul import unpack_codes_t
    L = codes_t.shape[0]
    k = scales_t.shape[1] * QK
    n = codes_t.shape[2]
    c = codes_t
    if c.shape[1] != k:  # globally packed (PACK_BLOCK) -> logical rows
        c = unpack_codes_t(c, k).astype(jnp.int8)
    nk, nn = k // kk, n // tn
    c = c.reshape(L, nk, kk, nn, tn).transpose(0, 3, 1, 2, 4)
    h = kk // 2

    def half(x):
        if pack:
            lo = x[..., : h // 2, :].astype(jnp.uint8)
            hi = x[..., h // 2:, :].astype(jnp.uint8)
            x = jax.lax.bitcast_convert_type((hi << 4) | lo, jnp.int8)
        return x.reshape(L, nn * nk, x.shape[-2], tn)

    c0 = half(c[..., :h, :])
    c1 = half(c[..., h:, :])
    s = scales_t.reshape(L, nk, kk // QK, nn, tn).transpose(0, 3, 1, 2, 4)
    s = s.astype(jnp.bfloat16)
    s0 = s[..., : h // QK, :].reshape(L, nn * nk, h // QK, tn)
    s1 = s[..., h // QK:, :].reshape(L, nn * nk, h // QK, tn)
    return c0, s0, c1, s1


def _layer_tiles_whole(codes_t, scales_t, kk: int, tn: int, pack: bool):
    """Whole (kk x tn) tiles, single stream (no K-split): (L, nt, kr, tn)
    codes + (L, nt, kk//QK, tn) bf16 scales, n-outer k-inner order.
    Packing follows pack_codes_t (PACK_BLOCK half-split blocks) so
    _dqdot's packed loop stays consistent for kk > PACK_BLOCK."""
    from .quant_matmul import pack_codes_t, unpack_codes_t
    L = codes_t.shape[0]
    k = scales_t.shape[1] * QK
    n = codes_t.shape[2]
    c = codes_t
    if c.shape[1] != k:
        c = unpack_codes_t(c, k).astype(jnp.int8)
    nk, nn = k // kk, n // tn
    c = c.reshape(L, nk, kk, nn, tn).transpose(0, 3, 1, 2, 4)
    if pack:
        c = pack_codes_t(c)
    c = c.reshape(L, nn * nk, c.shape[-2], tn)
    s = scales_t.reshape(L, nk, kk // QK, nn, tn).transpose(0, 3, 1, 2, 4)
    s = s.reshape(L, nn * nk, kk // QK, tn).astype(jnp.bfloat16)
    return c, s


def prep_llama_flat(mega, head, out_norm, qtype: int, vocab: int,
                    n_heads: int, n_kv: int, ctx: int,
                    mode: str = "fullk",
                    page: int | None = None) -> LlamaFlatMega:
    """Build the flat stream from LlamaMegaLayers + the LM head QuantTensor.

    `ctx` is the KV-cache context length the decode will run with (pages
    are baked into the schedule); `page` overrides the flash page size
    (the batched kernel prefers 256-row pages: its page blocks carry all
    B slots, so a 512-row page's (B, n_kv, 512, d) block + the
    (B*nh, B*nkv*512) score intermediate would crowd VMEM). Raises
    ValueError when shapes don't admit a uniform tile (caller keeps the
    phase megastep)."""
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
    if not kk or not tn or kk % 128:
        raise ValueError(f"no uniform tile for H={hidden} KVN={kvn} F={ffn}")
    pack = qtype == quants.GGML_TYPE_Q4_0
    vocab_pad = -(-vocab // tn) * tn
    psz = page if page is not None else pick_page(ctx)
    if ctx % psz:
        raise ValueError(f"ctx {ctx} not a multiple of page {psz}")
    if mode == "fullk":
        from .quant_matmul import can_pack
        if pack and not (can_pack(hidden) and can_pack(ffn)):
            raise ValueError("fullk needs pack-aligned K dims")

        @jax.jit
        def build_fk(mega, head_c, head_s):
            parts = [[], []]
            for c, s in ((mega.qkv_codes, mega.qkv_scales),
                         (mega.o_codes, mega.o_scales),
                         (mega.gate_codes, mega.gate_scales),
                         (mega.up_codes, mega.up_scales)):
                for i, t in enumerate(_layer_tiles_whole(
                        c, s.astype(jnp.float32), hidden, tn, pack)):
                    parts[i].append(t)
            lt = [jnp.concatenate(p, axis=1) for p in parts]
            lt = [a.reshape(-1, a.shape[-2], tn) for a in lt]
            npad = vocab_pad - head_c.shape[-1]
            hc = jnp.pad(head_c, ((0, 0), (0, npad)))
            hs = jnp.pad(head_s, ((0, 0), (0, npad)))
            ht = _layer_tiles_whole(hc[None], hs[None].astype(jnp.float32),
                                    hidden, tn, pack)
            c0 = jnp.concatenate([lt[0], ht[0][0]], axis=0)
            s0 = jnp.concatenate([lt[1], ht[1][0]], axis=0)
            dt_ = _layer_tiles_whole(mega.down_codes,
                                     mega.down_scales.astype(jnp.float32),
                                     ffn, tn, pack)
            c1 = dt_[0].reshape(-1, dt_[0].shape[-2], tn)
            s1 = dt_[1].reshape(-1, dt_[1].shape[-2], tn)
            return c0, s0, c1, s1, mega.norms.astype(jnp.float32)

        c0, s0, c1, s1, nm = build_fk(mega, head.codes_t, head.scales_t)
        meta = jnp.asarray(build_fullk_schedule(
            L, hidden, kvn, ffn, vocab_pad, tn, ctx // psz))
        na = int(((meta[M_ROLE] < R_ATTP) & (meta[M_ROLE] != R_DOWN)).sum())
        nb = int((meta[M_ROLE] == R_DOWN).sum())
        assert na == c0.shape[0] and nb == c1.shape[0], \
            (na, nb, c0.shape, c1.shape)
        onm = jnp.asarray(out_norm, jnp.float32).reshape(1, hidden)
        return LlamaFlatMega(c0, s0, c1, s1, meta, nm, onm,
                             vocab_pad=vocab_pad, ffn=ffn, psz=psz,
                             kk=hidden, split=False, fullk=True)

    split = mode == "split"

    @jax.jit
    def build(mega, head_c, head_s):
        tiler = _layer_tiles if split else _layer_tiles_whole
        nparts = 4 if split else 2
        parts = [[] for _ in range(nparts)]
        for c, s in ((mega.qkv_codes, mega.qkv_scales),
                     (mega.o_codes, mega.o_scales),
                     (mega.gate_codes, mega.gate_scales),
                     (mega.up_codes, mega.up_scales),
                     (mega.down_codes, mega.down_scales)):
            for i, t in enumerate(tiler(c, s.astype(jnp.float32),
                                        kk, tn, pack)):
                parts[i].append(t)
        lt = [jnp.concatenate(p, axis=1) for p in parts]
        lt = [a.reshape(-1, a.shape[-2], tn) for a in lt]
        npad = vocab_pad - head_c.shape[-1]
        hc = jnp.pad(head_c, ((0, 0), (0, npad)))
        hs = jnp.pad(head_s, ((0, 0), (0, npad)))
        ht = tiler(hc[None], hs[None].astype(jnp.float32), kk, tn, pack)
        outs = [jnp.concatenate([a, b[0]], axis=0) for a, b in zip(lt, ht)]
        if not split:
            outs = list(outs) + [jnp.zeros((1, 1, tn), jnp.int8),
                                 jnp.zeros((1, 1, tn), jnp.bfloat16)]
        return (*outs, mega.norms.astype(jnp.float32))

    c0, s0, c1, s1, nm = build(mega, head.codes_t, head.scales_t)
    meta = jnp.asarray(build_schedule(L, hidden, kvn, ffn, vocab_pad,
                                      kk, tn, ctx // psz))
    n_weight = int((meta[M_ROLE] < R_ATTP).sum())
    assert n_weight == c0.shape[0], (n_weight, c0.shape)
    onm = jnp.asarray(out_norm, jnp.float32).reshape(1, hidden)
    return LlamaFlatMega(c0, s0, c1, s1, meta, nm, onm,
                         vocab_pad=vocab_pad, ffn=ffn, psz=psz, kk=kk,
                         split=split)


def _flat_kernel(meta_ref, pos_ref, x_ref, inv_ref, pos_b_ref, posr_ref,
                 c0_ref, s0_ref, c1_ref,
                 s1_ref, nm_ref, onm_ref, kc_ref, vc_ref, lg_ref, ko_ref,
                 vo_ref, x_scr, h_scr, qkv_scr, attn_scr, q_scr, m_scr,
                 l_scr, acc_scr, up_scr, gate_scr, *, n_heads, n_kv, hidden,
                 head_d, bias, kk, tn, ffn, psz, split, fullk, nb, batched):
    # nb = sublane rows: 8 replicas of one activation (single-stream) or
    # nb DISTINCT batch slots (batched); pos_ref[0] = max live position
    # (page skip / index-map clamp), pos_b_ref (nb, 1) per-row positions
    # (RoPE), posr_ref (rows, 1) per-attention-row positions (page masks).
    t = pl.program_id(0)
    role = meta_ref[M_ROLE, t]
    kidx = meta_ref[M_K0, t]
    k0 = kidx * kk
    n0 = meta_ref[M_N0, t] * tn
    pos = pos_ref[0]
    g = n_heads // n_kv
    scale = 1.0 / np.sqrt(head_d)
    kvh = n_kv * head_d
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

    def down_dot():
        # fullk: the down projection streams whole-K (ffn) tiles on its
        # own array (stream B, index M_SID2)
        if fullk:
            return _dqdot(gate_scr[:], c1_ref[0], s1_ref[0], bias)
        return tile_dot(gate_scr, k0)

    def accum(dst_ref, part, first):
        prev = dst_ref[:, pl.ds(n0, tn)]
        dst_ref[:, pl.ds(n0, tn)] = jnp.where(first, part, part + prev)

    @pl.when(role == R_QKV)
    def _():
        @pl.when((kidx == 0) & (n0 == 0))
        def _():
            h_scr[:] = _rms(x_scr[:], nm_ref[0, 0:1])
        accum(qkv_scr, tile_dot(h_scr, k0), kidx == 0)

    # Paged flash attention, vectorized over ALL kv heads per phase:
    # per-head state rides the sublane dim ((8*n_kv, d) scratches) and
    # every page folds with ONE masked (8*n_kv, n_kv*psz) score dot + ONE
    # AV dot — the per-head-loop formulation's ~100 small ops/page
    # serialized the stream (~1.1 ms/step of exposed bubbles at 28
    # layers). Everything stays (8k, lanes)-shaped (Mosaic rejects
    # (1, x) -> (8, x) sublane broadcasts of computed values); RoPE is
    # applied full-width with two lane-rolls instead of per-head slices.
    @pl.when(role == R_ATTP)
    def _():
        @pl.when(kidx == 0)
        def _():
            # rope the current token, emit its K/V rows, and initialize
            # the flash state from it: m = s_cur, l = 1, acc = v_cur.
            # Per-row positions (identical rows single-stream, per-slot
            # when batched) arrive as their own (nb, 1) input.
            ang = pos_b_ref[:].astype(jnp.float32) * inv_ref[0:1]
            cos = jnp.cos(ang)                                  # (nb, d/2)
            sin = jnp.sin(ang)
            cosd = jnp.concatenate([cos, cos], axis=1)          # (nb, d)
            sind = jnp.concatenate([sin, sin], axis=1)
            h2d = head_d // 2

            def rope_full(y, nh):
                # NeoX rotation on (8, nh*d) in 5 wide ops: out_lo =
                # x1*cos - x2*sin, out_hi = x2*cos + x1*sin via lane rolls
                cw = jnp.concatenate([cosd] * nh, axis=1)
                sw = jnp.concatenate([sind] * nh, axis=1)
                # circular rolls (shift must be non-negative)
                rn = pltpu.roll(y, y.shape[1] - h2d, 1)  # rn[i] = y[i+d/2]
                rp = pltpu.roll(y, h2d, 1)               # rp[i] = y[i-d/2]
                li = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
                first = (li % head_d) < h2d
                return y * cw + jnp.where(first, -rn, rp) * sw

            qrow = rope_full(qkv_scr[:, :hidden], n_heads)      # (8, H)
            k_row = rope_full(qkv_scr[:, hidden:hidden + kvh], n_kv)
            v_row = qkv_scr[:, hidden + kvh:hidden + 2 * kvh]   # (8, KV)
            ko_ref[0] = k_row
            vo_ref[0] = v_row
            if head_d % 128 == 0:
                # reshape-128 path (measured: 128-lane splits/merges are
                # the ONLY cheap layout moves; 4D transposes run at
                # ~0.15 GB/s and per-head loops serialize): rows become
                # (replica/slot r, query head h) r-major via one free
                # reshape
                q4 = (qrow * scale).reshape(nb * n_heads, head_d)
                krep = jnp.concatenate(
                    [k_row[:, j * head_d:(j + 1) * head_d]
                     for j in range(n_kv) for _ in range(g)], axis=1)
                vrep = jnp.concatenate(
                    [v_row[:, j * head_d:(j + 1) * head_d]
                     for j in range(n_kv) for _ in range(g)], axis=1)
                k4 = krep.reshape(nb * n_heads, head_d)
                v4 = vrep.reshape(nb * n_heads, head_d)
                q_scr[:] = q4
                s_cur = jnp.sum(q4 * k4, axis=1, keepdims=True)
                m_scr[:] = jnp.broadcast_to(s_cur, (nb * n_heads, head_d))
                l_scr[:] = jnp.ones((nb * n_heads, head_d), jnp.float32)
                acc_scr[:] = v4
            else:
                riota = jax.lax.broadcasted_iota(jnp.int32, (8, head_d), 0)
                for h in range(n_kv):
                    q8 = qrow[:, (h * g + g - 1) * head_d:
                              (h * g + g) * head_d]
                    for i in range(g - 2, -1, -1):
                        q8 = jnp.where(
                            riota == i,
                            qrow[:, (h * g + i) * head_d:
                                 (h * g + i + 1) * head_d], q8)
                    q8 = q8 * scale
                    q_scr[h * 8:(h + 1) * 8, :] = q8
                    kcur = k_row[:, h * head_d:(h + 1) * head_d]
                    s_cur = jnp.sum(q8 * kcur, axis=1, keepdims=True)
                    m_scr[h * 8:(h + 1) * 8, :] = jnp.broadcast_to(
                        s_cur, (8, head_d))
                    l_scr[h * 8:(h + 1) * 8, :] = jnp.ones((8, head_d),
                                                           jnp.float32)
                    vcur = v_row[:, h * head_d:(h + 1) * head_d]
                    acc_scr[h * 8:(h + 1) * 8, :] = vcur

        @pl.when(kidx * psz < pos)
        def _():
            rows = q_scr.shape[0]
            if batched:
                # each slot reads its OWN KV pages: the page block carries
                # all nb slots' page kidx ((nb, n_kv, psz, d) r-major), the
                # mask pairs row-slot with col-slot, and dots run bf16 (the
                # TPU cache dtype) as in ops/llama_megastep's batched phase
                # kernel
                cols = nb * n_kv * psz
                q_all = q_scr[:].astype(jnp.bfloat16)
                k2 = kc_ref[:].reshape(cols, head_d).astype(jnp.bfloat16)
                v2 = vc_ref[:].reshape(cols, head_d).astype(jnp.bfloat16)
            else:
                cols = n_kv * psz
                q_all = q_scr[:]
                k2 = kc_ref[0].reshape(cols, head_d).astype(jnp.float32)
                v2 = vc_ref[0].reshape(cols, head_d).astype(jnp.float32)
            s = jax.lax.dot_general(
                q_all, k2, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)             # (rows, cols)
            ri = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
            if batched:
                valid = ((ri // n_heads) == (ci // (n_kv * psz))) & \
                    (((ri % n_heads) // g) == ((ci // psz) % n_kv)) & \
                    ((kidx * psz + (ci % psz)) < posr_ref[:])
            else:
                if head_d % 128 == 0:
                    row_kv = (ri % n_heads) // g  # r-major (replica, head)
                else:
                    row_kv = ri // 8              # h-major groups of 8
                valid = (row_kv == (ci // psz)) & \
                    ((kidx * psz + (ci % psz)) < posr_ref[:])
            s = jnp.where(valid, s, -jnp.inf)
            m_old = m_scr[:, 0:1]
            m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
            corr = jnp.exp(m_old - m_new)
            pe = jnp.exp(s - m_new)   # masked cols are exactly 0
            if batched:
                pe = pe.astype(jnp.bfloat16)
            av = jax.lax.dot_general(
                pe, v2, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_scr[:] = acc_scr[:] * corr + av
            l_scr[:] = l_scr[:] * corr + jnp.sum(
                pe.astype(jnp.float32), axis=1, keepdims=True)
            m_scr[:] = jnp.broadcast_to(m_new, (rows, head_d))

    @pl.when(role == R_ATTF)
    def _():
        if head_d % 128 == 0:
            attn_scr[:] = (acc_scr[:] / l_scr[:]).reshape(nb, hidden)
        else:
            ciota = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 1)
            outs = []
            for h in range(n_kv):
                av = acc_scr[h * 8:(h + 1) * 8, :] / \
                    l_scr[h * 8:(h + 1) * 8, :]
                for i in range(g):
                    # replicate row i across the 8 rows via a selector dot
                    sel = (ciota == i).astype(jnp.float32)      # (8, 8)
                    outs.append(jax.lax.dot_general(
                        sel, av, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
            attn_scr[:] = jnp.concatenate(outs, axis=1)         # (8, H)

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
        part = down_dot()
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
    up to (history rows [0, pos)); the current token's K/V fold into the
    flash init and are returned for the caller to write at `pos`.

    Returns (logits (1, vocab_pad) f32 — caller slices the real vocab,
    k_new (L, KV), v_new (L, KV)). Runs the Pallas kernel on TPU and the
    same kernel in interpret mode elsewhere (tests); production CPU paths
    keep the phase megastep instead.
    """
    from .attention import rope_freqs
    vocab_pad, ffn, psz = flat.vocab_pad, flat.ffn, flat.psz
    L = flat.norms.shape[0]
    hidden = flat.norms.shape[2]
    T = flat.meta.shape[1]
    tn = flat.codes0.shape[2]
    kkq = flat.kk
    head_d = hidden // n_heads
    kvh = n_kv * head_d
    kvn_dim = hidden + 2 * kvh
    ctx = kv_k.shape[2]
    assert ctx % psz == 0 and ctx // psz >= 1, (ctx, psz)
    # attention-state rows: r-major (8*n_heads) on the reshape-128 path,
    # h-major groups (8*n_kv) otherwise
    arow = 8 * n_heads if head_d % 128 == 0 else 8 * n_kv
    inv = rope_freqs(head_d, rope_base, rope_freq_factors).reshape(1, -1)
    x8 = jnp.broadcast_to(x.astype(jnp.float32), (8, hidden))
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    def cmap(t, m, p):
        return (m[M_SID, t], 0, 0)

    def c2map(t, m, p):
        return (m[M_SID2, t], 0, 0)

    def nmmap(t, m, p):
        return (m[M_LAYER, t], 0, 0)

    def kvmap(t, m, p):
        page = jnp.minimum(m[M_PG, t], jnp.maximum(p[0] - 1, 0) // psz)
        return (m[M_LAYER, t], 0, page, 0)

    def lgmap(t, m, p):
        return (0, m[M_OUTN, t])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((8, hidden), lambda t, m, p: (0, 0)),
            pl.BlockSpec((1, head_d // 2), lambda t, m, p: (0, 0)),
            pl.BlockSpec((8, 1), lambda t, m, p: (0, 0)),
            pl.BlockSpec((arow, 1), lambda t, m, p: (0, 0)),
            pl.BlockSpec((1, flat.codes0.shape[1], tn), cmap),
            pl.BlockSpec((1, flat.scales0.shape[1], tn), cmap),
            pl.BlockSpec((1, flat.codes1.shape[1], tn),
                         c2map if flat.fullk else cmap if flat.split else
                         (lambda t, m, p: (0, 0, 0))),
            pl.BlockSpec((1, flat.scales1.shape[1], tn),
                         c2map if flat.fullk else cmap if flat.split else
                         (lambda t, m, p: (0, 0, 0))),
            pl.BlockSpec((1, 2, hidden), nmmap),
            pl.BlockSpec((1, hidden), lambda t, m, p: (0, 0)),
            pl.BlockSpec((1, n_kv, psz, head_d), kvmap),
            pl.BlockSpec((1, n_kv, psz, head_d), kvmap),
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
            pltpu.VMEM((arow, head_d), jnp.float32),    # q rows
            pltpu.VMEM((arow, head_d), jnp.float32),    # flash m
            pltpu.VMEM((arow, head_d), jnp.float32),    # flash l
            pltpu.VMEM((arow, head_d), jnp.float32),    # flash acc
            pltpu.VMEM((8, ffn), jnp.float32),          # up accumulator
            pltpu.VMEM((8, ffn), jnp.float32),          # gate -> activation
        ],
    )
    pos_b = jnp.broadcast_to(pos_arr.reshape(1, 1), (8, 1))
    posr = jnp.broadcast_to(pos_arr.reshape(1, 1), (arow, 1))
    logits, k_new, v_new = pl.pallas_call(
        functools.partial(_flat_kernel, n_heads=n_heads, n_kv=n_kv,
                          hidden=hidden, head_d=head_d, bias=_BIAS[qtype],
                          kk=kkq, tn=tn, ffn=ffn, psz=psz,
                          split=flat.split, fullk=flat.fullk, nb=8,
                          batched=False),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, vocab_pad), jnp.float32),
            jax.ShapeDtypeStruct((L, 8, kvh), jnp.float32),
            jax.ShapeDtypeStruct((L, 8, kvh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(flat.meta, pos_arr, x8, inv, pos_b, posr, flat.codes0, flat.scales0,
      flat.codes1, flat.scales1, flat.norms, flat.out_norm, kv_k, kv_v)
    return logits[:1], k_new[:, 0, :], v_new[:, 0, :]


@functools.partial(jax.jit, static_argnames=("qtype", "n_heads", "n_kv",
                                             "rope_base", "interpret"))
def llama_flat_megastep_batched(flat: LlamaFlatMega, x, kv_k, kv_v, pos, *,
                                qtype: int, n_heads: int, n_kv: int,
                                rope_base: float, rope_freq_factors=None,
                                interpret: bool = False):
    """Batched flat megastep: B distinct slots ride the sublane rows the
    single-stream kernel spends on replicas, so the whole 1.86 GB/step
    weight stream — LM head included — is read ONCE for all B slots.

    x (B, H) f32 — one row per slot; kv_k/kv_v (L, B, n_kv, CTX, D); pos
    (B,) int32 per-slot cache rows. Returns (logits (B, vocab_pad) f32,
    k_new (L, B, KV), v_new (L, B, KV)); the caller writes each slot's
    cache row at pos[slot] and samples per slot. Weight phases are
    IDENTICAL to the single-stream kernel (same tiles, same schedule);
    only RoPE, the KV page blocks ((B, n_kv, psz, d) per page), and the
    page masks become per-slot. Requires B % 8 == 0 (f32 sublane rows)
    and head_d % 128 == 0 (the reshape-128 attention layout). Replaces
    the reference's full-model-replica scaling for Orpheus
    (/root/reference/examples/server/server.cpp:885-897)."""
    from .attention import rope_freqs
    b = x.shape[0]
    vocab_pad, ffn, psz = flat.vocab_pad, flat.ffn, flat.psz
    L = flat.norms.shape[0]
    hidden = flat.norms.shape[2]
    T = flat.meta.shape[1]
    tn = flat.codes0.shape[2]
    kkq = flat.kk
    head_d = hidden // n_heads
    kvh = n_kv * head_d
    kvn_dim = hidden + 2 * kvh
    ctx = kv_k.shape[3]
    assert b % 8 == 0 and head_d % 128 == 0, (b, head_d)
    assert ctx % psz == 0 and ctx // psz >= 1, (ctx, psz)
    arow = b * n_heads
    inv = rope_freqs(head_d, rope_base, rope_freq_factors).reshape(1, -1)
    pos = jnp.asarray(pos, jnp.int32)
    pos_arr = jnp.max(pos).reshape(1)
    pos_b = pos[:, None]
    posr = jnp.repeat(pos, n_heads)[:, None]        # r-major (slot, head)
    kv_k5 = kv_k.reshape(L * b, kv_k.shape[2], ctx, head_d)
    kv_v5 = kv_v.reshape(L * b, kv_v.shape[2], ctx, head_d)

    def cmap(t, m, p):
        return (m[M_SID, t], 0, 0)

    def c2map(t, m, p):
        return (m[M_SID2, t], 0, 0)

    def nmmap(t, m, p):
        return (m[M_LAYER, t], 0, 0)

    def kvmap(t, m, p):
        page = jnp.minimum(m[M_PG, t], jnp.maximum(p[0] - 1, 0) // psz)
        return (m[M_LAYER, t], 0, page, 0)

    def lgmap(t, m, p):
        return (0, m[M_OUTN, t])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((b, hidden), lambda t, m, p: (0, 0)),
            pl.BlockSpec((1, head_d // 2), lambda t, m, p: (0, 0)),
            pl.BlockSpec((b, 1), lambda t, m, p: (0, 0)),
            pl.BlockSpec((arow, 1), lambda t, m, p: (0, 0)),
            pl.BlockSpec((1, flat.codes0.shape[1], tn), cmap),
            pl.BlockSpec((1, flat.scales0.shape[1], tn), cmap),
            pl.BlockSpec((1, flat.codes1.shape[1], tn),
                         c2map if flat.fullk else cmap if flat.split else
                         (lambda t, m, p: (0, 0, 0))),
            pl.BlockSpec((1, flat.scales1.shape[1], tn),
                         c2map if flat.fullk else cmap if flat.split else
                         (lambda t, m, p: (0, 0, 0))),
            pl.BlockSpec((1, 2, hidden), nmmap),
            pl.BlockSpec((1, hidden), lambda t, m, p: (0, 0)),
            pl.BlockSpec((b, n_kv, psz, head_d), kvmap),
            pl.BlockSpec((b, n_kv, psz, head_d), kvmap),
        ],
        out_specs=[
            pl.BlockSpec((b, tn), lgmap),
            pl.BlockSpec((1, b, kvh), nmmap),
            pl.BlockSpec((1, b, kvh), nmmap),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, hidden), jnp.float32),       # x residual
            pltpu.VMEM((b, hidden), jnp.float32),       # h (rms'd input)
            pltpu.VMEM((b, kvn_dim), jnp.float32),      # qkv accumulator
            pltpu.VMEM((b, hidden), jnp.float32),       # attention out
            pltpu.VMEM((arow, head_d), jnp.float32),    # q rows
            pltpu.VMEM((arow, head_d), jnp.float32),    # flash m
            pltpu.VMEM((arow, head_d), jnp.float32),    # flash l
            pltpu.VMEM((arow, head_d), jnp.float32),    # flash acc
            pltpu.VMEM((b, ffn), jnp.float32),          # up accumulator
            pltpu.VMEM((b, ffn), jnp.float32),          # gate -> activation
        ],
    )
    logits, k_new, v_new = pl.pallas_call(
        functools.partial(_flat_kernel, n_heads=n_heads, n_kv=n_kv,
                          hidden=hidden, head_d=head_d, bias=_BIAS[qtype],
                          kk=kkq, tn=tn, ffn=ffn, psz=psz,
                          split=flat.split, fullk=flat.fullk, nb=b,
                          batched=True),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, vocab_pad), jnp.float32),
            jax.ShapeDtypeStruct((L, b, kvh), jnp.float32),
            jax.ShapeDtypeStruct((L, b, kvh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(flat.meta, pos_arr, x.astype(jnp.float32), inv, pos_b, posr,
      flat.codes0, flat.scales0, flat.codes1, flat.scales1, flat.norms,
      flat.out_norm, kv_k5, kv_v5)
    return logits, k_new, v_new
