"""Fused block-dequant matmul (Q4_0 / Q5_0 / Q8_0) — the framework's hot kernel.

The reference multiplies against ggml block-quantized weights on CPU/Metal
(graph op `ggml_mul_mat` over Q4_0/Q5_0/Q8_0 tensors). On TPU the win is HBM
bandwidth: autoregressive decode is a stream of (1 x K) @ (K x N) matvecs that
are weight-bandwidth-bound, so reading 1 byte (+ per-32 scale) instead of 4
bytes per weight is up to ~3.6x speed-of-light improvement.

Device layout (chosen for Mosaic's layout rules): weights live TRANSPOSED,
  codes_t  : int8/uint8 (K, N)    raw quant codes (bias NOT applied)
  scales_t : float32    (K//32, N) one scale per 32-long K-block
so the per-32 scale expansion is a *sublane* broadcast+reshape
((K//32, 32, N) -> (K, N), minor dim untouched — supported by Mosaic),
and the MXU consumes the dequantized tile directly; f32 weights never touch
HBM. `gguf/quants.unpack_planar` produces row-major (N, K) codes; use
`QuantTensor.from_planar` to get the device layout.

`quant_matmul(x, codes_t, scales_t, qtype)` computes x @ W^T for the logical
weight W (N, K) — i.e. x (M, K) -> out (M, N).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


from ..gguf import quants

_BIAS = {
    quants.GGML_TYPE_Q4_0: 8.0,
    quants.GGML_TYPE_Q5_0: 16.0,
    quants.GGML_TYPE_Q8_0: 0.0,
}

QK = quants.QK


def _expand_scales_t(s_t: jax.Array, k: int) -> jax.Array:
    """(K//32, N) -> (K, N) by repeating each scale row 32x (sublane-only)."""
    nsb, n = s_t.shape
    return jax.lax.broadcast_in_dim(s_t, (nsb, QK, n), (0, 2)).reshape(k, n)


# ---------------------------------------------------------------------------
# Q4_0 nibble packing: two 4-bit codes per byte along the sublane (K) dim,
# BLOCK HALF-SPLIT layout — K is cut into PACK_BLOCK-row blocks; within each
# block, byte row r holds logical row r in the low nibble and logical row
# r + block/2 in the high nibble. Halves weight HBM traffic in the decode
# hot loops (codes go from 1 byte to 0.5 bytes/weight; the reference stores
# Q4_0 packed too, ggml-quants block_q4_0.qs — its in-block x[i]/x[i+16]
# split is the same idea at 32-granularity). Half-split is chosen over
# adjacent-pair interleave because unpack is then two masks + two plain MXU
# dots with NO sublane interleave — measured ~2x faster in-kernel than
# broadcast+variable-shift or concat-interleave (tools/probe_unpack.py).
# The fixed block size keeps kernels that stream K-slices of a weight (the
# llama megastep FFN phases) self-consistent: any K-slice that is a
# multiple of PACK_BLOCK contains whole blocks. Packing is EXACT (pure bit
# rearrangement), so all parity tests hold unchanged.
# ---------------------------------------------------------------------------

PACK_BLOCK = 2048


def can_pack(k: int) -> bool:
    """Packable iff every block half stays 32-aligned for scale slicing."""
    return k % 64 == 0 and (k % PACK_BLOCK) % 64 == 0


def pack_codes_t(codes_t: jax.Array) -> jax.Array:
    """(..., K, N) int8 Q4 codes (values 0..15) -> (..., K//2, N) int8,
    block half-split (see module comment)."""
    k = codes_t.shape[-2]
    c = codes_t.astype(jnp.uint8)
    outs = []
    for b0 in range(0, k, PACK_BLOCK):
        bb = min(PACK_BLOCK, k - b0)
        h = bb // 2
        blk = c[..., b0:b0 + bb, :]
        outs.append((blk[..., h:, :] << 4) | blk[..., :h, :])
    packed = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-2)
    return jax.lax.bitcast_convert_type(packed, jnp.int8)


def unpack_codes_t(codes_t: jax.Array, k: int) -> jax.Array:
    """(..., K//2, N) block-half-split nibbles -> (..., K, N) int32 codes.

    Sign-extension-safe: for int8 bytes, `(c >> 4) & 15` under arithmetic
    shift still yields the high nibble, and `c & 15` the low one."""
    ci = codes_t.astype(jnp.int32)
    outs = []
    for b0 in range(0, k, PACK_BLOCK):
        bb = min(PACK_BLOCK, k - b0)
        h = bb // 2
        blk = ci[..., b0 // 2:(b0 + bb) // 2, :]
        outs += [blk & 15, (blk >> 4) & 15]
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-2)


def is_packed(codes_t, scales_t) -> bool:
    """True iff codes are nibble-packed (half the K rows of the scales)."""
    return codes_t.shape[-2] * 2 == scales_t.shape[-2] * QK


def dequant_t(codes_t: jax.Array, scales_t: jax.Array, qtype: int,
              dtype=jnp.float32) -> jax.Array:
    """Transposed planar -> dense W^T (K, N). XLA path / golden reference.
    Accepts nibble-packed Q4_0 codes transparently."""
    bias = _BIAS[qtype]
    k = scales_t.shape[-2] * QK
    if codes_t.shape[-2] != k:
        vals = unpack_codes_t(codes_t, k).astype(jnp.float32) - bias
    else:
        vals = codes_t.astype(jnp.int32).astype(jnp.float32) - bias
    sk = _expand_scales_t(scales_t.astype(jnp.float32), k)
    return (vals * sk).astype(dtype)


def quant_matmul_xla(x: jax.Array, codes_t: jax.Array, scales_t: jax.Array,
                     qtype: int) -> jax.Array:
    wt = dequant_t(codes_t, scales_t, qtype, dtype=jnp.float32)
    return jnp.dot(x.astype(jnp.float32), wt,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST).astype(x.dtype)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _qmm_kernel(x_ref, c_ref, s_ref, o_ref, *, bias: float, packed: bool):
    """Grid (N//TN,): dequantize one (K, TN) weight tile in registers, feed
    the MXU. Full K per tile — the supported models' K (<= 8192) fits VMEM,
    avoiding K-tiling and lane-misaligned scale slicing entirely.

    bf16 scales select the megastep dequant path (parler_megastep._dqdot:
    f32 dequant, ONE bf16 MXU pass with f32 accumulation) — used for the
    big LM-head matvecs where the f32-HIGHEST multi-pass dot is ~3x off the
    HBM floor; f32 scales keep full f32 HIGHEST precision."""
    if s_ref.dtype == jnp.bfloat16:
        from .parler_megastep import _dqdot
        o_ref[:] = _dqdot(x_ref[:].astype(jnp.float32), c_ref[:], s_ref[:],
                          bias).astype(o_ref.dtype)
        return
    # (Mosaic can't cast u8/i8 -> f32 directly; hop through i32.)
    if packed:
        ci = c_ref[:].astype(jnp.int32)
        k = s_ref.shape[0] * QK
        parts = []
        for b0 in range(0, k, PACK_BLOCK):      # block half-split layout
            h = min(PACK_BLOCK, k - b0) // 2
            blk = ci[b0 // 2:b0 // 2 + h]
            parts += [blk & 15, (blk >> 4) & 15]
        codes = jnp.concatenate(parts, axis=0).astype(jnp.float32) - bias
    else:
        codes = c_ref[:].astype(jnp.int32).astype(jnp.float32) - bias
    k, tn = codes.shape
    sk = _expand_scales_t(s_ref[:].astype(jnp.float32), k)         # (K, TN)
    wt = codes * sk
    # HIGHEST: true-f32 MXU passes. Decode matvecs are HBM-bound, so the
    # extra passes are free, and it keeps greedy token parity vs the host
    # dequant reference.
    o_ref[:] = jax.lax.dot_general(
        x_ref[:].astype(jnp.float32), wt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("qtype", "tile_n"))
def quant_matmul_pallas(x: jax.Array, codes_t: jax.Array, scales_t: jax.Array,
                        qtype: int, tile_n: int = 256) -> jax.Array:
    """x: (M, K); codes_t: (K, N) -> (M, N). M is padded to 8."""
    m, k = x.shape
    n = codes_t.shape[1]
    tile_n = min(tile_n, n)
    # Lane dim (N tile) must be 128-aligned or full; sublane K is taken whole.
    # Large M (prefill / encoder passes) goes to XLA: the kernel keeps the
    # whole (M, K) activation block in VMEM (sized for decode matvecs), and
    # at M>=2048 that blows the 16 MB scoped-vmem limit (observed at Dia
    # encoder scale); those shapes are compute-bound, where XLA's
    # dequant+dot does fine.
    if (n % tile_n or (tile_n % 128 and tile_n != n) or k % QK or k > 16384
            or m > 256):
        return quant_matmul_xla(x, codes_t, scales_t, qtype)
    m_pad = max(8, ((m + 7) // 8) * 8)
    xp = jnp.zeros((m_pad, k), x.dtype).at[:m].set(x) if m_pad != m else x
    k_phys = codes_t.shape[0]          # K, or K//2 when nibble-packed
    out = pl.pallas_call(
        functools.partial(_qmm_kernel, bias=_BIAS[qtype],
                          packed=k_phys != k),
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((m_pad, k), lambda i: (0, 0)),
            pl.BlockSpec((k_phys, tile_n), lambda i: (0, i)),
            pl.BlockSpec((k // QK, tile_n), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((m_pad, tile_n), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k,
            bytes_accessed=n * k_phys + n * (k // QK) * 4 + m_pad * k * 4 + m_pad * n * 4,
            transcendentals=0,
        ),
    )(xp, codes_t, scales_t)
    return out[:m]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@functools.lru_cache(maxsize=1)
def _use_pallas_default() -> bool:
    return _on_tpu()


def quant_matmul(x: jax.Array, codes_t: jax.Array, scales_t: jax.Array,
                 qtype: int, use_pallas: bool | None = None) -> jax.Array:
    """Dispatching entry point: Pallas on TPU, XLA elsewhere."""
    if use_pallas is None:
        use_pallas = _use_pallas_default()
    if use_pallas:
        return quant_matmul_pallas(x, codes_t, scales_t, qtype)
    return quant_matmul_xla(x, codes_t, scales_t, qtype)


class QuantTensor:
    """A weight matrix W (N, K) held quantized on device in transposed layout.

    `matmul(x)` computes x @ W.T via the fused kernel; `take_rows` serves
    embedding-style lookups (reference `ggml_get_rows` over quantized
    codebooks) by gathering columns of the transposed codes.
    """

    __slots__ = ("codes_t", "scales_t", "qtype", "shape")

    def __init__(self, codes_t, scales_t, qtype: int):
        self.codes_t = codes_t
        self.scales_t = scales_t
        self.qtype = qtype
        # K derived from the scales so nibble-packed codes report the
        # logical shape (codes may hold K or K//2 physical rows).
        self.shape = (int(codes_t.shape[-1]),
                      int(scales_t.shape[-2]) * QK)  # (N, K)

    @property
    def is_packed(self) -> bool:
        return is_packed(self.codes_t, self.scales_t)

    def pack(self) -> "QuantTensor":
        """Nibble-pack Q4_0 codes (2 codes/byte along K) — exact, halves
        code HBM traffic. No-op for other qtypes, already-packed codes, or
        K that cannot keep block halves 32-aligned."""
        if (self.qtype != quants.GGML_TYPE_Q4_0 or self.is_packed
                or not can_pack(self.shape[1])):
            return self
        return QuantTensor(pack_codes_t(self.codes_t), self.scales_t,
                           self.qtype)

    @classmethod
    def from_planar(cls, codes: np.ndarray, scales: np.ndarray, qtype: int):
        """From row-major planar arrays as produced by gguf unpack_planar."""
        return cls(jnp.asarray(np.ascontiguousarray(codes.T)),
                   jnp.asarray(np.ascontiguousarray(scales.T.astype(np.float32))),
                   qtype)

    def pad_n(self, align: int = 256) -> "QuantTensor":
        """Zero-pad the output dim N up to a multiple of `align` so the
        Pallas kernel applies (misaligned N falls back to the XLA dequant
        path, which materializes the dense weight — catastrophic for big LM
        heads). Padded columns have zero scales -> exactly-zero outputs;
        callers slice logits back to the true vocab."""
        n = self.codes_t.shape[-1]
        pad = (-n) % align
        if pad == 0:
            return self
        cfg = [(0, 0)] * (self.codes_t.ndim - 1) + [(0, pad)]
        return QuantTensor(jnp.pad(self.codes_t, cfg),
                           jnp.pad(self.scales_t, cfg), self.qtype)

    def matmul(self, x: jax.Array) -> jax.Array:
        return quant_matmul(x, self.codes_t, self.scales_t, self.qtype)

    def fast_lm_head(self, align: int = 256) -> "QuantTensor":
        """Prep for the decode-loop LM-head matvec: pad N to the Pallas
        alignment, ship scales in bf16 (halves scale traffic and selects the
        single-pass bf16 dequant-dot kernel), nibble-pack Q4 codes. Callers
        slice the logits back to the true vocab (padded columns are exactly
        zero)."""
        h = self.pad_n(align)
        return QuantTensor(h.codes_t, h.scales_t.astype(jnp.bfloat16),
                           h.qtype).pack()

    def fast_stacked_heads(self, n_heads: int, vocab: int,
                           align: int = 256) -> "QuantTensor":
        """fast_lm_head for a stacked multi-codebook head (N = n_heads *
        vocab): each head's vocab is padded to `align` IN PLACE so callers
        can reshape logits to (n_heads, padded_vocab) and slice; padding
        the total N would shift head boundaries."""
        h = self
        if h.codes_t.shape[-1] == n_heads * vocab and vocab % align:
            vp = ((vocab + align - 1) // align) * align
            kc, ks = h.codes_t.shape[-2], h.scales_t.shape[-2]
            shp = h.codes_t.shape[:-2]
            codes = h.codes_t.reshape(-1, kc, n_heads, vocab)
            codes = jnp.pad(codes, ((0, 0),) * 3 + ((0, vp - vocab),))
            scales = h.scales_t.reshape(-1, ks, n_heads, vocab)
            scales = jnp.pad(scales, ((0, 0),) * 3 + ((0, vp - vocab),))
            h = QuantTensor(codes.reshape(*shp, kc, n_heads * vp),
                            scales.reshape(*shp, ks, n_heads * vp),
                            h.qtype)
        return QuantTensor(h.codes_t, h.scales_t.astype(jnp.bfloat16),
                           h.qtype).pack()

    def dense(self, dtype=jnp.float32) -> jax.Array:
        """Materialize W (N, K)."""
        return dequant_t(self.codes_t, self.scales_t, self.qtype, dtype).T

    def take_rows(self, ids: jax.Array, dtype=jnp.float32) -> jax.Array:
        """W[ids, :] -> (len(ids), K), dequantizing only the gathered rows."""
        c = jnp.take(self.codes_t, ids, axis=1)            # (K, n_ids)
        s = jnp.take(self.scales_t, ids, axis=1)           # (K//32, n_ids)
        return dequant_t(c, s, self.qtype, dtype).T
