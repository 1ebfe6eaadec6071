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
from jax.experimental.pallas import tpu as pltpu

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


def dequant_t(codes_t: jax.Array, scales_t: jax.Array, qtype: int,
              dtype=jnp.float32) -> jax.Array:
    """Transposed planar -> dense W^T (K, N). XLA path / golden reference."""
    bias = _BIAS[qtype]
    vals = codes_t.astype(jnp.int32).astype(jnp.float32) - bias
    sk = _expand_scales_t(scales_t.astype(jnp.float32), codes_t.shape[0])
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

def _qmm_kernel(x_ref, c_ref, s_ref, o_ref, *, bias: float):
    """Grid (N//TN,): dequantize one (K, TN) weight tile in registers, feed
    the MXU. Full K per tile — the supported models' K (<= 8192) fits VMEM,
    avoiding K-tiling and lane-misaligned scale slicing entirely."""
    # (Mosaic can't cast u8/i8 -> f32 directly; hop through i32.)
    codes = c_ref[:].astype(jnp.int32).astype(jnp.float32) - bias  # (K, TN)
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
    out = pl.pallas_call(
        functools.partial(_qmm_kernel, bias=_BIAS[qtype]),
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((m_pad, k), lambda i: (0, 0)),
            pl.BlockSpec((k, tile_n), lambda i: (0, i)),
            pl.BlockSpec((k // QK, tile_n), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((m_pad, tile_n), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k,
            bytes_accessed=n * k + n * (k // QK) * 4 + m_pad * k * 4 + m_pad * n * 4,
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
        self.shape = (int(codes_t.shape[1]), int(codes_t.shape[0]))  # (N, K)

    @classmethod
    def from_planar(cls, codes: np.ndarray, scales: np.ndarray, qtype: int):
        """From row-major planar arrays as produced by gguf unpack_planar."""
        return cls(jnp.asarray(np.ascontiguousarray(codes.T)),
                   jnp.asarray(np.ascontiguousarray(scales.T.astype(np.float32))),
                   qtype)

    def matmul(self, x: jax.Array) -> jax.Array:
        return quant_matmul(x, self.codes_t, self.scales_t, self.qtype)

    def dense(self, dtype=jnp.float32) -> jax.Array:
        """Materialize W (N, K)."""
        return dequant_t(self.codes_t, self.scales_t, self.qtype, dtype).T

    def take_rows(self, ids: jax.Array, dtype=jnp.float32) -> jax.Array:
        """W[ids, :] -> (len(ids), K), dequantizing only the gathered rows."""
        c = jnp.take(self.codes_t, ids, axis=1)            # (K, n_ids)
        s = jnp.take(self.scales_t, ids, axis=1)           # (K//32, n_ids)
        return dequant_t(c, s, self.qtype, dtype).T
