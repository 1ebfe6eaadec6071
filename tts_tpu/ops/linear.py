"""Weight containers: dense or block-quantized, pytree-registered.

Model weights are nested pytrees of `jnp.ndarray` (dense) or `QuantTensor`
(block-quantized, device layout). `matmul(x, w)` dispatches; layer stacks
(for `lax.scan` over transformer layers) hold stacked leaves, and scanning
slices through QuantTensor transparently because it is a pytree node.
"""
from __future__ import annotations

from typing import Any, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import quants
from .quant_matmul import QuantTensor, quant_matmul

# register QuantTensor as a pytree so it can live in jitted args / scan xs
jax.tree_util.register_pytree_node(
    QuantTensor,
    lambda qt: ((qt.codes_t, qt.scales_t), qt.qtype),
    lambda qtype, children: QuantTensor(children[0], children[1], qtype),
)

Weight = Union[jax.Array, QuantTensor]


def matmul(x: jax.Array, w: Weight) -> jax.Array:
    """x @ W.T for a logical weight W (N, K); x (..., K) -> (..., N)."""
    if isinstance(w, QuantTensor):
        lead = x.shape[:-1]
        y = w.matmul(x.reshape(-1, x.shape[-1]))
        return y.reshape(lead + (y.shape[-1],))
    return jnp.matmul(x, w.T, precision=jax.lax.Precision.HIGHEST)


def take_rows(w: Weight, ids: jax.Array) -> jax.Array:
    """Embedding lookup W[ids] for dense or quantized weights."""
    if isinstance(w, QuantTensor):
        return w.take_rows(ids)
    return jnp.take(w, ids, axis=0)


def dense(w: Weight, dtype=jnp.float32) -> jax.Array:
    if isinstance(w, QuantTensor):
        return w.dense(dtype)
    return w.astype(dtype)


def from_gguf_tensor(reader, name: str, transpose_last2: bool = False) -> Weight:
    """Load one tensor from a GGUFReader as a device weight.

    Quantized tensors stay quantized (QuantTensor); f16/f32 load dense (f32).
    """
    ti = reader.tensors[name]
    if quants.is_quantized(ti.ggml_type):
        if len(ti.shape) != 2:
            raise ValueError(f"quantized tensor {name} must be 2D, got {ti.shape}")
        from .. import native
        codes_t, scales_t = native.unpack_planar_transposed(
            reader.raw(name), ti.ggml_type, ti.shape)
        return QuantTensor(jnp.asarray(codes_t), jnp.asarray(scales_t),
                           ti.ggml_type)
    arr = np.asarray(reader.array(name), dtype=np.float32)
    return jnp.asarray(arr)


def stack_weights(ws: list) -> Weight:
    """Stack per-layer weights along a new axis 0 for lax.scan.

    All-dense -> stacked array; all-quantized (same qtype) -> QuantTensor
    with stacked codes/scales. Mixed stacks dequantize to dense.
    """
    if all(isinstance(w, QuantTensor) for w in ws):
        qt = ws[0].qtype
        if all(w.qtype == qt for w in ws):
            return QuantTensor(jnp.stack([w.codes_t for w in ws]),
                               jnp.stack([w.scales_t for w in ws]), qt)
    return jnp.stack([dense(w) for w in ws])


class StackedQuantMatmul:
    """Helper for scan bodies: a sliced QuantTensor leaf arrives as 2D
    codes_t/scales_t and `matmul` works unchanged; nothing to do here. Kept
    as documentation anchor."""
