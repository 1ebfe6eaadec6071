"""1-D convolution ops: dilated/depthwise conv1d and conv_transpose_1d.

TPU-native equivalents of ggml's conv ops (the reference reworked
`ggml_conv_transpose_1d` for its codec vocoders — SURVEY §2.9). Built on
`lax.conv_general_dilated`, which XLA lowers onto the MXU. Layout is
channels-first (C, T) per tensor / (B, C, T) batched, matching both torch
and the model weights' natural layout; weights are (C_out, C_in/groups, K)
like torch.nn.Conv1d.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NCH", "OIH", "NCH")  # batch/feature/spatial layout for lax conv


def conv1d(x: jax.Array, w: jax.Array, bias: jax.Array | None = None,
           stride: int = 1, padding: int = 0, dilation: int = 1,
           groups: int = 1) -> jax.Array:
    """torch.nn.functional.conv1d semantics. x: (B, C_in, T) or (C_in, T)."""
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    dn = lax.conv_dimension_numbers(x.shape, w.shape, _DN)
    out = lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=dn,
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias[None, :, None]
    return out[0] if squeeze else out


def conv_transpose_1d(x: jax.Array, w: jax.Array, bias: jax.Array | None = None,
                      stride: int = 1, padding: int = 0,
                      groups: int = 1, output_padding: int = 0) -> jax.Array:
    """torch.nn.functional.conv_transpose1d semantics.

    x: (B, C_in, T) or (C_in, T); w: (C_in, C_out/groups, K) (torch layout).
    Output length = (T-1)*stride - 2*padding + K + output_padding.

    Implemented as an input-dilated (fractionally-strided) regular conv with a
    flipped kernel — the standard XLA formulation, which maps to the MXU
    instead of scatter.
    """
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    k = w.shape[-1]
    # (C_in, C_out/groups, K) -> flip taps, swap to (C_out, C_in/groups, K)
    if groups == 1:
        wt = jnp.flip(w, axis=-1).transpose(1, 0, 2)
    else:
        c_in = w.shape[0]
        co_g = w.shape[1]
        wg = jnp.flip(w, axis=-1).reshape(groups, c_in // groups, co_g, k)
        wt = wg.transpose(0, 2, 1, 3).reshape(groups * co_g, c_in // groups, k)
    dn = lax.conv_dimension_numbers(x.shape, wt.shape, _DN)
    out = lax.conv_general_dilated(
        x, wt,
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding + output_padding)],
        lhs_dilation=(stride,),
        dimension_numbers=dn,
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias[None, :, None]
    return out[0] if squeeze else out


def conv1d_weight_norm(x: jax.Array, w_g: jax.Array, w_v: jax.Array,
                       bias: jax.Array | None = None, **kw) -> jax.Array:
    """Weight-normalized conv1d (DAC/SNAC use torch weight_norm).

    w = g * v / ||v||, norm over (in, k) dims per output channel. Converters
    usually pre-fold this; kept for checkpoints that store g/v separately.
    """
    norm = jnp.sqrt(jnp.sum(w_v ** 2, axis=(1, 2), keepdims=True))
    return conv1d(x, w_g.reshape(-1, 1, 1) * w_v / norm, bias, **kw)
