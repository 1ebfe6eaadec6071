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
    """torch.nn.functional.conv1d semantics. x: (B, C_in, T) or (C_in, T).

    groups == 1 uses a tap-decomposed GEMM formulation — one
    (C_out, C_in) @ (C_in, T_out) MXU matmul per kernel tap over a shifted
    view of the input. XLA's native conv lowering handles the channels-first
    batch-1 shapes of the codec vocoders poorly on TPU (measured >30x slower
    than the GEMM form at DAC-44k residual-unit shapes); grouped/depthwise
    convs keep the native path (channel-elementwise, no MXU to win).
    """
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    if groups == 1:
        k = w.shape[-1]
        b, c_in, t = x.shape
        t_out = (t + 2 * padding - dilation * (k - 1) - 1) // stride + 1
        # channels-LAST internally: XLA's TPU conv/GEMM path wants the
        # feature dim minor; the channels-first form compiles to a
        # catastrophically slow lowering at codec shapes (measured ~1000x
        # slower at (768ch, T=4096) on v5e — tools/probe_conv2.py). Per-tap
        # dot over a shifted (B, T, C_in) view; XLA sinks the boundary
        # transposes through the surrounding elementwise ops.
        # bf16 kernels (vocoder compute_dtype) pull the activations to bf16
        # for the MXU passes; accumulation stays f32.
        xt = x.transpose(0, 2, 1).astype(w.dtype)       # (B, T, C_in)
        xp = jnp.pad(xt, ((0, 0), (padding, padding), (0, 0))) if padding \
            else xt
        acc = None
        for i in range(k):
            lo = i * dilation
            xs = lax.slice(xp, (0, lo, 0),
                           (b, lo + (t_out - 1) * stride + 1, c_in),
                           (1, stride, 1))              # (B, T_out, C_in)
            part = lax.dot_general(
                xs, w[:, :, i],
                dimension_numbers=(((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)     # (B, T_out, C_out)
            acc = part if acc is None else acc + part
        if bias is not None:
            acc = acc + bias[None, None, :].astype(acc.dtype)
        out = acc.transpose(0, 2, 1)
        return (out[0] if squeeze else out).astype(jnp.float32)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, _DN)
    out = lax.conv_general_dilated(
        x.astype(w.dtype), w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=dn,
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias[None, :, None]
    return (out[0] if squeeze else out).astype(jnp.float32)


def conv_transpose_1d(x: jax.Array, w: jax.Array, bias: jax.Array | None = None,
                      stride: int = 1, padding: int = 0,
                      groups: int = 1, output_padding: int = 0) -> jax.Array:
    """torch.nn.functional.conv_transpose1d semantics.

    x: (B, C_in, T) or (C_in, T); w: (C_in, C_out/groups, K) (torch layout).
    Output length = (T-1)*stride - 2*padding + K + output_padding.

    groups == 1: subpixel phase decomposition into per-tap GEMMs (see body).
    groups > 1: input-dilated (fractionally-strided) regular conv with a
    flipped kernel — the standard XLA formulation.
    """
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    k = w.shape[-1]
    if groups == 1:
        # Subpixel (phase) decomposition into MXU GEMMs: output position
        # j = u*stride + r receives sum_m W[:, :, r + m*stride] @ x[u - m].
        # One (C_out, C_in) @ (C_in, U) matmul per (phase, tap), phases
        # interleaved by reshape. Same rationale as conv1d: XLA's native
        # lhs-dilated conv is pathologically slow for batch-1 channels-first.
        b, c_in, t = x.shape
        c_out = w.shape[1]
        s = stride
        t_out = (t - 1) * s - 2 * padding + k + output_padding
        m_taps = -(-k // s)                     # ceil(k / s)
        u = t + m_taps                          # covers all phases + slack
        # channels-last internally (same rationale as conv1d); bf16 kernels
        # pull activations to bf16 with f32 accumulation
        xt = x.transpose(0, 2, 1).astype(w.dtype)   # (B, T, C_in)
        xp = jnp.pad(xt, ((0, 0), (m_taps - 1, u - t), (0, 0)))
        phases = []
        for r in range(s):
            acc = None
            for m in range(m_taps):
                tap = r + m * s
                if tap >= k:
                    break
                xs = lax.slice(xp, (0, m_taps - 1 - m, 0),
                               (b, m_taps - 1 - m + u, c_in), (1, 1, 1))
                part = lax.dot_general(
                    xs, w[:, :, tap],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (B, U, C_out)
                acc = part if acc is None else acc + part
            phases.append(acc if acc is not None
                          else jnp.zeros((b, u, c_out), jnp.float32))
        full = jnp.stack(phases, axis=2).reshape(b, u * s, c_out)
        out = lax.slice(full, (0, padding, 0), (b, padding + t_out, c_out))
        if bias is not None:
            out = out + bias[None, None, :]
        out = out.transpose(0, 2, 1)
        return (out[0] if squeeze else out).astype(jnp.float32)
    else:
        c_in = w.shape[0]
        co_g = w.shape[1]
        wg = jnp.flip(w, axis=-1).reshape(groups, c_in // groups, co_g, k)
        wt = wg.transpose(0, 2, 1, 3).reshape(groups * co_g, c_in // groups, k)
    dn = lax.conv_dimension_numbers(x.shape, wt.shape, _DN)
    out = lax.conv_general_dilated(
        x.astype(wt.dtype), wt,
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding + output_padding)],
        lhs_dilation=(stride,),
        dimension_numbers=dn,
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias[None, :, None]
    return (out[0] if squeeze else out).astype(jnp.float32)


def conv1d_weight_norm(x: jax.Array, w_g: jax.Array, w_v: jax.Array,
                       bias: jax.Array | None = None, **kw) -> jax.Array:
    """Weight-normalized conv1d (DAC/SNAC use torch weight_norm).

    w = g * v / ||v||, norm over (in, k) dims per output channel. Converters
    usually pre-fold this; kept for checkpoints that store g/v separately.
    """
    norm = jnp.sqrt(jnp.sum(w_v ** 2, axis=(1, 2), keepdims=True))
    return conv1d(x, w_g.reshape(-1, 1, 1) * w_v / norm, bias, **kw)
