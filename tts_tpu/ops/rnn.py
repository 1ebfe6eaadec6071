"""Recurrent layers for Kokoro: LSTM via lax.scan, AdaLayerNorm, AdaIN.

The reference unrolls LSTMs as explicit per-timestep graph nodes
(kokoro/model.cpp:53-86 `build_lstm_run`, gates batched upfront) which blows
its graph up to ~570k nodes. TPU-native design: one `lax.scan` over time with
the input-side gate matmul hoisted out of the scan (a single big MXU matmul),
leaving only the (H x 4H) recurrent matmul inside the scan body.

Gate order follows torch.nn.LSTM: (input, forget, cell/g, output) — the
Kokoro checkpoints are converted from torch.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LSTMWeights(NamedTuple):
    w_ih: jax.Array  # (4H, I)
    w_hh: jax.Array  # (4H, H)
    b_ih: jax.Array  # (4H,)
    b_hh: jax.Array  # (4H,)


def lstm(x: jax.Array, w: LSTMWeights, reverse: bool = False,
         h0: jax.Array | None = None, c0: jax.Array | None = None) -> jax.Array:
    """Single-direction LSTM. x: (T, I) -> (T, H)."""
    hidden = w.w_hh.shape[-1]
    if h0 is None:
        h0 = jnp.zeros((hidden,), x.dtype)
    if c0 is None:
        c0 = jnp.zeros((hidden,), x.dtype)
    # Hoist the input projection: one (T, I) @ (I, 4H) MXU matmul.
    gates_x = x @ w.w_ih.T + (w.b_ih + w.b_hh)

    def step(carry, gx):
        h, c = carry
        g = gx + h @ w.w_hh.T
        i, f, gg, o = jnp.split(g, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        gg = jnp.tanh(gg)
        o = jax.nn.sigmoid(o)
        c = f * c + i * gg
        h = o * jnp.tanh(c)
        return (h, c), h

    _, hs = jax.lax.scan(step, (h0, c0), gates_x, reverse=reverse)
    return hs


def bilstm(x: jax.Array, fwd: LSTMWeights, bwd: LSTMWeights) -> jax.Array:
    """Bidirectional LSTM: concat(forward, backward) -> (T, 2H)."""
    return jnp.concatenate([lstm(x, fwd), lstm(x, bwd, reverse=True)], axis=-1)


def masked_bilstm(x: jax.Array, lengths, fwd: LSTMWeights, bwd: LSTMWeights) -> jax.Array:
    """Bidirectional LSTM over a padded sequence of true length `lengths`.

    The backward pass must start at the last *valid* timestep, so padded tail
    steps are made no-ops (carry passes through) instead of flipping the
    array — keeps shapes static under jit.
    """
    t = x.shape[0]
    valid = (jnp.arange(t) < lengths).astype(x.dtype)[:, None]

    def direction(w: LSTMWeights, reverse: bool):
        hidden = w.w_hh.shape[-1]
        gates_x = x @ w.w_ih.T + (w.b_ih + w.b_hh)

        def step(carry, inp):
            h, c = carry
            gx, m = inp
            g = gx + h @ w.w_hh.T
            i, f, gg, o = jnp.split(g, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            h = m * h_new + (1 - m) * h
            c = m * c_new + (1 - m) * c
            return (h, c), h * m

        z = jnp.zeros((hidden,), x.dtype)
        _, hs = jax.lax.scan(step, (z, z), (gates_x, valid), reverse=reverse)
        return hs

    return jnp.concatenate([direction(fwd, False), direction(bwd, True)], axis=-1)


def layer_norm(x: jax.Array, gamma: jax.Array, beta: jax.Array,
               eps: float = 1e-5) -> jax.Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * gamma + beta


def rms_norm(x: jax.Array, gamma: jax.Array, eps: float = 1e-5) -> jax.Array:
    ms = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(ms + eps).astype(x.dtype)) * gamma


def ada_layer_norm(x: jax.Array, style: jax.Array, w_fc: jax.Array,
                   b_fc: jax.Array, eps: float = 1e-5) -> jax.Array:
    """StyleTTS2 AdaLayerNorm: style vector -> (gamma, beta) via linear.

    Parity: kokoro duration-predictor AdaLayerNorm blocks
    (kokoro/model.cpp:1017-1029). fc output is (2C,) split into gamma/beta;
    normalization is a plain LayerNorm then (1+gamma)*xhat + beta.
    """
    h = style @ w_fc.T + b_fc
    gamma, beta = jnp.split(h, 2, axis=-1)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    xhat = (x - mu) * jax.lax.rsqrt(var + eps)
    return (1.0 + gamma) * xhat + beta


def adain_1d(x: jax.Array, style: jax.Array, w_fc: jax.Array,
             b_fc: jax.Array, eps: float = 1e-5) -> jax.Array:
    """AdaIN1d: instance-norm over time then style-conditioned affine.

    x: (C, T); style: (S,). fc gives (2C,) -> gamma, beta per channel.
    Parity: kokoro AdainResBlock (kokoro/model.cpp:1169-1231).
    """
    h = style @ w_fc.T + b_fc
    gamma, beta = jnp.split(h, 2, axis=-1)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    xhat = (x - mu) * jax.lax.rsqrt(var + eps)
    return (1.0 + gamma[:, None]) * xhat + beta[:, None]
