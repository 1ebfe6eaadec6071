"""Attention building blocks: SDPA, RoPE variants, T5 relative bias, GQA.

TPU-native equivalents of the reference's per-model attention graphs
(parler/model.cpp:534-606, dia/model.cpp:394-514, orpheus/model.cpp:194-277,
t5/model.cpp:216-320). One fused SDPA used by every model; masks are additive
bias tensors so jit sees static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def sdpa(q: jax.Array, k: jax.Array, v: jax.Array,
         bias: jax.Array | None = None, scale: float | None = None) -> jax.Array:
    """Scaled dot-product attention.

    q: (..., H, Tq, D), k/v: (..., H, Tk, D). bias broadcasts to
    (..., H, Tq, Tk) and is added to the scaled logits (use -inf for masking).
    Softmax is computed in f32 regardless of input dtype (numerics on MXU
    bf16 inputs).
    """
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    logits = jnp.einsum("...qd,...kd->...qk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("...qk,...kd->...qd", probs.astype(v.dtype), v)


def causal_bias(t: int, dtype=jnp.float32) -> jax.Array:
    """(t, t) additive causal mask."""
    i = jnp.arange(t)[:, None]
    j = jnp.arange(t)[None, :]
    return jnp.where(j <= i, 0.0, -jnp.inf).astype(dtype)


def length_bias(t: int, valid_len, dtype=jnp.float32) -> jax.Array:
    """(t,) additive padding mask: 0 for positions < valid_len else -inf."""
    return jnp.where(jnp.arange(t) < valid_len, 0.0, -jnp.inf).astype(dtype)


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------

def rope_freqs(dim: int, base: float = 10000.0,
               freq_factors: jax.Array | None = None) -> jax.Array:
    """Inverse frequencies (dim//2,). llama3-style per-frequency factors
    divide inv_freq (reference orpheus/model.cpp:274-277 `rope_frequencies`)."""
    inv = 1.0 / (base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    if freq_factors is not None:
        inv = inv / freq_factors
    return inv


def apply_rope_neox(x: jax.Array, positions: jax.Array,
                    base: float = 10000.0,
                    freq_factors: jax.Array | None = None) -> jax.Array:
    """NeoX/llama-style RoPE: rotate (x[i], x[i+d/2]) pairs.

    x: (..., T, D); positions: (T,) or broadcastable. Used by Dia (NeoX
    protocol, dia/model.cpp:394) and Orpheus (llama arch).
    """
    d = x.shape[-1]
    inv = rope_freqs(d, base, freq_factors)
    ang = positions[..., :, None].astype(jnp.float32) * inv  # (..., T, D/2)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x1, x2 = x[..., : d // 2], x[..., d // 2:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def apply_rope_interleaved(x: jax.Array, positions: jax.Array,
                           base: float = 10000.0) -> jax.Array:
    """Original GPT-J/ggml-mode-0 RoPE: rotate adjacent pairs (x[2i], x[2i+1])."""
    d = x.shape[-1]
    inv = rope_freqs(d, base)
    ang = positions[..., :, None].astype(jnp.float32) * inv
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    r1 = x1 * cos - x2 * sin
    r2 = x2 * cos + x1 * sin
    out = jnp.stack([r1, r2], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# T5 relative position bias (t5/model.cpp:300-320 builds these host-side)
# ---------------------------------------------------------------------------

def t5_relative_buckets(q_pos: jax.Array, k_pos: jax.Array,
                        num_buckets: int = 32, max_distance: int = 128,
                        bidirectional: bool = True) -> jax.Array:
    """Log-binned relative-position bucket ids, HF T5 formula."""
    rel = k_pos[None, :] - q_pos[:, None]
    buckets = jnp.zeros_like(rel)
    n = num_buckets
    if bidirectional:
        n = n // 2
        buckets = jnp.where(rel > 0, n, 0)
        rel = jnp.abs(rel)
    else:
        rel = -jnp.minimum(rel, 0)
    max_exact = n // 2
    is_small = rel < max_exact
    large = max_exact + (
        jnp.log(rel.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact) * (n - max_exact)
    ).astype(rel.dtype)
    large = jnp.minimum(large, n - 1)
    return buckets + jnp.where(is_small, rel, large)


def t5_position_bias(embed: jax.Array, tq: int, tk: int,
                     num_buckets: int = 32, max_distance: int = 128) -> jax.Array:
    """(H, Tq, Tk) additive attention bias from bucket embedding (buckets, H)."""
    b = t5_relative_buckets(jnp.arange(tq), jnp.arange(tk), num_buckets, max_distance)
    return embed[b].transpose(2, 0, 1)


# ---------------------------------------------------------------------------
# GQA
# ---------------------------------------------------------------------------

def repeat_kv(kv: jax.Array, n_rep: int) -> jax.Array:
    """(..., H_kv, T, D) -> (..., H_kv*n_rep, T, D), grouped repeat.

    Reference interleaves kv heads into the cache with strided copies
    (orpheus/model.cpp:194-228, dia/model.cpp:443-474); on TPU we keep the
    cache at H_kv and expand (or let dot_general broadcast) at use.
    """
    if n_rep == 1:
        return kv
    return jnp.repeat(kv, n_rep, axis=-3)


def gqa_sdpa(q: jax.Array, k: jax.Array, v: jax.Array,
             bias: jax.Array | None = None, scale: float | None = None) -> jax.Array:
    """SDPA with fewer KV heads than Q heads, without materializing repeats.

    q: (..., Hq, Tq, D), k/v: (..., Hkv, Tk, D) with Hq % Hkv == 0. Reshapes
    q to (..., Hkv, G, Tq, D) so the repeat is a broadcast inside einsum.
    """
    hq, hkv = q.shape[-3], k.shape[-3]
    if hq == hkv:
        return sdpa(q, k, v, bias, scale)
    g = hq // hkv
    qs = q.reshape(q.shape[:-3] + (hkv, g) + q.shape[-2:])
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    logits = jnp.einsum("...hgqd,...hkd->...hgqk", qs, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        bias = bias.reshape(bias.shape[:-3] + (hkv, g) + bias.shape[-2:]) \
            if bias.ndim >= 3 and bias.shape[-3] == hq else bias
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("...hgqk,...hkd->...hgqd", probs.astype(v.dtype), v)
    return out.reshape(q.shape)
