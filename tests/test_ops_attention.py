"""Golden tests: SDPA vs torch, RoPE vs reference formulas, T5 bias vs HF."""
import numpy as np
import torch

import jax.numpy as jnp

from tts_tpu.ops import attention as attn


def test_sdpa_matches_torch(rng):
    q = rng.standard_normal((2, 4, 6, 16)).astype(np.float32)
    k = rng.standard_normal((2, 4, 10, 16)).astype(np.float32)
    v = rng.standard_normal((2, 4, 10, 16)).astype(np.float32)
    y = np.asarray(attn.sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    ref = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)).numpy()
    np.testing.assert_allclose(y, ref, atol=1e-5)


def test_sdpa_causal(rng):
    q = rng.standard_normal((1, 2, 8, 16)).astype(np.float32)
    k = v = q
    bias = attn.causal_bias(8)
    y = np.asarray(attn.sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), bias))
    ref = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
        is_causal=True).numpy()
    np.testing.assert_allclose(y, ref, atol=1e-5)


def test_gqa_matches_repeat(rng):
    q = rng.standard_normal((8, 5, 16)).astype(np.float32)
    k = rng.standard_normal((2, 9, 16)).astype(np.float32)
    v = rng.standard_normal((2, 9, 16)).astype(np.float32)
    y = np.asarray(attn.gqa_sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    kr = np.asarray(attn.repeat_kv(jnp.asarray(k), 4))
    vr = np.asarray(attn.repeat_kv(jnp.asarray(v), 4))
    ref = np.asarray(attn.sdpa(jnp.asarray(q), jnp.asarray(kr), jnp.asarray(vr)))
    np.testing.assert_allclose(y, ref, atol=1e-5)


def _rope_ref_neox(x, pos, base):
    # rotate-halves formulation
    d = x.shape[-1]
    inv = 1.0 / (base ** (np.arange(0, d, 2) / d))
    ang = pos[:, None] * inv[None, :]
    cos, sin = np.cos(ang), np.sin(ang)
    x1, x2 = x[..., : d // 2], x[..., d // 2:]
    return np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)


def test_rope_neox(rng):
    x = rng.standard_normal((3, 7, 32)).astype(np.float32)
    pos = np.arange(7).astype(np.int32)
    y = np.asarray(attn.apply_rope_neox(jnp.asarray(x), jnp.asarray(pos)))
    ref = _rope_ref_neox(x, pos.astype(np.float64), 10000.0)
    np.testing.assert_allclose(y, ref, atol=1e-4)


def test_rope_interleaved_pairs(rng):
    x = rng.standard_normal((1, 4, 8)).astype(np.float32)
    pos = np.arange(4).astype(np.int32)
    y = np.asarray(attn.apply_rope_interleaved(jnp.asarray(x), jnp.asarray(pos)))
    # manual reference over adjacent pairs
    d = 8
    inv = 1.0 / (10000.0 ** (np.arange(0, d, 2) / d))
    expect = np.empty_like(x)
    for t in range(4):
        for i in range(d // 2):
            c, s = np.cos(t * inv[i]), np.sin(t * inv[i])
            a, b = x[0, t, 2 * i], x[0, t, 2 * i + 1]
            expect[0, t, 2 * i] = a * c - b * s
            expect[0, t, 2 * i + 1] = b * c + a * s
    np.testing.assert_allclose(y, expect, atol=1e-4)


def test_rope_freq_factors(rng):
    x = rng.standard_normal((1, 5, 16)).astype(np.float32)
    pos = np.arange(5).astype(np.int32)
    ff = np.ones(8, np.float32) * 2.0
    y = np.asarray(attn.apply_rope_neox(jnp.asarray(x), jnp.asarray(pos),
                                        base=500000.0, freq_factors=jnp.asarray(ff)))
    # halved frequencies == positions halved
    ref = np.asarray(attn.apply_rope_neox(jnp.asarray(x),
                                          jnp.asarray(pos.astype(np.float32) / 2),
                                          base=500000.0))
    np.testing.assert_allclose(y, ref, atol=1e-5)


def _hf_t5_bucket(relative_position, bidirectional=True, num_buckets=32, max_distance=128):
    # transformers.models.t5.modeling_t5.T5Attention._relative_position_bucket
    relative_buckets = 0
    if bidirectional:
        num_buckets //= 2
        relative_buckets += (relative_position > 0).astype(np.int64) * num_buckets
        relative_position = np.abs(relative_position)
    else:
        relative_position = -np.minimum(relative_position, 0)
    max_exact = num_buckets // 2
    is_small = relative_position < max_exact
    rel_if_large = max_exact + (
        np.log(relative_position.astype(np.float32) / max_exact + 1e-20)
        / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(np.int64)
    rel_if_large = np.minimum(rel_if_large, num_buckets - 1)
    relative_buckets += np.where(is_small, relative_position, rel_if_large)
    return relative_buckets


def test_t5_buckets_match_hf():
    q = np.arange(40)
    k = np.arange(40)
    ours = np.asarray(attn.t5_relative_buckets(jnp.asarray(q), jnp.asarray(k)))
    rel = k[None, :] - q[:, None]
    ref = _hf_t5_bucket(rel)
    np.testing.assert_array_equal(ours, ref)
