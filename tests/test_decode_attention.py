"""Paged decode attention vs dense numpy reference (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from tts_tpu.ops.decode_attention import (_xla_fallback,
                                          paged_decode_attention)


def np_ref(q, k, v, pos, scale):
    s = np.einsum("hd,hkd->hk", q, k) * scale
    s[:, pos + 1:] = -np.inf
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("hk,hkd->hd", p, v)


@pytest.mark.parametrize("pos", [0, 3, 63, 64, 100, 255])
def test_paged_kernel_interpret(rng, pos):
    H, CTX, D = 4, 256, 64
    q = rng.standard_normal((H, D)).astype(np.float32)
    k = rng.standard_normal((H, CTX, D)).astype(np.float32)
    v = rng.standard_normal((H, CTX, D)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(paged_decode_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), pos, page=64))
    ref = np_ref(q, k, v, pos, 1.0 / np.sqrt(D))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_xla_fallback_matches_numpy(rng):
    H, CTX, D = 3, 100, 16
    q = rng.standard_normal((H, D)).astype(np.float32)
    k = rng.standard_normal((H, CTX, D)).astype(np.float32)
    v = rng.standard_normal((H, CTX, D)).astype(np.float32)
    out = np.asarray(_xla_fallback(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), 42, 0.25))
    ref = np_ref(q, k, v, 42, 0.25)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_bf16_cache(rng):
    H, CTX, D = 4, 128, 64
    q = rng.standard_normal((H, D)).astype(np.float32)
    k = (rng.standard_normal((H, CTX, D)).astype(np.float32))
    v = (rng.standard_normal((H, CTX, D)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(paged_decode_attention(
            jnp.asarray(q), jnp.asarray(k).astype(jnp.bfloat16),
            jnp.asarray(v).astype(jnp.bfloat16), 90, page=64))
    ref = np_ref(q, k, v, 90, 1.0 / np.sqrt(D))
    np.testing.assert_allclose(out, ref, atol=0.05)
