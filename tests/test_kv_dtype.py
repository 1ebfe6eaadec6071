"""bf16 KV-cache path regression tests.

On TPU the caches default to bfloat16 (common.kv_cache_dtype), which CPU
tests never exercise — a dtype-mismatched cache write once slipped through
(lax.scatter requires matching dtypes). Force bf16 via the env override and
run every decode path that writes a cache.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture
def bf16_kv(monkeypatch):
    monkeypatch.setenv("TTS_TPU_KV_DTYPE", "bfloat16")


def test_kv_cache_dtype_override(bf16_kv):
    from tts_tpu.common import kv_cache_dtype
    assert kv_cache_dtype() == jnp.bfloat16


def test_parler_single_stream_bf16(bf16_kv, rng):
    from bench import build_q4_parler
    from tts_tpu.models.parler.model import (parler_generate_tokens_chunked,
                                             parler_prefill)
    cfg, w = build_q4_parler(rng, n_layers=2, hidden=128, heads=2, ffn=256,
                             enc_len=16, max_ctx=128)
    cfg.max_generation_size = 40
    shape = (cfg.n_layers, cfg.n_attn_heads, cfg.max_ctx_length, cfg.head_size)
    kv_k = jnp.zeros(shape, jnp.bfloat16)
    kv_v = jnp.zeros(shape, jnp.bfloat16)
    toks = jnp.asarray(rng.integers(0, 900, 16).astype(np.int32))
    kv_k, kv_v = parler_prefill(cfg, w, toks, kv_k, kv_v)
    assert kv_k.dtype == jnp.bfloat16
    out, steps = parler_generate_tokens_chunked(
        cfg, w, 16, kv_k, kv_v, jax.random.PRNGKey(0), chunk=8,
        do_sample=True, temperature=1.0, top_k=20)
    assert int(steps) > 0


def test_batched_engine_bf16(bf16_kv, rng):
    from bench import build_q4_parler
    from tts_tpu.models.parler.model import parler_prefill
    from tts_tpu.runtime.batched_parler import (batched_decode_chunk,
                                                init_batched_state,
                                                insert_request)
    cfg, w = build_q4_parler(rng, n_layers=2, hidden=128, heads=2, ffn=256,
                             enc_len=16, max_ctx=128)
    cfg.max_generation_size = 32
    st = init_batched_state(cfg, 2, jax.random.PRNGKey(1))
    assert st.kv_k.dtype == jnp.bfloat16
    shape = (cfg.n_layers, cfg.n_attn_heads, cfg.max_ctx_length, cfg.head_size)
    toks = jnp.asarray(rng.integers(0, 900, 16).astype(np.int32))
    kv_k, kv_v = parler_prefill(cfg, w, toks,
                                jnp.zeros(shape, jnp.bfloat16),
                                jnp.zeros(shape, jnp.bfloat16))
    st = insert_request(cfg, st, 0, kv_k, kv_v, 16, True, 1.0, 20, 1.0, 1.0)
    st = batched_decode_chunk(cfg, w, st, n_steps=4)
    assert int(np.asarray(st.step[0])) == 4


def test_batched_engine_accepts_f32_prefill_into_bf16_cache(bf16_kv, rng):
    """insert_request must cast: prefill output dtype may differ."""
    from bench import build_q4_parler
    from tts_tpu.models.parler.model import parler_prefill
    from tts_tpu.runtime.batched_parler import (init_batched_state,
                                                insert_request)
    cfg, w = build_q4_parler(rng, n_layers=2, hidden=128, heads=2, ffn=256,
                             enc_len=16, max_ctx=128)
    st = init_batched_state(cfg, 2, jax.random.PRNGKey(1))
    shape = (cfg.n_layers, cfg.n_attn_heads, cfg.max_ctx_length, cfg.head_size)
    toks = jnp.asarray(rng.integers(0, 900, 16).astype(np.int32))
    kv_k, kv_v = parler_prefill(cfg, w, toks, jnp.zeros(shape), jnp.zeros(shape))
    st = insert_request(cfg, st, 0, kv_k, kv_v, 16, True, 1.0, 20, 1.0, 1.0)
    assert st.kv_k.dtype == jnp.bfloat16


def test_dia_orpheus_bf16_states(bf16_kv):
    from tts_tpu.models.dia.model import DiaConfig, _dia_init_state
    st = _dia_init_state(DiaConfig(), jax.random.PRNGKey(0), max_steps=16)
    assert st.kv_k.dtype == jnp.bfloat16
