"""Chunked-scan generation must match the while_loop generation exactly
(greedy) for every autoregressive model."""
import numpy as np

import jax
import jax.numpy as jnp

from tests.test_dia import make_cfg as dia_cfg, make_weights as dia_weights
from tests.test_parler import make_cfg as parler_cfg, make_weights as parler_weights
from tests.test_orpheus import make_orpheus
from tts_tpu.models.dia.model import (dia_encode, dia_generate_tokens,
                                      dia_generate_tokens_chunked)
from tts_tpu.models.orpheus.model import (orpheus_prefill,
                                          orpheus_generate_tokens,
                                          orpheus_generate_tokens_chunked)
from tts_tpu.models.parler.model import (parler_prefill,
                                         parler_generate_tokens,
                                         parler_generate_tokens_chunked)


def test_parler_chunked_matches_whileloop(rng):
    cfg = parler_cfg()
    w, *_ = parler_weights(cfg, rng)
    prompt = [1, 4, 2, 7, 3]
    shape = (cfg.n_layers, cfg.n_attn_heads, cfg.max_ctx_length, cfg.head_size)
    tokens = np.zeros(8, np.int32)
    tokens[: len(prompt)] = prompt
    kv_k, kv_v = parler_prefill(cfg, w, jnp.asarray(tokens),
                                jnp.zeros(shape), jnp.zeros(shape))
    out_a, n_a = parler_generate_tokens(cfg, w, jnp.int32(len(prompt)),
                                        kv_k, kv_v, jax.random.PRNGKey(0),
                                        do_sample=False)
    out_b, n_b = parler_generate_tokens_chunked(cfg, w, len(prompt),
                                                kv_k, kv_v,
                                                jax.random.PRNGKey(0),
                                                chunk=5, do_sample=False)
    assert int(n_a) == int(n_b)
    np.testing.assert_array_equal(np.asarray(out_a)[: int(n_a)],
                                  np.asarray(out_b)[: int(n_b)])


def test_dia_chunked_matches_whileloop(rng):
    cfg = dia_cfg()
    w = dia_weights(cfg, rng)
    tokens = np.zeros((2, 32), np.int32)
    tokens[0, :5] = [1, 72, 105, 33, 46]
    _, ck, cv = dia_encode(cfg, w, jnp.asarray(tokens), jnp.int32(5))
    out_a, n_a = dia_generate_tokens(cfg, w, ck, cv, jax.random.PRNGKey(0),
                                     max_steps=20, do_sample=False)
    out_b, n_b = dia_generate_tokens_chunked(cfg, w, ck, cv,
                                             jax.random.PRNGKey(0),
                                             max_steps=20, chunk=6,
                                             do_sample=False)
    assert int(n_a) == int(n_b)
    np.testing.assert_array_equal(np.asarray(out_a)[: int(n_a)],
                                  np.asarray(out_b)[: int(n_b)])


def test_orpheus_chunked_matches_whileloop(rng):
    cfg, w = make_orpheus(rng)
    ids = [5, 9, 3]
    toks = np.zeros(8, np.int32)
    toks[: len(ids)] = ids
    shape = (cfg.n_layers, cfg.n_kv_heads, 64, cfg.head_size)
    logits, kv_k, kv_v = orpheus_prefill(cfg, w, jnp.asarray(toks),
                                         jnp.int32(len(ids)),
                                         jnp.zeros(shape), jnp.zeros(shape))
    first = jnp.argmax(logits).astype(jnp.int32)
    out_a, n_a = orpheus_generate_tokens(cfg, w, first, jnp.int32(len(ids)),
                                         kv_k, kv_v, jax.random.PRNGKey(0),
                                         max_steps=9, do_sample=False)
    out_b, n_b = orpheus_generate_tokens_chunked(cfg, w, first, len(ids),
                                                 kv_k, kv_v,
                                                 jax.random.PRNGKey(0),
                                                 max_steps=9, chunk=4,
                                                 do_sample=False)
    assert int(n_a) == int(n_b)
    np.testing.assert_array_equal(np.asarray(out_a)[: int(n_a)],
                                  np.asarray(out_b)[: int(n_b)])
