"""Continuous-batching parity for the Orpheus (llama) engine.

Greedy tokens from the batched engine must equal the single-stream path per
request — the batched decode is the same math with per-slot positions.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_orpheus import make_orpheus

from tts_tpu.common import GenerationConfig
from tts_tpu.models.orpheus.model import (orpheus_generate_tokens_chunked,
                                          orpheus_prefill,
                                          prepare_output_tokens)
from tts_tpu.ops import sampling
from tts_tpu.runtime.batched_llama import (BatchedLlamaEngine,
                                           batched_llama_decode_chunk,
                                           init_batched_llama_state,
                                           insert_llama_request)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class _Tok:
    def tokenize(self, text):
        return [3 + (ord(c) % 40) for c in text]


def _single_stream(cfg, w, ids, max_steps):
    from tts_tpu.common import kv_cache_dtype
    p = 16
    toks = np.zeros(p, np.int32)
    toks[: len(ids)] = ids
    ctx = cfg.max_context_length + cfg.max_generation_size
    shape = (cfg.n_layers, cfg.n_kv_heads, ctx, cfg.head_size)
    dt = kv_cache_dtype()
    logits, kv_k, kv_v = orpheus_prefill(cfg, w, jnp.asarray(toks),
                                         jnp.int32(len(ids)),
                                         jnp.zeros(shape, dt),
                                         jnp.zeros(shape, dt))
    first = jnp.argmax(logits).astype(jnp.int32)
    out, n_out = orpheus_generate_tokens_chunked(
        cfg, w, first, len(ids), kv_k, kv_v, jax.random.PRNGKey(0),
        max_steps=max_steps, chunk=8, do_sample=False)
    return np.asarray(out)[: int(n_out)]


def test_batched_greedy_matches_single(rng):
    cfg, w = make_orpheus(rng)
    prompts = ([5, 9, 3], [7, 1], [2, 4, 6, 8])
    singles = [_single_stream(cfg, w, ids, cfg.max_generation_size)
               for ids in prompts]

    from tts_tpu.common import kv_cache_dtype
    dt = kv_cache_dtype()
    st = init_batched_llama_state(cfg, 4, jax.random.PRNGKey(1))
    ctx = cfg.max_context_length + cfg.max_generation_size
    shape = (cfg.n_layers, cfg.n_kv_heads, ctx, cfg.head_size)
    for slot, ids in enumerate(prompts):
        toks = np.zeros(16, np.int32)
        toks[: len(ids)] = ids
        logits, kv_k, kv_v = orpheus_prefill(cfg, w, jnp.asarray(toks),
                                             jnp.int32(len(ids)),
                                             jnp.zeros(shape, dt),
                                             jnp.zeros(shape, dt))
        first = jnp.argmax(logits).astype(jnp.int32)
        st = insert_llama_request(cfg, st, slot, kv_k, kv_v, len(ids), first,
                                  False, 1.0, 0, 1.0, 1.0)
    for _ in range(6):
        st = batched_llama_decode_chunk(cfg, w, st, n_steps=8)
    for slot, want in enumerate(singles):
        n = int(np.asarray(st.n_out[slot]))
        got = np.asarray(st.out_tokens[slot])[:n]
        np.testing.assert_array_equal(got, want)
    # empty slot 3 untouched
    assert int(np.asarray(st.n_out[3])) == 0


def test_engine_refills_slots(rng):
    cfg, w = make_orpheus(rng)
    eng = BatchedLlamaEngine(cfg, w, _Tok(), n_slots=2, chunk=8)
    cfgs = GenerationConfig(sample=False)
    rids = [eng.submit(f"req {i}", cfgs) for i in range(4)]
    eng.run_until_done(max_chunks=64)
    assert set(eng.results) == set(rids)
    # identical prompts produce identical head streams
    assert eng.results[rids[0]] is not None
    a = eng.results[rids[1]]
    b = eng.results[rids[3]]
    # requests 1 and 3 share the prompt text "req 1"/"req 3" -> differ only
    # by one token; just check structure (3 SNAC heads, 1:2:4 ratios)
    for r in (a, b):
        assert len(r) == 3
        assert len(r[1]) == 2 * len(r[0])
        assert len(r[2]) == 4 * len(r[0])


def test_batched_megastep_matches_per_matmul(rng, monkeypatch):
    """The batched megakernel path (ops/llama_megastep_batched; XLA
    reference off-TPU) produces the same greedy streams as the
    per-projection batched decode."""
    monkeypatch.setenv("TTS_TPU_MEGAKERNEL", "1")
    from test_llama_megastep import tiny_q4_llama
    from tts_tpu.models.orpheus.model import maybe_prep_llama_mega
    cfg, w = tiny_q4_llama(rng)
    mega, qtype = maybe_prep_llama_mega(cfg, w)
    assert mega is not None
    from tts_tpu.common import kv_cache_dtype
    dt = kv_cache_dtype()
    ctx = -(-(cfg.max_context_length + cfg.max_generation_size) // 256) * 256
    shape = (cfg.n_layers, cfg.n_kv_heads, ctx, cfg.head_size)

    def build(with_mega):
        st = init_batched_llama_state(cfg, 2, jax.random.PRNGKey(1))
        for slot, ids in enumerate(([5, 9, 3], [7, 1])):
            toks = np.zeros(16, np.int32)
            toks[: len(ids)] = ids
            logits, kv_k, kv_v = orpheus_prefill(
                cfg, w, jnp.asarray(toks), jnp.int32(len(ids)),
                jnp.zeros(shape, dt), jnp.zeros(shape, dt))
            first = jnp.argmax(logits).astype(jnp.int32)
            st = insert_llama_request(cfg, st, slot, kv_k, kv_v, len(ids),
                                      first, False, 1.0, 0, 1.0, 1.0)
        kw = dict(mega=mega, mega_qtype=qtype) if with_mega else {}
        for _ in range(3):
            st = batched_llama_decode_chunk(cfg, w, st, n_steps=6, **kw)
        return st

    st_m, st_f = build(True), build(False)
    for slot in range(2):
        n = min(int(st_m.n_out[slot]), int(st_f.n_out[slot]))
        a = np.asarray(st_m.out_tokens[slot])[:n]
        b = np.asarray(st_f.out_tokens[slot])[:n]
        agree = (a == b).mean()
        assert agree > 0.7, (slot, agree, a, b)


def test_oversized_prompt_rejected_at_submit(rng):
    cfg, w = make_orpheus(rng)
    eng = BatchedLlamaEngine(cfg, w, _Tok(), n_slots=2, chunk=8)
    with pytest.raises(ValueError, match="too large"):
        eng.submit("x" * (cfg.max_context_length + 8),
                   GenerationConfig(sample=False))
    assert not eng.pending and not eng.errors


def test_failing_request_fails_only_itself(rng, monkeypatch):
    """A request whose prefill raises (e.g. slipped past validation) is
    recorded in engine.errors and the other in-flight requests complete."""
    cfg, w = make_orpheus(rng)
    eng = BatchedLlamaEngine(cfg, w, _Tok(), n_slots=1, chunk=8)
    real = eng._prefill

    def boom(text, config):
        if "bad" in text:
            raise ValueError("synthetic prefill failure")
        return real(text, config)

    monkeypatch.setattr(eng, "_prefill", boom)
    good1 = eng.submit("ok one", GenerationConfig(sample=False))
    bad = eng.submit("bad", GenerationConfig(sample=False))
    good2 = eng.submit("ok two", GenerationConfig(sample=False))
    eng.run_until_done(max_chunks=64)
    assert bad in eng.errors and "synthetic" in eng.errors[bad]
    assert good1 in eng.results and good2 in eng.results
    assert bad not in eng.results
