"""Continuous-batching engine: batched decode must match single-stream
generation exactly (greedy), with mixed prompts, slot reuse, and per-request
sampling params in one compiled program."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_e2e_parler import make_tiny_parler_gguf
from tts_tpu.common import GenerationConfig
from tts_tpu.models.registry import runner_from_file
from tts_tpu.runtime.batched_parler import BatchedParlerEngine


@pytest.fixture()
def tiny_runner(tmp_path, rng):
    path = str(tmp_path / "tiny.gguf")
    make_tiny_parler_gguf(path, rng)
    return runner_from_file(path)


def test_batched_matches_single_greedy(tiny_runner):
    runner = tiny_runner
    cfg = GenerationConfig(sample=False, seed=0)
    prompts = ["hello world", "hello", "wor ld a b c"]
    singles = {p: runner.generate_codes(p, cfg) for p in prompts}

    engine = BatchedParlerEngine(runner.cfg, runner.weights, runner.tokenizer,
                                 n_slots=2, chunk=7)
    rids = {engine.submit(p, cfg): p for p in prompts}
    engine.run_until_done()
    for rid, prompt in rids.items():
        got = engine.results[rid]
        want = singles[prompt]
        assert got.shape == want.shape, (prompt, got.shape, want.shape)
        np.testing.assert_array_equal(got, want)


def test_batched_mixed_sampling_configs(tiny_runner):
    runner = tiny_runner
    engine = BatchedParlerEngine(runner.cfg, runner.weights, runner.tokenizer,
                                 n_slots=3, chunk=6)
    r1 = engine.submit("hello", GenerationConfig(sample=False))
    r2 = engine.submit("hello", GenerationConfig(sample=True, temperature=1.5,
                                                 top_k=4))
    r3 = engine.submit("world", GenerationConfig(sample=True, top_p=0.8))
    engine.run_until_done()
    assert set(engine.results) == {r1, r2, r3}
    for rid in (r1, r2, r3):
        assert engine.results[rid].ndim == 2


def _q4_setup(rng):
    """Megakernel-eligible Q4 weights (H=256 hits the %128 gate)."""
    from bench import build_q4_parler
    cfg, w = build_q4_parler(rng, n_layers=2, hidden=256, heads=4, ffn=512,
                             enc_len=32, max_ctx=128)
    cfg.max_generation_size = 40
    return cfg, w


def test_batched_mega_reference_matches_per_slot(rng):
    """The batched megastep reference == the single-stream reference applied
    per slot, at distinct per-slot positions (the spec the TPU kernel is
    checked against by tools/test_megastep_tpu.py)."""
    from tts_tpu.ops.parler_megastep import (
        parler_megastep_batched, parler_megastep_reference, prep_mega_layers)
    cfg, w = _q4_setup(rng)
    mega, qtype = prep_mega_layers(w.layers)
    L, H, nh, d = (cfg.n_layers, cfg.hidden_size, cfg.n_attn_heads,
                   cfg.head_size)
    B, ctx = 4, cfg.max_ctx_length
    kv = rng.standard_normal((2, L, B, nh, ctx, d)).astype(np.float32) * 0.3
    kv_k, kv_v = jnp.asarray(kv[0]), jnp.asarray(kv[1])
    x = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32)) * 0.5
    pos = jnp.asarray([0, 1, 63, 127], jnp.int32)   # incl. empty history
    xo_b, kn_b, vn_b = parler_megastep_batched(
        mega, x, kv_k, kv_v, pos, qtype=qtype, use_cross=True, n_heads=nh)
    for s in range(B):
        xo, kn, vn = parler_megastep_reference(
            mega, x[s:s + 1], kv_k[:, s], kv_v[:, s], pos[s], qtype=qtype,
            use_cross=True, n_heads=nh)
        np.testing.assert_allclose(np.asarray(xo_b[s]), np.asarray(xo[0]),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(kn_b[:, s]), np.asarray(kn),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(vn_b[:, s]), np.asarray(vn),
                                   rtol=1e-5, atol=1e-5)


def test_batched_engine_megakernel_greedy_parity(rng, monkeypatch):
    """Batched engine with the megakernel ON (Q4 weights) must reproduce the
    single-stream megastep decode exactly under greedy decoding."""
    monkeypatch.setenv("TTS_TPU_MEGAKERNEL", "1")
    from tts_tpu.models.parler.model import (
        _parler_init_state, adjust_output_tokens, maybe_prep_mega,
        parler_decode_chunk, parler_prefill)
    cfg, w = _q4_setup(rng)
    mega, qtype = maybe_prep_mega(cfg, w)
    assert mega is not None

    class StubTok:
        eos_token = 2

        def tokenize(self, text):
            return [3 + (ord(c) % 7) for c in text]

    engine = BatchedParlerEngine(cfg, w, StubTok(), n_slots=2, chunk=5)
    assert engine.mega is not None
    gen_cfg = GenerationConfig(sample=False, seed=0)
    prompts = ["hello", "a much longer prompt here"]
    rids = {engine.submit(p, gen_cfg): p for p in prompts}
    engine.run_until_done()

    tok = StubTok()
    shape = (cfg.n_layers, cfg.n_attn_heads, cfg.max_ctx_length,
             cfg.head_size)
    for rid, prompt in rids.items():
        ids = tok.tokenize(prompt) + [tok.eos_token]
        p = next(bk for bk in engine.prompt_buckets if len(ids) <= bk)
        toks = np.zeros((p,), np.int32)
        toks[:len(ids)] = ids
        kv_k, kv_v = parler_prefill(cfg, w, jnp.asarray(toks),
                                    jnp.zeros(shape), jnp.zeros(shape))
        st = _parler_init_state(cfg, jnp.int32(len(ids)), kv_k, kv_v,
                                jax.random.PRNGKey(0))
        n_steps = cfg.max_generation_size - len(ids)
        st = parler_decode_chunk(cfg, w, st, n_steps=n_steps,
                                 do_sample=False, mega=mega, mega_qtype=qtype)
        want = adjust_output_tokens(np.asarray(st.out_tokens),
                                    int(st.step), cfg)
        np.testing.assert_array_equal(engine.results[rid], want)


def test_slot_reuse_more_requests_than_slots(tiny_runner):
    runner = tiny_runner
    cfg = GenerationConfig(sample=False, seed=0)
    engine = BatchedParlerEngine(runner.cfg, runner.weights, runner.tokenizer,
                                 n_slots=2, chunk=8)
    rids = [engine.submit("hello world", cfg) for _ in range(5)]
    engine.run_until_done()
    ref = runner.generate_codes("hello world", cfg)
    for rid in rids:
        np.testing.assert_array_equal(engine.results[rid], ref)
