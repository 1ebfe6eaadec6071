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
