"""Streaming generation: concatenated stream must match the one-shot decode
except within the conv margin of chunk seams (exact in the interior)."""
import numpy as np
import pytest

from tts_tpu.common import GenerationConfig
from tts_tpu.models.registry import runner_from_file
from tests.test_e2e_parler import make_tiny_parler_gguf


def test_stream_matches_full(tmp_path, rng):
    path = str(tmp_path / "tiny.gguf")
    make_tiny_parler_gguf(path, rng)
    runner = runner_from_file(path)
    cfg = GenerationConfig(sample=False, seed=0)
    full = runner.generate("hello world", cfg).audio
    chunks = list(runner.generate_stream("hello world", cfg, chunk=5, margin=4))
    stream = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
    assert stream.shape == full.shape
    if len(full):
        # identical except possibly within the margin of seams; demand 95%
        # exact samples and small error elsewhere
        close = np.isclose(stream, full, atol=1e-4)
        assert close.mean() > 0.95
        np.testing.assert_allclose(stream, full, atol=0.2)


def test_stream_first_chunk_latency_shape(tmp_path, rng):
    path = str(tmp_path / "tiny.gguf")
    make_tiny_parler_gguf(path, rng)
    runner = runner_from_file(path)
    cfg = GenerationConfig(sample=False, seed=0)
    gen = runner.generate_stream("hello", cfg, chunk=16, margin=4)
    first = next(gen, None)
    # first chunk (if any audio at all) arrives before the rest completes
    rest = list(gen)
    if first is not None:
        assert first.ndim == 1
