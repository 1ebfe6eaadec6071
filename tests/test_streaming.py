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


def test_dia_stream_matches_full(tmp_path, rng):
    from tests.test_dac import make_tiny_dac
    from tests.test_dia import make_cfg as dia_cfg, make_weights as dia_weights
    from tests.test_e2e_dia_orpheus import serialize_dia
    from tts_tpu.models.codec.dac import DACRunner

    cfg = dia_cfg()
    w = dia_weights(cfg, rng)
    path = str(tmp_path / "dia-tiny.gguf")
    serialize_dia(path, cfg, w)
    runner = runner_from_file(path)
    dac_cfg, dac_w = make_tiny_dac(rng)
    runner.dac = DACRunner(dac_cfg, dac_w)

    gconf = GenerationConfig(sample=False, seed=3)
    full = runner.generate("[S1] hello there", gconf).audio
    chunks = list(runner.generate_stream("[S1] hello there", gconf,
                                         chunk=6, margin=8))
    stream = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
    assert stream.shape == full.shape
    if len(full):
        # the tiny DAC's receptive field (~20 code frames) exceeds the
        # margin, so only demand majority-exact + small seam error
        close = np.isclose(stream, full, atol=1e-4)
        assert close.mean() > 0.8
        np.testing.assert_allclose(stream, full, atol=0.5)


def test_orpheus_stream_matches_full(tmp_path, rng):
    from tests.test_e2e_dia_orpheus import serialize_orpheus
    from tests.test_orpheus import make_orpheus, make_tiny_snac

    cfg, w = make_orpheus(rng)
    snac_cfg, snac_w = make_tiny_snac(rng)
    path = str(tmp_path / "orpheus-tiny.gguf")
    serialize_orpheus(path, cfg, w, snac_cfg, snac_w)
    runner = runner_from_file(path)
    # tiny vocab can't hold the real special prompt tokens — feed small ids
    runner._prompt_ids = lambda text, voice: [5, 6, 8]

    gconf = GenerationConfig(sample=False, seed=7)
    full = runner.generate("hi", gconf).audio
    chunks = list(runner.generate_stream("hi", gconf, chunk=7, margin=4))
    stream = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
    assert stream.shape == full.shape
    if len(full):
        # position-stable SNAC noise: identical away from chunk seams (the
        # tiny random-weight SNAC has a receptive field wider than the
        # margin, so seam samples can differ — demand majority-exact and a
        # small mean deviation rather than a tight per-sample bound)
        close = np.isclose(stream, full, atol=1e-4)
        assert close.mean() > 0.75
        assert np.abs(stream - full).mean() < 0.2


def test_kokoro_stream_matches_full(tmp_path, rng):
    from tests.test_e2e_kokoro import serialize_kokoro, tiny_kokoro

    cfg, w = tiny_kokoro(rng)
    tokens = ["$", "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k",
              "l", "m", "n", "o", " ", ".", "!", "?"]
    voices = {"af_heart": rng.standard_normal((32, 16)).astype(np.float32) * 0.2}
    path = str(tmp_path / "kokoro-tiny.gguf")
    serialize_kokoro(path, cfg, w, voices, tokens)
    runner = runner_from_file(path)

    gconf = GenerationConfig(voice="af_heart", seed=0)
    full = runner.generate("abc def", gconf).audio
    chunks = list(runner.generate_stream("abc def", gconf))
    stream = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
    # feed-forward model: per-chunk synthesis is the full pipeline, exact
    np.testing.assert_allclose(stream, full, atol=0)


def test_base_runner_stream_fallback(tmp_path):
    runner = runner_from_file("test:dummy")
    full = runner.generate("abc").audio
    chunks = list(runner.generate_stream("abc"))
    stream = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
    np.testing.assert_allclose(stream, full)
