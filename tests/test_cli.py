"""CLI + registry + audio IO tests (dummy model path, no weights)."""
import numpy as np
import pytest

from tts_tpu.apps.cli import main
from tts_tpu.audio.wav import (decode_aiff, decode_wav, encode_aiff,
                               encode_wav, read_audio_file,
                               write_audio_file)
from tts_tpu.audio.vad import apply_energy_voice_inactivity_detection
from tts_tpu.models.registry import runner_from_file


def test_dummy_runner():
    r = runner_from_file("test:dummy")
    resp = r.generate("ab")
    assert resp.sample_rate == 44100
    assert resp.n_outputs == 2 * 44100
    # per-character sine parity vs reference formula (dummy/model.cpp:6-19)
    j = np.arange(44100, dtype=np.float32)
    wl = np.float32(44100 / np.pi / 2) / np.float32(200 + ord("a"))
    expect = np.sin(j * np.float32(np.pi / 44100)) * np.sin(j / wl)
    np.testing.assert_allclose(resp.audio[:44100], expect, atol=1e-5)


def test_cli_dummy_wav(tmp_path):
    out = str(tmp_path / "out.wav")
    rc = main(["--model-path", "test:dummy", "--prompt", "hi",
               "--save-path", out])
    assert rc == 0
    audio, rate = decode_wav(open(out, "rb").read())
    assert rate == 44100
    assert len(audio) == 2 * 44100


def test_cli_rejects_bad_top_p(tmp_path):
    rc = main(["--model-path", "test:dummy", "--prompt", "x",
               "--top-p", "1.5"])
    assert rc == 1


def test_wav_roundtrip(rng):
    x = (rng.standard_normal(1000) * 0.3).astype(np.float32)
    for depth, tol in [(16, 1e-4), (24, 1e-6), (32, 1e-7)]:
        audio, rate = decode_wav(encode_wav(x, 22050, depth))
        assert rate == 22050
        np.testing.assert_allclose(audio, np.clip(x, -1, 1), atol=tol)


def test_aiff_header(rng):
    x = (rng.standard_normal(100) * 0.1).astype(np.float32)
    data = encode_aiff(x, 24000)
    assert data[:4] == b"FORM" and data[8:12] == b"AIFF"


def test_aiff_roundtrip(rng):
    x = (rng.standard_normal(1000) * 0.3).astype(np.float32)
    for depth, tol in [(16, 1e-4), (24, 1e-6), (32, 1e-7)]:
        audio, rate = decode_aiff(encode_aiff(x, 24000, depth))
        assert rate == 24000
        np.testing.assert_allclose(audio, np.clip(x, -1, 1), atol=tol)


def test_read_audio_file_sniffs_format(rng, tmp_path):
    x = (rng.standard_normal(500) * 0.2).astype(np.float32)
    for name in ("a.wav", "b.aiff"):
        p = str(tmp_path / name)
        write_audio_file(x, p, 22050)
        audio, rate = read_audio_file(p)
        assert rate == 22050
        np.testing.assert_allclose(audio, x, atol=1e-4)


def test_vad_trims_trailing_silence():
    sr = 44100
    t = np.arange(sr, dtype=np.float32) / sr
    speech = np.sin(2 * np.pi * 220 * t) * 0.5
    silence = np.zeros(sr, np.float32)
    audio = np.concatenate([speech, silence])
    trimmed = apply_energy_voice_inactivity_detection(audio, sr)
    assert len(trimmed) < len(audio)
    assert len(trimmed) >= len(speech) - sr // 10


def test_vad_keeps_speech():
    sr = 44100
    t = np.arange(2 * sr, dtype=np.float32) / sr
    speech = (np.sin(2 * np.pi * 220 * t) * 0.5).astype(np.float32)
    trimmed = apply_energy_voice_inactivity_detection(speech, sr)
    assert len(trimmed) == len(speech)
