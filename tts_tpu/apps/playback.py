"""Audio playback (parity: reference examples/cli/playback.cpp, SDL2-based).

This environment has no audio device; we try common backends and report
failure so the CLI falls back to writing a file — mirroring the reference's
behavior when built without SDL2_INSTALL.
"""
from __future__ import annotations

import numpy as np


def play_audio(audio: np.ndarray, sample_rate: int) -> bool:
    try:
        import sounddevice  # type: ignore
    except Exception:
        try:
            import simpleaudio  # type: ignore
        except Exception:
            raise RuntimeError("no playback backend (sounddevice/simpleaudio)")
        pcm = (np.clip(audio, -1, 1) * 32767).astype(np.int16)
        simpleaudio.play_buffer(pcm, 1, 2, sample_rate).wait_done()
        return True
    sounddevice.play(audio, sample_rate)
    sounddevice.wait()
    return True
