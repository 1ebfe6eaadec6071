"""Common types shared across the framework.

Parity with reference include/common.h:13-101 (`tts_arch`, `tts_response`,
`generation_configuration`), re-expressed as plain dataclasses. The response
holds a numpy waveform (host side) — device arrays are converted at the
runner boundary, mirroring the reference's D2H fetch of the output tensor.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import numpy as np

# Audio-rate constants (reference: src/decoder/dac_model.h:27-31,
# src/models/kokoro/model.h:231, src/models/orpheus/model.h:122).
SAMPLE_RATE_DAC = 44_100
SAMPLE_RATE_KOKORO = 24_000
SAMPLE_RATE_SNAC = 24_000
DAC_SAMPLES_PER_TOKEN = 512
KOKORO_SAMPLES_PER_FRAME = 600
SNAC_SAMPLES_PER_TOKEN = 512


class Arch(str, enum.Enum):
    """Supported model architectures (reference include/common.h:13-42)."""

    PARLER = "parler-tts"
    KOKORO = "kokoro"
    DIA = "dia"
    ORPHEUS = "orpheus"
    T5 = "t5-encoder"
    DAC = "dac"
    SNAC = "snac"
    DUMMY = "dummy"

    @classmethod
    def from_gguf(cls, name: str) -> "Arch":
        aliases = {
            "parler-tts": cls.PARLER,
            "parler_tts": cls.PARLER,
            "kokoro": cls.KOKORO,
            "dia": cls.DIA,
            "orpheus": cls.ORPHEUS,
            "t5-encoder": cls.T5,
            "t5encoder": cls.T5,
            "dac": cls.DAC,
            "snac": cls.SNAC,
            "dummy": cls.DUMMY,
        }
        if name not in aliases:
            raise ValueError(f"unsupported architecture: {name!r}")
        return aliases[name]


@dataclasses.dataclass
class GenerationConfig:
    """Per-request sampling/generation settings.

    Parity: reference `generation_configuration` include/common.h:45-66.
    """

    voice: str = ""
    top_k: int = 0  # 0 => disabled (reference uses max_top_k sentinel)
    temperature: float = 1.0
    repetition_penalty: float = 1.0
    use_cross_attn: bool = True
    espeak_voice_id: str = ""
    max_tokens: int = 0  # 0 => model default
    top_p: float = 1.0
    sample: bool = True
    seed: Optional[int] = None  # TPU addition: explicit PRNG seed


@dataclasses.dataclass
class TTSResponse:
    """Generated audio (reference `tts_response` include/common.h:70-74)."""

    audio: np.ndarray  # float32 waveform, mono
    sample_rate: int

    @property
    def n_outputs(self) -> int:
        return int(self.audio.shape[-1])

    @property
    def duration_s(self) -> float:
        return self.n_outputs / float(self.sample_rate)


def kv_cache_dtype():
    """Dtype for autoregressive KV caches.

    bfloat16 on TPU: halves the per-step cache read (the decode loop's
    second-largest HBM stream after the quantized weights) at <0.3% logit
    delta; float32 elsewhere so CPU golden/parity tests stay exact. Override
    with TTS_TPU_KV_DTYPE=float32|bfloat16.
    """
    import os

    import jax
    import jax.numpy as jnp

    env = os.environ.get("TTS_TPU_KV_DTYPE")
    if env:
        return jnp.dtype(env)
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    return jnp.bfloat16 if on_tpu else jnp.float32


def chunk_schedule(first: int = 64, cap: int = 256):
    """Yield decode-chunk sizes 64, 128, 256, 256, ... .

    Each host-side chunk boundary costs one dispatch round-trip (~33 ms on
    the axon relay), so chunks grow geometrically; the first chunks stay
    small so short generations don't overshoot EOS by hundreds of steps.
    """
    c = first
    while True:
        yield c
        c = min(c * 2, cap)
