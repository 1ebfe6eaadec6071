"""tts_tpu — a TPU-native text-to-speech inference framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of TTS.cpp
(reference: /root/reference): four model families (Parler-TTS, Kokoro, Dia,
Orpheus), two neural-codec vocoders (DAC, SNAC), GGUF weight loading with
Q4_0/Q5_0/Q8_0/F16 weight-only quantization, three tokenizers, a native
rule-based IPA phonemizer, CLI + OpenAI-style HTTP server, quantizer tool,
and perf benchmark — redesigned TPU-first:

  * jitted fixed-shape step functions instead of per-step graph rebuilds
    (reference: src/models/parler/model.cpp:648-693 rebuilds its graph every
    decode step),
  * device-side sampling kernels instead of host float* loops
    (reference: src/sampler.cpp),
  * Pallas fused block-dequant matmuls instead of ggml quantized mat_mul,
  * jax.sharding Mesh + collectives instead of a two-backend graph scheduler
    (reference: src/tts_model.cpp:53-67).
"""

__version__ = "0.1.0"

from .common import (  # noqa: F401
    GenerationConfig,
    TTSResponse,
    SAMPLE_RATE_DAC,
    SAMPLE_RATE_KOKORO,
    SAMPLE_RATE_SNAC,
)
