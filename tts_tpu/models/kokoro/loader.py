"""Kokoro runner assembly from GGUF (parity: kokoro/loader.cpp)."""
from __future__ import annotations

from ...common import GenerationConfig
from ...gguf.reader import GGUFReader
from ...text import SinglePassTokenizer
from .model import KokoroConfig, KokoroRunner, load_kokoro_weights, load_voices


def load_kokoro_runner(reader: GGUFReader, config: GenerationConfig,
                       **kw) -> KokoroRunner:
    cfg = KokoroConfig.from_gguf(reader)
    tokenizer = SinglePassTokenizer.from_gguf(reader, "tokenizer.ggml.tokens")
    weights = load_kokoro_weights(reader, cfg)
    # the reference hardcodes style_half_size=128 and harmonic_num=8
    # (kokoro/model.h:212,227); infer them from the weights so small
    # checkpoints work
    cfg.style_half_size = int(weights.prosody.layers_ada[0].gamma_w.shape[1])
    cfg.harmonic_num = int(weights.decoder.generator.m_source_w.shape[1]) - 1
    voices = load_voices(reader)
    phonemizer = None
    if "phonemizer.graphemes" in reader.metadata:
        try:
            from ...text.phonemizer import Phonemizer
            phonemizer = Phonemizer.from_gguf(reader)
        except Exception:
            phonemizer = None
    return KokoroRunner(cfg, weights, tokenizer, voices, phonemizer)
