"""Dia runner assembly from GGUF (parity: dia/loader.cpp)."""
from __future__ import annotations

from ...common import GenerationConfig
from ...gguf.reader import GGUFReader
from ..codec.dac import DACConfig, DACRunner, load_dac_weights
from .model import DiaConfig, DiaRunner, load_dia_weights


def load_dia_runner(reader: GGUFReader, config: GenerationConfig,
                    **kw) -> DiaRunner:
    cfg = DiaConfig.from_gguf(reader)
    weights = load_dia_weights(reader, cfg)
    dac = None
    if any(n.startswith("audio_encoder.") for n in reader.tensor_names()):
        dac_cfg = DACConfig.from_gguf(reader)
        dac = DACRunner(dac_cfg, load_dac_weights(reader, dac_cfg))
    return DiaRunner(cfg, weights, dac)
