"""Orpheus runner assembly from GGUF (parity: orpheus/loader.cpp)."""
from __future__ import annotations

from ...common import GenerationConfig
from ...gguf.reader import GGUFReader
from ...text import BPETokenizer
from ..codec.snac import SNACConfig, SNACRunner, load_snac_weights
from .model import OrpheusConfig, OrpheusRunner, load_orpheus_weights


def load_orpheus_runner(reader: GGUFReader, config: GenerationConfig,
                        **kw) -> OrpheusRunner:
    cfg = OrpheusConfig.from_gguf(reader)
    tokenizer = BPETokenizer.from_gguf(reader)
    weights = load_orpheus_weights(reader, cfg)
    snac = None
    if any(n.startswith("snac.") for n in reader.tensor_names()):
        snac_cfg = SNACConfig.from_gguf(reader)
        snac = SNACRunner(snac_cfg, load_snac_weights(reader, snac_cfg))
    return OrpheusRunner(cfg, weights, tokenizer, snac)
