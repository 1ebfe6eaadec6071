"""GGUF checkpoint writers (offline tooling).

TPU-era equivalent of the reference's py-gguf converters: given plain
numpy weight dicts (e.g. extracted from HF torch state dicts), write GGUF
files with the exact key/tensor naming the reference engine — and this
framework — loads. Because this environment has no network access, the HF
download step is decoupled: callers hand in arrays.

Naming parity: py-gguf/tts_encoders/*.py (see each function's docstring).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from ..gguf import GGUFWriter, quants


def write_parler_gguf(
    path: str,
    *,
    hidden_size: int,
    n_layers: int,
    n_attn_heads: int,
    n_output_heads: int,
    output_vocab_size: int,
    max_generation: int,
    max_ctx: int,
    bos_token_id: int,
    eos_token_id: int,
    decoder_tensors: Dict[str, np.ndarray],
    tokenizer_tokens: Sequence[str],
    tokenizer_scores: Sequence[float],
    tokenizer_unk_id: int = 0,
    tokenizer_eos_id: int = 1,
    text_encoding: Optional[np.ndarray] = None,
    dac_tensors: Optional[Dict[str, np.ndarray]] = None,
    dac_strides: Sequence[int] = (8, 8, 4, 2),
    dac_paddings: Sequence[int] = (4, 4, 2, 1),
    dac_up_sampling_factor: int = 512,
) -> None:
    """Parler-TTS GGUF (parity: parler_tts_gguf_encoder.py + dac encoder).

    decoder_tensors keys are relative to the 'decoder.' prefix (e.g.
    'layers.0.self_attn.q_proj.weight'); dac_tensors relative to
    'audio_encoder.'.
    """
    w = GGUFWriter(path, "parler-tts")
    w.add_u32("parler-tts.decoder.hidden_size", hidden_size)
    w.add_u32("parler-tts.decoder.num_hidden_layers", n_layers)
    w.add_u32("parler-tts.decoder.attention.head_count", n_attn_heads)
    w.add_u32("parler-tts.decoder.output_heads", n_output_heads)
    w.add_u32("parler-tts.decoder.out_vocab_size", output_vocab_size)
    w.add_u32("parler-tts.decoder.audio_vocab_size", eos_token_id)
    w.add_u32("parler-tts.decoder.max_generation", max_generation)
    w.add_u32("parler-tts.decoder.context_length", max_ctx)
    w.add_u32("audio.bos_token_id", bos_token_id)
    w.add_u32("audio.eos_token_id", eos_token_id)
    if text_encoding is not None:
        w.add_u32("parler-tts.decoder.encode_length", text_encoding.shape[0])
    w.add_str("tokenizer.ggml.model", "unigram")
    w.add_array("tokenizer.ggml.tokens", list(tokenizer_tokens))
    w.add_array("tokenizer.ggml.scores",
                np.asarray(tokenizer_scores, np.float32))
    w.add_u32("tokenizer.ggml.unknown_token_id", tokenizer_unk_id)
    w.add_u32("tokenizer.ggml.eos_token_id", tokenizer_eos_id)
    if dac_tensors is not None:
        w.add_u32("dac.up_scaling_factor", dac_up_sampling_factor)
        w.add_u32("dac.up_sampling_factor", dac_up_sampling_factor)
        for i, (s, p) in enumerate(zip(dac_strides, dac_paddings)):
            w.add_u32(f"dac.dac_layer_stride_{i}", s)
            w.add_u32(f"dac.dac_layer_padding_{i}", p)
    for name, arr in decoder_tensors.items():
        w.add_tensor(f"decoder.{name}", np.asarray(arr, np.float32))
    if text_encoding is not None:
        w.add_tensor("decoder.text_encoding",
                     np.asarray(text_encoding, np.float32))
    for name, arr in (dac_tensors or {}).items():
        w.add_tensor(f"audio_encoder.{name}", np.asarray(arr, np.float32))
    w.write()


def write_t5_gguf(
    path: str,
    *,
    hidden_size: int,
    n_layers: int,
    n_attn_heads: int,
    vocab_size: int,
    output_size: int,
    tensors: Dict[str, np.ndarray],
    tokenizer_tokens: Sequence[str],
    tokenizer_scores: Sequence[float],
    max_ctx: int = 512,
) -> None:
    """T5 encoder GGUF (parity: t5_encoder_gguf_encoder.py). tensors keys are
    full names ('t5encoder.enc.blk.N.attn_q', ...)."""
    w = GGUFWriter(path, "t5encoder")
    w.add_u32("t5encoder.embedding_length", hidden_size)
    w.add_u32("t5encoder.block_count", n_layers)
    w.add_u32("t5encoder.attention.head_count", n_attn_heads)
    w.add_u32("t5encoder.vocab_size", vocab_size)
    w.add_u32("t5encoder.output_size", output_size)
    w.add_u32("t5encoder.context_length", max_ctx)
    w.add_str("tokenizer.ggml.model", "unigram")
    w.add_array("tokenizer.ggml.tokens", list(tokenizer_tokens))
    w.add_array("tokenizer.ggml.scores",
                np.asarray(tokenizer_scores, np.float32))
    w.add_u32("tokenizer.ggml.unknown_token_id", 2)
    w.add_u32("tokenizer.ggml.eos_token_id", 1)
    w.add_u32("tokenizer.ggml.bos_token_id", 0)
    for name, arr in tensors.items():
        w.add_tensor(name, np.asarray(arr, np.float32))
    w.write()
