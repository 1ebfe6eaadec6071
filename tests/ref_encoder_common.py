"""Shared scaffolding for driving the REFERENCE's GGUF converters
(/root/reference/py-gguf/tts_encoders/*.py) unmodified over tiny torch
models (see tests/test_reference_encoders.py for the recipe and rationale).

Provides: the `gguf`/HF-package stubbing importer, a tiny real-transformers
T5 encoder, the unigram HF tokenizer, and the tiny weight-normed torch DAC
model whose parameter tree matches what dac_gguf_encoder walks.
"""
from __future__ import annotations

import sys
import types
from types import SimpleNamespace

import numpy as np
import torch
import torch.nn as nn

import gguf_shim

REF = "/root/reference/py-gguf"

_STUBS = {}


def import_tts_encoders():
    """Import the reference encoder package with `gguf` (and the HF model
    packages it imports at module level) stubbed. Returns (tts_encoders,
    stubs dict name->module) so tests can set attributes on stubs (e.g. a
    real DecoderBlock class for isinstance checks)."""
    sys.modules["gguf"] = gguf_shim

    def stub(name, **attrs):
        if name in sys.modules:
            _STUBS.setdefault(name, sys.modules[name])
            return
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        _STUBS[name] = m

    ph = type("_Placeholder", (), {})
    stub("parler_tts", ParlerTTSForConditionalGeneration=ph)
    stub("kokoro", KPipeline=ph, KModel=ph)
    stub("snac", SNAC=ph)
    stub("snac.layers", DecoderBlock=ph)
    stub("dia")
    stub("dia.model", Dia=ph)
    stub("dia.state", EncoderInferenceState=ph)
    stub("dia.layers", DiaModel=ph)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import tts_encoders
    return tts_encoders, _STUBS


def t5_encoder_model(hidden=64, ffn=128, heads=4, layers=2, vocab=48,
                     d_kv=16, seed=0):
    from transformers import T5Config, T5EncoderModel
    cfg = T5Config(vocab_size=vocab, d_model=hidden, d_kv=d_kv, d_ff=ffn,
                   num_layers=layers, num_heads=heads,
                   feed_forward_proj="gated-gelu", eos_token_id=2,
                   pad_token_id=0, decoder_start_token_id=0)
    torch.manual_seed(seed)
    m = T5EncoderModel(cfg).eval()
    # this transformers version dropped the n_positions alias the reference
    # encoder reads; the real flan-t5 configs carry it
    if not hasattr(m.config, "n_positions"):
        m.config.n_positions = 512
    return m


def unigram_tokenizer():
    """Real tokenizers-lib Unigram wrapped as PreTrainedTokenizerFast (the
    encoders introspect ._tokenizer.model, .vocab, .to_str())."""
    from tokenizers import Tokenizer
    from tokenizers.models import Unigram
    from tokenizers.pre_tokenizers import Metaspace
    from transformers import PreTrainedTokenizerFast
    pieces = [("<unk>", 0.0)]
    words = ["voice", "female", "male", "deep", "calm", "fast", "slow", "a"]
    for i, w in enumerate(words):
        pieces.append((chr(0x2581) + w, -float(i + 1)))
    for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz "):
        pieces.append((ch, -10.0 - i))
    tok = Tokenizer(Unigram(pieces, unk_id=0))
    tok.pre_tokenizer = Metaspace()
    return PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="<unk>")


# --- tiny torch DAC whose tree matches dac_gguf_encoder's walk -------------

class Snake(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.alpha = nn.Parameter(torch.rand(1, c, 1) + 0.5)


def wn(m):
    return torch.nn.utils.weight_norm(m)


class DACResUnit(nn.Module):
    def __init__(self, c, dilation, padding):
        super().__init__()
        self.block = nn.Sequential(
            Snake(c),
            wn(nn.Conv1d(c, c, 7, dilation=dilation, padding=padding)),
            Snake(c),
            wn(nn.Conv1d(c, c, 1)))


class DACDecBlock(nn.Module):
    def __init__(self, cin, cout, stride, padding):
        super().__init__()
        self.block = nn.Sequential(
            Snake(cin),
            wn(nn.ConvTranspose1d(cin, cout, 2 * stride, stride=stride,
                                  padding=padding)),
            DACResUnit(cout, 1, 3), DACResUnit(cout, 3, 9),
            DACResUnit(cout, 9, 27))


class DACDecoder(nn.Module):
    def __init__(self, latent, chans, strides, paddings):
        super().__init__()
        blocks = [wn(nn.Conv1d(latent, chans[0], 7, padding=3))]
        for i, (s, p) in enumerate(zip(strides, paddings)):
            blocks.append(DACDecBlock(chans[i], chans[i + 1], s, p))
        blocks += [Snake(chans[-1]), wn(nn.Conv1d(chans[-1], 1, 7, padding=3))]
        self.model = nn.Sequential(*blocks)


class DACQuantizer(nn.Module):
    def __init__(self, latent, cb_dim, cb_size):
        super().__init__()
        self.codebook = nn.Embedding(cb_size, cb_dim)
        self.out_proj = wn(nn.Conv1d(cb_dim, latent, 1))


class DACModel(nn.Module):
    """.decoder walks as 'model.N...' names; .quantizer.quantizers list."""

    def __init__(self, n_codebooks=3, cb_size=24, latent=16, cb_dim=6,
                 chans=(12, 8, 8, 4, 4), strides=(2, 2, 2, 1),
                 paddings=(1, 1, 1, 1), seed=7):
        super().__init__()
        torch.manual_seed(seed)
        self.decoder = DACDecoder(latent, list(chans), strides, paddings)
        self.quantizer = nn.Module()
        self.quantizer.quantizers = nn.ModuleList(
            [DACQuantizer(latent, cb_dim, cb_size)
             for _ in range(n_codebooks)])
