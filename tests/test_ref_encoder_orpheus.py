"""Golden parity through the reference's Orpheus GGUF converter
(/root/reference/py-gguf/tts_encoders/orpheus_gguf_encoder.py), driven
unmodified over a tiny REAL transformers LlamaForCausalLM (the exact module
tree the encoder walks) plus a tiny SNAC-shaped torch model with new-style
weight-norm parametrizations. Verifies: the GGUF loads through tts_tpu's
registry, every tensor is consumed, llama3 rope_frequencies match, the BPE
tokenizer round-trips, SNAC weight-norm tensors load bit-exactly, and a
prefill forward matches the HF llama logits.
"""
from __future__ import annotations

from types import SimpleNamespace

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from ref_encoder_common import import_tts_encoders, Snake

H, LAYERS, HEADS, KV, HD, VOCAB, FFN = 64, 2, 4, 2, 16, 300, 128


def pwn(m):
    return torch.nn.utils.parametrizations.weight_norm(m)


def _tiny_llama():
    from transformers import LlamaConfig, LlamaForCausalLM
    cfg = LlamaConfig(
        vocab_size=VOCAB, hidden_size=H, intermediate_size=FFN,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        num_key_value_heads=KV, head_dim=HD, max_position_embeddings=256,
        rope_theta=500000.0,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 64},
        tie_word_embeddings=False, attention_bias=False, mlp_bias=False,
        rms_norm_eps=1e-5,       # llama-3/Orpheus value, hardcoded in
        eos_token_id=2, bos_token_id=1)  # reference model.cpp rms norms
    torch.manual_seed(11)
    return LlamaForCausalLM(cfg).eval()


class _SnacResUnit(nn.Module):
    def __init__(self, c, dilation, padding, groups=1):
        super().__init__()
        self.block = nn.Sequential(
            Snake(c),
            pwn(nn.Conv1d(c, c, 7, dilation=dilation, padding=padding,
                          groups=groups)),
            Snake(c),
            pwn(nn.Conv1d(c, c, 1)))


def _snac_decoder_block_cls(DecoderBlock):
    class _SnacDecBlock(nn.Module, DecoderBlock):
        def __init__(self, cin, cout, stride, padding, groups=1):
            nn.Module.__init__(self)
            self.block = nn.Sequential(
                Snake(cin),
                pwn(nn.ConvTranspose1d(cin, cout, 2 * stride, stride=stride,
                                       padding=padding)),
                pwn(nn.Conv1d(cout, cout, 1, bias=False)),   # noise conv
                _SnacResUnit(cout, 1, 3, groups=groups),
                _SnacResUnit(cout, 3, 9, groups=groups),
                _SnacResUnit(cout, 9, 27, groups=groups))
    return _SnacDecBlock


class _SnacQuantizer(nn.Module):
    def __init__(self, latent, cb_dim, cb_size, n):
        super().__init__()
        self.n_codebooks = n
        self.quantizers = nn.ModuleList()
        for _ in range(n):
            q = nn.Module()
            q.codebook = nn.Embedding(cb_size, cb_dim)
            q.out_proj = pwn(nn.Conv1d(cb_dim, latent, 1))
            self.quantizers.append(q)


def _tiny_snac(DecoderBlock):
    torch.manual_seed(13)
    blk = _snac_decoder_block_cls(DecoderBlock)
    latent = 16
    chans = (12, 8, 8, 4, 4)
    model = nn.Module()
    model.quantizer = _SnacQuantizer(latent, 6, 24, 3)
    model.decoder = nn.Module()
    model.decoder.model = nn.Sequential(
        pwn(nn.Conv1d(latent, chans[0], 7, padding=3, groups=1)),
        pwn(nn.Conv1d(chans[0], chans[0], 1)),
        blk(chans[0], chans[1], 2, 1),
        blk(chans[1], chans[2], 2, 1),
        blk(chans[2], chans[3], 2, 1, groups=chans[3]),
        blk(chans[3], chans[4], 1, 1),
        Snake(chans[4]),
        pwn(nn.Conv1d(chans[4], 1, 7, padding=3)))
    return model


_TOK_JSON = {
    "model": {
        "type": "BPE",
        "vocab": {"h": 0, "e": 1, "l": 2, "o": 3, " ": 4, "v": 5, "i": 6,
                  "c": 7, "he": 8, "ll": 9, "hell": 10, "hello": 11,
                  "vo": 12, "ic": 13, "voic": 14, "voice": 15, ":": 16,
                  "Ġ": 17, "Ġhe": 18, "Ġhell": 19, "Ġhello": 20},
        "merges": [["h", "e"], ["l", "l"], ["he", "ll"], ["hell", "o"],
                   ["v", "o"], ["i", "c"], ["vo", "ic"], ["voic", "e"],
                   ["Ġ", "he"], ["Ġhe", "ll"], ["Ġhell", "o"]],
    }
}


@pytest.fixture(scope="module")
def orpheus_gguf(tmp_path_factory):
    tts_encoders, stubs = import_tts_encoders()
    from tts_encoders import orpheus_gguf_encoder as mod
    path = tmp_path_factory.mktemp("refenc_orpheus") / "orpheus.gguf"
    enc = tts_encoders.OrpheusEncoder(model_path=path,
                                      repo_id="tiny/fake-orpheus")
    model = _tiny_llama()
    enc._model = model
    enc._snac_model = _tiny_snac(mod.DecoderBlock)
    enc._tokenizer_json = _TOK_JSON
    enc.write()
    return path, model, enc


def test_orpheus_encoder_file_loads(orpheus_gguf):
    path, model, enc = orpheus_gguf
    from tts_tpu.gguf.reader import GGUFReader
    r = GGUFReader(str(path))
    md = r.metadata
    assert md["general.architecture"] == "orpheus"
    assert md["orpheus.hidden_size"] == H
    assert md["orpheus.attn_heads"] == HEADS
    assert md["orpheus.kv_attn_heads"] == KV
    assert md["orpheus.head_dim"] == HD
    assert md["orpheus.layers"] == LAYERS
    assert md["orpheus.stopping_token_id"] == 128258
    assert md["snac.audio_token_channels"] == 3
    assert md["snac.snac_layer_stride_0"] == 2
    assert md["snac.snac_layer_grouping_2"] == 4    # depthwise block
    # llama3 rope frequency factors match tts_tpu's own formula
    got = np.asarray(r.array("orpheus.rope_frequencies"), np.float32)
    assert got.shape == (HD // 2,)
    from tts_tpu.ops.attention import rope_freqs
    base_inv = 1.0 / (500000.0 ** (np.arange(0, HD, 2) / HD))
    with_factors = np.asarray(rope_freqs(HD, 500000.0, jnp.asarray(got)))
    np.testing.assert_allclose(with_factors, base_inv / got, rtol=1e-6)


def test_orpheus_runner_consumes_all_tensors(orpheus_gguf):
    path, model, enc = orpheus_gguf
    from tts_tpu.gguf.reader import GGUFReader
    from tts_tpu.models.registry import runner_from_file
    runner = runner_from_file(str(path))
    r = GGUFReader(str(path))
    names = set(r.tensors)
    # llama side: every written tensor has a loader consumer
    for l in range(LAYERS):
        b = f"orpheus.layers.{l}."
        for part in ("self_attn.q_proj", "self_attn.k_proj",
                     "self_attn.v_proj", "self_attn.o_proj",
                     "mlp.gate_proj", "mlp.up_proj", "mlp.down_proj",
                     "input_layernorm", "post_attention_layernorm"):
            assert b + part in names
    for n in ("orpheus.embed_tokens", "orpheus.norm", "orpheus.lm_head",
              "orpheus.rope_frequencies"):
        assert n in names
    # snac side loaded into SNACWeights
    assert runner.snac is not None
    snacw = runner.snac.weights
    tm = enc._snac_model
    w_in = torch._weight_norm(
        tm.decoder.model[0].parametrizations.weight.original1,
        tm.decoder.model[0].parametrizations.weight.original0, 0)
    np.testing.assert_allclose(np.asarray(snacw.in_w),
                               w_in.detach().numpy(), rtol=1e-6, atol=1e-6)
    w_up1 = torch._weight_norm(
        tm.decoder.model[2].block[1].parametrizations.weight.original1,
        tm.decoder.model[2].block[1].parametrizations.weight.original0, 0)
    np.testing.assert_allclose(np.asarray(snacw.layers[0].up_w),
                               w_up1.detach().numpy(), rtol=1e-6, atol=1e-6)
    ru = tm.decoder.model[2].block[3].block
    w_ru = torch._weight_norm(ru[1].parametrizations.weight.original1,
                              ru[1].parametrizations.weight.original0, 0)
    np.testing.assert_allclose(np.asarray(snacw.layers[0].units[0].in_w),
                               w_ru.detach().numpy(), rtol=1e-6, atol=1e-6)
    assert snacw.layers[0].noise_w is not None
    np.testing.assert_allclose(
        np.asarray(snacw.quantizers[1].codebook),
        tm.quantizer.quantizers[1].codebook.weight.detach().numpy(),
        rtol=1e-6, atol=1e-6)


def test_orpheus_bpe_tokenizer_roundtrip(orpheus_gguf):
    path, model, enc = orpheus_gguf
    from tts_tpu.models.registry import runner_from_file
    runner = runner_from_file(str(path))
    assert runner.tokenizer.tokenize("hello") == [11]
    # spaces latch a Ġ prefix onto the next word and emit no token
    # (reference tokenizer.cpp:265-275); "Ġhello" assembles via merges
    assert runner.tokenizer.tokenize("voice: hello") == [15, 16, 20]


def test_orpheus_prefill_logit_parity(orpheus_gguf):
    """Padded-prompt prefill through the GGUF-loaded weights == HF llama
    forward logits at the last real position."""
    path, model, enc = orpheus_gguf
    from tts_tpu.models.registry import runner_from_file
    from tts_tpu.models.orpheus.model import orpheus_prefill
    runner = runner_from_file(str(path))
    cfg, w = runner.cfg, runner.weights
    assert cfg.hidden_size == H and cfg.n_layers == LAYERS
    ids = [1, 17, 42, 99, 5]
    P = 8
    toks = np.zeros(P, np.int32)
    toks[: len(ids)] = ids
    ctx = 32
    shape = (cfg.n_layers, cfg.n_kv_heads, ctx, cfg.head_size)
    kv_k, kv_v = jnp.zeros(shape), jnp.zeros(shape)
    logits, _, _ = orpheus_prefill(cfg, w, jnp.asarray(toks),
                                   jnp.int32(len(ids)), kv_k, kv_v)
    with torch.no_grad():
        want = model(torch.tensor([ids])).logits[0, -1]
    np.testing.assert_allclose(np.asarray(logits), want.numpy(),
                               rtol=2e-3, atol=2e-3)
