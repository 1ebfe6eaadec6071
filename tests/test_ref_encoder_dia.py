"""Golden parity through the reference's Dia GGUF converter
(/root/reference/py-gguf/tts_encoders/dia_gguf_encoder.py), driven
unmodified over a tiny torch model with the exact parameter tree (DenseGeneral
(in, heads, head_dim) attention params, fused wi_fused MLP, per-channel
logits_dense) plus the weight-normed DAC. Verifies the converter's
transposes/splits load through tts_tpu's registry, config round-trips
(including the encoder hidden size the converter never writes), and the
encoder forward matches a torch mirror.
"""
from __future__ import annotations

from types import SimpleNamespace

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from ref_encoder_common import import_tts_encoders, DACModel

EH, DH, NH, KVH, HD = 32, 64, 4, 2, 16
EL, DL, EF, DF = 2, 2, 64, 96
CHANNELS, TGT_VOCAB, AUDIO_EOS = 3, 32, 24
TEXT_LEN, AUDIO_LEN = 64, 48


class _Norm(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.weight = nn.Parameter(torch.rand(d) * 0.2 + 0.9)


class _EncLayer(nn.Module):
    def __init__(self):
        super().__init__()
        self.pre_sa_norm = _Norm(EH)
        self.post_sa_norm = _Norm(EH)
        self.self_attention = nn.Module()
        self.self_attention.q_proj = nn.Module()
        self.self_attention.q_proj.weight = nn.Parameter(
            torch.randn(EH, NH, HD) * 0.1)
        self.self_attention.k_proj = nn.Module()
        self.self_attention.k_proj.weight = nn.Parameter(
            torch.randn(EH, NH, HD) * 0.1)
        self.self_attention.v_proj = nn.Module()
        self.self_attention.v_proj.weight = nn.Parameter(
            torch.randn(EH, NH, HD) * 0.1)
        self.self_attention.o_proj = nn.Module()
        self.self_attention.o_proj.weight = nn.Parameter(
            torch.randn(NH, HD, EH) * 0.1)
        self.mlp = nn.Module()
        self.mlp.wi_fused = nn.Module()
        self.mlp.wi_fused.weight = nn.Parameter(torch.randn(EH, 2, EF) * 0.1)
        self.mlp.wo = nn.Module()
        self.mlp.wo.weight = nn.Parameter(torch.randn(EF, EH) * 0.1)


class _DecLayer(nn.Module):
    def __init__(self):
        super().__init__()
        self.pre_sa_norm = _Norm(DH)
        self.pre_ca_norm = _Norm(DH)
        self.pre_mlp_norm = _Norm(DH)
        self.self_attention = nn.Module()
        for pn, shape in (("q_proj", (DH, NH, HD)), ("k_proj", (DH, KVH, HD)),
                          ("v_proj", (DH, KVH, HD)), ("o_proj", (NH, HD, DH))):
            m = nn.Module()
            m.weight = nn.Parameter(torch.randn(*shape) * 0.1)
            setattr(self.self_attention, pn, m)
        self.cross_attention = nn.Module()
        for pn, shape in (("q_proj", (DH, NH, HD)), ("k_proj", (EH, NH, HD)),
                          ("v_proj", (EH, NH, HD)), ("o_proj", (NH, HD, DH))):
            m = nn.Module()
            m.weight = nn.Parameter(torch.randn(*shape) * 0.1)
            setattr(self.cross_attention, pn, m)
        self.mlp = nn.Module()
        self.mlp.wi_fused = nn.Module()
        self.mlp.wi_fused.weight = nn.Parameter(torch.randn(DH, 2, DF) * 0.1)
        self.mlp.wo = nn.Module()
        self.mlp.wo.weight = nn.Parameter(torch.randn(DF, DH) * 0.1)


class _DiaModel(nn.Module):
    def __init__(self):
        super().__init__()
        torch.manual_seed(17)
        self.encoder = nn.Module()
        self.encoder.embedding = nn.Embedding(256, EH)
        self.encoder.norm = _Norm(EH)
        self.encoder.layers = nn.ModuleList([_EncLayer() for _ in range(EL)])
        self.decoder = nn.Module()
        self.decoder.embeddings = nn.ModuleList(
            [nn.Embedding(TGT_VOCAB, DH) for _ in range(CHANNELS)])
        self.decoder.norm = _Norm(DH)
        self.decoder.layers = nn.ModuleList([_DecLayer() for _ in range(DL)])
        self.decoder.logits_dense = nn.Module()
        self.decoder.logits_dense.weight = nn.Parameter(
            torch.randn(DH, CHANNELS, TGT_VOCAB) * 0.1)
        enc_cfg = SimpleNamespace(head_dim=HD, n_head=NH, n_layer=EL)
        dec_cfg = SimpleNamespace(n_embd=DH, n_layer=DL,
                                  gqa_query_heads=NH, kv_heads=KVH)
        self.config = SimpleNamespace(
            data=SimpleNamespace(audio_bos_value=26, audio_eos_value=AUDIO_EOS,
                                 audio_pad_value=25,
                                 delay_pattern=[0, 1, 2],
                                 text_length=TEXT_LEN,
                                 audio_length=AUDIO_LEN, channels=CHANNELS),
            model=SimpleNamespace(encoder=enc_cfg, decoder=dec_cfg,
                                  tgt_vocab_size=TGT_VOCAB))


class _FakeDia:
    """What DiaEncoder reads: ._model.model (DiaModel) and ._model.dac_model."""

    def __init__(self):
        self.model = _DiaModel().eval()
        self.dac_model = DACModel(n_codebooks=CHANNELS, cb_size=AUDIO_EOS)


@pytest.fixture(scope="module")
def dia_gguf(tmp_path_factory):
    tts_encoders, _ = import_tts_encoders()
    path = tmp_path_factory.mktemp("refenc_dia") / "dia.gguf"
    enc = tts_encoders.DiaEncoder(model_path=path, repo_id="tiny/fake-dia")
    fake = _FakeDia()
    enc._model = fake
    enc.write()
    return path, fake, enc


def test_dia_encoder_file_loads(dia_gguf):
    path, fake, enc = dia_gguf
    from tts_tpu.gguf.reader import GGUFReader
    from tts_tpu.models.registry import runner_from_file
    r = GGUFReader(str(path))
    md = r.metadata
    assert md["general.architecture"] == "dia"
    assert md["dia.attn_head_size"] == HD
    assert md["dia.decoder.hidden_size"] == DH
    assert md["dia.decoder.attn_heads"] == NH
    assert md["dia.decoder.query_heads"] == KVH   # reference's naming quirk
    assert md["dia.decoder.output_heads"] == CHANNELS
    assert md["dia.max_delay"] == 2
    runner = runner_from_file(str(path))
    cfg = runner.cfg
    # encoder hidden size is NOT written by the converter — inferred from
    # the embedding tensor shape
    assert cfg.encoder_hidden_size == EH
    assert cfg.n_kv_heads == 2
    assert cfg.delay_pattern == (0, 1, 2)
    assert runner.dac is not None


def test_dia_weight_transposes(dia_gguf):
    """The converter's DenseGeneral reshuffles land as (out, in) weights."""
    path, fake, enc = dia_gguf
    from tts_tpu.models.registry import runner_from_file
    runner = runner_from_file(str(path))
    w = runner.weights
    tl = fake.model.decoder.layers[1]
    want_q = tl.self_attention.q_proj.weight.detach().reshape(DH, NH * HD)
    np.testing.assert_allclose(np.asarray(w.dec_layers.self_q[1]),
                               want_q.T.numpy(), rtol=1e-6, atol=1e-6)
    want_o = tl.self_attention.o_proj.weight.detach().reshape(NH * HD, DH)
    np.testing.assert_allclose(np.asarray(w.dec_layers.self_o[1]),
                               want_o.T.numpy(), rtol=1e-6, atol=1e-6)
    want_gate = tl.mlp.wi_fused.weight.detach()[:, 0]          # (DH, DF)
    np.testing.assert_allclose(np.asarray(w.dec_layers.gate[1]),
                               want_gate.T.numpy(), rtol=1e-6, atol=1e-6)
    want_ck = tl.cross_attention.k_proj.weight.detach().reshape(EH, NH * HD)
    np.testing.assert_allclose(np.asarray(w.dec_layers.cross_k[1]),
                               want_ck.T.numpy(), rtol=1e-6, atol=1e-6)
    # per-channel LM heads: head i == logits_dense[:, i].T, stacked
    heads = np.asarray(w.heads).reshape(CHANNELS, TGT_VOCAB, DH)
    want_h = fake.model.decoder.logits_dense.weight.detach()[:, 2]
    np.testing.assert_allclose(heads[2], want_h.T.numpy(),
                               rtol=1e-6, atol=1e-6)


def _torch_dia_encoder(fake, ids):
    """Torch mirror of the Dia encoder forward (RMS norm eps 1e-5, NeoX
    RoPE base 10000, softmax scale 1.0, silu(gate)*up MLP) on the real
    (unpadded) prompt."""
    m = fake.model.encoder
    t = len(ids)
    x = m.embedding(torch.tensor(ids))

    def rms(v, wt):
        return v * torch.rsqrt(torch.mean(v * v, -1, keepdim=True) + 1e-5) \
            * wt.weight

    inv = 1.0 / (10000.0 ** (torch.arange(0, HD, 2, dtype=torch.float32) / HD))
    ang = torch.arange(t, dtype=torch.float32)[:, None] * inv[None, :]
    cos, sin = torch.cos(ang), torch.sin(ang)

    def rope(v):                                   # (T, NH, HD) NeoX halves
        v1, v2 = v[..., : HD // 2], v[..., HD // 2:]
        return torch.cat([v1 * cos[:, None] - v2 * sin[:, None],
                          v2 * cos[:, None] + v1 * sin[:, None]], dim=-1)

    for lyr in m.layers:
        h = rms(x, lyr.pre_sa_norm)
        q = rope(torch.einsum("th,hnd->tnd", h, lyr.self_attention.q_proj.weight))
        k = rope(torch.einsum("th,hnd->tnd", h, lyr.self_attention.k_proj.weight))
        v = torch.einsum("th,hnd->tnd", h, lyr.self_attention.v_proj.weight)
        s = torch.einsum("qnd,knd->nqk", q, k)     # scale 1.0
        a = torch.softmax(s, -1)
        o = torch.einsum("nqk,knd->qnd", a, v)
        x = x + torch.einsum("qnd,ndh->qh", o, lyr.self_attention.o_proj.weight)
        h = rms(x, lyr.post_sa_norm)
        gate = torch.einsum("th,hf->tf", h, lyr.mlp.wi_fused.weight[:, 0])
        up = torch.einsum("th,hf->tf", h, lyr.mlp.wi_fused.weight[:, 1])
        x = x + torch.einsum("tf,fh->th", torch.nn.functional.silu(gate) * up,
                             lyr.mlp.wo.weight)
    return rms(x, m.norm)


def test_dia_encoder_forward_parity(dia_gguf):
    path, fake, enc = dia_gguf
    from tts_tpu.models.registry import runner_from_file
    from tts_tpu.models.dia.model import dia_encode
    runner = runner_from_file(str(path))
    ids = [1, 20, 7, 99, 3, 45, 8]
    toks = np.zeros((2, TEXT_LEN), np.int32)
    toks[0, : len(ids)] = ids
    hidden, ck, cv = dia_encode(runner.cfg, runner.weights,
                                jnp.asarray(toks), jnp.int32(len(ids)))
    with torch.no_grad():
        want = _torch_dia_encoder(fake, ids)
    np.testing.assert_allclose(np.asarray(hidden[0, : len(ids)]),
                               want.numpy(), rtol=2e-4, atol=2e-4)
    # cross-K rows past the prompt are zeroed (reference cache semantics)
    np.testing.assert_allclose(np.asarray(ck[:, :, :, len(ids):, :]), 0.0,
                               atol=0.0)


def test_dia_generate_smoke(dia_gguf):
    """Greedy generate through the loaded runner produces a waveform."""
    path, fake, enc = dia_gguf
    from tts_tpu.common import GenerationConfig
    from tts_tpu.models.registry import runner_from_file
    runner = runner_from_file(str(path))
    out = runner.generate("[S1] hi.", GenerationConfig(sample=False,
                                                      max_tokens=12))
    assert out.audio.dtype == np.float32
