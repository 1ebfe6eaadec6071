"""Golden parity through the reference's Kokoro GGUF converter
(/root/reference/py-gguf/tts_encoders/kokoro_gguf_encoder.py), driven
unmodified over a tiny torch model with the exact KModel module tree it
walks: a REAL transformers AlbertModel, the DurationEncoder lstms list, the
AdainResBlk1d trees (weight-normed convs, InstanceNorm affine params that
must be SKIPPED, fc gamma/beta splits), the iSTFTNet generator
(m_source/noise_convs/noise_res/ups/resblocks/conv_post with ParameterList
alphas), voice packs, and the phonemizer-GGUF transplant. This is the
highest-risk name-mapping surface (100+ tensors, 8-tensor LSTM layout).
"""
from __future__ import annotations

import json

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from ref_encoder_common import import_tts_encoders, wn

EMB, H, HEADS, RECUR = 16, 32, 4, 2
DH, STY = 24, 8                      # duration hidden, style half
VOCAB = 30
GCH, NFFT, HOP = 12, 8, 4
F0CH = 4
POST2 = 2 * (NFFT // 2 + 1)          # 10


class _AdaIN(nn.Module):
    """AdaIN1d: fc + InstanceNorm1d(affine=True) whose norm.weight/bias the
    encoder must skip."""

    def __init__(self, c, sty=STY):
        super().__init__()
        self.fc = nn.Linear(sty, 2 * c)
        self.norm = nn.InstanceNorm1d(c, affine=True)


class _AdaLayerNorm(nn.Module):
    def __init__(self, c, sty=STY):
        super().__init__()
        self.fc = nn.Linear(sty, 2 * c)


class _AdainResBlk(nn.Module):
    """kokoro istftnet AdainResBlk1d parameter tree."""

    def __init__(self, cin, cout, pool=False):
        super().__init__()
        self.norm1 = _AdaIN(cin)
        self.conv1 = wn(nn.Conv1d(cin, cout, 3, padding=1))
        self.norm2 = _AdaIN(cout)
        self.conv2 = wn(nn.Conv1d(cout, cout, 3, padding=1))
        if pool:
            self.pool = wn(nn.ConvTranspose1d(cin, cin, 3, stride=2,
                                              groups=cin, padding=1))
        if pool or cin != cout:
            self.conv1x1 = wn(nn.Conv1d(cin, cout, 1, bias=False))


class _GenResBlock(nn.Module):
    """AdaINResBlock1: convs1/convs2 + adain1/adain2 + ParameterList alphas."""

    def __init__(self, c, dilations=(1, 3, 5)):
        super().__init__()
        self.convs1 = nn.ModuleList(
            [wn(nn.Conv1d(c, c, 3, dilation=d, padding=d)) for d in dilations])
        self.convs2 = nn.ModuleList(
            [wn(nn.Conv1d(c, c, 3, padding=1)) for _ in dilations])
        self.adain1 = nn.ModuleList([_AdaIN(c) for _ in dilations])
        self.adain2 = nn.ModuleList([_AdaIN(c) for _ in dilations])
        self.alpha1 = nn.ParameterList(
            [nn.Parameter(torch.rand(1, c, 1) + 0.5) for _ in dilations])
        self.alpha2 = nn.ParameterList(
            [nn.Parameter(torch.rand(1, c, 1) + 0.5) for _ in dilations])


class _MSource(nn.Module):
    def __init__(self, harmonics=4):
        super().__init__()
        self.l_linear = nn.Linear(harmonics, 1)


class _Generator(nn.Module):
    def __init__(self):
        super().__init__()
        self.num_kernels = 2
        self.num_upsamples = 2
        self.m_source = _MSource()
        self.ups = nn.ModuleList(
            [wn(nn.ConvTranspose1d(GCH, GCH, 4, stride=2, padding=1))
             for _ in range(2)])
        self.noise_convs = nn.ModuleList(
            [nn.Conv1d(POST2, GCH, 3, stride=2, padding=1),
             nn.Conv1d(POST2, GCH, 1, stride=1)])
        self.noise_res = nn.ModuleList([_GenResBlock(GCH) for _ in range(2)])
        self.resblocks = nn.ModuleList([_GenResBlock(GCH) for _ in range(4)])
        self.conv_post = wn(nn.Conv1d(GCH, POST2, 3, padding=1))


class _Decoder(nn.Module):
    def __init__(self):
        super().__init__()
        dec_in = DH + 2 * F0CH                 # 32
        blk_in = GCH + 3 * F0CH                # 24
        self.encode = _AdainResBlk(dec_in, GCH)
        self.decode = nn.ModuleList([_AdainResBlk(blk_in, GCH),
                                     _AdainResBlk(blk_in, GCH, pool=True)])
        self.F0_conv = wn(nn.Conv1d(1, F0CH, 3, stride=2, padding=1))
        self.N_conv = wn(nn.Conv1d(1, F0CH, 3, stride=2, padding=1))
        self.asr_res = nn.Sequential(wn(nn.Conv1d(DH, F0CH, 1)))
        self.generator = _Generator()


class _TextCNNLayer(nn.Module):
    """Sequential(weight-normed conv, gamma/beta norm) like kokoro's cnn."""

    def __init__(self):
        super().__init__()
        conv = wn(nn.Conv1d(EMB, EMB, 5, padding=2))
        norm = nn.Module()
        norm.gamma = nn.Parameter(torch.rand(EMB))
        norm.beta = nn.Parameter(torch.rand(EMB) * 0.1)
        self.seq = nn.ModuleList([conv, norm])

    def named_parameters(self, prefix="", recurse=True, remove_duplicate=True):
        # present as "<idx>.<param>" names like nn.Sequential would
        for n, p in super().named_parameters(prefix, recurse, remove_duplicate):
            yield n.replace("seq.", ""), p


class _TextEncoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.embedding = nn.Embedding(VOCAB, EMB)
        self.cnn = nn.ModuleList([_TextCNNLayer() for _ in range(2)])
        self.lstm = nn.LSTM(EMB, DH // 2, bidirectional=True)


class _DurationEncoder(nn.Module):
    def __init__(self):
        super().__init__()
        din = DH + STY
        self.lstms = nn.ModuleList([
            nn.LSTM(din, DH // 2, bidirectional=True), _AdaLayerNorm(DH),
            nn.LSTM(din, DH // 2, bidirectional=True), _AdaLayerNorm(DH)])


class _Predictor(nn.Module):
    def __init__(self):
        super().__init__()
        din = DH + STY
        self.text_encoder = _DurationEncoder()
        self.lstm = nn.LSTM(din, DH // 2, bidirectional=True)
        self.shared = nn.LSTM(din, DH // 2, bidirectional=True)
        self.duration_proj = nn.Module()
        self.duration_proj.linear_layer = nn.Linear(DH, 10)
        self.F0 = nn.ModuleList([_AdainResBlk(DH, DH),
                                 _AdainResBlk(DH, DH // 2, pool=True),
                                 _AdainResBlk(DH // 2, DH // 2)])
        self.N = nn.ModuleList([_AdainResBlk(DH, DH),
                                _AdainResBlk(DH, DH // 2, pool=True),
                                _AdainResBlk(DH // 2, DH // 2)])
        self.F0_proj = nn.Conv1d(DH // 2, 1, 1)
        self.N_proj = nn.Conv1d(DH // 2, 1, 1)


class _KModel(nn.Module):
    def __init__(self):
        super().__init__()
        torch.manual_seed(23)
        from transformers import AlbertConfig, AlbertModel
        acfg = AlbertConfig(
            vocab_size=VOCAB, embedding_size=EMB, hidden_size=H,
            num_attention_heads=HEADS, intermediate_size=2 * H,
            num_hidden_layers=RECUR, num_hidden_groups=1, inner_group_num=1,
            max_position_embeddings=64, type_vocab_size=2)
        self.bert = AlbertModel(acfg)
        self.bert_encoder = nn.Linear(H, DH)
        self.predictor = _Predictor()
        self.text_encoder = _TextEncoder()
        self.decoder = _Decoder()
        chars = "abcdefghijklmnopqrstuvwxyzE ."
        self.vocab = {c: i + 1 for i, c in enumerate(chars)}


CONFIG_JSON = {
    "plbert": {"num_attention_heads": HEADS, "hidden_size": H,
               "num_hidden_layers": RECUR},
    "hidden_dim": DH,
    "n_layer": 2,
    "istftnet": {"gen_istft_n_fft": NFFT, "gen_istft_hop_size": HOP},
}

VOICES = ["af_heart", "am_tiny"]


def _write_phonemizer_gguf(path):
    from tts_tpu.gguf.writer import GGUFWriter
    w = GGUFWriter(str(path), "phonemizer")
    w.add_array("phonemizer.graphemes",
                ["<unk>"] + list("abcdefghijklmnopqrstuvwxyz"))
    letters = list("abcdefghijklmnopqrstuvwxyz")
    w.add_array("phonemizer.rules.keys", letters)
    w.add_array("phonemizer.rules.phonemes", letters)
    w.add_array("phonemizer.dictionary.keys", ["hello", "world"])
    w.add_array("phonemizer.dictionary.values", ["hElo", "wErld"])
    w.add_tensor("phonemizer.dummy", np.zeros((1,), np.float32))
    w.write()


@pytest.fixture(scope="module")
def kokoro_gguf(tmp_path_factory):
    tts_encoders, _ = import_tts_encoders()
    from tts_encoders import kokoro_gguf_encoder as mod
    tmp = tmp_path_factory.mktemp("refenc_kokoro")
    model = _KModel().eval()

    phon_path = tmp / "phonemizer.gguf"
    _write_phonemizer_gguf(phon_path)

    def fake_hub_download(repo_id=None, filename=None, **kw):
        if filename == "config.json":
            p = tmp / "config.json"
            p.write_text(json.dumps(CONFIG_JSON))
            return str(p)
        if filename and filename.startswith("voices/"):
            name = filename.split("/")[1]
            p = tmp / name
            g = torch.Generator().manual_seed(hash(name) % (2 ** 31))
            torch.save(torch.randn(510, 1, 2 * STY, generator=g) * 0.2, p)
            return str(p)
        if filename == "tts_en_us_phonemizer.gguf":
            return str(phon_path)
        raise AssertionError(f"unexpected download {filename}")

    orig = mod.hf_hub_download
    mod.hf_hub_download = fake_hub_download
    try:
        path = tmp / "kokoro.gguf"
        enc = tts_encoders.KokoroEncoder(model_path=path,
                                         repo_id="tiny/fake-kokoro",
                                         voices=VOICES, use_espeak=False)
        enc._model = model
        enc.write()
    finally:
        mod.hf_hub_download = orig
    return path, model, enc


def test_kokoro_config_roundtrip(kokoro_gguf):
    path, model, enc = kokoro_gguf
    from tts_tpu.gguf.reader import GGUFReader
    from tts_tpu.models.kokoro.model import KokoroConfig
    r = GGUFReader(str(path))
    md = r.metadata
    assert md["general.architecture"] == "kokoro"
    cfg = KokoroConfig.from_gguf(r)
    assert cfg.hidden_size == H and cfg.n_attn_heads == HEADS
    assert cfg.n_recurrence == RECUR
    assert cfg.duration_hidden_size == DH
    assert cfg.n_duration_prediction_layers == 2
    assert cfg.f0_n_blocks == 3
    assert cfg.true_n_fft == NFFT and cfg.stft_hop == HOP
    assert cfg.n_kernels == 2 and cfg.n_upsamples == 2
    assert cfg.n_res_blocks == 4
    assert cfg.up_strides == (2, 2) and cfg.up_paddings == (1, 1)
    assert cfg.noise_conv_strides == (2, 1)
    # inferred (not written by the converter): style width and vocab size
    assert cfg.style_half_size == STY
    assert cfg.vocab_size == len(model.vocab) + 1
    # phonemizer transplant
    assert md["phonemizer.type"] == 0
    assert md["phonemizer.dictionary.keys"] == ["hello", "world"]
    assert md["kokoro.voices"] == VOICES


def test_kokoro_all_tensors_consumed(kokoro_gguf):
    """Loading must consume the converter's output without KeyErrors, and
    every GGUF tensor must be touched by the loader (no orphans)."""
    path, model, enc = kokoro_gguf
    from tts_tpu.gguf.reader import GGUFReader
    from tts_tpu.models.kokoro.model import (KokoroConfig,
                                             load_kokoro_weights, load_voices)
    r = GGUFReader(str(path))
    cfg = KokoroConfig.from_gguf(r)
    touched = set()
    orig_array = r.array

    def tracking_array(name):
        touched.add(name)
        return orig_array(name)

    r.array = tracking_array
    load_kokoro_weights(r, cfg)
    load_voices(r)
    untouched = set(r.tensors) - touched
    assert not untouched, f"orphan tensors never loaded: {sorted(untouched)}"


def test_kokoro_weight_parity_spot_checks(kokoro_gguf):
    path, model, enc = kokoro_gguf
    from tts_tpu.gguf.reader import GGUFReader
    from tts_tpu.models.kokoro.model import (KokoroConfig,
                                             load_kokoro_weights)
    r = GGUFReader(str(path))
    cfg = KokoroConfig.from_gguf(r)
    w = load_kokoro_weights(r, cfg)
    # ALBERT (real transformers module) q projection + layernorm
    al = model.bert.encoder.albert_layer_groups[0].albert_layers[0]
    np.testing.assert_allclose(np.asarray(w.albert_layers[0].q_w),
                               al.attention.query.weight.detach().numpy(),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w.albert_layers[0].out_ln_w),
                               al.full_layer_layer_norm.weight.detach().numpy(),
                               rtol=1e-6, atol=1e-6)
    # LSTM 8-tensor interleave: w_ih = concat of the 4 gate slices (I,F,G,O)
    lstm = model.predictor.lstm
    np.testing.assert_allclose(np.asarray(w.prosody.duration_lstm[0].w_ih),
                               lstm.weight_ih_l0.detach().numpy(),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w.prosody.duration_lstm[1].w_hh),
                               lstm.weight_hh_l0_reverse.detach().numpy(),
                               rtol=1e-6, atol=1e-6)
    # AdaLayerNorm fc split: gamma rows then beta rows
    fc = model.predictor.text_encoder.lstms[1].fc
    np.testing.assert_allclose(np.asarray(w.prosody.layers_ada[0].gamma_w),
                               fc.weight.detach().numpy()[:DH],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w.prosody.layers_ada[0].beta_b),
                               fc.bias.detach().numpy()[DH:],
                               rtol=1e-6, atol=1e-6)
    # weight-normed generator conv regularized at encode time
    g = model.decoder.generator
    want = torch._weight_norm(g.conv_post.weight_v, g.conv_post.weight_g, 0)
    np.testing.assert_allclose(np.asarray(w.decoder.generator.out_conv_w),
                               want.detach().numpy(), rtol=1e-6, atol=1e-6)
    # ParameterList alpha + adain gamma of a noise-res block
    nr = g.noise_res[1]
    np.testing.assert_allclose(
        np.asarray(w.decoder.generator.noise_blocks[1].res.alpha1[2]),
        nr.alpha1[2].detach().numpy(), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(w.decoder.generator.noise_blocks[1].res.adain2[0].gamma_w),
        nr.adain2[0].fc.weight.detach().numpy()[:GCH], rtol=1e-6, atol=1e-6)
    # AdainResBlk pool (grouped convT) + conv1x1 shortcut
    blk = model.predictor.F0[1]
    want_pool = torch._weight_norm(blk.pool.weight_v, blk.pool.weight_g, 0)
    np.testing.assert_allclose(np.asarray(w.prosody.f0_blocks[1].pool_w),
                               want_pool.detach().numpy(),
                               rtol=1e-6, atol=1e-6)
    want_sc = torch._weight_norm(blk.conv1x1.weight_v, blk.conv1x1.weight_g, 0)
    np.testing.assert_allclose(np.asarray(w.prosody.f0_blocks[1].upsample_w),
                               want_sc.detach().numpy()[:, :, 0],
                               rtol=1e-6, atol=1e-6)


def test_kokoro_runner_generate_smoke(kokoro_gguf):
    """Full runner path: registry load -> native phonemizer (transplanted
    GGUF keys) -> single-pass tokenizer -> duration + generation graphs ->
    waveform."""
    path, model, enc = kokoro_gguf
    from tts_tpu.common import GenerationConfig
    from tts_tpu.models.registry import runner_from_file
    runner = runner_from_file(str(path))
    assert sorted(runner.list_voices()) == sorted(VOICES)
    resp = runner.generate("hello world",
                           GenerationConfig(voice="af_heart", seed=0))
    assert resp.audio.dtype == np.float32
    assert resp.sample_rate == 24000
    assert resp.audio.size > 0
    assert np.isfinite(resp.audio).all()
