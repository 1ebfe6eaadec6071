"""Golden parity through the REFERENCE's own GGUF converters.

Drives /root/reference/py-gguf/tts_encoders/*.py unmodified (the encoders
that produced every real TTS.cpp checkpoint) over tiny torch models with the
exact HF module trees they traverse, writes a real GGUF via tests/gguf_shim
(a stand-in for the uninstalled `gguf` package backed by tts_tpu's writer),
loads the file with tts_tpu's loader registry, and asserts:

  * every tensor the reference encoder wrote is consumed / name-mapped,
  * config metadata round-trips (parler-tts.decoder.*, dac.*, tokenizer.*),
  * the baked T5 voice-prompt encoding equals the torch T5 forward
    (parler_tts_gguf_encoder.prepare_text_encoding_tensors:81-124),
  * full-stack greedy logit parity: prefill + first decode step through the
    loaded runner's weights match a torch mirror of the original modules
    (incl. DAC weight-norm regularization, get_regularized_weight).

This is the "no GGUF produced by the reference's own encoders has ever
flowed through tts_tpu loaders" gap. The HF-side model classes
(parler_tts package) are not installed; the test supplies stand-in torch
modules with identical parameter trees and implements the four generation-
mixin helpers the encoder calls (semantics: run the text encoder on the
prompt ids), which is upstream-HF behavior, not reference behavior.
"""
from __future__ import annotations

import sys
import types
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

import gguf_shim

REF = "/root/reference/py-gguf"


@pytest.fixture(scope="module")
def tts_encoders():
    """Import the reference encoder package with `gguf` (and the HF model
    packages it imports at module level) stubbed."""
    sys.modules["gguf"] = gguf_shim

    def stub(name, **attrs):
        if name in sys.modules:
            return
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m

    ph = type("_Placeholder", (), {})
    stub("parler_tts", ParlerTTSForConditionalGeneration=ph)
    stub("kokoro", KPipeline=ph, KModel=ph)
    stub("snac", SNAC=ph)
    stub("snac.layers", DecoderBlock=ph)
    stub("dia", )
    stub("dia.model", Dia=ph)
    stub("dia.state", EncoderInferenceState=ph)
    stub("dia.layers", DiaModel=ph)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import tts_encoders
    return tts_encoders


# ---------------------------------------------------------------------------
# tiny HF-shaped torch modules (module/parameter trees the encoder walks)
# ---------------------------------------------------------------------------

H, FFN, NH_ATTN, N_LAYERS = 64, 128, 4, 2
N_CODEBOOKS, OUT_VOCAB, AUDIO_VOCAB = 3, 32, 24
BOS, EOS = 25, 24          # decoder (audio) special tokens
CTX, MAX_GEN = 96, 48
T5_VOCAB = 48


class _Attn(nn.Module):
    def __init__(self, h):
        super().__init__()
        self.q_proj = nn.Linear(h, h, bias=False)
        self.k_proj = nn.Linear(h, h, bias=False)
        self.v_proj = nn.Linear(h, h, bias=False)
        self.out_proj = nn.Linear(h, h, bias=False)


class _DecLayer(nn.Module):
    def __init__(self):
        super().__init__()
        self.self_attn = _Attn(H)
        self.self_attn_layer_norm = nn.LayerNorm(H)
        self.encoder_attn = _Attn(H)
        self.encoder_attn_layer_norm = nn.LayerNorm(H)
        self.fc1 = nn.Linear(H, FFN, bias=False)
        self.fc2 = nn.Linear(FFN, H, bias=False)
        self.final_layer_norm = nn.LayerNorm(H)


class _PosEmbed(nn.Module):
    def __init__(self):
        super().__init__()
        # buffer-like plain attribute: read via .embed_positions.weights
        self.weights = torch.randn(CTX, H) * 0.02


class _HFDecoderCore(nn.Module):
    """= model.decoder.model.decoder in HF parler-tts."""

    def __init__(self):
        super().__init__()
        self.embed_tokens = nn.ModuleList(
            [nn.Embedding(BOS + 2, H) for _ in range(N_CODEBOOKS)])
        self.embed_positions = _PosEmbed()
        self.layers = nn.ModuleList([_DecLayer() for _ in range(N_LAYERS)])
        self.layer_norm = nn.LayerNorm(H)


class _Snake(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.alpha = nn.Parameter(torch.rand(1, c, 1) + 0.5)


def _wn(m):
    return torch.nn.utils.weight_norm(m)


class _ResUnit(nn.Module):
    def __init__(self, c, dilation, padding):
        super().__init__()
        self.block = nn.Sequential(
            _Snake(c),
            _wn(nn.Conv1d(c, c, 7, dilation=dilation, padding=padding)),
            _Snake(c),
            _wn(nn.Conv1d(c, c, 1)))


class _DecBlock(nn.Module):
    def __init__(self, cin, cout, stride, padding):
        super().__init__()
        self.block = nn.Sequential(
            _Snake(cin),
            _wn(nn.ConvTranspose1d(cin, cout, 2 * stride, stride=stride,
                                   padding=padding)),
            _ResUnit(cout, 1, 3), _ResUnit(cout, 3, 9), _ResUnit(cout, 9, 27))


class _DACDecoder(nn.Module):
    def __init__(self, latent, chans, strides, paddings):
        super().__init__()
        blocks = [_wn(nn.Conv1d(latent, chans[0], 7, padding=3))]
        for i, (s, p) in enumerate(zip(strides, paddings)):
            blocks.append(_DecBlock(chans[i], chans[i + 1], s, p))
        blocks += [_Snake(chans[-1]),
                   _wn(nn.Conv1d(chans[-1], 1, 7, padding=3))]
        self.model = nn.Sequential(*blocks)


class _Quantizer(nn.Module):
    def __init__(self, latent, cb_dim, cb_size):
        super().__init__()
        self.codebook = nn.Embedding(cb_size, cb_dim)
        self.out_proj = _wn(nn.Conv1d(cb_dim, latent, 1))


class _DACModel(nn.Module):
    def __init__(self):
        super().__init__()
        latent, cb_dim = 16, 6
        self.decoder = _DACDecoder(latent, [12, 8, 8, 4, 4],
                                   strides=(2, 2, 2, 1),
                                   paddings=(1, 1, 1, 1))
        self.quantizer = nn.Module()
        self.quantizer.quantizers = nn.ModuleList(
            [_Quantizer(latent, cb_dim, AUDIO_VOCAB)
             for _ in range(N_CODEBOOKS)])


def _t5_encoder():
    from transformers import T5Config, T5EncoderModel
    cfg = T5Config(vocab_size=T5_VOCAB, d_model=H, d_kv=16, d_ff=FFN,
                   num_layers=2, num_heads=4, feed_forward_proj="gated-gelu",
                   eos_token_id=2, pad_token_id=0, decoder_start_token_id=0)
    torch.manual_seed(0)
    return T5EncoderModel(cfg)


class _FakeParler(nn.Module):
    """Stand-in for ParlerTTSForConditionalGeneration: same attribute tree
    + the four generation-mixin helpers the reference encoder calls."""

    def __init__(self):
        super().__init__()
        torch.manual_seed(1)
        self.embed_prompts = nn.Embedding(T5_VOCAB, H)
        self.decoder = nn.Module()
        self.decoder.model = nn.Module()
        self.decoder.model.decoder = _HFDecoderCore()
        self.decoder.lm_heads = nn.ModuleList(
            [nn.Linear(H, OUT_VOCAB, bias=False)
             for _ in range(N_CODEBOOKS)])
        self.decoder.config = SimpleNamespace(bos_token_id=BOS,
                                              eos_token_id=EOS)
        self.text_encoder = _t5_encoder()
        self.audio_encoder = SimpleNamespace(model=_DACModel())
        dec_cfg = SimpleNamespace(to_dict=lambda: dict(
            hidden_size=H, num_codebooks=N_CODEBOOKS,
            max_position_embeddings=CTX, num_attention_heads=NH_ATTN,
            vocab_size=OUT_VOCAB, num_hidden_layers=N_LAYERS))
        audio_cfg = SimpleNamespace(to_dict=lambda: dict(
            codebook_size=AUDIO_VOCAB))
        self.config = SimpleNamespace(
            pad_token_id=0, decoder_start_token_id=BOS, decoder=dec_cfg,
            audio_encoder=audio_cfg,
            text_encoder=SimpleNamespace(eos_token_id=2))
        self.generation_config = SimpleNamespace(
            bos_token_id=BOS, use_cache=True, max_length=MAX_GEN,
            _pad_token_tensor=torch.tensor(0),
            _eos_token_tensor=torch.tensor(2))

    # generation-mixin surface used by prepare_text_encoding_tensors
    def _prepare_model_inputs(self, inputs, bos_token_id, model_kwargs):
        return model_kwargs["input_ids"], "input_ids", model_kwargs

    def _prepare_special_tokens(self, generation_config, is_encdec, device):
        pass

    def _prepare_attention_mask_for_generation(self, inputs, pad_t, eos_t):
        return torch.ones_like(inputs)

    def _prepare_text_encoder_kwargs_for_generation(self, inputs_tensor,
                                                    model_kwargs,
                                                    model_input_name,
                                                    generation_config):
        with torch.no_grad():
            out = self.text_encoder(input_ids=inputs_tensor)
        model_kwargs["encoder_outputs"] = out
        return model_kwargs


def _unigram_tokenizer():
    """Real tokenizers-lib Unigram wrapped as PreTrainedTokenizerFast (the
    encoder introspects ._tokenizer.model, .vocab, .to_str())."""
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


@pytest.fixture(scope="module")
def parler_gguf(tts_encoders, tmp_path_factory):
    path = tmp_path_factory.mktemp("refenc") / "parler.gguf"
    enc = tts_encoders.ParlerTTSEncoder(
        model_path=path, repo_id="tiny/fake-parler",
        text_encoding_prompt="female voice")
    model = _FakeParler().eval()
    enc._model = model
    enc._tokenizer = _unigram_tokenizer()
    enc.write()
    return path, model, enc


def test_parler_encoder_file_loads(parler_gguf):
    path, model, enc = parler_gguf
    from tts_tpu.gguf.reader import GGUFReader
    r = GGUFReader(str(path))
    md = r.metadata
    assert md["general.architecture"] == "parler-tts"
    assert md["parler-tts.decoder.hidden_size"] == H
    assert md["parler-tts.decoder.output_heads"] == N_CODEBOOKS
    assert md["parler-tts.decoder.attention.head_count"] == NH_ATTN
    assert md["parler-tts.decoder.num_hidden_layers"] == N_LAYERS
    assert md["audio.bos_token_id"] == BOS
    assert md["audio.eos_token_id"] == EOS
    assert md["dac.up_scaling_factor"] == 512
    assert md["dac.dac_layer_stride_0"] == 2
    # baked T5 voice prompt == torch text-encoder forward
    tok = enc._tokenizer("female voice", return_tensors="pt").input_ids
    with torch.no_grad():
        want = model.text_encoder(input_ids=tok).last_hidden_state.squeeze(0)
    got = np.asarray(r.array("decoder.text_encoding"), dtype=np.float32)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-5)
    assert md["parler-tts.decoder.encode_length"] == got.shape[0]


def test_parler_encoder_runner_logit_parity(parler_gguf):
    """Prefill last position + first decode step through the GGUF-loaded
    tts_tpu weights == torch forward of the original modules."""
    path, model, enc = parler_gguf
    from tts_tpu.models.registry import runner_from_file
    runner = runner_from_file(str(path))
    cfg, w = runner.cfg, runner.weights
    assert cfg.n_layers == N_LAYERS and cfg.use_cross_attn

    ids = [1, 3, 5, 2]
    P = len(ids)
    from tts_tpu.models.parler.model import (parler_prefill, _transformer,
                                             _logits_last)
    shape = (cfg.n_layers, cfg.n_attn_heads, cfg.max_ctx_length,
             cfg.head_size)
    kv_k, kv_v = (jnp.zeros(shape), jnp.zeros(shape))
    kv_k, kv_v = parler_prefill(cfg, w, jnp.asarray(ids, jnp.int32),
                                kv_k, kv_v, use_cross=True)
    # first audio step: all-BOS inputs at cache position P
    from tts_tpu.ops.linear import take_rows
    embs = jnp.stack([take_rows(w.embds[i], jnp.asarray([BOS]))[0]
                      for i in range(N_CODEBOOKS)])
    x = jnp.sum(embs, axis=0, keepdims=True) + w.pos_embd[P][None, :]
    x, _, _ = _transformer(cfg, w, x, kv_k, kv_v, P, None, True)
    logits = _logits_last(cfg, w, x[0])

    ref = _torch_parler_first_step(model, enc, ids)
    np.testing.assert_allclose(np.asarray(logits), ref.numpy(),
                               rtol=2e-4, atol=2e-4)


def _torch_parler_first_step(model, enc, ids):
    """Torch mirror: prompt prefill + one all-BOS audio step, full
    recompute with causal masking; cross-attends the baked T5 encoding."""
    core = model.decoder.model.decoder
    tok = enc._tokenizer("female voice", return_tensors="pt").input_ids
    with torch.no_grad():
        text_enc = model.text_encoder(input_ids=tok).last_hidden_state[0]
    P = len(ids)
    prompt = model.embed_prompts(torch.tensor(ids))
    bos_step = sum(core.embed_tokens[i](torch.tensor(BOS))
                   for i in range(N_CODEBOOKS))
    x = torch.cat([prompt, bos_step[None, :]], dim=0)
    x = x + core.embed_positions.weights[: P + 1]
    T = P + 1
    d = H // NH_ATTN
    mask = torch.where(
        torch.arange(T)[None, :] <= torch.arange(T)[:, None], 0.0,
        -torch.inf)
    with torch.no_grad():
        for layer in core.layers:
            h = layer.self_attn_layer_norm(x)
            q = layer.self_attn.q_proj(h).reshape(T, NH_ATTN, d).transpose(0, 1)
            k = layer.self_attn.k_proj(h).reshape(T, NH_ATTN, d).transpose(0, 1)
            v = layer.self_attn.v_proj(h).reshape(T, NH_ATTN, d).transpose(0, 1)
            s = q @ k.transpose(1, 2) / np.sqrt(d) + mask
            a = torch.softmax(s, -1) @ v
            x = x + layer.self_attn.out_proj(
                a.transpose(0, 1).reshape(T, H))
            h = layer.encoder_attn_layer_norm(x)
            q = layer.encoder_attn.q_proj(h).reshape(T, NH_ATTN, d).transpose(0, 1)
            ck = layer.encoder_attn.k_proj(text_enc).reshape(
                -1, NH_ATTN, d).transpose(0, 1)
            cv = layer.encoder_attn.v_proj(text_enc).reshape(
                -1, NH_ATTN, d).transpose(0, 1)
            s = q @ ck.transpose(1, 2) / np.sqrt(d)
            a = torch.softmax(s, -1) @ cv
            x = x + layer.encoder_attn.out_proj(
                a.transpose(0, 1).reshape(T, H))
            h = layer.final_layer_norm(x)
            x = x + layer.fc2(torch.nn.functional.gelu(layer.fc1(h),
                                                       approximate="tanh"))
        x = core.layer_norm(x)
        out = torch.stack([hd(x[-1]) for hd in model.decoder.lm_heads])
    return out


def test_parler_encoder_dac_weights_parity(parler_gguf):
    """DAC weight-norm tensors regularized by the reference encoder load
    into tts_tpu's DACWeights bit-exactly."""
    path, model, _ = parler_gguf
    from tts_tpu.models.registry import runner_from_file
    runner = runner_from_file(str(path))
    assert runner.dac is not None
    dacw = runner.dac.weights
    dec = model.audio_encoder.model.decoder.model
    # in conv (model.0) weight-norm regularized
    w0 = torch._weight_norm(dec[0].weight_v, dec[0].weight_g, 0)
    np.testing.assert_allclose(np.asarray(dacw.in_w), w0.detach().numpy(),
                               rtol=1e-6, atol=1e-6)
    # first decoder block convT + a residual-unit conv
    b1 = dec[1].block
    w1 = torch._weight_norm(b1[1].weight_v, b1[1].weight_g, 0)
    np.testing.assert_allclose(np.asarray(dacw.layers[0].up_w),
                               w1.detach().numpy(), rtol=1e-6, atol=1e-6)
    ru = b1[2].block
    w2 = torch._weight_norm(ru[1].weight_v, ru[1].weight_g, 0)
    np.testing.assert_allclose(np.asarray(dacw.layers[0].units[0].in_w),
                               w2.detach().numpy(), rtol=1e-6, atol=1e-6)
    # quantizer codebook passes through unregularized
    np.testing.assert_allclose(
        np.asarray(dacw.quantizers[0].codebook),
        model.audio_encoder.model.quantizer.quantizers[0]
        .codebook.weight.detach().numpy(), rtol=1e-6, atol=1e-6)
