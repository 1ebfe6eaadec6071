"""Kokoro (82M, StyleTTS2-derived) — TPU-native implementation.

Behavior parity with reference src/models/kokoro/model.cpp, re-architected
for XLA: the reference builds two giant ggml graphs per run (110k / 570k
nodes — LSTMs unrolled per timestep, kokoro/model.cpp:938-1047, 1141-1242).
Here each phase is ONE jitted function with bucketed static shapes:

  duration graph:  tokens -> ALBERT(12 shared-layer recurrences) ->
                   prosody encoder (3x masked biLSTM + AdaLayerNorm w/ style)
                   -> duration biLSTM -> sigmoid proj -> per-token durations
  generation graph: duration-expanded hidden states -> shared biLSTM ->
                   F0/N curves (AdainResBlk1d chains) -> text encoder
                   (conv+LN+biLSTM) -> decoder (Adain blocks) -> iSTFTNet
                   generator (harmonic source, STFT, upsample+noise blocks,
                   snake res blocks, iSTFT)

LSTMs run as lax.scan with the input projection hoisted (ops/rnn.py), the
token->frame expansion is a device-side gather from cumulative durations
(the reference builds a host-side 0/1 expansion matrix, model.cpp:1265-1274),
and every conv/norm is masked on the padded tail so bucketed shapes produce
exactly the unpadded result.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...common import GenerationConfig, TTSResponse, SAMPLE_RATE_KOKORO
from ...gguf.reader import GGUFReader
from ...ops import dsp
from ...ops.conv import conv1d, conv_transpose_1d
from ...ops.rnn import LSTMWeights, masked_bilstm
from ...text import SinglePassTokenizer
from ..base import TTSRunner

LRELU = 0.2

# Kokoro voice packs encode their language as the first letter of the voice
# name; this maps it to the espeak-ng voice identifier used for
# phonemization (reference kokoro/model.h:20-30).
KOKORO_LANG_TO_ESPEAK_ID = {
    "a": "gmw/en-US",
    "b": "gmw/en",
    "e": "roa/es",
    "f": "roa/fr",
    "h": "inc/hi",
    "i": "roa/it",
    "j": "jpx/ja",
    "p": "roa/pt-BR",
    "z": "sit/cmn",
}


def get_espeak_id_from_kokoro_voice(voice: str) -> str:
    return KOKORO_LANG_TO_ESPEAK_ID.get(voice[:1], "gmw/en-US")


@dataclasses.dataclass(eq=False)
class KokoroConfig:
    """Defaults per reference kokoro/model.h:186-232; overridden by
    kokoro.* GGUF keys (model.cpp:841-930)."""

    bos_token_id: int = 0
    eos_token_id: int = 0
    space_token_id: int = 16
    max_context_length: int = 512
    vocab_size: int = 178
    hidden_size: int = 768
    n_attn_heads: int = 12
    n_layers: int = 1
    n_recurrence: int = 12
    duration_hidden_size: int = 512
    style_half_size: int = 128
    f0_n_blocks: int = 3
    n_duration_prediction_layers: int = 3
    n_conv_layers: int = 3
    n_kernels: int = 3
    n_upsamples: int = 2
    n_decoder_blocks: int = 4
    n_res_blocks: int = 6
    n_noise_blocks: int = 2
    out_conv_padding: int = 3
    true_n_fft: int = 20
    stft_hop: int = 5
    harmonic_num: int = 8
    up_sampling_factor: int = 600
    upsample_scale: float = 300.0
    albert_scale: float = 0.125
    sin_amp: float = 0.1
    noise_std: float = 0.003
    voice_threshold: float = 10.0
    sample_rate: float = 24000.0
    max_duration_per_token: int = 50
    # per-block conv geometry (from GGUF metadata)
    res_block_dilations: tuple = ((1, 3, 5),) * 6
    res_block_paddings: tuple = ((1, 3, 5),) * 6
    noise_block_dilations: tuple = ((1, 3, 5),) * 2
    noise_block_paddings: tuple = ((1, 3, 5),) * 2
    noise_conv_strides: tuple = (6, 1)
    noise_conv_paddings: tuple = (3, 0)
    up_strides: tuple = (10, 6)
    up_paddings: tuple = (5, 3)

    @property
    def head_size(self) -> int:
        return self.hidden_size // self.n_attn_heads

    @property
    def post_n_fft(self) -> int:
        return self.true_n_fft // 2 + 1

    @classmethod
    def from_gguf(cls, r: GGUFReader) -> "KokoroConfig":
        c = cls()
        g = r.metadata.get
        c.max_context_length = int(g("kokoro.duration_predictor.albert.context_length", c.max_context_length))
        vocab = g("kokoro.tokenizer.vocab_size")
        if vocab is None and g("tokenizer.ggml.tokens") is not None:
            # the reference converter (py-gguf kokoro_gguf_encoder.py) never
            # writes the vocab-size key; the token list defines it
            vocab = len(g("tokenizer.ggml.tokens"))
        if vocab is not None:
            c.vocab_size = int(vocab)
        for name, ti in r.tensors.items():
            # style vector width is not in the metadata either — each voice
            # pack row is concat(style_half, style_half2)
            if name.startswith("kokoro.voice_tensors."):
                c.style_half_size = int(ti.shape[-1]) // 2
                break
        c.hidden_size = int(g("kokoro.duration_predictor.albert.hidden_size", c.hidden_size))
        c.n_attn_heads = int(g("kokoro.duration_predictor.albert.attn_heads", c.n_attn_heads))
        c.n_layers = int(g("kokoro.duration_predictor.albert.layers", c.n_layers))
        c.n_recurrence = int(g("kokoro.duration_predictor.albert.recurrence", c.n_recurrence))
        c.duration_hidden_size = int(g("kokoro.duration_predictor.hidden_size", c.duration_hidden_size))
        c.f0_n_blocks = int(g("kokoro.duration_predictor.f0_n_blocks", c.f0_n_blocks))
        c.n_duration_prediction_layers = int(g("kokoro.duration_predictor.layers", c.n_duration_prediction_layers))
        c.n_conv_layers = int(g("kokoro.text_encoder.layers", c.n_conv_layers))
        c.n_kernels = int(g("kokoro.decoder.generator.kernels", c.n_kernels))
        c.n_upsamples = int(g("kokoro.decoder.generator.upsamples", c.n_upsamples))
        c.n_decoder_blocks = int(g("kokoro.decoder.generator.layers", c.n_decoder_blocks))
        c.out_conv_padding = int(g("kokoro.decoder.generator.padding", c.out_conv_padding))
        c.up_sampling_factor = int(g("kokoro.decoder.generator.up_sampling_factor", c.up_sampling_factor))
        # the F0 curve runs at 2x frame rate; its linear interpolation factor
        # is therefore half the per-frame sample count (600 -> 300 for the
        # published model, where the reference hardcodes 300)
        c.upsample_scale = c.up_sampling_factor / 2.0
        if "kokoro.decoder.generator.n_fft" in r.metadata:
            c.true_n_fft = int(g("kokoro.decoder.generator.n_fft"))
        c.stft_hop = int(g("kokoro.decoder.generator.hop", c.stft_hop))
        c.n_res_blocks = c.n_upsamples * c.n_kernels

        def geom(base, n, inner=3):
            dil, pad = [], []
            for i in range(n):
                dd, pp = [], []
                for j in range(inner):
                    d = g(f"{base}.{i}.dilation") if inner == 1 else g(f"{base}.{i}.{j}.dilation")
                    p = g(f"{base}.{i}.padding") if inner == 1 else g(f"{base}.{i}.{j}.padding")
                    if d is None or p is None:
                        return None
                    dd.append(int(d)); pp.append(int(p))
                dil.append(tuple(dd)); pad.append(tuple(pp))
            return tuple(dil), tuple(pad)

        got = geom("kokoro.decoder.generator.res_blocks", c.n_res_blocks)
        if got:
            c.res_block_dilations, c.res_block_paddings = got
        nb = []
        nbp = []
        ok = True
        for i in range(c.n_noise_blocks):
            dd, pp = [], []
            for j in range(3):
                d = g(f"kokoro.decoder.generator.noise_blocks.{i}.res_block.{j}.dilation")
                p = g(f"kokoro.decoder.generator.noise_blocks.{i}.res_block.{j}.padding")
                if d is None or p is None:
                    ok = False
                    break
                dd.append(int(d)); pp.append(int(p))
            if not ok:
                break
            nb.append(tuple(dd)); nbp.append(tuple(pp))
        if ok and nb:
            c.noise_block_dilations, c.noise_block_paddings = tuple(nb), tuple(nbp)
        ncs, ncp, ups, upp = [], [], [], []
        for i in range(c.n_noise_blocks):
            s = g(f"kokoro.decoder.generator.noise_blocks.{i}.stride")
            p = g(f"kokoro.decoder.generator.noise_blocks.{i}.padding")
            if s is not None:
                ncs.append(int(s)); ncp.append(int(p))
        if ncs:
            c.noise_conv_strides, c.noise_conv_paddings = tuple(ncs), tuple(ncp)
        for i in range(c.n_upsamples):
            s = g(f"kokoro.decoder.generator.up_convs.{i}.stride")
            p = g(f"kokoro.decoder.generator.up_convs.{i}.padding")
            if s is not None:
                ups.append(int(s)); upp.append(int(p))
        if ups:
            c.up_strides, c.up_paddings = tuple(ups), tuple(upp)
        return c


# ---------------------------------------------------------------------------
# Weight containers
# ---------------------------------------------------------------------------

class AlbertLayer(NamedTuple):
    q_w: Any; q_b: Any; k_w: Any; k_b: Any; v_w: Any; v_b: Any
    o_w: Any; o_b: Any
    attn_ln_w: Any; attn_ln_b: Any       # post-attention LayerNorm
    ffn_w: Any; ffn_b: Any
    ffn_out_w: Any; ffn_out_b: Any
    out_ln_w: Any; out_ln_b: Any         # post-ffn LayerNorm


class AdaLayerNormW(NamedTuple):
    gamma_w: Any; gamma_b: Any; beta_w: Any; beta_b: Any


class AdaResBlockW(NamedTuple):
    """StyleTTS2 AdainResBlk1d (reference build_ada_residual_conv,
    model.cpp:88-134)."""
    norm1: AdaLayerNormW
    conv1_w: Any; conv1_b: Any
    norm2: AdaLayerNormW
    conv2_w: Any; conv2_b: Any
    pool_w: Any; pool_b: Any             # depthwise convT (or None)
    upsample_w: Any; upsample_b: Any     # 1x1 shortcut (or None)


class GenResBlockW(NamedTuple):
    """iSTFTNet resblock with snake + AdaIN (model.cpp:136-165)."""
    adain1: List[AdaLayerNormW]
    adain2: List[AdaLayerNormW]
    alpha1: List[Any]
    alpha2: List[Any]
    convs1_w: List[Any]; convs1_b: List[Any]
    convs2_w: List[Any]; convs2_b: List[Any]


class NoiseBlockW(NamedTuple):
    conv_w: Any; conv_b: Any
    res: GenResBlockW


class DurationPredictorW(NamedTuple):
    encode_w: Any; encode_b: Any
    layers_lstm: List[tuple]             # [(fwd, bwd), ...]
    layers_ada: List[AdaLayerNormW]
    duration_lstm: tuple
    duration_proj_w: Any; duration_proj_b: Any
    shared_lstm: tuple
    f0_blocks: List[AdaResBlockW]
    n_blocks: List[AdaResBlockW]
    f0_proj_w: Any; f0_proj_b: Any
    n_proj_w: Any; n_proj_b: Any


class TextEncoderW(NamedTuple):
    embd: Any
    convs: List[tuple]                   # (gamma, beta, conv_w, conv_b)
    lstm: tuple


class GeneratorW(NamedTuple):
    m_source_w: Any; m_source_b: Any
    ups_w: List[Any]; ups_b: List[Any]
    noise_blocks: List[NoiseBlockW]
    res_blocks: List[GenResBlockW]
    out_conv_w: Any; out_conv_b: Any


class DecoderW(NamedTuple):
    f0_conv_w: Any; f0_conv_b: Any
    n_conv_w: Any; n_conv_b: Any
    asr_conv_w: Any; asr_conv_b: Any
    encoder_block: AdaResBlockW
    decoder_blocks: List[AdaResBlockW]
    generator: GeneratorW


class KokoroWeights(NamedTuple):
    token_embd: Any
    position_embd: Any
    token_type_row: Any
    input_ln_w: Any; input_ln_b: Any
    embd_hidden_w: Any; embd_hidden_b: Any
    albert_layers: List[AlbertLayer]
    prosody: DurationPredictorW
    text_encoder: TextEncoderW
    decoder: DecoderW


# ---------------------------------------------------------------------------
# primitive helpers
# ---------------------------------------------------------------------------

def _ln(x, w, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _ada_affine(style, w: AdaLayerNormW):
    gamma = style @ w.gamma_w.T + w.gamma_b
    beta = style @ w.beta_w.T + w.beta_b
    return gamma, beta


def _mask_t(x, valid):
    """Zero columns >= valid of (C, T)."""
    return x * (jnp.arange(x.shape[-1]) < valid)[None, :]


def _masked_instance_norm(x, valid, eps=1e-5):
    """Per-channel mean/var over the valid time prefix of (C, T)."""
    m = (jnp.arange(x.shape[-1]) < valid)[None, :].astype(x.dtype)
    n = jnp.maximum(jnp.sum(m), 1.0)
    mu = jnp.sum(x * m, axis=-1, keepdims=True) / n
    var = jnp.sum(jnp.square(x - mu) * m, axis=-1, keepdims=True) / n
    return (x - mu) * jax.lax.rsqrt(var + eps) * m


def ada_res_block(x, style, w: AdaResBlockW, valid, cfg_eps=1e-5):
    """x (C, T) -> (C_out, T or 2T). Returns (out, valid_out)."""
    gamma, beta = _ada_affine(style, w.norm1)
    h = _masked_instance_norm(x, valid)
    h = h * (1.0 + gamma[:, None]) + beta[:, None]
    h = jax.nn.leaky_relu(h, LRELU)
    h = _mask_t(h, valid)
    v_out = valid
    if w.pool_w is not None:
        c = h.shape[0]
        h = conv_transpose_1d(h, w.pool_w, w.pool_b, stride=2, padding=1,
                              groups=c, output_padding=1)
        v_out = valid * 2
        h = _mask_t(h, v_out)
    h = conv1d(h, w.conv1_w, w.conv1_b, padding=1)
    h = _mask_t(h, v_out)
    gamma, beta = _ada_affine(style, w.norm2)
    h = _masked_instance_norm(h, v_out)
    h = h * (1.0 + gamma[:, None]) + beta[:, None]
    h = jax.nn.leaky_relu(h, LRELU)
    h = conv1d(h, w.conv2_w, w.conv2_b, padding=1)
    h = _mask_t(h, v_out)
    s = x
    if w.upsample_w is not None:
        if w.pool_w is not None:
            s = jnp.repeat(s, 2, axis=-1)  # nearest x2 (ggml_upscale_ext)
        s = w.upsample_w @ s
        if w.upsample_b is not None:
            s = s + w.upsample_b[:, None]
        s = _mask_t(s, v_out)
    return (h + s) / np.sqrt(2.0), v_out


def gen_res_block(x, style, w: GenResBlockW, dilations, paddings, valid):
    """iSTFTNet residual block, x (C, T) (model.cpp:136-165)."""
    inpl = x
    for i in range(len(w.convs1_w)):
        gamma, beta = _ada_affine(style, w.adain1[i])
        h = _masked_instance_norm(inpl, valid)
        h = h * (1.0 + gamma[:, None]) + beta[:, None]
        h = dsp.snake_1d(h, w.alpha1[i].reshape(-1, 1))
        h = _mask_t(h, valid)
        h = conv1d(h, w.convs1_w[i], w.convs1_b[i], padding=paddings[i],
                   dilation=dilations[i])
        h = _mask_t(h, valid)
        gamma, beta = _ada_affine(style, w.adain2[i])
        h = _masked_instance_norm(h, valid)
        h = h * (1.0 + gamma[:, None]) + beta[:, None]
        h = dsp.snake_1d(h, w.alpha2[i].reshape(-1, 1))
        h = _mask_t(h, valid)
        # NOTE: the reference uses conv1_paddings[0] for every convs2
        # (model.cpp:161)
        h = conv1d(h, w.convs2_w[i], w.convs2_b[i], padding=paddings[0])
        h = _mask_t(h, valid)
        inpl = inpl + h
    return inpl


# ---------------------------------------------------------------------------
# duration graph
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def kokoro_duration(cfg: KokoroConfig, w: KokoroWeights, tokens, valid_len,
                    style_half):
    """tokens (P,) padded; returns (durations (P,) f32, hidden (P, 640)).

    Parity: build_kokoro_duration_graph (model.cpp:938-1047).
    """
    p = tokens.shape[0]
    pos = jnp.arange(p)
    x = jnp.take(w.token_embd, tokens, axis=0) + w.position_embd[:p] + w.token_type_row
    x = _ln(x, w.input_ln_w, w.input_ln_b, 1e-12)
    x = x @ w.embd_hidden_w.T + w.embd_hidden_b

    pad_bias = jnp.where(pos < valid_len, 0.0, -jnp.inf)[None, None, :]
    nh = cfg.n_attn_heads

    for _ in range(cfg.n_recurrence):
        for lw in w.albert_layers:
            res = x
            q = (x @ lw.q_w.T + lw.q_b).reshape(p, nh, -1).transpose(1, 0, 2)
            k = (x @ lw.k_w.T + lw.k_b).reshape(p, nh, -1).transpose(1, 0, 2)
            v = (x @ lw.v_w.T + lw.v_b).reshape(p, nh, -1).transpose(1, 0, 2)
            logits = jnp.einsum("hqd,hkd->hqk", q, k,
                                preferred_element_type=jnp.float32)
            logits = logits * cfg.albert_scale + pad_bias
            probs = jax.nn.softmax(logits, axis=-1)
            a = jnp.einsum("hqk,hkd->hqd", probs, v).transpose(1, 0, 2).reshape(p, -1)
            x = a @ lw.o_w.T + lw.o_b + res
            x = _ln(x, lw.attn_ln_w, lw.attn_ln_b, 1e-12)
            res = x
            h = jax.nn.gelu(x @ lw.ffn_w.T + lw.ffn_b, approximate=True)
            h = h @ lw.ffn_out_w.T + lw.ffn_out_b
            x = _ln(h + res, lw.out_ln_w, lw.out_ln_b, 1e-12)

    pw = w.prosody
    x = x @ pw.encode_w.T + pw.encode_b            # (P, 512)
    sty = jnp.broadcast_to(style_half, (p, style_half.shape[-1]))
    x = jnp.concatenate([x, sty], axis=-1)         # (P, 640)
    for (fwd, bwd), ada in zip(pw.layers_lstm, pw.layers_ada):
        x = masked_bilstm(x, valid_len, fwd, bwd)  # (P, 512)
        gamma, beta = _ada_affine(style_half, ada)
        x = _ln(x, 1.0, 0.0, 1e-5) * (1.0 + gamma) + beta
        x = jnp.concatenate([x, sty], axis=-1)
    hidden = x                                      # duration_hidden_states
    d = masked_bilstm(x, valid_len, *pw.duration_lstm)
    d = jax.nn.sigmoid(d @ pw.duration_proj_w.T + pw.duration_proj_b)
    dur = jnp.floor(jnp.sum(d, axis=-1) + 0.5)      # roundf (half away)
    dur = jnp.clip(dur, 1.0, 50.0)
    dur = dur * (pos < valid_len)                   # zero padded tokens
    return dur, hidden


# ---------------------------------------------------------------------------
# generation graph
# ---------------------------------------------------------------------------

def _expand_frames(values, durations, n_frames):
    """(P, C) per-token -> (F, C) per-frame via cumulative durations.

    Replaces the reference's host-built 0/1 expansion matrix
    (model.cpp:1265-1274) with a device-side searchsorted gather.
    """
    cum = jnp.cumsum(durations)
    frame_idx = jnp.searchsorted(cum, jnp.arange(n_frames), side="right")
    frame_idx = jnp.clip(frame_idx, 0, values.shape[0] - 1)
    return jnp.take(values, frame_idx, axis=0)


@functools.partial(jax.jit, static_argnames=("cfg", "n_frames"))
def kokoro_generate(cfg: KokoroConfig, w: KokoroWeights, tokens, valid_len,
                    durations, hidden, style_half, style_half2,
                    uv_rand, n_frames: int):
    """Generation graph. n_frames is the STATIC frame bucket; the true total
    duration is sum(durations) <= n_frames. uv_rand is uniform [0,1) noise of
    shape (harmonics+1, 2*n_frames*upsample_scale) — passed in (rather than
    drawn in-graph) so results don't depend on the bucket size.
    Returns waveform (n_frames * 600,) with valid prefix total*600.

    Parity: build_kokoro_graph (model.cpp:1141-1242).
    """
    total = jnp.sum(durations).astype(jnp.int32)    # true frame count
    pw = w.prosody

    en = _expand_frames(hidden, durations, n_frames)            # (F, 640)
    x = masked_bilstm(en, total, *pw.shared_lstm)               # (F, 512)
    xT = _mask_t(x.T, total)                                    # (512, F)

    f0 = xT
    vf = total
    for blk in pw.f0_blocks:
        f0, vf = ada_res_block(f0, style_half, blk, vf)
    f0_curve = (pw.f0_proj_w @ f0 + pw.f0_proj_b.reshape(-1, 1))[0]   # (2F,)
    f0_curve = f0_curve * (jnp.arange(f0_curve.shape[0]) < vf)

    nn = xT
    vn = total
    for blk in pw.n_blocks:
        nn, vn = ada_res_block(nn, style_half, blk, vn)
    n_curve = (pw.n_proj_w @ nn + pw.n_proj_b.reshape(-1, 1))[0]
    n_curve = n_curve * (jnp.arange(n_curve.shape[0]) < vn)

    # text encoder (model.cpp:1196-1206)
    te = w.text_encoder
    h = jnp.take(te.embd, tokens, axis=0)                        # (P, 128)
    hC = h.T
    for (gamma, beta, cw, cb) in te.convs:
        hC = conv1d(hC, cw, cb, padding=2)
        hT = hC.T
        hT = _ln(hT, gamma, beta, 1e-5)
        hT = jax.nn.leaky_relu(hT, LRELU)
        hC = hT.T
        hC = hC * (jnp.arange(hC.shape[-1]) < valid_len)[None, :]
    enc = masked_bilstm(hC.T, valid_len, *te.lstm)               # (P, 512)
    asr = _expand_frames(enc, durations, n_frames).T             # (512, F)
    asr = _mask_t(asr, total)

    # decoder (model.cpp:1215-1231)
    dw = w.decoder
    f0_d = conv1d(f0_curve[None, :], dw.f0_conv_w, dw.f0_conv_b, stride=2,
                  padding=1)                                     # (64, F)
    f0_d = _mask_t(f0_d, total)
    n_d = conv1d(n_curve[None, :], dw.n_conv_w, dw.n_conv_b, stride=2,
                 padding=1)
    n_d = _mask_t(n_d, total)
    cur = jnp.concatenate([asr, f0_d, n_d], axis=0)
    cur, vcur = ada_res_block(cur, style_half2, dw.encoder_block, total)
    asr_res = dw.asr_conv_w @ asr + dw.asr_conv_b.reshape(-1, 1)
    asr_res = _mask_t(asr_res, total)
    # every decoder block gets the residual concat; only the LAST block may
    # carry a pool (temporal x2), matching the reference loop
    # (model.cpp:1226-1230)
    for blk in dw.decoder_blocks:
        cat = jnp.concatenate([cur, asr_res, f0_d, n_d], axis=0)
        cur, vcur = ada_res_block(cat, style_half2, blk, vcur)

    # generator (model.cpp:195-244)
    gw = dw.generator
    wav = _generator(cfg, gw, cur, style_half2, f0_curve, vf, uv_rand,
                     vcur, total)
    return wav, total


def _generator(cfg: KokoroConfig, gw: GeneratorW, x, style, f0_curve,
               f0_valid, uv_rand, valid, total):
    nharm = cfg.harmonic_num + 1
    f2 = f0_curve.shape[0]                          # 2F static
    sr = cfg.sample_rate
    # harmonic phase: mod BEFORE cumsum (model.cpp:174-176)
    harm = (jnp.arange(nharm) + 1.0) / sr           # (9,)
    ph = jnp.mod(f0_curve[None, :] * harm[:, None], 1.0)       # (9, 2F)
    ph = ph * (jnp.arange(f2) < f0_valid)[None, :]  # keep cumsum clean
    ph = jnp.cumsum(ph, axis=-1) * (cfg.upsample_scale * 2.0 * np.pi)
    ph = dsp.upscale_linear(ph, int(cfg.upsample_scale))       # (9, 600F)
    f0_up = jnp.repeat(f0_curve, int(cfg.upsample_scale))      # nearest x300
    # the reference fills uniform [0,1) noise host-side (model.cpp:1255,
    # util.cpp:66-72); callers pass it in pre-drawn
    uv, noise = dsp.uv_noise(f0_up, nharm, uv_rand,
                             cfg.voice_threshold, cfg.noise_std, cfg.sin_amp)
    sing = (jnp.sin(ph) * uv + noise).T                        # (600F, 9)
    har = jnp.tanh(sing @ gw.m_source_w.T + gw.m_source_b)     # (600F, 1)
    n_samp_valid = total * cfg.up_sampling_factor
    har = har * (jnp.arange(har.shape[0]) < n_samp_valid)[:, None]

    window = dsp.hann_window(cfg.true_n_fft)
    spec = dsp.stft(har[:, 0], window, cfg.true_n_fft, cfg.stft_hop,
                    abs_and_angle=True, one_sided=True)        # (2, Fr, 11)
    mag, phase = spec[0], spec[1]
    combined = jnp.concatenate([mag, phase], axis=-1).T        # (22, Fr)

    cur = x                                                    # (C, F2?)
    vcur = valid
    for i in range(len(gw.ups_w)):
        cur = jax.nn.leaky_relu(cur, 0.1)
        cur = _mask_t(cur, vcur)
        cur = conv_transpose_1d(cur, gw.ups_w[i], gw.ups_b[i],
                                stride=cfg.up_strides[i],
                                padding=cfg.up_paddings[i])
        vcur = vcur * cfg.up_strides[i]
        cur = _mask_t(cur, vcur)
        if i == len(gw.ups_w) - 1:
            # reflect-pad front by one (model.cpp:213-217)
            cur = jnp.concatenate([cur[:, 1:2], cur], axis=-1)
            vcur = vcur + 1
        nb = gw.noise_blocks[i]
        ns = conv1d(combined, nb.conv_w, nb.conv_b,
                    stride=cfg.noise_conv_strides[i],
                    padding=cfg.noise_conv_paddings[i])
        ns = ns[:, : cur.shape[-1]]
        if ns.shape[-1] < cur.shape[-1]:
            ns = jnp.pad(ns, ((0, 0), (0, cur.shape[-1] - ns.shape[-1])))
        ns = _mask_t(ns, vcur)
        ns = gen_res_block(ns, style, nb.res, cfg.noise_block_dilations[i],
                           cfg.noise_block_paddings[i], vcur)
        cur = cur + ns
        acc = None
        for k in range(cfg.n_kernels):
            rb = gw.res_blocks[i * cfg.n_kernels + k]
            out = gen_res_block(cur, style, rb, cfg.res_block_dilations[i * cfg.n_kernels + k],
                                cfg.res_block_paddings[i * cfg.n_kernels + k], vcur)
            acc = out if acc is None else acc + out
        cur = acc / cfg.n_kernels

    cur = jax.nn.leaky_relu(cur, 0.01)
    cur = _mask_t(cur, vcur)
    cur = conv1d(cur, gw.out_conv_w, gw.out_conv_b,
                 padding=cfg.out_conv_padding)                  # (22, L)
    cur = _mask_t(cur, vcur)
    mag = jnp.exp(cur[: cfg.post_n_fft])
    phase = jnp.sin(cur[cfg.post_n_fft:])
    spec = jnp.stack([mag.T, phase.T], axis=0)                  # (2, L, 11)
    wav = dsp.istft(spec, window, cfg.true_n_fft, cfg.stft_hop,
                    abs_and_angle=True)
    n_static = (f2 // 2) * cfg.up_sampling_factor   # bucket samples
    wav = wav[:n_static]
    n_out = total * cfg.up_sampling_factor
    wav = wav * (jnp.arange(wav.shape[0]) < n_out)
    return wav


# ---------------------------------------------------------------------------
# Loading (GGUF names per the reference converter, py-gguf
# kokoro_gguf_encoder.py, and kokoro_model::assign_* in model.cpp:394-773)
# ---------------------------------------------------------------------------

def _arr(r: GGUFReader, name: str):
    return jnp.asarray(np.asarray(r.array(name), dtype=np.float32))


def _maybe(r: GGUFReader, name: str):
    return _arr(r, name) if name in r.tensors else None


def _load_lstm(r: GGUFReader, base: str) -> tuple:
    """'<base>.0.weights.N' 8-tensor layout: even=input, odd=recurrent, gate
    order I,F,G,O (kokoro converter prepare_lstm_tensor)."""
    def cell(kind_w: str, kind_b: str) -> LSTMWeights:
        ws = [_arr(r, f"{base}.0.{kind_w}.{i}") for i in range(8)]
        bs = [_arr(r, f"{base}.0.{kind_b}.{i}") for i in range(8)]
        w_ih = jnp.concatenate([ws[0], ws[2], ws[4], ws[6]], axis=0)
        w_hh = jnp.concatenate([ws[1], ws[3], ws[5], ws[7]], axis=0)
        b_ih = jnp.concatenate([bs[0], bs[2], bs[4], bs[6]], axis=0)
        b_hh = jnp.concatenate([bs[1], bs[3], bs[5], bs[7]], axis=0)
        return LSTMWeights(w_ih, w_hh, b_ih, b_hh)
    return cell("weights", "biases"), cell("reverse_weights", "reverse_biases")


def _load_ada_ln(r: GGUFReader, base: str) -> AdaLayerNormW:
    return AdaLayerNormW(
        gamma_w=_arr(r, f"{base}gamma_weight"),
        gamma_b=_arr(r, f"{base}gamma_bias"),
        beta_w=_arr(r, f"{base}beta_weight"),
        beta_b=_arr(r, f"{base}beta_bias"),
    )


def _load_ada_res_block(r: GGUFReader, base: str) -> AdaResBlockW:
    return AdaResBlockW(
        norm1=_load_ada_ln(r, f"{base}.norm1_"),
        conv1_w=_arr(r, f"{base}.conv1_weight"),
        conv1_b=_arr(r, f"{base}.conv1_bias"),
        norm2=_load_ada_ln(r, f"{base}.norm2_"),
        conv2_w=_arr(r, f"{base}.conv2_weight"),
        conv2_b=_arr(r, f"{base}.conv2_bias"),
        pool_w=_maybe(r, f"{base}.pool_weight"),
        pool_b=_maybe(r, f"{base}.pool_bias"),
        upsample_w=(_maybe(r, f"{base}.conv1x1_weight").reshape(
            r.tensors[f"{base}.conv1x1_weight"].shape[:2])
            if f"{base}.conv1x1_weight" in r.tensors else None),
        upsample_b=_maybe(r, f"{base}.conv1x1_bias"),
    )


def _load_gen_res_block(r: GGUFReader, base: str) -> GenResBlockW:
    n = 3
    return GenResBlockW(
        adain1=[AdaLayerNormW(
            gamma_w=_arr(r, f"{base}.{i}.gamma1_weight"),
            gamma_b=_arr(r, f"{base}.{i}.gamma1_bias"),
            beta_w=_arr(r, f"{base}.{i}.beta1_weight"),
            beta_b=_arr(r, f"{base}.{i}.beta1_bias")) for i in range(n)],
        adain2=[AdaLayerNormW(
            gamma_w=_arr(r, f"{base}.{i}.gamma2_weight"),
            gamma_b=_arr(r, f"{base}.{i}.gamma2_bias"),
            beta_w=_arr(r, f"{base}.{i}.beta2_weight"),
            beta_b=_arr(r, f"{base}.{i}.beta2_bias")) for i in range(n)],
        alpha1=[_arr(r, f"{base}.{i}.alpha1") for i in range(n)],
        alpha2=[_arr(r, f"{base}.{i}.alpha2") for i in range(n)],
        convs1_w=[_arr(r, f"{base}.{i}.convs1_weight") for i in range(n)],
        convs1_b=[_arr(r, f"{base}.{i}.convs1_bias") for i in range(n)],
        convs2_w=[_arr(r, f"{base}.{i}.convs2_weight") for i in range(n)],
        convs2_b=[_arr(r, f"{base}.{i}.convs2_bias") for i in range(n)],
    )


def load_kokoro_weights(r: GGUFReader, cfg: KokoroConfig) -> KokoroWeights:
    a = "kokoro.albert."
    albert_layers = []
    for i in range(cfg.n_layers):
        b = f"{a}layer.{i}."
        albert_layers.append(AlbertLayer(
            q_w=_arr(r, b + "q"), q_b=_arr(r, b + "q_bias"),
            k_w=_arr(r, b + "k"), k_b=_arr(r, b + "k_bias"),
            v_w=_arr(r, b + "v"), v_b=_arr(r, b + "v_bias"),
            o_w=_arr(r, b + "o"), o_b=_arr(r, b + "o_bias"),
            attn_ln_w=_arr(r, b + "ffn_norm"),
            attn_ln_b=_arr(r, b + "ffn_norm_bias"),
            ffn_w=_arr(r, b + "ffn"), ffn_b=_arr(r, b + "ffn_bias"),
            ffn_out_w=_arr(r, b + "ffn_out"),
            ffn_out_b=_arr(r, b + "ffn_out_bias"),
            out_ln_w=_arr(r, b + "attn_norm"),
            out_ln_b=_arr(r, b + "attn_norm_bias"),
        ))

    d = "kokoro.duration_predictor."
    layers_lstm, layers_ada = [], []
    for i in range(cfg.n_duration_prediction_layers):
        layers_lstm.append(_load_lstm(r, f"{d}layers.{i * 2}.lstm"))
        layers_ada.append(AdaLayerNormW(
            gamma_w=_arr(r, f"{d}layers.{i * 2 + 1}.gamma_weight"),
            gamma_b=_arr(r, f"{d}layers.{i * 2 + 1}.gamma_bias"),
            beta_w=_arr(r, f"{d}layers.{i * 2 + 1}.beta_weight"),
            beta_b=_arr(r, f"{d}layers.{i * 2 + 1}.beta_bias")))
    prosody = DurationPredictorW(
        encode_w=_arr(r, d + "encode"), encode_b=_arr(r, d + "encode_bias"),
        layers_lstm=layers_lstm, layers_ada=layers_ada,
        duration_lstm=_load_lstm(r, d + "duration_lstm"),
        duration_proj_w=_arr(r, d + "duration_proj"),
        duration_proj_b=_arr(r, d + "duration_proj_bias"),
        shared_lstm=_load_lstm(r, d + "shared_lstm"),
        f0_blocks=[_load_ada_res_block(r, f"{d}f0_blocks.{i}")
                   for i in range(cfg.f0_n_blocks)],
        n_blocks=[_load_ada_res_block(r, f"{d}n_blocks.{i}")
                  for i in range(cfg.f0_n_blocks)],
        f0_proj_w=_arr(r, d + "f0_proj_kernel").reshape(
            r.tensors[d + "f0_proj_kernel"].shape[:2]),
        f0_proj_b=_arr(r, d + "f0_proj_bias"),
        n_proj_w=_arr(r, d + "n_proj_kernel").reshape(
            r.tensors[d + "n_proj_kernel"].shape[:2]),
        n_proj_b=_arr(r, d + "n_proj_bias"),
    )

    t = "kokoro.text_encoder."
    convs = []
    for i in range(cfg.n_conv_layers):
        convs.append((
            _arr(r, f"{t}layers.{i}.gamma"), _arr(r, f"{t}layers.{i}.beta"),
            _arr(r, f"{t}layers.{i}.weight"), _arr(r, f"{t}layers.{i}.bias"),
        ))
    text_encoder = TextEncoderW(
        embd=_arr(r, t + "embedding_weight"),
        convs=convs,
        lstm=_load_lstm(r, t + "lstm"),
    )

    g = "kokoro.decoder.generator."
    generator = GeneratorW(
        m_source_w=_arr(r, g + "m_source_weight"),
        m_source_b=_arr(r, g + "m_source_bias"),
        ups_w=[_arr(r, f"{g}ups.{i}.weight") for i in range(cfg.n_upsamples)],
        ups_b=[_arr(r, f"{g}ups.{i}.bias") for i in range(cfg.n_upsamples)],
        noise_blocks=[NoiseBlockW(
            conv_w=_arr(r, f"{g}noise_blocks.{i}.conv_weight"),
            conv_b=_arr(r, f"{g}noise_blocks.{i}.conv_bias"),
            res=_load_gen_res_block(r, f"{g}noise_blocks.{i}.resblock"))
            for i in range(cfg.n_noise_blocks)],
        res_blocks=[_load_gen_res_block(r, f"{g}resblocks.{i}")
                    for i in range(cfg.n_res_blocks)],
        out_conv_w=_arr(r, g + "conv_post_weight"),
        out_conv_b=_arr(r, g + "conv_post_bias"),
    )

    dd = "kokoro.decoder."
    decoder = DecoderW(
        f0_conv_w=_arr(r, dd + "f0_conv_weight"),
        f0_conv_b=_arr(r, dd + "f0_conv_bias"),
        n_conv_w=_arr(r, dd + "n_conv_weight"),
        n_conv_b=_arr(r, dd + "n_conv_bias"),
        asr_conv_w=_arr(r, dd + "asr_conv_weight").reshape(
            r.tensors[dd + "asr_conv_weight"].shape[:2]),
        asr_conv_b=_arr(r, dd + "asr_conv_bias"),
        encoder_block=_load_ada_res_block(r, dd + "encoder_block"),
        decoder_blocks=[_load_ada_res_block(r, f"{dd}decoder_blocks.{i}")
                        for i in range(cfg.n_decoder_blocks)],
        generator=generator,
    )

    return KokoroWeights(
        token_embd=_arr(r, a + "token_embd"),
        position_embd=_arr(r, a + "position_embd"),
        token_type_row=_arr(r, a + "token_type_embd"),
        input_ln_w=_arr(r, a + "norm"), input_ln_b=_arr(r, a + "norm_bias"),
        embd_hidden_w=_arr(r, a + "embd"), embd_hidden_b=_arr(r, a + "embd_bias"),
        albert_layers=albert_layers,
        prosody=prosody,
        text_encoder=text_encoder,
        decoder=decoder,
    )


def load_voices(r: GGUFReader) -> dict:
    """kokoro.voice_tensors.<name> -> (510, 256) style packs."""
    out = {}
    prefix = "kokoro.voice_tensors."
    for name in r.tensor_names():
        if name.startswith(prefix):
            v = np.asarray(r.array(name), dtype=np.float32)
            v = v.reshape(v.shape[0], -1)
            out[name[len(prefix):]] = v
    return out


# ---------------------------------------------------------------------------
# Runner
# ---------------------------------------------------------------------------

class KokoroRunner(TTSRunner):
    arch = "kokoro"
    sample_rate = SAMPLE_RATE_KOKORO

    def __init__(self, cfg: KokoroConfig, weights: KokoroWeights,
                 tokenizer: SinglePassTokenizer, voices: dict,
                 phonemizer=None,
                 token_buckets=(64, 128, 256, 512),
                 frame_buckets=(250, 500, 1000, 2000, 4000, 10240)):
        self.cfg = cfg
        self.weights = weights
        self.tokenizer = tokenizer
        self.voices = voices
        self.phonemizer = phonemizer
        self.token_buckets = token_buckets
        self.frame_buckets = frame_buckets

    def list_voices(self):
        return sorted(self.voices.keys())

    def _bucket(self, n, buckets):
        for b in buckets:
            if n <= b:
                return b
        return buckets[-1]

    def _style(self, voice: str, n_tokens: int):
        pack = self.voices[voice]
        idx = int(np.clip(n_tokens - 3, 0, pack.shape[0] - 1))
        row = pack[idx]
        half = self.cfg.style_half_size
        # style_half (prosody) = second half; style_half2 (decoder) = first
        # half (model.cpp:1013, 1150, 1213)
        return jnp.asarray(row[half:]), jnp.asarray(row[:half])

    def run_tokens(self, tokens, voice: str, seed=None) -> np.ndarray:
        """One chunk: tokens (with bos/eos) -> waveform (float32)."""
        cfg = self.cfg
        n = len(tokens)
        p = self._bucket(n, self.token_buckets)
        toks = np.zeros(p, np.int32)
        toks[:n] = tokens
        s_half, s_half2 = self._style(voice, n)
        dur, hidden = kokoro_duration(cfg, self.weights, jnp.asarray(toks),
                                      jnp.int32(n), s_half)
        total = int(np.asarray(dur).sum())
        if total == 0:
            return np.zeros(0, np.float32)
        f = self._bucket(total, self.frame_buckets)
        key = jax.random.PRNGKey(seed if seed is not None else
                                 np.random.randint(2 ** 31))
        uv_rand = jax.random.uniform(
            key, (cfg.harmonic_num + 1, int(2 * f * cfg.upsample_scale)))
        wav, total_dev = kokoro_generate(
            cfg, self.weights, jnp.asarray(toks), jnp.int32(n), dur, hidden,
            s_half, s_half2, uv_rand, n_frames=f)
        return np.asarray(wav)[: total * cfg.up_sampling_factor]

    def tokenize_chunks(self, clauses):
        """Clause list -> <=512-token chunks (model.cpp:1340-1388)."""
        cfg = self.cfg
        chunks = []
        for clause in clauses:
            clause = clause.strip()
            if not clause:
                continue
            body = self.tokenizer.tokenize(clause)
            if len(body) + 1 <= cfg.max_context_length - 2:
                chunks.append([cfg.bos_token_id] + body + [cfg.eos_token_id])
                continue
            tokens = [cfg.bos_token_id] + body
            last_space, last_split = 1, 1
            for i in range(1, len(tokens)):
                if tokens[i] == cfg.space_token_id:
                    last_space = i
                cur_len = (i - last_split) + (len(chunks[-1]) if chunks else 0)
                if cur_len >= cfg.max_context_length - 1:
                    if last_space > last_split:
                        chunks.append([cfg.bos_token_id] +
                                      tokens[last_split:last_space] +
                                      [cfg.eos_token_id])
                        last_split = last_space
                    else:
                        chunks.append([cfg.bos_token_id] +
                                      tokens[last_split:i + 1] +
                                      [cfg.eos_token_id])
                        last_split = i + 1
            if last_split + 1 < len(tokens):
                chunks.append([cfg.bos_token_id] + tokens[last_split:] +
                              [cfg.eos_token_id])
        return chunks

    def generate(self, prompt: str, config: GenerationConfig | None = None) -> TTSResponse:
        """Parity: kokoro_runner::generate (model.cpp:1409-1460)."""
        parts = list(self._stream_parts(prompt, config))
        wav = np.concatenate(parts) if parts else np.zeros(0, np.float32)
        return TTSResponse(wav.astype(np.float32), SAMPLE_RATE_KOKORO)

    def generate_stream(self, prompt: str, config: GenerationConfig | None = None):
        """Streaming generation: yields one waveform per <=512-token text
        chunk as it is synthesized (Kokoro is feed-forward, so the natural
        streaming unit is the reference's clause chunk, model.cpp:1436-1449).
        TTFA path."""
        for part in self._stream_parts(prompt, config):
            yield part.astype(np.float32)

    def _stream_parts(self, prompt: str, config: GenerationConfig | None = None):
        config = config or GenerationConfig()
        cfg = self.cfg
        voice = config.voice or "af_heart"
        if voice not in self.voices:
            if self.voices:
                voice = sorted(self.voices)[0]
            else:
                raise ValueError("no voices in checkpoint")
        # propagate the voice's language to the espeak phonemizer if in use
        # (reference propagate_voice_setting, model.cpp:1390-1407)
        if self.phonemizer is not None and \
                hasattr(self.phonemizer, "set_voice"):
            code = config.espeak_voice_id or get_espeak_id_from_kokoro_voice(voice)
            try:
                self.phonemizer.set_voice(code)
            except Exception:
                pass
        text = prompt
        for ch in ",;:":
            text = text.replace(ch, "--")
        text = text.replace("\n", " ")
        if self.phonemizer is not None:
            text = self.phonemizer.text_to_phonemes(text)
        if len(text) < cfg.max_context_length - 2:
            stripped = text
            for ch in ".!?":
                stripped = stripped.replace(ch, "")
            stripped = stripped.strip()
            if not stripped:
                return
            tokens = [cfg.bos_token_id] + self.tokenizer.tokenize(stripped) + \
                [cfg.eos_token_id]
            yield self.run_tokens(tokens, voice, seed=config.seed)
        else:
            clauses = []
            cur = ""
            for ch in text:
                cur += ch
                if ch in ".!?":
                    clauses.append(cur)
                    cur = ""
            if cur:
                clauses.append(cur)
            for chunk in self.tokenize_chunks(clauses):
                yield self.run_tokens(chunk, voice, seed=config.seed)
