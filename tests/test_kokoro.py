"""Kokoro tests on a tiny random model.

The strongest checks here are bucket-invariance: running the same input
through different padded bucket sizes must give identical valid outputs —
this exercises every mask (attention, biLSTM reverse start, instance norms,
conv tails, iSTFT). Component-level golden tests compare the Adain residual
block against a torch re-implementation.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tts_tpu.models.kokoro.model import (
    AdaLayerNormW, AdaResBlockW, AlbertLayer, DecoderW, DurationPredictorW,
    GenResBlockW, GeneratorW, KokoroConfig, KokoroRunner, KokoroWeights,
    NoiseBlockW, TextEncoderW, ada_res_block, gen_res_block, kokoro_duration,
    kokoro_generate,
)
from tts_tpu.ops.rnn import LSTMWeights


def _r(rng, *s, scale=0.3):
    return jnp.asarray(rng.standard_normal(s).astype(np.float32) * scale)


def _lstm(rng, inp, hid):
    return (
        LSTMWeights(_r(rng, 4 * hid, inp), _r(rng, 4 * hid, hid),
                    _r(rng, 4 * hid), _r(rng, 4 * hid)),
        LSTMWeights(_r(rng, 4 * hid, inp), _r(rng, 4 * hid, hid),
                    _r(rng, 4 * hid), _r(rng, 4 * hid)),
    )


def _ada_ln(rng, c, style):
    return AdaLayerNormW(_r(rng, c, style), _r(rng, c), _r(rng, c, style), _r(rng, c))


def _ada_block(rng, cin, cout, style, pool=False):
    return AdaResBlockW(
        norm1=_ada_ln(rng, cin, style),
        conv1_w=_r(rng, cout, cin, 3), conv1_b=_r(rng, cout),
        norm2=_ada_ln(rng, cout, style),
        conv2_w=_r(rng, cout, cout, 3), conv2_b=_r(rng, cout),
        pool_w=_r(rng, cin, 1, 3) if pool else None,
        pool_b=_r(rng, cin) if pool else None,
        upsample_w=_r(rng, cout, cin) if (pool or cin != cout) else None,
        upsample_b=jnp.zeros(cout) if (pool or cin != cout) else None,
    )


def _gen_block(rng, c, style, n=3):
    return GenResBlockW(
        adain1=[_ada_ln(rng, c, style) for _ in range(n)],
        adain2=[_ada_ln(rng, c, style) for _ in range(n)],
        alpha1=[jnp.abs(_r(rng, 1, c, 1)) + 0.5 for _ in range(n)],
        alpha2=[jnp.abs(_r(rng, 1, c, 1)) + 0.5 for _ in range(n)],
        convs1_w=[_r(rng, c, c, 3) for _ in range(n)],
        convs1_b=[_r(rng, c) for _ in range(n)],
        convs2_w=[_r(rng, c, c, 3) for _ in range(n)],
        convs2_b=[_r(rng, c) for _ in range(n)],
    )


def tiny_kokoro(rng):
    cfg = KokoroConfig(
        max_context_length=64, vocab_size=30, hidden_size=32, n_attn_heads=4,
        n_layers=1, n_recurrence=2, duration_hidden_size=24,
        style_half_size=8, f0_n_blocks=3, n_duration_prediction_layers=2,
        n_conv_layers=2, n_kernels=2, n_upsamples=2, n_decoder_blocks=2,
        n_res_blocks=4, n_noise_blocks=2, out_conv_padding=1, true_n_fft=8,
        stft_hop=4, harmonic_num=3, up_sampling_factor=32, upsample_scale=16.0,
        res_block_dilations=((1, 3, 5),) * 4, res_block_paddings=((1, 3, 5),) * 4,
        noise_block_dilations=((1, 3, 5),) * 2,
        noise_block_paddings=((1, 3, 5),) * 2,
        noise_conv_strides=(2, 1), noise_conv_paddings=(1, 0),
        up_strides=(2, 2), up_paddings=(1, 1),
    )
    emb = 16
    H = cfg.hidden_size
    dh = cfg.duration_hidden_size  # 24
    sty = cfg.style_half_size      # 8
    albert = AlbertLayer(
        q_w=_r(rng, H, H), q_b=_r(rng, H), k_w=_r(rng, H, H), k_b=_r(rng, H),
        v_w=_r(rng, H, H), v_b=_r(rng, H), o_w=_r(rng, H, H), o_b=_r(rng, H),
        attn_ln_w=_r(rng, H) * 0.1 + 1, attn_ln_b=_r(rng, H) * 0.1,
        ffn_w=_r(rng, 2 * H, H), ffn_b=_r(rng, 2 * H),
        ffn_out_w=_r(rng, H, 2 * H), ffn_out_b=_r(rng, H),
        out_ln_w=_r(rng, H) * 0.1 + 1, out_ln_b=_r(rng, H) * 0.1,
    )
    din = dh + sty  # 32
    prosody = DurationPredictorW(
        encode_w=_r(rng, dh, H), encode_b=_r(rng, dh),
        layers_lstm=[_lstm(rng, din, dh // 2) for _ in range(2)],
        layers_ada=[_ada_ln(rng, dh, sty) for _ in range(2)],
        duration_lstm=_lstm(rng, din, dh // 2),
        duration_proj_w=_r(rng, 10, dh), duration_proj_b=_r(rng, 10),
        shared_lstm=_lstm(rng, din, dh // 2),
        f0_blocks=[_ada_block(rng, dh, dh, sty),
                   _ada_block(rng, dh, dh // 2, sty, pool=True),
                   _ada_block(rng, dh // 2, dh // 2, sty)],
        n_blocks=[_ada_block(rng, dh, dh, sty),
                  _ada_block(rng, dh, dh // 2, sty, pool=True),
                  _ada_block(rng, dh // 2, dh // 2, sty)],
        f0_proj_w=_r(rng, 1, dh // 2), f0_proj_b=_r(rng, 1),
        n_proj_w=_r(rng, 1, dh // 2), n_proj_b=_r(rng, 1),
    )
    te = TextEncoderW(
        embd=_r(rng, cfg.vocab_size, emb),
        convs=[(jnp.ones(emb), jnp.zeros(emb), _r(rng, emb, emb, 5), _r(rng, emb))
               for _ in range(2)],
        lstm=_lstm(rng, emb, dh // 2),
    )
    gch = 12  # generator channel width
    gen = GeneratorW(
        m_source_w=_r(rng, 1, cfg.harmonic_num + 1), m_source_b=_r(rng, 1),
        ups_w=[_r(rng, gch, gch, 4), _r(rng, gch, gch, 4)],
        ups_b=[_r(rng, gch), _r(rng, gch)],
        noise_blocks=[
            NoiseBlockW(conv_w=_r(rng, gch, 2 * (cfg.true_n_fft // 2 + 1), 3),
                        conv_b=_r(rng, gch), res=_gen_block(rng, gch, sty)),
            NoiseBlockW(conv_w=_r(rng, gch, 2 * (cfg.true_n_fft // 2 + 1), 1),
                        conv_b=_r(rng, gch), res=_gen_block(rng, gch, sty)),
        ],
        res_blocks=[_gen_block(rng, gch, sty) for _ in range(4)],
        out_conv_w=_r(rng, 2 * (cfg.true_n_fft // 2 + 1), gch, 3),
        out_conv_b=_r(rng, 2 * (cfg.true_n_fft // 2 + 1)),
    )
    f0ch = 4
    asr_ch = dh  # 24
    dec_in = asr_ch + 2 * f0ch  # 32
    dec = DecoderW(
        f0_conv_w=_r(rng, f0ch, 1, 3), f0_conv_b=_r(rng, f0ch),
        n_conv_w=_r(rng, f0ch, 1, 3), n_conv_b=_r(rng, f0ch),
        asr_conv_w=_r(rng, f0ch, asr_ch), asr_conv_b=_r(rng, f0ch),
        encoder_block=_ada_block(rng, dec_in, gch, sty),
        decoder_blocks=[_ada_block(rng, gch + 3 * f0ch, gch, sty),
                        _ada_block(rng, gch + 3 * f0ch, gch, sty, pool=True)],
        generator=gen,
    )
    w = KokoroWeights(
        token_embd=_r(rng, cfg.vocab_size, emb),
        position_embd=_r(rng, cfg.max_context_length, emb),
        token_type_row=_r(rng, emb),
        input_ln_w=_r(rng, emb) * 0.1 + 1, input_ln_b=_r(rng, emb) * 0.1,
        embd_hidden_w=_r(rng, H, emb), embd_hidden_b=_r(rng, H),
        albert_layers=[albert],
        prosody=prosody,
        text_encoder=te,
        decoder=dec,
    )
    return cfg, w


def test_duration_bucket_invariance(rng):
    cfg, w = tiny_kokoro(rng)
    tokens = [0, 5, 7, 3, 9, 2, 0]
    style = _r(rng, cfg.style_half_size)
    outs = []
    for p in (16, 32):
        t = np.zeros(p, np.int32)
        t[: len(tokens)] = tokens
        dur, hidden = kokoro_duration(cfg, w, jnp.asarray(t),
                                      jnp.int32(len(tokens)), style)
        outs.append((np.asarray(dur)[: len(tokens)],
                     np.asarray(hidden)[: len(tokens)]))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_allclose(outs[0][1], outs[1][1], atol=1e-5)
    assert np.all(outs[0][0] >= 1) and np.all(outs[0][0] <= 50)


def test_generation_runs_and_bucket_invariant(rng):
    cfg, w = tiny_kokoro(rng)
    tokens = [0, 5, 7, 3, 9, 2, 0]
    p = 16
    t = np.zeros(p, np.int32)
    t[: len(tokens)] = tokens
    style = _r(rng, cfg.style_half_size)
    style2 = _r(rng, cfg.style_half_size)
    dur, hidden = kokoro_duration(cfg, w, jnp.asarray(t),
                                  jnp.int32(len(tokens)), style)
    total = int(np.asarray(jnp.sum(dur)))
    assert total >= len(tokens)
    # deterministic uv noise shared across buckets (valid prefix identical)
    nharm = cfg.harmonic_num + 1
    big = rng.random((nharm, int(2 * (total + 11) * cfg.upsample_scale))
                     ).astype(np.float32)
    wavs = []
    for f in (total + 3, total + 11):
        uv = jnp.asarray(big[:, : int(2 * f * cfg.upsample_scale)])
        wav, tot = kokoro_generate(cfg, w, jnp.asarray(t),
                                   jnp.int32(len(tokens)), dur, hidden,
                                   style, style2, uv, n_frames=f)
        assert int(tot) == total
        wavs.append(np.asarray(wav)[: total * cfg.up_sampling_factor])
    assert wavs[0].shape == (total * cfg.up_sampling_factor,)
    assert np.abs(wavs[0]).max() > 0
    scale = np.abs(wavs[0]).max()
    np.testing.assert_allclose(wavs[0], wavs[1], atol=2e-4 * max(scale, 1.0))


def test_ada_res_block_matches_torch(rng):
    # torch reference of StyleTTS2 AdainResBlk1d semantics used by the
    # reference graph (model.cpp:88-134)
    cin, cout, sty, t = 8, 6, 4, 12
    blk = _ada_block(rng, cin, cout, sty, pool=False)
    x = rng.standard_normal((cin, t)).astype(np.float32)
    style = rng.standard_normal(sty).astype(np.float32)
    out, v = ada_res_block(jnp.asarray(x), jnp.asarray(style), blk, t)

    def affine(aw, h):
        gamma = style @ np.asarray(aw.gamma_w).T + np.asarray(aw.gamma_b)
        beta = style @ np.asarray(aw.beta_w).T + np.asarray(aw.beta_b)
        return (1 + gamma)[:, None] * h + beta[:, None]

    xt = torch.from_numpy(x)
    h = torch.nn.functional.instance_norm(xt[None], eps=1e-5)[0].numpy()
    h = affine(blk.norm1, h)
    h = np.where(h > 0, h, 0.2 * h)
    h = torch.nn.functional.conv1d(torch.from_numpy(h[None]),
                                   torch.from_numpy(np.asarray(blk.conv1_w)),
                                   torch.from_numpy(np.asarray(blk.conv1_b)),
                                   padding=1)[0].numpy()
    h2 = torch.nn.functional.instance_norm(torch.from_numpy(h)[None], eps=1e-5)[0].numpy()
    h2 = affine(blk.norm2, h2)
    h2 = np.where(h2 > 0, h2, 0.2 * h2)
    h2 = torch.nn.functional.conv1d(torch.from_numpy(h2[None]),
                                    torch.from_numpy(np.asarray(blk.conv2_w)),
                                    torch.from_numpy(np.asarray(blk.conv2_b)),
                                    padding=1)[0].numpy()
    shortcut = np.asarray(blk.upsample_w) @ x
    expect = (h2 + shortcut) / np.sqrt(2)
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-4)


def test_gen_res_block_residual_structure(rng):
    c, sty, t = 6, 4, 16
    blk = _gen_block(rng, c, sty)
    x = rng.standard_normal((c, t)).astype(np.float32)
    style = rng.standard_normal(sty).astype(np.float32)
    out = gen_res_block(jnp.asarray(x), jnp.asarray(style), blk,
                        (1, 3, 5), (1, 3, 5), t)
    assert out.shape == (c, t)
    # zeroing the convs2 weights makes the block an identity
    import dataclasses as dc
    blk0 = blk._replace(convs2_w=[jnp.zeros_like(w) for w in blk.convs2_w],
                        convs2_b=[jnp.zeros_like(b) for b in blk.convs2_b])
    out0 = gen_res_block(jnp.asarray(x), jnp.asarray(style), blk0,
                         (1, 3, 5), (1, 3, 5), t)
    np.testing.assert_allclose(np.asarray(out0), x, atol=1e-6)
