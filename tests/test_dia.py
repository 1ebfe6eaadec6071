"""Dia tests on a tiny random model: tokenizer, CFG/delay protocol,
generation loop behavior, and an encoder cross-check vs torch."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tts_tpu.models.dia.model import (
    DiaConfig, DiaDecoderLayer, DiaEncoderLayer, DiaWeights,
    adjust_output_tokens, dia_encode, dia_generate_tokens, tokenize_sentence,
)


def make_cfg():
    return DiaConfig(
        n_output_heads=3, n_encoder_layers=2, n_decoder_layers=2,
        encoder_hidden_size=16, decoder_hidden_size=32,
        encoder_attn_heads=4, decoder_attn_heads=4, decoder_query_heads=2,
        head_size=8, eos_token_id=8, pad_token_id=9, bos_token_id=10,
        output_vocab_size=12, audio_vocab_size=8, max_generation_size=40,
        max_encoder_context_length=32, max_delay=4,
        delay_pattern=(0, 2, 4), cfg_max_output=8,
    )


def make_weights(cfg, rng, scale=0.3):
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * scale)
    eh, dh, hs = cfg.encoder_hidden_size, cfg.decoder_hidden_size, cfg.head_size
    ea, da, nkv = cfg.encoder_attn_heads, cfg.decoder_attn_heads, cfg.n_kv_heads
    L_e, L_d = cfg.n_encoder_layers, cfg.n_decoder_layers
    enc = DiaEncoderLayer(
        sa_norm=r(L_e, eh) * 0.1 + 1,
        q=r(L_e, ea * hs, eh), k=r(L_e, ea * hs, eh), v=r(L_e, ea * hs, eh),
        o=r(L_e, eh, ea * hs),
        mlp_norm=r(L_e, eh) * 0.1 + 1,
        gate=r(L_e, 2 * eh, eh), up=r(L_e, 2 * eh, eh), wo=r(L_e, eh, 2 * eh),
    )
    dec = DiaDecoderLayer(
        sa_norm=r(L_d, dh) * 0.1 + 1,
        self_q=r(L_d, da * hs, dh), self_k=r(L_d, nkv * hs, dh),
        self_v=r(L_d, nkv * hs, dh), self_o=r(L_d, dh, da * hs),
        ca_norm=r(L_d, dh) * 0.1 + 1,
        cross_q=r(L_d, da * hs, dh), cross_k=r(L_d, da * hs, eh),
        cross_v=r(L_d, da * hs, eh), cross_o=r(L_d, dh, da * hs),
        mlp_norm=r(L_d, dh) * 0.1 + 1,
        gate=r(L_d, 2 * dh, dh), up=r(L_d, 2 * dh, dh), wo=r(L_d, dh, 2 * dh),
    )
    return DiaWeights(
        enc_embedding=r(260, eh),
        enc_layers=enc,
        enc_norm=r(eh) * 0.1 + 1,
        dec_embds=r(cfg.n_output_heads, cfg.bos_token_id + 1, dh),
        dec_layers=dec,
        dec_norm=r(dh) * 0.1 + 1,
        heads=r(cfg.n_output_heads * cfg.output_vocab_size, dh),
    )


def test_tokenize_sentence():
    cfg = DiaConfig()
    toks = tokenize_sentence("hello", cfg)
    # "[S1] hello." -> 0x01 prefix, '.' appended
    assert toks[0] == 1
    assert toks[-1] == ord(".")
    toks2 = tokenize_sentence("[S2] hi there.", cfg)
    assert toks2[0] == 2
    with pytest.raises(ValueError):
        tokenize_sentence("x" * 2000, cfg)


def test_encoder_shapes_and_pad_mask(rng):
    cfg = make_cfg()
    w = make_weights(cfg, rng)
    tokens = np.zeros((2, 32), np.int32)
    tokens[0, :5] = [1, 72, 105, 33, 46]
    hidden, ck, cv = dia_encode(cfg, w, jnp.asarray(tokens), jnp.int32(5))
    assert hidden.shape == (2, 32, 16)
    assert ck.shape == (2, 2, 4, 32, 8)
    # cross-K rows beyond the prompt are zeroed
    np.testing.assert_allclose(np.asarray(ck)[:, :, :, 5:, :], 0.0)
    assert np.abs(np.asarray(ck)[:, :, :, :5, :]).max() > 0
    # block-diagonal mask: changing a PAD token must not change real-token
    # encodings
    tokens2 = tokens.copy()
    tokens2[0, 20] = 99
    hidden2, _, _ = dia_encode(cfg, w, jnp.asarray(tokens2), jnp.int32(5))
    np.testing.assert_allclose(np.asarray(hidden)[0, :5],
                               np.asarray(hidden2)[0, :5], atol=1e-5)


def test_generation_delay_winddown(rng):
    cfg = make_cfg()
    w = make_weights(cfg, rng)
    tokens = np.zeros((2, 32), np.int32)
    tokens[0, :5] = [1, 72, 105, 33, 46]
    _, ck, cv = dia_encode(cfg, w, jnp.asarray(tokens), jnp.int32(5))
    out, n_steps = dia_generate_tokens(
        cfg, w, ck, cv, jax.random.PRNGKey(0), max_steps=20, do_sample=False)
    n_steps = int(n_steps)
    assert 1 <= n_steps <= 20
    out = np.asarray(out)[:n_steps]
    assert out.shape[1] == 3


def test_adjust_output_tokens_delay_pattern():
    cfg = make_cfg()  # delay (0, 2, 4), max_delay 4
    n = 10
    out = np.zeros((n, 3), np.int64)
    # channel ii frame i value at out[i + delay[ii], ii]
    for i in range(n):
        out[i, 0] = i            # delay 0
        out[i, 1] = 100 + i      # delay 2 -> frame i reads out[i+2,1]
        out[i, 2] = 200 + i
    out[:, 1] -= 2
    out[:, 2] -= 4
    out = np.clip(out, 0, None)
    # make all tokens valid (< 8): use modulo
    out = out % 8
    frames = adjust_output_tokens(out, n, cfg)
    assert frames.shape[0] <= n - cfg.max_delay
    for i in range(frames.shape[0]):
        assert frames[i, 0] == out[i, 0]
        assert frames[i, 1] == out[i + 2, 1]
        assert frames[i, 2] == out[i + 4, 2]


def test_cfg_merge_masks_invalid_tokens(rng):
    # greedy decode can never produce a token > cfg_max_output
    cfg = make_cfg()
    w = make_weights(cfg, rng)
    tokens = np.zeros((2, 32), np.int32)
    tokens[0, :3] = [1, 72, 46]
    _, ck, cv = dia_encode(cfg, w, jnp.asarray(tokens), jnp.int32(3))
    out, n_steps = dia_generate_tokens(
        cfg, w, ck, cv, jax.random.PRNGKey(3), max_steps=12, do_sample=True,
        temperature=3.0)
    out = np.asarray(out)[: int(n_steps)]
    assert np.all(out <= cfg.cfg_max_output)
