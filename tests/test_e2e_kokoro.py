"""End-to-end Kokoro: serialize the tiny random model to a GGUF with the
reference converter's naming, load via runner_from_file, and generate."""
import numpy as np
import pytest

from tests.test_kokoro import tiny_kokoro, _r
from tts_tpu.common import GenerationConfig
from tts_tpu.convert.writers import write_kokoro_gguf
from tts_tpu.models.registry import runner_from_file


def _split_lstm(pair, tensors, base):
    fwd, bwd = pair
    for kind, lw in (("", fwd), ("reverse_", bwd)):
        h4 = lw.w_ih.shape[0]
        h = h4 // 4
        for gi in range(4):
            tensors[f"{base}.0.{kind}weights.{gi*2}"] = np.asarray(lw.w_ih[gi*h:(gi+1)*h])
            tensors[f"{base}.0.{kind}weights.{gi*2+1}"] = np.asarray(lw.w_hh[gi*h:(gi+1)*h])
            tensors[f"{base}.0.{kind}biases.{gi*2}"] = np.asarray(lw.b_ih[gi*h:(gi+1)*h])
            tensors[f"{base}.0.{kind}biases.{gi*2+1}"] = np.asarray(lw.b_hh[gi*h:(gi+1)*h])


def _ada_ln(t, base, ada):
    t[base + "gamma_weight"] = np.asarray(ada.gamma_w)
    t[base + "gamma_bias"] = np.asarray(ada.gamma_b)
    t[base + "beta_weight"] = np.asarray(ada.beta_w)
    t[base + "beta_bias"] = np.asarray(ada.beta_b)


def _ada_block(t, base, blk):
    _ada_ln(t, base + ".norm1_", blk.norm1)
    t[base + ".conv1_weight"] = np.asarray(blk.conv1_w)
    t[base + ".conv1_bias"] = np.asarray(blk.conv1_b)
    _ada_ln(t, base + ".norm2_", blk.norm2)
    t[base + ".conv2_weight"] = np.asarray(blk.conv2_w)
    t[base + ".conv2_bias"] = np.asarray(blk.conv2_b)
    if blk.pool_w is not None:
        t[base + ".pool_weight"] = np.asarray(blk.pool_w)
        t[base + ".pool_bias"] = np.asarray(blk.pool_b)
    if blk.upsample_w is not None:
        t[base + ".conv1x1_weight"] = np.asarray(blk.upsample_w)[:, :, None]
        t[base + ".conv1x1_bias"] = np.asarray(blk.upsample_b)


def _gen_block(t, base, blk):
    for i in range(len(blk.convs1_w)):
        t[f"{base}.{i}.gamma1_weight"] = np.asarray(blk.adain1[i].gamma_w)
        t[f"{base}.{i}.gamma1_bias"] = np.asarray(blk.adain1[i].gamma_b)
        t[f"{base}.{i}.beta1_weight"] = np.asarray(blk.adain1[i].beta_w)
        t[f"{base}.{i}.beta1_bias"] = np.asarray(blk.adain1[i].beta_b)
        t[f"{base}.{i}.gamma2_weight"] = np.asarray(blk.adain2[i].gamma_w)
        t[f"{base}.{i}.gamma2_bias"] = np.asarray(blk.adain2[i].gamma_b)
        t[f"{base}.{i}.beta2_weight"] = np.asarray(blk.adain2[i].beta_w)
        t[f"{base}.{i}.beta2_bias"] = np.asarray(blk.adain2[i].beta_b)
        t[f"{base}.{i}.alpha1"] = np.asarray(blk.alpha1[i])
        t[f"{base}.{i}.alpha2"] = np.asarray(blk.alpha2[i])
        t[f"{base}.{i}.convs1_weight"] = np.asarray(blk.convs1_w[i])
        t[f"{base}.{i}.convs1_bias"] = np.asarray(blk.convs1_b[i])
        t[f"{base}.{i}.convs2_weight"] = np.asarray(blk.convs2_w[i])
        t[f"{base}.{i}.convs2_bias"] = np.asarray(blk.convs2_b[i])


def serialize_kokoro(path, cfg, w, voices, tokens):
    t = {}
    a = "kokoro.albert."
    t[a + "token_embd"] = np.asarray(w.token_embd)
    t[a + "position_embd"] = np.asarray(w.position_embd)
    t[a + "token_type_embd"] = np.asarray(w.token_type_row)
    t[a + "norm"] = np.asarray(w.input_ln_w)
    t[a + "norm_bias"] = np.asarray(w.input_ln_b)
    t[a + "embd"] = np.asarray(w.embd_hidden_w)
    t[a + "embd_bias"] = np.asarray(w.embd_hidden_b)
    for i, lw in enumerate(w.albert_layers):
        b = f"{a}layer.{i}."
        for name, val in (("q", lw.q_w), ("q_bias", lw.q_b), ("k", lw.k_w),
                          ("k_bias", lw.k_b), ("v", lw.v_w), ("v_bias", lw.v_b),
                          ("o", lw.o_w), ("o_bias", lw.o_b),
                          ("ffn_norm", lw.attn_ln_w), ("ffn_norm_bias", lw.attn_ln_b),
                          ("ffn", lw.ffn_w), ("ffn_bias", lw.ffn_b),
                          ("ffn_out", lw.ffn_out_w), ("ffn_out_bias", lw.ffn_out_b),
                          ("attn_norm", lw.out_ln_w), ("attn_norm_bias", lw.out_ln_b)):
            t[b + name] = np.asarray(val)
    d = "kokoro.duration_predictor."
    pw = w.prosody
    t[d + "encode"] = np.asarray(pw.encode_w)
    t[d + "encode_bias"] = np.asarray(pw.encode_b)
    for i, (lstm_pair, ada) in enumerate(zip(pw.layers_lstm, pw.layers_ada)):
        _split_lstm(lstm_pair, t, f"{d}layers.{i*2}.lstm")
        _ada_ln(t, f"{d}layers.{i*2+1}.", ada)
    _split_lstm(pw.duration_lstm, t, d + "duration_lstm")
    _split_lstm(pw.shared_lstm, t, d + "shared_lstm")
    t[d + "duration_proj"] = np.asarray(pw.duration_proj_w)
    t[d + "duration_proj_bias"] = np.asarray(pw.duration_proj_b)
    for i, blk in enumerate(pw.f0_blocks):
        _ada_block(t, f"{d}f0_blocks.{i}", blk)
    for i, blk in enumerate(pw.n_blocks):
        _ada_block(t, f"{d}n_blocks.{i}", blk)
    t[d + "f0_proj_kernel"] = np.asarray(pw.f0_proj_w)[:, :, None]
    t[d + "f0_proj_bias"] = np.asarray(pw.f0_proj_b)
    t[d + "n_proj_kernel"] = np.asarray(pw.n_proj_w)[:, :, None]
    t[d + "n_proj_bias"] = np.asarray(pw.n_proj_b)
    te = "kokoro.text_encoder."
    t[te + "embedding_weight"] = np.asarray(w.text_encoder.embd)
    for i, (gamma, beta, cw, cb) in enumerate(w.text_encoder.convs):
        t[f"{te}layers.{i}.gamma"] = np.asarray(gamma)
        t[f"{te}layers.{i}.beta"] = np.asarray(beta)
        t[f"{te}layers.{i}.weight"] = np.asarray(cw)
        t[f"{te}layers.{i}.bias"] = np.asarray(cb)
    _split_lstm(w.text_encoder.lstm, t, te + "lstm")
    dd = "kokoro.decoder."
    dec = w.decoder
    t[dd + "f0_conv_weight"] = np.asarray(dec.f0_conv_w)
    t[dd + "f0_conv_bias"] = np.asarray(dec.f0_conv_b)
    t[dd + "n_conv_weight"] = np.asarray(dec.n_conv_w)
    t[dd + "n_conv_bias"] = np.asarray(dec.n_conv_b)
    t[dd + "asr_conv_weight"] = np.asarray(dec.asr_conv_w)[:, :, None]
    t[dd + "asr_conv_bias"] = np.asarray(dec.asr_conv_b)
    _ada_block(t, dd + "encoder_block", dec.encoder_block)
    for i, blk in enumerate(dec.decoder_blocks):
        _ada_block(t, f"{dd}decoder_blocks.{i}", blk)
    g = dd + "generator."
    gen = dec.generator
    t[g + "m_source_weight"] = np.asarray(gen.m_source_w)
    t[g + "m_source_bias"] = np.asarray(gen.m_source_b)
    t[g + "conv_post_weight"] = np.asarray(gen.out_conv_w)
    t[g + "conv_post_bias"] = np.asarray(gen.out_conv_b)
    for i in range(len(gen.ups_w)):
        t[f"{g}ups.{i}.weight"] = np.asarray(gen.ups_w[i])
        t[f"{g}ups.{i}.bias"] = np.asarray(gen.ups_b[i])
    for i, nb in enumerate(gen.noise_blocks):
        t[f"{g}noise_blocks.{i}.conv_weight"] = np.asarray(nb.conv_w)
        t[f"{g}noise_blocks.{i}.conv_bias"] = np.asarray(nb.conv_b)
        _gen_block(t, f"{g}noise_blocks.{i}.resblock", nb.res)
    for i, rb in enumerate(gen.res_blocks):
        _gen_block(t, f"{g}resblocks.{i}", rb)

    write_kokoro_gguf(
        path,
        albert_hidden=cfg.hidden_size, albert_layers=cfg.n_layers,
        albert_heads=cfg.n_attn_heads, albert_recurrence=cfg.n_recurrence,
        duration_hidden=cfg.duration_hidden_size, f0_n_blocks=cfg.f0_n_blocks,
        duration_layers=cfg.n_duration_prediction_layers,
        text_encoder_layers=cfg.n_conv_layers, gen_kernels=cfg.n_kernels,
        gen_upsamples=cfg.n_upsamples, decoder_blocks=cfg.n_decoder_blocks,
        gen_padding=cfg.out_conv_padding, gen_n_fft=cfg.true_n_fft,
        gen_hop=cfg.stft_hop, up_sampling_factor=cfg.up_sampling_factor,
        up_strides=cfg.up_strides, up_paddings=cfg.up_paddings,
        noise_strides=cfg.noise_conv_strides,
        noise_paddings=cfg.noise_conv_paddings,
        res_dilations=cfg.res_block_dilations,
        res_paddings=cfg.res_block_paddings,
        noise_res_dilations=cfg.noise_block_dilations,
        noise_res_paddings=cfg.noise_block_paddings,
        tensors=t, voices=voices, tokenizer_tokens=tokens,
        max_context_length=cfg.max_context_length)


def test_kokoro_end_to_end(tmp_path, rng):
    cfg, w = tiny_kokoro(rng)
    tokens = ["$", "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k",
              "l", "m", "n", "o", " "]
    voices = {"af_heart": rng.standard_normal((32, 16)).astype(np.float32) * 0.2,
              "bm_lewis": rng.standard_normal((32, 16)).astype(np.float32) * 0.2}
    path = str(tmp_path / "kokoro-tiny.gguf")
    serialize_kokoro(path, cfg, w, voices, tokens)

    runner = runner_from_file(path)
    assert runner.arch == "kokoro"
    assert runner.list_voices() == ["af_heart", "bm_lewis"]
    resp = runner.generate("abc def", GenerationConfig(voice="af_heart", seed=0))
    assert resp.sample_rate == 24000
    assert resp.n_outputs > 0
    assert resp.n_outputs % cfg.up_sampling_factor == 0
    # upsampling rate: each duration frame is up_sampling_factor samples
    assert resp.n_outputs >= 7 * cfg.up_sampling_factor  # >=1 per token+bos/eos


def test_kokoro_gguf_matches_direct_weights(tmp_path, rng):
    """The GGUF-loaded model must produce the same durations as the in-memory
    weights it was serialized from."""
    import jax.numpy as jnp
    from tts_tpu.models.kokoro.model import kokoro_duration
    cfg, w = tiny_kokoro(rng)
    tokens = ["$"] + [chr(ord("a") + i) for i in range(15)] + [" "]
    voices = {"af_x": rng.standard_normal((32, 16)).astype(np.float32) * 0.2}
    path = str(tmp_path / "k2.gguf")
    serialize_kokoro(path, cfg, w, voices, tokens)
    runner = runner_from_file(path)
    ids = [0, 3, 5, 2, 0]
    toks = np.zeros(16, np.int32)
    toks[: len(ids)] = ids
    style = jnp.asarray(voices["af_x"][len(ids) - 3][8:])
    d1, h1 = kokoro_duration(cfg, w, jnp.asarray(toks), jnp.int32(len(ids)), style)
    d2, h2 = kokoro_duration(runner.cfg, runner.weights, jnp.asarray(toks),
                             jnp.int32(len(ids)), style)
    np.testing.assert_array_equal(np.asarray(d1)[: len(ids)],
                                  np.asarray(d2)[: len(ids)])
    np.testing.assert_allclose(np.asarray(h1)[: len(ids)],
                               np.asarray(h2)[: len(ids)], atol=1e-5)
