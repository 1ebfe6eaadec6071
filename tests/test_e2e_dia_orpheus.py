"""End-to-end Dia and Orpheus: serialize tiny models to GGUF with reference
naming, load via runner_from_file, generate waveforms."""
import numpy as np
import pytest

from tests.test_dia import make_cfg as dia_cfg, make_weights as dia_weights
from tests.test_orpheus import make_orpheus, make_tiny_snac
from tts_tpu.common import GenerationConfig
from tts_tpu.convert.writers import write_dia_gguf, write_orpheus_gguf
from tts_tpu.models.registry import runner_from_file


def serialize_dia(path, cfg, w, dac=None, dac_cfg=None):
    t = {}
    t["dia.encoder.embedding"] = np.asarray(w.enc_embedding)
    t["dia.encoder.norm"] = np.asarray(w.enc_norm)
    for l in range(cfg.n_encoder_layers):
        b = f"dia.encoder.layers.{l}."
        lw = w.enc_layers
        t[b + "pre_sa_norm"] = np.asarray(lw.sa_norm[l])
        t[b + "q_proj"] = np.asarray(lw.q[l])
        t[b + "k_proj"] = np.asarray(lw.k[l])
        t[b + "v_proj"] = np.asarray(lw.v[l])
        t[b + "o_proj"] = np.asarray(lw.o[l])
        t[b + "post_sa_norm"] = np.asarray(lw.mlp_norm[l])
        t[b + "gate"] = np.asarray(lw.gate[l])
        t[b + "up"] = np.asarray(lw.up[l])
        t[b + "wo"] = np.asarray(lw.wo[l])
    for l in range(cfg.n_decoder_layers):
        b = f"dia.decoder.layers.{l}."
        lw = w.dec_layers
        t[b + "pre_sa_norm"] = np.asarray(lw.sa_norm[l])
        t[b + "self_q_proj"] = np.asarray(lw.self_q[l])
        t[b + "self_k_proj"] = np.asarray(lw.self_k[l])
        t[b + "self_v_proj"] = np.asarray(lw.self_v[l])
        t[b + "self_o_proj"] = np.asarray(lw.self_o[l])
        t[b + "pre_ca_norm"] = np.asarray(lw.ca_norm[l])
        t[b + "cross_q_proj"] = np.asarray(lw.cross_q[l])
        t[b + "cross_k_proj"] = np.asarray(lw.cross_k[l])
        t[b + "cross_v_proj"] = np.asarray(lw.cross_v[l])
        t[b + "cross_o_proj"] = np.asarray(lw.cross_o[l])
        t[b + "pre_mlp_norm"] = np.asarray(lw.mlp_norm[l])
        t[b + "gate"] = np.asarray(lw.gate[l])
        t[b + "up"] = np.asarray(lw.up[l])
        t[b + "wo"] = np.asarray(lw.wo[l])
    t["dia.decoder.norm"] = np.asarray(w.dec_norm)
    for i in range(cfg.n_output_heads):
        t[f"dia.decoder.embeddings.{i}"] = np.asarray(w.dec_embds[i])
        v = cfg.output_vocab_size
        t[f"dia.decoder.heads.{i}"] = np.asarray(
            w.heads[i * v:(i + 1) * v])
    write_dia_gguf(
        path, head_size=cfg.head_size, encoder_hidden=cfg.encoder_hidden_size,
        decoder_hidden=cfg.decoder_hidden_size,
        encoder_layers=cfg.n_encoder_layers, decoder_layers=cfg.n_decoder_layers,
        encoder_heads=cfg.encoder_attn_heads, decoder_heads=cfg.decoder_attn_heads,
        query_heads=cfg.decoder_query_heads, output_heads=cfg.n_output_heads,
        output_vocab=cfg.output_vocab_size, audio_vocab=cfg.audio_vocab_size,
        max_generation=cfg.max_generation_size,
        max_encoder_context=cfg.max_encoder_context_length,
        eos_token_id=cfg.eos_token_id, bos_token_id=cfg.bos_token_id,
        pad_token_id=cfg.pad_token_id, max_delay=cfg.max_delay,
        delay_pattern=cfg.delay_pattern,
        tensors=t)


def test_dia_end_to_end(tmp_path, rng):
    cfg = dia_cfg()
    w = dia_weights(cfg, rng)
    path = str(tmp_path / "dia-tiny.gguf")
    serialize_dia(path, cfg, w)
    runner = runner_from_file(path)
    assert runner.arch == "dia"
    assert runner.cfg.delay_pattern == cfg.delay_pattern
    codes = runner.generate_codes("[S1] hi there.",
                                  GenerationConfig(sample=False, seed=0,
                                                   max_tokens=20))
    assert codes.ndim == 2 and codes.shape[1] == cfg.n_output_heads


def serialize_orpheus(path, cfg, w, snac_cfg=None, snac_w=None):
    t = {}
    t["orpheus.embed_tokens"] = np.asarray(w.embd)
    t["orpheus.norm"] = np.asarray(w.out_norm)
    t["orpheus.lm_head"] = np.asarray(w.head)
    t["orpheus.rope_frequencies"] = np.asarray(w.rope_freqs)
    for l in range(cfg.n_layers):
        b = f"orpheus.layers.{l}."
        lw = w.layers
        t[b + "input_layernorm"] = np.asarray(lw.in_norm[l])
        t[b + "self_attn.q_proj"] = np.asarray(lw.q[l])
        t[b + "self_attn.k_proj"] = np.asarray(lw.k[l])
        t[b + "self_attn.v_proj"] = np.asarray(lw.v[l])
        t[b + "self_attn.o_proj"] = np.asarray(lw.o[l])
        t[b + "post_attention_layernorm"] = np.asarray(lw.post_norm[l])
        t[b + "mlp.gate_proj"] = np.asarray(lw.gate[l])
        t[b + "mlp.up_proj"] = np.asarray(lw.up[l])
        t[b + "mlp.down_proj"] = np.asarray(lw.down[l])
    snac_t = None
    kw = {}
    if snac_w is not None:
        snac_t = {}
        snac_t["in.weight"] = np.asarray(snac_w.in_w)
        snac_t["in.bias"] = np.asarray(snac_w.in_b)
        snac_t["up.weight"] = np.asarray(snac_w.up_w)
        snac_t["up.bias"] = np.asarray(snac_w.up_b)
        snac_t["alpha_out"] = np.asarray(snac_w.final_alpha)[None, :, :]
        snac_t["final.weight"] = np.asarray(snac_w.out_w)
        snac_t["final.bias"] = np.asarray(snac_w.out_b)
        for i, q in enumerate(snac_w.quantizers):
            snac_t[f"quantizers.{i}.codebook.weight"] = np.asarray(q.codebook)
            snac_t[f"quantizers.{i}.out_proj.weight"] = np.asarray(q.out_w)
            snac_t[f"quantizers.{i}.out_proj.bias"] = np.asarray(q.out_b)
        for i, lw2 in enumerate(snac_w.layers):
            b = f"layers.{i}."
            snac_t[b + "alpha"] = np.asarray(lw2.alpha)[None, :, :]
            snac_t[b + "weight"] = np.asarray(lw2.up_w)
            snac_t[b + "bias"] = np.asarray(lw2.up_b)
            if lw2.noise_w is not None:
                snac_t[b + "noise_weight"] = np.asarray(lw2.noise_w)
            for j, u in enumerate(lw2.units):
                ub = b + f"residual_unit.{j}.res."
                snac_t[ub + "initial.alpha"] = np.asarray(u.in_alpha)[None, :, :]
                snac_t[ub + "initial.weight"] = np.asarray(u.in_w)
                snac_t[ub + "initial.bias"] = np.asarray(u.in_b)
                snac_t[ub + "final.alpha"] = np.asarray(u.out_alpha)[None, :, :]
                snac_t[ub + "final.weight"] = np.asarray(u.out_w)
                snac_t[ub + "final.bias"] = np.asarray(u.out_b)
        kw = dict(snac_strides=snac_cfg.strides, snac_paddings=snac_cfg.paddings,
                  snac_groupings=snac_cfg.groupings,
                  snac_up_sampling_factor=snac_cfg.up_sampling_factor)
    vocab = [f"tok{i}" for i in range(cfg.vocab_size)]
    vocab[5] = "hi"
    vocab[6] = "Ġthere"
    vocab[7] = "zoe"
    vocab[8] = ":"
    write_orpheus_gguf(
        path, vocab_size=cfg.vocab_size, attn_heads=cfg.n_attn_heads,
        kv_attn_heads=cfg.n_kv_heads, head_dim=cfg.head_size,
        hidden_size=cfg.hidden_size, n_layers=cfg.n_layers,
        stopping_token_id=cfg.stopping_token_id,
        bos_token_id=cfg.bos_token_id, eos_token_id=cfg.eos_token_id,
        tensors=t, tokenizer_tokens=vocab, tokenizer_merges=[],
        snac_tensors=snac_t, **kw)


def test_orpheus_end_to_end(tmp_path, rng):
    cfg, w = make_orpheus(rng)
    snac_cfg, snac_w = make_tiny_snac(rng)
    path = str(tmp_path / "orpheus-tiny.gguf")
    serialize_orpheus(path, cfg, w, snac_cfg, snac_w)
    runner = runner_from_file(path)
    assert runner.arch == "orpheus"
    assert "zoe" in runner.list_voices()
    # tiny vocab can't hold the real prepend/append special tokens: bypass
    # the prompt builder and check the loaded weights roundtrip instead
    import jax.numpy as jnp
    from tts_tpu.models.orpheus.model import orpheus_prefill
    toks = np.zeros(8, np.int32)
    toks[:3] = [5, 6, 8]
    shape = (cfg.n_layers, cfg.n_kv_heads, 40, cfg.head_size)
    l1, _, _ = orpheus_prefill(cfg, w, jnp.asarray(toks), jnp.int32(3),
                               jnp.zeros(shape), jnp.zeros(shape))
    l2, _, _ = orpheus_prefill(runner.cfg, runner.weights, jnp.asarray(toks),
                               jnp.int32(3), jnp.zeros(shape), jnp.zeros(shape))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)
    # SNAC decodes through the loaded weights
    heads = [[1, 2], [1, 2, 3, 4], [1, 2, 3, 4, 5, 6, 7, 0]]
    wav = runner.snac.decode(heads, seed=0)
    assert wav.shape == (8 * snac_cfg.up_sampling_factor,)


def test_orpheus_quantize_roundtrip(tmp_path, rng):
    """Orpheus quantization — a capability the reference lacks entirely
    (reference README.md:25 'No quantization support yet'). Q8_0 weights
    load through the same runner path and produce near-identical logits."""
    import jax.numpy as jnp
    from tts_tpu.apps.quantize import QuantizationParams, quantize_gguf
    from tts_tpu.gguf import GGUFReader, quants
    from tts_tpu.models.orpheus.model import orpheus_prefill

    cfg, w = make_orpheus(rng)
    src = str(tmp_path / "orpheus-f32.gguf")
    dst = str(tmp_path / "orpheus-q8.gguf")
    serialize_orpheus(path=src, cfg=cfg, w=w)
    quantize_gguf(src, dst, QuantizationParams(quants.GGML_TYPE_Q8_0),
                  log=lambda *a: None)

    r = GGUFReader(dst)
    assert r.metadata["general.quantization_type"] == quants.GGML_TYPE_Q8_0
    # rows divisible by the 32-block quantize; others (K=16 here) stay f32
    assert r.tensors["orpheus.layers.0.self_attn.o_proj"].type_name == "Q8_0"
    assert r.tensors["orpheus.layers.0.mlp.down_proj"].type_name == "Q8_0"
    assert r.tensors["orpheus.layers.0.self_attn.q_proj"].type_name == "F32"
    assert r.tensors["orpheus.layers.0.input_layernorm"].type_name == "F32"
    assert r.tensors["orpheus.lm_head"].type_name == "F32"
    r.close()

    ra = runner_from_file(src)
    rb = runner_from_file(dst)
    toks = np.zeros(8, np.int32)
    toks[:3] = [5, 6, 8]
    shape = (cfg.n_layers, cfg.n_kv_heads, 40, cfg.head_size)
    la, _, _ = orpheus_prefill(ra.cfg, ra.weights, jnp.asarray(toks),
                               jnp.int32(3), jnp.zeros(shape), jnp.zeros(shape))
    lb, _, _ = orpheus_prefill(rb.cfg, rb.weights, jnp.asarray(toks),
                               jnp.int32(3), jnp.zeros(shape), jnp.zeros(shape))
    la, lb = np.asarray(la), np.asarray(lb)
    assert np.abs(la - lb).max() < 3e-2 * max(1.0, np.abs(la).max())
