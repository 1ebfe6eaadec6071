"""End-to-end: fabricate a tiny Parler GGUF (decoder + DAC + unigram
tokenizer), load through runner_from_file, generate, quantize, reload."""
import numpy as np
import pytest

from tts_tpu.common import GenerationConfig
from tts_tpu.convert import write_parler_gguf
from tts_tpu.models.registry import runner_from_file


def make_tiny_parler_gguf(path, rng):
    H, L, NH, heads = 32, 2, 3, 2
    vocab = 12  # output vocab; audio vocab 8, eos 8, bos 9
    dec = {}
    for l in range(L):
        b = f"layers.{l}."
        r = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.3
        dec[b + "self_attn_layer_norm.weight"] = r(H) * 0.1 + 1
        dec[b + "self_attn_layer_norm.bias"] = r(H) * 0.1
        for n in ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
                  "self_attn.out_proj"):
            dec[b + n + ".weight"] = r(H, H)
        dec[b + "encoder_attn_layer_norm.weight"] = r(H) * 0.1 + 1
        dec[b + "encoder_attn_layer_norm.bias"] = r(H) * 0.1
        for n in ("encoder_attn.q_proj", "encoder_attn.k_proj",
                  "encoder_attn.v_proj", "encoder_attn.out_proj"):
            dec[b + n + ".weight"] = r(H, H)
        dec[b + "final_layer_norm.weight"] = r(H) * 0.1 + 1
        dec[b + "final_layer_norm.bias"] = r(H) * 0.1
        dec[b + "fc1.weight"] = r(2 * H, H)
        dec[b + "fc2.weight"] = r(H, 2 * H)
    r = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.3
    dec["layer_norm.weight"] = r(H) * 0.1 + 1
    dec["layer_norm.bias"] = r(H) * 0.1
    dec["embed_prompts"] = r(20, H)
    dec["positional_embed"] = r(64, H)
    for i in range(NH):
        dec[f"embed_tokens.{i}.weight"] = r(10, H)
        dec[f"lm_heads.{i}.weight.head"] = r(vocab, H)

    # tiny DAC: 2 layers, 3 quantizers, latent 8
    dac = {}
    dac["initial.weight"] = r(8, 8, 7)
    dac["initial.bias"] = r(8)
    ch = [8, 6, 4]
    for i in (1, 2):
        b = f"decoder_block.{i}."
        cin, cout = ch[i - 1], ch[i]
        stride = (4, 2)[i - 1]
        dac[b + "final.alpha"] = np.abs(r(1, cin, 1)) + 0.5
        dac[b + "final.weight"] = r(cin, cout, 2 * stride)
        dac[b + "final.bias"] = r(cout)
        for j in range(3):
            ub = b + f"residual_unit.{j}.res."
            dac[ub + "initial.alpha"] = np.abs(r(1, cout, 1)) + 0.5
            dac[ub + "initial.weight"] = r(cout, cout, 7)
            dac[ub + "initial.bias"] = r(cout)
            dac[ub + "final.alpha"] = np.abs(r(1, cout, 1)) + 0.5
            dac[ub + "final.weight"] = r(cout, cout, 1)
            dac[ub + "final.bias"] = r(cout)
    dac["final.alpha"] = np.abs(r(1, 4, 1)) + 0.5
    dac["final.weight"] = r(1, 4, 7)
    dac["final.bias"] = r(1)
    for i in range(NH):
        b = f"quantizers.{i}."
        dac[b + "codebook.weight"] = r(10, 6)
        dac[b + "out_proj.weight"] = r(8, 6, 1)
        dac[b + "out_proj.bias"] = r(8)

    tokens = ["<unk>", "</s>", " ", "he", "llo", "wor", "ld", "a", "b", "c"]
    scores = [-10.0, -1.0, -1.0, -2.0, -2.0, -2.0, -2.0, -3.0, -3.0, -3.0]
    text_encoding = r(6, H)
    write_parler_gguf(
        path, hidden_size=H, n_layers=L, n_attn_heads=4, n_output_heads=NH,
        output_vocab_size=vocab, max_generation=24, max_ctx=64,
        bos_token_id=9, eos_token_id=8,
        decoder_tensors=dec, tokenizer_tokens=tokens, tokenizer_scores=scores,
        tokenizer_unk_id=0, tokenizer_eos_id=1, text_encoding=text_encoding,
        dac_tensors=dac, dac_strides=(4, 2), dac_paddings=(2, 1),
        dac_up_sampling_factor=8)


def test_parler_end_to_end(tmp_path, rng):
    path = str(tmp_path / "parler-tiny.gguf")
    make_tiny_parler_gguf(path, rng)
    runner = runner_from_file(path)
    assert runner.arch == "parler-tts"
    cfg = GenerationConfig(sample=False, seed=0)
    resp = runner.generate("hello world", cfg)
    # with random weights the model may or may not emit valid frames, but the
    # pipeline must produce a waveform at 8 samples per valid frame
    assert resp.sample_rate == 44100
    assert resp.n_outputs % 8 == 0
    codes = runner.generate_codes("hello world", cfg)
    assert codes.shape[0] * 8 == resp.n_outputs


def test_parler_quantize_roundtrip(tmp_path, rng):
    from tts_tpu.apps.quantize import QuantizationParams, quantize_gguf
    from tts_tpu.gguf import GGUFReader, quants
    src = str(tmp_path / "parler-tiny.gguf")
    dst = str(tmp_path / "parler-q8.gguf")
    make_tiny_parler_gguf(src, rng)
    params = QuantizationParams(quants.GGML_TYPE_Q8_0)
    quantize_gguf(src, dst, params, log=lambda *a: None)
    r = GGUFReader(dst)
    assert r.metadata["general.quantization_type"] == quants.GGML_TYPE_Q8_0
    # projections quantized; DAC, norms, positional embds untouched
    assert r.tensors["decoder.layers.0.self_attn.q_proj.weight"].type_name == "Q8_0"
    assert r.tensors["decoder.layers.0.encoder_attn.k_proj.weight"].type_name == "F32"
    assert r.tensors["decoder.positional_embed"].type_name == "F32"
    assert r.tensors["audio_encoder.initial.weight"].type_name == "F32"
    assert r.tensors["decoder.lm_heads.0.weight.head"].type_name == "F32"
    r.close()

    # quantized model loads and generates through the same runner path
    runner = runner_from_file(dst)
    resp = runner.generate("hello", GenerationConfig(sample=False, seed=0))
    assert resp.sample_rate == 44100


def test_greedy_parity_f32_vs_q8(tmp_path, rng):
    """Greedy token streams from the f32 and Q8_0 models should match (Q8
    error is tiny relative to random-weight logit gaps)."""
    from tts_tpu.apps.quantize import QuantizationParams, quantize_gguf
    from tts_tpu.gguf import quants
    src = str(tmp_path / "a.gguf")
    dst = str(tmp_path / "b.gguf")
    make_tiny_parler_gguf(src, rng)
    quantize_gguf(src, dst, QuantizationParams(quants.GGML_TYPE_Q8_0),
                  log=lambda *a: None)
    cfg = GenerationConfig(sample=False, seed=0)
    codes_a = runner_from_file(src).generate_codes("hello world", cfg)
    codes_b = runner_from_file(dst).generate_codes("hello world", cfg)
    assert codes_a.shape == codes_b.shape
    np.testing.assert_array_equal(codes_a, codes_b)
