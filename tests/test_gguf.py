"""GGUF reader/writer + quantization format tests.

Golden math checks for Q4_0/Q5_0/Q8_0 block formats (reference ggml layout)
and roundtrip tests for the file format.
"""
import numpy as np
import pytest

from tts_tpu.gguf import GGUFReader, GGUFWriter, quants


def test_q8_0_roundtrip(rng):
    x = rng.standard_normal(256).astype(np.float32)
    raw = quants.quantize_q8_0(x)
    assert raw.nbytes == 256 // 32 * 34
    y = quants.dequantize_q8_0(raw, 256)
    # Q8_0 max error is d/2 = amax/254 per block
    err = np.abs(x - y)
    bound = np.repeat(np.abs(x.reshape(-1, 32)).max(-1) / 254 + 1e-6, 32)
    assert np.all(err <= bound * 1.01)


def test_q8_0_block_layout():
    # One block, known scale: amax = 127 -> d = 1.0, codes = values.
    x = np.arange(-16, 16, dtype=np.float32)
    x[0] = -127.0
    raw = quants.quantize_q8_0(x)
    d = raw[:2].view(np.float16)[0]
    assert d == np.float16(1.0)
    q = raw[2:].view(np.int8)
    assert q[0] == -127
    assert q[5] == x[5]


def test_q4_0_layout_and_dequant():
    # d = signed_absmax / -8. Build a block with absmax elem = -8 => d = 1.0
    x = np.zeros(32, dtype=np.float32)
    x[0] = -8.0
    x[7] = 3.0
    x[20] = -4.0
    raw = quants.quantize_q4_0(x)
    assert raw.nbytes == 18
    d = raw[:2].view(np.float16)[0]
    assert d == np.float16(1.0)
    qs = raw[2:]
    # elem 0 is in low nibble of byte 0: q = x/d + 8.5 trunc = 0.5 -> 0
    assert (qs[0] & 0x0F) == 0
    # elem 7 low nibble of byte 7: 3 + 8.5 = 11.5 -> 11
    assert (qs[7] & 0x0F) == 11
    # elem 20 high nibble of byte 4: -4 + 8.5 = 4.5 -> 4
    assert (qs[4] >> 4) == 4
    y = quants.dequantize_q4_0(raw, 32)
    assert y[0] == -8.0 and y[7] == 3.0 and y[20] == -4.0


def test_q5_0_layout_and_dequant():
    x = np.zeros(32, dtype=np.float32)
    x[0] = -16.0  # d = 1.0
    x[3] = 9.0
    x[19] = -12.0
    raw = quants.quantize_q5_0(x)
    assert raw.nbytes == 22
    d = raw[:2].view(np.float16)[0]
    assert d == np.float16(1.0)
    y = quants.dequantize_q5_0(raw, 32)
    assert y[0] == -16.0 and y[3] == 9.0 and y[19] == -12.0


@pytest.mark.parametrize("t", [quants.GGML_TYPE_Q4_0, quants.GGML_TYPE_Q5_0,
                               quants.GGML_TYPE_Q8_0])
def test_quant_error_bounds(rng, t):
    x = rng.standard_normal(32 * 64).astype(np.float32) * 3
    raw = quants.quantize(x, t)
    y = quants.dequantize(raw, t, x.size)
    denom = {quants.GGML_TYPE_Q4_0: 7, quants.GGML_TYPE_Q5_0: 15,
             quants.GGML_TYPE_Q8_0: 120}[t]
    per_block_scale = np.abs(x.reshape(-1, 32)).max(-1) / denom
    err = np.abs(x - y).reshape(-1, 32).max(-1)
    assert np.all(err <= per_block_scale + 1e-5)


@pytest.mark.parametrize("t", [quants.GGML_TYPE_Q4_0, quants.GGML_TYPE_Q5_0,
                               quants.GGML_TYPE_Q8_0])
def test_planar_pack_unpack_lossless(rng, t):
    x = rng.standard_normal((8, 128)).astype(np.float32)
    raw = quants.quantize(x, t)
    codes, scales = quants.unpack_planar(raw, t, (8, 128))
    assert codes.shape == (8, 128)
    assert scales.shape == (8, 4)
    raw2 = quants.pack_planar(codes, scales, t)
    assert bytes(raw) == bytes(raw2)
    # planar dequant == block dequant
    if t == quants.GGML_TYPE_Q8_0:
        vals = codes.astype(np.float32)
    else:
        bias = 8 if t == quants.GGML_TYPE_Q4_0 else 16
        vals = codes.astype(np.float32) - bias
    y = vals * np.repeat(scales.astype(np.float32), 32, axis=-1)
    np.testing.assert_allclose(y.reshape(-1), quants.dequantize(raw, t, x.size))


def test_gguf_file_roundtrip(tmp_path, rng):
    path = str(tmp_path / "test.gguf")
    w = GGUFWriter(path, "parler-tts")
    w.add_u32("parler-tts.decoder.hidden_size", 1024)
    w.add_f32("some.float", 0.5)
    w.add_bool("some.flag", True)
    w.add_str("tokenizer.ggml.model", "unigram")
    w.add_array("tokenizer.ggml.tokens", ["<unk>", "hello", "▁world"])
    w.add_array("tokenizer.ggml.scores", np.array([0.0, -1.5, -2.0], dtype=np.float32))
    t1 = rng.standard_normal((4, 64)).astype(np.float32)
    t2 = rng.standard_normal((32, 96)).astype(np.float32)
    t3 = rng.integers(0, 100, (7,)).astype(np.int32)
    w.add_tensor("dense.weight", t1)
    w.add_tensor("quant.weight", t2, quants.GGML_TYPE_Q4_0)
    w.add_tensor("ids", t3)
    w.add_tensor("half.weight", t1, quants.GGML_TYPE_F16)
    w.write()

    r = GGUFReader(path)
    assert r.architecture == "parler-tts"
    assert r.metadata["parler-tts.decoder.hidden_size"] == 1024
    assert abs(r.metadata["some.float"] - 0.5) < 1e-7
    assert r.metadata["some.flag"] is True
    assert r.metadata["tokenizer.ggml.tokens"] == ["<unk>", "hello", "▁world"]
    np.testing.assert_allclose(r.metadata["tokenizer.ggml.scores"], [0.0, -1.5, -2.0])
    np.testing.assert_allclose(r.array("dense.weight"), t1)
    np.testing.assert_array_equal(r.array("ids"), t3)
    np.testing.assert_allclose(r.array("half.weight"), t1.astype(np.float16))
    # quantized roundtrip matches direct quantize/dequantize
    expect = quants.dequantize(quants.quantize(t2, quants.GGML_TYPE_Q4_0),
                               quants.GGML_TYPE_Q4_0, t2.size).reshape(32, 96)
    np.testing.assert_allclose(r.array("quant.weight"), expect)
    codes, scales = r.planar("quant.weight")
    assert codes.shape == (32, 96) and scales.shape == (32, 3)
    assert r.tensors["quant.weight"].type_name == "Q4_0"
    r.close()


def test_first_key_fallback(tmp_path):
    path = str(tmp_path / "kv.gguf")
    w = GGUFWriter(path, "kokoro")
    w.add_u32("kokoro.duration_predictor.hidden_size", 512)
    w.write()
    r = GGUFReader(path)
    assert r.first_key(["missing.key", "kokoro.duration_predictor.hidden_size"]) == 512
    assert r.first_key(["nope"], 7) == 7
    r.close()
