"""Native C++ data-path kernels vs the numpy reference implementations."""
import numpy as np
import pytest

from tts_tpu import native
from tts_tpu.gguf import quants


requires_native = pytest.mark.skipif(not native.available(),
                                     reason="native toolchain unavailable")


@requires_native
@pytest.mark.parametrize("qtype", [quants.GGML_TYPE_Q4_0, quants.GGML_TYPE_Q5_0,
                                   quants.GGML_TYPE_Q8_0])
def test_native_unpack_matches_numpy(rng, qtype):
    w = rng.standard_normal((48, 96)).astype(np.float32)
    raw = quants.quantize(w, qtype)
    codes, scales = quants.unpack_planar(raw, qtype, (48, 96))
    ct, st = native.unpack_planar_transposed(raw, qtype, (48, 96))
    np.testing.assert_array_equal(ct, codes.astype(np.int8).T)
    np.testing.assert_allclose(st, scales.astype(np.float32).T, rtol=1e-6)


@requires_native
@pytest.mark.parametrize("qtype", [quants.GGML_TYPE_Q4_0, quants.GGML_TYPE_Q5_0,
                                   quants.GGML_TYPE_Q8_0])
def test_native_quantize_matches_numpy(rng, qtype):
    x = rng.standard_normal((16, 64)).astype(np.float32) * 2
    a = np.asarray(quants.quantize(x, qtype))
    b = np.asarray(native.quantize(x, qtype))
    np.testing.assert_array_equal(a, b)


def test_fallback_paths(rng, monkeypatch):
    # with the lib forced off, the wrappers still produce correct results
    monkeypatch.setattr(native, "_load", lambda: None)
    w = rng.standard_normal((8, 64)).astype(np.float32)
    raw = quants.quantize(w, quants.GGML_TYPE_Q4_0)
    ct, st = native.unpack_planar_transposed(raw, quants.GGML_TYPE_Q4_0, (8, 64))
    codes, scales = quants.unpack_planar(raw, quants.GGML_TYPE_Q4_0, (8, 64))
    np.testing.assert_array_equal(ct, codes.astype(np.int8).T)
    out = native.quantize(w, quants.GGML_TYPE_Q4_0)
    np.testing.assert_array_equal(out, raw)
