"""Fused dequant matmul: XLA path vs numpy golden; Pallas kernel in
interpreter mode vs XLA path. (Real-TPU execution is covered by bench.py.)"""
import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from tts_tpu.gguf import quants
from tts_tpu.ops import quant_matmul as qmm


def _make_qt(rng, n, k, qtype):
    w = rng.standard_normal((n, k)).astype(np.float32)
    raw = quants.quantize(w, qtype)
    codes, scales = quants.unpack_planar(raw, qtype, (n, k))
    wd = quants.dequantize(raw, qtype, n * k).reshape(n, k)
    qt = qmm.QuantTensor.from_planar(codes, scales, qtype)
    return qt, wd


@pytest.mark.parametrize("qtype", [quants.GGML_TYPE_Q4_0, quants.GGML_TYPE_Q5_0,
                                   quants.GGML_TYPE_Q8_0])
def test_dense_matches_host_dequant(rng, qtype):
    qt, wd = _make_qt(rng, 16, 64, qtype)
    np.testing.assert_allclose(np.asarray(qt.dense()), wd, atol=1e-3)


@pytest.mark.parametrize("qtype", [quants.GGML_TYPE_Q4_0, quants.GGML_TYPE_Q8_0])
def test_quant_matmul_xla(rng, qtype):
    qt, wd = _make_qt(rng, 32, 96, qtype)
    x = rng.standard_normal((4, 96)).astype(np.float32)
    y = np.asarray(qmm.quant_matmul_xla(jnp.asarray(x), qt.codes_t, qt.scales_t, qtype))
    np.testing.assert_allclose(y, x @ wd.T, atol=1e-2, rtol=1e-4)


@pytest.mark.parametrize("qtype", [quants.GGML_TYPE_Q4_0, quants.GGML_TYPE_Q5_0,
                                   quants.GGML_TYPE_Q8_0])
def test_quant_matmul_pallas_interpret(rng, qtype):
    n, k, m = 512, 1024, 4
    qt, wd = _make_qt(rng, n, k, qtype)
    x = rng.standard_normal((m, k)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(qmm.quant_matmul_pallas(jnp.asarray(x), qt.codes_t,
                                               qt.scales_t, qtype, tile_n=256))
    ref = x @ wd.T
    np.testing.assert_allclose(y, ref, atol=1e-2 * np.abs(ref).max())


def test_quant_matmul_fallback_on_odd_shapes(rng):
    # N not 128-tileable -> silently uses the XLA path
    qt, wd = _make_qt(rng, 384, 32, quants.GGML_TYPE_Q8_0)
    x = rng.standard_normal((1, 32)).astype(np.float32)
    y = np.asarray(qmm.quant_matmul(jnp.asarray(x), qt.codes_t, qt.scales_t,
                                    quants.GGML_TYPE_Q8_0, use_pallas=True))
    np.testing.assert_allclose(y, x @ wd.T, atol=1e-2, rtol=1e-4)


def test_quant_tensor_take_rows(rng):
    qt, wd = _make_qt(rng, 64, 32, quants.GGML_TYPE_Q4_0)
    ids = jnp.asarray([3, 60, 7])
    rows = np.asarray(qt.take_rows(ids))
    np.testing.assert_allclose(rows, wd[[3, 60, 7]], atol=1e-3)
