"""LSTM / norm golden tests vs torch."""
import numpy as np
import torch

import jax.numpy as jnp

from tts_tpu.ops import rnn


def _torch_lstm(x, w, reverse=False):
    m = torch.nn.LSTM(x.shape[-1], w.w_hh.shape[-1], batch_first=False)
    with torch.no_grad():
        m.weight_ih_l0.copy_(torch.from_numpy(np.asarray(w.w_ih)))
        m.weight_hh_l0.copy_(torch.from_numpy(np.asarray(w.w_hh)))
        m.bias_ih_l0.copy_(torch.from_numpy(np.asarray(w.b_ih)))
        m.bias_hh_l0.copy_(torch.from_numpy(np.asarray(w.b_hh)))
        xin = torch.from_numpy(x[::-1].copy() if reverse else x)
        out, _ = m(xin.unsqueeze(1))
        out = out.squeeze(1).numpy()
    return out[::-1] if reverse else out


def _mk_weights(rng, inp, hid):
    return rnn.LSTMWeights(
        w_ih=jnp.asarray(rng.standard_normal((4 * hid, inp)).astype(np.float32) * 0.3),
        w_hh=jnp.asarray(rng.standard_normal((4 * hid, hid)).astype(np.float32) * 0.3),
        b_ih=jnp.asarray(rng.standard_normal(4 * hid).astype(np.float32) * 0.1),
        b_hh=jnp.asarray(rng.standard_normal(4 * hid).astype(np.float32) * 0.1),
    )


def test_lstm_matches_torch(rng):
    x = rng.standard_normal((12, 6)).astype(np.float32)
    w = _mk_weights(rng, 6, 8)
    y = np.asarray(rnn.lstm(jnp.asarray(x), w))
    ref = _torch_lstm(x, w)
    np.testing.assert_allclose(y, ref, atol=1e-5)


def test_bilstm_matches_torch(rng):
    x = rng.standard_normal((10, 5)).astype(np.float32)
    fwd = _mk_weights(rng, 5, 7)
    bwd = _mk_weights(rng, 5, 7)
    y = np.asarray(rnn.bilstm(jnp.asarray(x), fwd, bwd))
    ref_f = _torch_lstm(x, fwd)
    ref_b = _torch_lstm(x, bwd, reverse=True)
    np.testing.assert_allclose(y[:, :7], ref_f, atol=1e-5)
    np.testing.assert_allclose(y[:, 7:], ref_b, atol=1e-5)


def test_masked_bilstm_equals_unpadded(rng):
    x = rng.standard_normal((16, 5)).astype(np.float32)
    true_len = 11
    fwd = _mk_weights(rng, 5, 6)
    bwd = _mk_weights(rng, 5, 6)
    full = np.asarray(rnn.masked_bilstm(jnp.asarray(x), true_len, fwd, bwd))
    short = np.asarray(rnn.bilstm(jnp.asarray(x[:true_len]), fwd, bwd))
    np.testing.assert_allclose(full[:true_len], short, atol=1e-5)
    np.testing.assert_allclose(full[true_len:], 0.0, atol=1e-6)


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((4, 10)).astype(np.float32)
    g = rng.standard_normal(10).astype(np.float32)
    b = rng.standard_normal(10).astype(np.float32)
    y = np.asarray(rnn.layer_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b),
                                  eps=1e-12))
    ref = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (10,), torch.from_numpy(g), torch.from_numpy(b),
        eps=1e-12).numpy()
    np.testing.assert_allclose(y, ref, atol=1e-5)


def test_rms_norm(rng):
    x = rng.standard_normal((3, 8)).astype(np.float32)
    g = rng.standard_normal(8).astype(np.float32)
    y = np.asarray(rnn.rms_norm(jnp.asarray(x), jnp.asarray(g), eps=1e-6))
    ref = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-6) * g
    np.testing.assert_allclose(y, ref, atol=1e-5)


def test_adain_instance_norm(rng):
    x = rng.standard_normal((6, 20)).astype(np.float32)
    style = rng.standard_normal(4).astype(np.float32)
    w = rng.standard_normal((12, 4)).astype(np.float32)
    b = rng.standard_normal(12).astype(np.float32)
    y = np.asarray(rnn.adain_1d(jnp.asarray(x), jnp.asarray(style),
                                jnp.asarray(w), jnp.asarray(b)))
    h = style @ w.T + b
    gamma, beta = h[:6], h[6:]
    inorm = torch.nn.functional.instance_norm(
        torch.from_numpy(x[None]), eps=1e-5).numpy()[0]
    ref = (1 + gamma[:, None]) * inorm + beta[:, None]
    np.testing.assert_allclose(y, ref, atol=1e-4)
