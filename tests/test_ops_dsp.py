"""Golden tests for DSP ops vs torch/numpy reference implementations."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tts_tpu.ops import conv, dsp


def test_hann_window():
    w = np.asarray(dsp.hann_window(16))
    ref = np.sin(np.pi * np.arange(16) / 16) ** 2
    np.testing.assert_allclose(w, ref, atol=1e-7)
    # periodic form == torch.hann_window(periodic=True)
    np.testing.assert_allclose(w, torch.hann_window(16, periodic=True).numpy(),
                               atol=1e-6)


def test_stft_matches_torch(rng):
    n_fft, hop, t = 20, 5, 200
    x = rng.standard_normal(t).astype(np.float32)
    w = dsp.hann_window(n_fft)
    out = np.asarray(dsp.stft(jnp.asarray(x), w, n_fft, hop, abs_and_angle=False))
    ref = torch.stft(torch.from_numpy(x), n_fft, hop_length=hop,
                     window=torch.hann_window(n_fft, periodic=True),
                     center=True, return_complex=True,
                     onesided=True, pad_mode="reflect").numpy()
    # torch: (bins, frames); ours: (2, frames, bins)
    np.testing.assert_allclose(out[0].T, ref.real, atol=1e-4)
    np.testing.assert_allclose(out[1].T, ref.imag, atol=1e-4)


def test_stft_istft_roundtrip(rng):
    n_fft, hop, t = 20, 5, 400
    x = rng.standard_normal(t).astype(np.float32)
    w = dsp.hann_window(n_fft)
    spec = dsp.stft(jnp.asarray(x), w, n_fft, hop, abs_and_angle=True)
    y = np.asarray(dsp.istft(spec, w, n_fft, hop, abs_and_angle=True))
    n_frames = t // hop + 1
    assert y.shape == (n_frames * hop,)
    # interior must reconstruct the signal (edges are window-truncated)
    np.testing.assert_allclose(y[n_fft:t - n_fft], x[n_fft:t - n_fft],
                               atol=1e-3)


def test_window_squared_sum_matches_reference_loop():
    n_fft, hop, n_frames = 20, 5, 37
    w = np.asarray(dsp.hann_window(n_fft))
    # reference C loop (src/util.cpp:203-217)
    cutoff = n_frames * hop
    half = n_fft // 2
    tgt = np.zeros(cutoff, np.float32)
    for i in range(n_frames + half // hop):
        for ii in range(n_fft):
            idx = ii + i * hop - half
            if 0 <= idx < cutoff:
                tgt[idx] += w[ii] ** 2
    ours = np.asarray(dsp.window_squared_sum(n_fft, hop, n_frames, w))
    np.testing.assert_allclose(ours, tgt, atol=1e-5)


def test_snake(rng):
    x = rng.standard_normal((4, 64)).astype(np.float32)
    alpha = np.abs(rng.standard_normal((4, 1))).astype(np.float32) + 0.1
    y = np.asarray(dsp.snake_1d(jnp.asarray(x), jnp.asarray(alpha)))
    ref = x + np.sin(alpha * x) ** 2 / alpha
    np.testing.assert_allclose(y, ref, atol=1e-5)


def test_upscale_linear_matches_torch(rng):
    x = rng.standard_normal((2, 3, 17)).astype(np.float32)
    y = np.asarray(dsp.upscale_linear(jnp.asarray(x), 4))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), scale_factor=4, mode="linear",
        align_corners=False).numpy()
    np.testing.assert_allclose(y, ref, atol=1e-5)


def test_uv_noise_semantics(rng):
    t, h = 32, 9
    f0 = rng.uniform(0, 300, t).astype(np.float32)
    noise = rng.standard_normal((h, t)).astype(np.float32)
    uv, nz = dsp.uv_noise(jnp.asarray(f0), h, jnp.asarray(noise),
                          voice_threshold=10.0, noise_std=0.003, sin_amp=0.1)
    uv, nz = np.asarray(uv), np.asarray(nz)
    voiced = f0 > 10.0
    np.testing.assert_allclose(uv[:, voiced], 0.1)
    np.testing.assert_allclose(uv[:, ~voiced], 0.0)
    np.testing.assert_allclose(nz[:, voiced], 0.003 * noise[:, voiced], atol=1e-7)
    np.testing.assert_allclose(nz[:, ~voiced], (0.1 / 3) * noise[:, ~voiced], atol=1e-7)


def test_cfg_scale():
    cond = np.array([[1.0, 2.0, 3.0, 4.0]], np.float32)
    uncond = np.array([[0.5, 1.0, 5.0, 0.0]], np.float32)
    out = np.asarray(dsp.cfg_scale(jnp.asarray(cond), jnp.asarray(uncond),
                                   scale=3.0, max_output=2))
    expect = cond + 3.0 * (cond - uncond)
    np.testing.assert_allclose(out[0, :3], expect[0, :3])
    assert out[0, 3] == -np.inf


def test_conv1d_matches_torch(rng):
    x = rng.standard_normal((2, 8, 50)).astype(np.float32)
    w = rng.standard_normal((16, 8, 7)).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    y = np.asarray(conv.conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                               stride=2, padding=3, dilation=1))
    ref = torch.nn.functional.conv1d(torch.from_numpy(x), torch.from_numpy(w),
                                     torch.from_numpy(b), stride=2, padding=3).numpy()
    np.testing.assert_allclose(y, ref, atol=1e-4)


def test_conv1d_dilated_depthwise(rng):
    x = rng.standard_normal((1, 8, 64)).astype(np.float32)
    w = rng.standard_normal((8, 1, 7)).astype(np.float32)
    y = np.asarray(conv.conv1d(jnp.asarray(x), jnp.asarray(w), None,
                               padding=9, dilation=3, groups=8))
    ref = torch.nn.functional.conv1d(torch.from_numpy(x), torch.from_numpy(w),
                                     padding=9, dilation=3, groups=8).numpy()
    np.testing.assert_allclose(y, ref, atol=1e-4)


@pytest.mark.parametrize("stride,padding,k", [(2, 1, 4), (4, 2, 8), (8, 4, 16), (1, 0, 3)])
def test_conv_transpose_1d_matches_torch(rng, stride, padding, k):
    x = rng.standard_normal((1, 6, 20)).astype(np.float32)
    w = rng.standard_normal((6, 4, k)).astype(np.float32)
    b = rng.standard_normal(4).astype(np.float32)
    y = np.asarray(conv.conv_transpose_1d(jnp.asarray(x), jnp.asarray(w),
                                          jnp.asarray(b), stride=stride,
                                          padding=padding))
    ref = torch.nn.functional.conv_transpose1d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=stride, padding=padding).numpy()
    np.testing.assert_allclose(y, ref, atol=1e-4)


def test_conv_transpose_grouped(rng):
    x = rng.standard_normal((1, 8, 16)).astype(np.float32)
    w = rng.standard_normal((8, 2, 5)).astype(np.float32)
    y = np.asarray(conv.conv_transpose_1d(jnp.asarray(x), jnp.asarray(w), None,
                                          stride=2, padding=1, groups=4))
    ref = torch.nn.functional.conv_transpose1d(
        torch.from_numpy(x), torch.from_numpy(w), stride=2, padding=1,
        groups=4).numpy()
    np.testing.assert_allclose(y, ref, atol=1e-4)


def test_unbatched_conv(rng):
    x = rng.standard_normal((8, 30)).astype(np.float32)
    w = rng.standard_normal((4, 8, 3)).astype(np.float32)
    y = np.asarray(conv.conv1d(jnp.asarray(x), jnp.asarray(w), padding=1))
    assert y.shape == (4, 30)
