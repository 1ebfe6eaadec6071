"""DSP ops: STFT/iSTFT, windows, snake activation, linear upsampling.

TPU-native equivalents of the reference's GGML-fork DSP ops
(`ggml_stft`/`ggml_istft`/`snake_1d`/`ggml_upscale_linear`, used via
src/util.cpp:98-130, 203-217). Everything here is jittable, static-shape,
and built from XLA primitives (rfft/irfft are supported on TPU; framing is a
gather; overlap-add is a scatter-add — all fuse well under jit).

Conventions (matching the reference):
  * hann_window(n) = sin^2(pi*i/n)  — periodic window (src/util.cpp:132-137)
  * STFT is centered: the signal is reflect-padded by n_fft//2 on each side
    (src/util.cpp:202 comment), frame i starts at i*hop in the padded signal.
  * iSTFT output length is n_frames*hop; frame i is placed at i*hop - n_fft//2
    and the sum is normalized by the window-squared overlap sum
    (src/util.cpp:203-217).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n_fft: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window: sin^2(pi*i/n_fft). Reference src/util.cpp:132."""
    i = np.arange(n_fft)
    return jnp.asarray(np.sin(np.pi * i / n_fft) ** 2, dtype=dtype)


def window_squared_sum(n_fft: int, hop: int, n_frames: int, window) -> jax.Array:
    """Overlap-added window^2 normalizer (reference src/util.cpp:203-217).

    Output length n_frames*hop; frames at i*hop - n_fft//2 for
    i in [0, n_frames + (n_fft//2)//hop).
    """
    cutoff = n_frames * hop
    half = n_fft // 2
    w2 = jnp.asarray(window) ** 2
    total_frames = n_frames + half // hop
    starts = jnp.arange(total_frames) * hop - half
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]  # (frames, n_fft)
    valid = (idx >= 0) & (idx < cutoff)
    flat_idx = jnp.where(valid, idx, cutoff)  # out-of-range -> dropped bucket
    out = jnp.zeros(cutoff + 1, dtype=w2.dtype)
    out = out.at[flat_idx.reshape(-1)].add(
        jnp.broadcast_to(w2, (total_frames, n_fft)).reshape(-1))
    return out[:cutoff]


def _frame(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Center-pad (reflect) and cut into overlapping frames: (..., T) -> (..., F, n_fft)."""
    half = n_fft // 2
    pad = [(0, 0)] * (x.ndim - 1) + [(half, half)]
    xp = jnp.pad(x, pad, mode="reflect")
    n_frames = x.shape[-1] // hop + 1
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    return xp[..., idx]  # gather -> (..., n_frames, n_fft)


def stft(x: jax.Array, window, n_fft: int, hop: int,
         abs_and_angle: bool = True, one_sided: bool = True):
    """Short-time Fourier transform.

    Returns an array of shape (..., 2, n_frames, n_bins): channel 0/1 are
    (magnitude, phase-angle) when abs_and_angle else (real, imag).
    Parity: reference `stft` wrapper src/util.cpp:111-121.
    """
    w = jnp.asarray(window)
    frames = _frame(x, n_fft, hop) * w
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    if not one_sided:
        full = jnp.fft.fft(frames, n=n_fft, axis=-1)
        spec = full
    if abs_and_angle:
        a = jnp.abs(spec)
        ang = jnp.arctan2(spec.imag, spec.real)
        return jnp.stack([a, ang], axis=-3)
    return jnp.stack([spec.real, spec.imag], axis=-3)


def istft(spec: jax.Array, window, n_fft: int, hop: int,
          abs_and_angle: bool = True, win_sq_sum: jax.Array | None = None):
    """Inverse STFT with window-squared-sum normalization.

    spec: (..., 2, n_frames, n_bins) one-sided. Output (..., n_frames*hop).
    Parity: reference `istft` src/util.cpp:123-130 (ggml_istft + div by
    window^2 sum).
    """
    w = jnp.asarray(window)
    if abs_and_angle:
        mag, ang = spec[..., 0, :, :], spec[..., 1, :, :]
        re = mag * jnp.cos(ang)
        im = mag * jnp.sin(ang)
    else:
        re, im = spec[..., 0, :, :], spec[..., 1, :, :]
    z = jax.lax.complex(re.astype(jnp.float32), im.astype(jnp.float32))
    frames = jnp.fft.irfft(z, n=n_fft, axis=-1) * w  # (..., F, n_fft)
    n_frames = frames.shape[-2]
    cutoff = n_frames * hop
    half = n_fft // 2
    starts = jnp.arange(n_frames) * hop - half
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    valid = (idx >= 0) & (idx < cutoff)
    flat_idx = jnp.where(valid, idx, cutoff).reshape(-1)

    def ola(fr):
        out = jnp.zeros(cutoff + 1, dtype=fr.dtype)
        out = out.at[flat_idx].add(jnp.where(valid, fr, 0.0).reshape(-1))
        return out[:cutoff]

    batch_shape = frames.shape[:-2]
    flat = frames.reshape((-1, n_frames, n_fft))
    out = jax.vmap(ola)(flat).reshape(batch_shape + (cutoff,))
    if win_sq_sum is None:
        win_sq_sum = window_squared_sum(n_fft, hop, n_frames, w)
    return out / win_sq_sum


def snake_1d(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """Snake activation x + sin^2(alpha*x)/alpha (arXiv:2006.08195).

    Parity: reference snake_1d src/util.cpp:98-101. alpha broadcasts over
    the channel dim.
    """
    return x + jnp.square(jnp.sin(alpha * x)) / alpha


def upscale_linear(x: jax.Array, factor: int) -> jax.Array:
    """Linear-interpolation upsample along the last axis by an integer factor.

    Matches torch F.interpolate(mode="linear", align_corners=False), which the
    reference's `ggml_upscale_linear` replicates for the Kokoro harmonic
    source (src/models/kokoro/model.cpp:175-193).
    """
    t = x.shape[-1]
    out_t = t * factor
    # align_corners=False: out coord i maps to (i + 0.5)/factor - 0.5
    pos = (jnp.arange(out_t) + 0.5) / factor - 0.5
    lo = jnp.clip(jnp.floor(pos), 0, t - 1).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, t - 1)
    frac = jnp.clip(pos - lo, 0.0, 1.0)
    return x[..., lo] * (1.0 - frac) + x[..., hi] * frac


def uv_noise(f0: jax.Array, n_harmonics: int, noise: jax.Array,
             voice_threshold: float = 10.0, noise_std: float = 0.003,
             sin_amp: float = 0.1) -> tuple[jax.Array, jax.Array]:
    """Voiced/unvoiced amplitude + noise for the harmonic source.

    Parity: reference custom op `uv_noise_compute` src/util.cpp:140-172:
      voiced  (f0 > threshold): uv = sin_amp,  noise = noise_std * N(0,1)
      unvoiced              : uv = 0,        noise = (sin_amp/3) * N(0,1)

    f0: (T,); noise: (n_harmonics, T) standard normal.
    Returns (uv, noise_out) each (n_harmonics, T).
    """
    sin_amp_div = sin_amp / 3.0
    voiced = (f0 > voice_threshold)[None, :]
    uv = jnp.where(voiced, sin_amp, 0.0) * jnp.ones((n_harmonics, 1), f0.dtype)
    noise_out = jnp.where(voiced, noise_std * noise, sin_amp_div * noise)
    return uv, noise_out


def cfg_scale(cond: jax.Array, uncond: jax.Array, scale: float,
              max_output: int | None = None) -> jax.Array:
    """Classifier-free-guidance logit merge: cond + scale*(cond - uncond).

    Parity: reference custom op `cfg_scale` src/util.cpp:175-200. Tokens
    beyond max_output are masked to -inf so sampling can't pick invalid audio
    tokens. (The reference writes -INFINITY *before* the merge so its clamp is
    a no-op; we apply the documented intent — clamp after merge.)
    """
    out = cond + scale * (cond - uncond)
    if max_output is not None:
        tok = jnp.arange(out.shape[-1])
        out = jnp.where(tok > max_output, -jnp.inf, out)
    return out
