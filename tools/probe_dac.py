"""Probe DAC-44k conv strategies on the real chip.

Compares, at the real DAC decoder shapes (ch 1536->96, T 512->262144):
  gemm-f32 : current per-tap GEMM conv1d (channels-last internal)
  gemm-bf16: same with bf16 operands
  nhc-f32  : native lax.conv_general_dilated with NHC/HIO layouts
  nhc-bf16 : same with bf16
and times the full dac_decode for reference.
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

# representative DAC layer shapes: (C_in, C_out, T, k, dilation)
SHAPES = [
    (1536, 1536, 512, 7, 1),
    (768, 768, 4096, 7, 1),
    (768, 768, 4096, 7, 3),
    (384, 384, 32768, 7, 1),
    (192, 192, 131072, 7, 1),
    (96, 96, 262144, 7, 1),
]
REPS = 8


def timed(fn, *args):
    out = fn(*args)
    np.asarray(out).sum()        # block_until_ready is unreliable on axon
    best = 1e9
    for i in range(2):
        a0 = args[0] + np.float32((time.time() * 997) % 7 + i) * 1e-5
        t0 = time.perf_counter()
        out = fn(a0, *args[1:])
        np.asarray(out).sum()
        best = min(best, (time.perf_counter() - t0 - 0.033) / REPS)
    return best


def bench_variant(name, conv_fn, cin, cout, t, k, dil):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((t, cin)), jnp.float32) * 0.1
    w = jnp.asarray(rng.standard_normal((cout, cin, k)), jnp.float32) * 0.1

    @jax.jit
    def run(x, w):
        def step(c, _):
            y = conv_fn(c, w)
            return c + y * 1e-9, ()
        c, _ = jax.lax.scan(step, x, None, length=REPS)
        return c

    dt = timed(run, x, w)
    flops = 2 * cin * cout * k * t
    print(f"  {name:9s}: {dt*1e3:7.2f} ms  {flops/dt/1e12:6.2f} TFLOP/s")
    return dt


def gemm_conv(dtype):
    def fn(xt, w):  # xt (T, C_in), w (C_out, C_in, k)
        t, cin = xt.shape
        cout, _, k = w.shape
        dil = 1
        pad = (k // 2) * dil
        xp = jnp.pad(xt, ((pad, pad), (0, 0))).astype(dtype)
        acc = None
        for i in range(k):
            xs = lax.slice(xp, (i * dil, 0), (i * dil + t, cin))
            part = lax.dot_general(
                xs, w[:, :, i].astype(dtype),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        return acc.astype(jnp.float32)
    return fn


def nhc_conv(dtype):
    def fn(xt, w):  # xt (T, C_in) -> NHC (1, T, C); w (C_out, C_in, k) -> HIO
        t, cin = xt.shape
        cout, _, k = w.shape
        pad = k // 2
        out = lax.conv_general_dilated(
            xt[None].astype(dtype),
            w.transpose(2, 1, 0).astype(dtype),   # (k, C_in, C_out)
            window_strides=(1,), padding=[(pad, pad)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32)
        return out[0].astype(jnp.float32)
    return fn


def main():
    for cin, cout, t, k, dil in SHAPES:
        print(f"C{cin}->C{cout} T={t} k={k} d={dil}:")
        bench_variant("gemm-f32", gemm_conv(jnp.float32), cin, cout, t, k, dil)
        bench_variant("gemm-bf16", gemm_conv(jnp.bfloat16), cin, cout, t, k, dil)
        bench_variant("nhc-f32", nhc_conv(jnp.float32), cin, cout, t, k, dil)
        bench_variant("nhc-bf16", nhc_conv(jnp.bfloat16), cin, cout, t, k, dil)


if __name__ == "__main__":
    main()
