"""Probe: lax.conv vs tap-decomposed GEMM for DAC-shaped conv1d on TPU."""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

from tts_tpu.ops.conv import conv1d

C, T, K = 768, 4096, 7
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32) * 0.1)
w = jnp.asarray(rng.standard_normal((C, C, K)).astype(np.float32) * 0.05)


@jax.jit
def via_lax(x, w):
    return conv1d(x, w, padding=3)


@jax.jit
def via_gemm(x, w):
    xp = jnp.pad(x, ((0, 0), (3, 3)))
    acc = None
    for k in range(K):
        part = lax.dot_general(w[:, :, k], xp[:, k:k + T],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc


@jax.jit
def via_gemm_bf16(x, w):
    xp = jnp.pad(x, ((0, 0), (3, 3))).astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    acc = None
    for k in range(K):
        part = lax.dot_general(wb[:, :, k], xp[:, k:k + T],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc


@jax.jit
def via_im2col(x, w):
    # (C*K, T) stacked shifts -> one GEMM
    xp = jnp.pad(x, ((0, 0), (3, 3)))
    cols = jnp.concatenate([xp[:, k:k + T] for k in range(K)], axis=0)
    wf = w.transpose(0, 2, 1).reshape(C, K * C)  # wait ordering
    wf = w.reshape(C, C * K)  # (C_out, C_in*K) but cols is (K*C? ) -- fix:
    wf = jnp.concatenate([w[:, :, k] for k in range(K)], axis=1)  # (C, K*C)
    return lax.dot_general(wf, cols, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def bench(f, name, *args):
    g = jax.jit(lambda *a: jnp.sum(f(*a)))  # scalar D2H: the relay is slow
    g(*args)
    t0 = time.perf_counter()
    g(*args).block_until_ready()
    float(g(*args))
    dt = (time.perf_counter() - t0 - 0.066) / 2
    gf = 2 * C * C * K * T / 1e9
    print(f"{name}: {dt*1e3:.2f} ms ({gf/dt:.0f} GFLOP/s)", flush=True)
    return np.asarray(f(*args))


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform, flush=True)
    a = bench(via_lax, "lax.conv f32", x, w)
    b = bench(via_gemm, "tap-GEMM f32", x, w)
    c = bench(via_gemm_bf16, "tap-GEMM bf16", x, w)
    d = bench(via_im2col, "im2col GEMM f32", x, w)
    for n, v in (("gemm", b), ("bf16", c), ("im2col", d)):
        rel = np.abs(v - a).max() / (np.abs(a).max() + 1e-9)
        print(f"{n} vs lax rel: {rel:.3e}", flush=True)
