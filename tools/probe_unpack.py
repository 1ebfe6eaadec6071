"""Probe: which in-kernel Q4 nibble-unpack formulation is fast on TPU.

Times a single (8, K) x (K, N) block-dequant matvec kernel at Parler fc1
scale (K=1024, N=4096), repeated over a scan to amortize dispatch, for:
  v0: unpacked int8 codes (baseline, 1 byte/weight)
  v1: packed + broadcast_in_dim + variable shift + sublane-merge reshape
  v2: packed + (lo, hi) expand_dims + concat(axis=1) + sublane-merge reshape
  v3: packed half-split layout (row r pairs with r + K/2) + concat(axis=0)
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

QK = 32
K, N = 1024, 4096
REPS = 1000


def _expand_scales(s, k):
    nsb, n = s.shape
    return jax.lax.broadcast_in_dim(s, (nsb, QK, n), (0, 2)).reshape(k, n)


NC = 1024


def kernel(mode, x_ref, c_ref, s_ref, o_ref):
    xb = x_ref[:].astype(jnp.bfloat16)
    for n0 in range(0, N, NC):
        c = c_ref[:, n0:n0 + NC]
        if mode == 0:
            cf = c.astype(jnp.int32).astype(jnp.float32) - 8.0
        elif mode == 1:
            ci = c.astype(jnp.int32)
            c3 = jax.lax.broadcast_in_dim(ci, (K // 2, 2, NC), (0, 2))
            sh = jax.lax.broadcasted_iota(jnp.int32, (K // 2, 2, NC), 1) * 4
            cf = ((c3 >> sh) & 15).reshape(K, NC).astype(jnp.float32) - 8.0
        elif mode == 2:
            ci = c.astype(jnp.int32)
            lo = (ci & 15).reshape(K // 2, 1, NC)
            hi = ((ci >> 4) & 15).reshape(K // 2, 1, NC)
            cf = jnp.concatenate([lo, hi], axis=1).reshape(K, NC) \
                .astype(jnp.float32) - 8.0
        elif mode == 3:
            ci = c.astype(jnp.int32)
            lo = ci & 15
            hi = (ci >> 4) & 15
            cf = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32) - 8.0
        elif mode == 4:
            # bit ops at int8 density, single concat, one i32 hop at the end
            lo = c & 15
            hi = (c >> 4) & 15
            cf = jnp.concatenate([lo, hi], axis=0).astype(jnp.int32) \
                .astype(jnp.float32) - 8.0
        elif mode == 5:
            # int8 bit ops + bf16 dequant arithmetic (halves VPU flop width)
            lo = c & 15
            hi = (c >> 4) & 15
            ci = jnp.concatenate([lo, hi], axis=0).astype(jnp.int32)
            cb = ci.astype(jnp.bfloat16) - jnp.bfloat16(8.0)
            sk = _expand_scales(
                s_ref[:, n0:n0 + NC].astype(jnp.float32), K)
            wf = cb * sk.astype(jnp.bfloat16)
            o_ref[:, n0:n0 + NC] = jax.lax.dot_general(
                xb, wf, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            continue
        sk = _expand_scales(s_ref[:, n0:n0 + NC].astype(jnp.float32), K)
        wf = (cf * sk).astype(jnp.bfloat16)
        o_ref[:, n0:n0 + NC] = jax.lax.dot_general(
            xb, wf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def run(mode):
    rows = K if mode == 0 else K // 2
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(-128, 128, (rows, N)).astype(np.int8))
    scales = jnp.asarray(rng.random((K // QK, N)).astype(np.float32) * 0.01)
    x = jnp.asarray(rng.standard_normal((8, K)).astype(np.float32))

    call = pl.pallas_call(
        functools.partial(kernel, mode),
        grid=(1,),
        in_specs=[pl.BlockSpec((8, K), lambda i: (0, 0)),
                  pl.BlockSpec((rows, N), lambda i: (0, 0)),
                  pl.BlockSpec((K // QK, N), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((8, N), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
    )

    @jax.jit
    def loop(x, codes, scales):
        def step(c, _):
            y = call(c, codes, scales)
            return (y[:, :K] * 1e-3 + x), ()
        out, _ = jax.lax.scan(step, x, jnp.arange(REPS))
        return out

    out = loop(x, codes, scales)
    np.asarray(out).sum()
    t0 = time.perf_counter()
    out = loop(x, codes, scales)
    np.asarray(out).sum()
    dt = (time.perf_counter() - t0) / REPS
    gbs = rows * N / dt / 1e9
    print(f"mode {mode}: {dt*1e6:.1f} us/call  codes {gbs:.0f} GB/s",
          flush=True)


if __name__ == "__main__":
    for m in (int(sys.argv[1]),) if len(sys.argv) > 1 else (0, 1, 2, 3):
        run(m)
