"""Time _dqdot variants on the real chip at an Orpheus FFN-sized projection.

Variants (selected per-call):
  legacy : f32 scales — f32 dequant, f32 mul, bf16 round, shift high nibble
  corr   : bf16 scales — bf16 mul, bias folded via a 2nd full MXU dot
  sub    : bf16 scales — bf16 mul, plain in-register bias subtract (&240
           high nibble with /16 x-fold), ONE MXU pass

Each runs as a jitted scan of STEPS pallas matvecs (packed Q4 codes) so the
relay dispatch cost amortizes. Prints ms/call and effective GB/s.
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
from jax.experimental import pallas as pl

STEPS = 128
K, N = 3072, 8192
QK = 32
PACK_BLOCK = 2048
BIAS = 8.0


def _srep(s, rr, nn):
    return jax.lax.broadcast_in_dim(
        s, (rr // QK, QK, nn), (0, 2)).reshape(rr, nn)


def _kernel(x_ref, c_ref, s_ref, o_ref, *, variant, nc=1024):
    x = x_ref[:]
    k = K
    outs = []
    for n0 in range(0, N, nc):
      acc = None
      corr = None
      for b0 in range(0, k, PACK_BLOCK):
        h = min(PACK_BLOCK, k - b0) // 2
        ci = c_ref[b0 // 2:b0 // 2 + h, n0:n0 + nc].astype(jnp.int32)
        for half in (0, 1):
            base = b0 + half * h
            s = s_ref[base // QK:(base + h) // QK, n0:n0 + nc]
            srep = _srep(s, h, nc)
            xs = x[:, base:base + h]
            if variant == "legacy":
                cv = (ci & 15) if half == 0 else ((ci >> 4) & 15)
                cf = cv.astype(jnp.float32) - BIAS
                wf = (cf * srep.astype(jnp.float32)).astype(jnp.bfloat16)
                part = jax.lax.dot_general(
                    xs.astype(jnp.bfloat16), wf,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            elif variant == "corr":
                cv = (ci & 15) if half == 0 else (ci & 240)
                if half == 1:
                    xs = xs * (1.0 / 16.0)
                wf = cv.astype(jnp.bfloat16) * srep
                part = jax.lax.dot_general(
                    xs.astype(jnp.bfloat16), wf,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                c2 = jax.lax.dot_general(
                    x[:, base:base + h].astype(jnp.bfloat16), srep,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                corr = c2 if corr is None else corr + c2
            else:  # sub
                cv = (ci & 15) if half == 0 else (ci & 240)
                b = BIAS if half == 0 else BIAS * 16.0
                if half == 1:
                    xs = xs * (1.0 / 16.0)
                wf = (cv.astype(jnp.bfloat16) - jnp.bfloat16(b)) * srep
                part = jax.lax.dot_general(
                    xs.astype(jnp.bfloat16), wf,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
      if corr is not None:
          acc = acc - BIAS * corr
      outs.append(acc)
    o_ref[:] = jnp.concatenate(outs, axis=1)


def run_variant(variant, codes, scales, x):
    sd = scales if variant == "legacy" else scales.astype(jnp.bfloat16)

    from jax.experimental.pallas import tpu as pltpu
    call = pl.pallas_call(
        functools.partial(_kernel, variant=variant),
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    @jax.jit
    def run(codes, sd, x):
        def step(c, _):
            y = call(c, codes, sd)
            return c + y[:, :K] * 1e-9, ()
        c, _ = jax.lax.scan(step, x, None, length=STEPS)
        return c

    out = run(codes, sd, x)
    np.asarray(out).sum()
    dts = []
    for i in range(3):
        # time-salted input per run defeats the relay's result cache even
        # across probe invocations
        xi = x + np.float32((time.time() * 997) % 100.0 + i) * 1e-4
        t0 = time.perf_counter()
        out = run(codes, sd, xi)
        np.asarray(out).sum()
        dts.append((time.perf_counter() - t0 - 0.033) / STEPS)
    dt = min(dts)
    nbytes = K // 2 * N + (K // 32) * N * (4 if variant == "legacy" else 2)
    print(f"{variant:7s}: {dt*1e6:8.1f} us/call  {nbytes/dt/1e9:7.1f} GB/s")


def main():
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(-128, 128, (K // 2, N)), jnp.int8)
    scales = jnp.asarray(rng.uniform(0.001, 0.01, (K // 32, N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((8, K)), jnp.float32)
    for v in ("legacy", "corr", "sub"):
        run_variant(v, codes, scales, x)


if __name__ == "__main__":
    main()
