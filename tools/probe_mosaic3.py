"""Mosaic micro-probes for the parler-attention vectorization: which
reshapes/stores compile on this toolchain?

  a) lane-SPLIT reshape (8, 1024) -> (128, 64)   [sublane-major rows]
  b) lane-MERGE reshape (128, 64) -> (8, 1024)   [documented-forbidden dir]
  c) per-head (8, 64) slice-stores into an (8, 1024) scratch at 64-lane
     offsets (ATTF assembly without concat)
"""
from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_case(name, kernel, out_shape, *args):
    try:
        r = pl.pallas_call(kernel, out_shape=out_shape)(*args)
        r = np.asarray(r)
        print(f"{name}: OK sum={r.sum():.3f}", flush=True)
        return r
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAILED {msg}", flush=True)
        return None


def main():
    x = jnp.asarray(np.arange(8 * 1024, dtype=np.float32).reshape(8, 1024))

    def k_split(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(128, 64) * 1.0

    r = try_case("split", k_split, jax.ShapeDtypeStruct((128, 64),
                                                        jnp.float32), x)
    if r is not None:
        want = np.asarray(x).reshape(128, 64)
        print("  split semantics row-major:", np.allclose(r, want),
              flush=True)

    y = jnp.asarray(np.arange(128 * 64, dtype=np.float32).reshape(128, 64))

    def k_merge(y_ref, o_ref):
        o_ref[:] = y_ref[:].reshape(8, 1024) * 1.0

    r = try_case("merge", k_merge, jax.ShapeDtypeStruct((8, 1024),
                                                        jnp.float32), y)
    if r is not None:
        print("  merge semantics row-major:",
              np.allclose(r, np.asarray(y).reshape(8, 1024)), flush=True)

    def k_stores(y_ref, o_ref):
        for h in range(16):
            o_ref[:, h * 64:(h + 1) * 64] = y_ref[h * 8:(h + 1) * 8, :] * 1.0

    r = try_case("stores", k_stores, jax.ShapeDtypeStruct((8, 1024),
                                                          jnp.float32), y)
    if r is not None:
        want = np.zeros((8, 1024), np.float32)
        yv = np.asarray(y)
        for h in range(16):
            want[:, h * 64:(h + 1) * 64] = yv[h * 8:(h + 1) * 8]
        print("  stores semantics:", np.allclose(r, want), flush=True)


def main2():
    # 128-lane-output variants: (8, 512) <-> (32, 128)
    x = jnp.asarray(np.arange(8 * 512, dtype=np.float32).reshape(8, 512))

    def k_split128(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(32, 128) * 1.0

    r = try_case("split128", k_split128,
                 jax.ShapeDtypeStruct((32, 128), jnp.float32), x)
    if r is not None:
        print("  row-major:", np.allclose(r, np.asarray(x).reshape(32, 128)),
              flush=True)

    y = jnp.asarray(np.arange(32 * 128, dtype=np.float32).reshape(32, 128))

    def k_merge128(y_ref, o_ref):
        o_ref[:] = y_ref[:].reshape(8, 512) * 1.0

    r = try_case("merge128", k_merge128,
                 jax.ShapeDtypeStruct((8, 512), jnp.float32), y)
    if r is not None:
        print("  row-major:", np.allclose(r, np.asarray(y).reshape(8, 512)),
              flush=True)

    # 4D leading-dim transpose cost probe: time (8,16,256,128) bf16
    # transpose(1,0,2,3) inside a kernel 20x
    z = jnp.asarray(np.random.default_rng(0).standard_normal(
        (8, 16, 256, 128)).astype(np.float32)).astype(jnp.bfloat16)

    def k_tr(z_ref, o_ref):
        acc = jnp.zeros((128, 128), jnp.float32)
        for i in range(8):
            t = z_ref[:].transpose(1, 0, 2, 3).reshape(16 * 8 * 256, 128)
            acc += t[: 128].astype(jnp.float32) * (1.0 + i)
        o_ref[:] = acc

    import time as _t
    try:
        f = pl.pallas_call(k_tr, out_shape=jax.ShapeDtypeStruct(
            (128, 128), jnp.float32))
        jf = jax.jit(lambda z: f(z))
        np.asarray(jf(z)).sum()
        t0 = _t.perf_counter()
        np.asarray(jf(z + 0.001)).sum()
        print(f"transpose8x: {(_t.perf_counter()-t0-0.033)*1e3:.2f} ms "
              f"(8x 8.4MB 4D-transposes)", flush=True)
    except Exception as e:  # noqa: BLE001
        print("transpose probe FAILED", str(e).split("\n")[0][:160],
              flush=True)


if __name__ == "__main__":
    main2()
