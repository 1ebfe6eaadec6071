"""Measure fixed pallas_call launch overhead vs per-grid-step overhead on the
real chip, inside a lax.scan (production decode-loop conditions)."""
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

STEPS = 64


def timed(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).sum()
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).sum()
    return (time.perf_counter() - t0) / STEPS


def _noop_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 1.000001


def tiny_call(x):
    return pl.pallas_call(
        _noop_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


def _grid_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 1.000001


def grid_call(x, n_grid):
    m, n = x.shape
    return pl.pallas_call(
        _grid_kernel,
        grid=(n_grid,),
        in_specs=[pl.BlockSpec((m, n // n_grid), lambda i: (0, i))],
        out_specs=pl.BlockSpec((m, n // n_grid), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
    )(x)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    x = jnp.ones((8, 128), jnp.float32)

    for ncalls in (1, 8, 64):
        @jax.jit
        def run(x, ncalls=ncalls):
            def step(c, _):
                for _ in range(ncalls):
                    c = tiny_call(c)
                return c, ()
            return jax.lax.scan(step, x, None, length=STEPS)[0]
        dt = timed(run, x)
        print(f"{ncalls:3d} tiny pallas calls/step: {dt*1e6:8.1f} us/step "
              f"({dt*1e6/ncalls:.2f} us/call)", flush=True)

    big = jnp.ones((8, 128 * 192), jnp.float32)
    for ngrid in (1, 24, 192):
        @jax.jit
        def run(x, ngrid=ngrid):
            def step(c, _):
                return grid_call(c, ngrid), ()
            return jax.lax.scan(step, big, None, length=STEPS)[0]
        dt = timed(run, big)
        print(f"1 call, grid=({ngrid:3d},): {dt*1e6:8.1f} us/step "
              f"({dt*1e6/ngrid:.2f} us/grid-step)", flush=True)


if __name__ == "__main__":
    main()
