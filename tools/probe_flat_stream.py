"""Probe the FLAT-TILE megastep redesign: can a 1-D grid of uniform
(512, TN) packed-Q4 tiles stream the whole Orpheus weight set at the
single-call dqdot rate (~860 GB/s), where the (L, phases) grid only
manages 355 GB/s (tools/probe_mega_grid.py)?

Each grid step runs one real _dqdot((8, 1024) x (1024, TN)) on its tile
(per-tile half-split nibble packing) and accumulates into a scratch, so
compute per step matches the planned kernel. Variants:
  - tn1024 / tn2048: tile width
  - kk2048: taller tiles (1024 packed rows = 2048 logical K)
  - bubble: tn1024 plus a synthetic ~10 us compute bubble every 30 tiles
    (emulating a vectorized attention phase) to measure exposure.

If tn1024 >= ~700 GB/s the llama megastep v2 design is validated:
1.85 GB/step would take ~2.6 ms vs today's 6.0.
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
from jax.experimental.pallas import tpu as pltpu

from tts_tpu.ops.parler_megastep import _dqdot

STEPS = 32


def _kernel(x_ref, c_ref, s_ref, o_ref, acc, *, n_tiles, kk, bubble,
            mode="base"):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    if mode == "dma":
        # touch one strided row per block: keeps the DMA honest, no dequant
        acc[:, :1] += (jnp.sum(c_ref[0, ::256, :].astype(jnp.float32)) +
                       jnp.sum(s_ref[0, ::8, :].astype(jnp.float32))) * 1e-9
    else:
        part = _dqdot(x_ref[:], c_ref[0], s_ref[0], 8.0)  # (8, TN)
        acc[:, : part.shape[1]] += part * 1e-6

    if bubble:
        @pl.when(t % 30 == 29)
        def _():
            # ~24x8192x128 MXU work + exp: the vectorized-attention shape
            q = acc[:, :128] * 1e-3
            kmat = jnp.broadcast_to(acc[:1, :128], (8 * 1024, 128)) * 1e-3
            s = jax.lax.dot_general(
                q, kmat, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # (8, 8192)
            p = jnp.exp(s - jnp.max(s, axis=1, keepdims=True))
            av = jax.lax.dot_general(
                p, kmat, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (8, 128)
            acc[:, :128] += av * 1e-9

    @pl.when(t == n_tiles - 1)
    def _():
        o_ref[:] = acc[:]


def _dual_kernel(x_ref, c0_ref, s0_ref, c1_ref, s1_ref, o_ref, acc, *,
                 n_tiles):
    """Two interleaved tile streams per grid step: twice the concurrent
    DMAs in flight, testing whether HBM needs more outstanding requests."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    p0 = _dqdot(x_ref[:], c0_ref[0], s0_ref[0], 8.0)
    p1 = _dqdot(x_ref[:], c1_ref[0], s1_ref[0], 8.0)
    acc[:, : p0.shape[1]] += (p0 + p1) * 1e-6

    @pl.when(t == n_tiles - 1)
    def _():
        o_ref[:] = acc[:]


def run_dual(label, tn, kk):
    layer_bytes = 3072 // 2 * (5120 + 3072 + 2 * 8192) + 8192 // 2 * 3072
    total = 28 * layer_bytes + 3072 // 2 * 157696
    tile_bytes = (kk // 2) * tn
    n_tiles = total // (2 * tile_bytes)
    key = jax.random.PRNGKey(0)
    mk = lambda k: (jax.random.randint(k, (n_tiles, kk // 2, tn), -128, 128,
                                       jnp.int8),
                    (jax.random.uniform(k, (n_tiles, kk // 32, tn),
                                        jnp.float32) * .01).astype(jnp.bfloat16))
    c0, s0 = mk(key)
    c1, s1 = mk(jax.random.PRNGKey(1))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, kk)),
                    jnp.float32)
    call = pl.pallas_call(
        functools.partial(_dual_kernel, n_tiles=n_tiles),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((8, kk), lambda t: (0, 0))] + [
            pl.BlockSpec((1, r, tn), lambda t: (t, 0, 0))
            for r in (kk // 2, kk // 32, kk // 2, kk // 32)],
        out_specs=pl.BlockSpec((8, 2048), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 2048), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 2048), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )

    @jax.jit
    def loop(x, c0, s0, c1, s1):
        def step(c, _):
            y = call(c, c0, s0, c1, s1)
            return c + y[:, :c.shape[1]] * 1e-9, ()
        c, _ = jax.lax.scan(step, x, None, length=STEPS)
        return c

    out = loop(x, c0, s0, c1, s1)
    np.asarray(out).sum()
    best = 1e9
    for i in range(3):
        xi = x + np.float32((time.time() * 997) % 100 + i) * 1e-4
        t0 = time.perf_counter()
        out = loop(xi, c0, s0, c1, s1)
        np.asarray(out).sum()
        best = min(best, (time.perf_counter() - t0 - 0.033) / STEPS)
    nbytes = 2 * n_tiles * (tile_bytes + (kk // 32) * tn * 2)
    print(f"{label:10s}: {n_tiles} tiles  {best*1e3:7.3f} ms/step  "
          f"{nbytes/1e9:.2f} GB -> {nbytes/best/1e9:6.1f} GB/s", flush=True)


def run(label, tn, kk, bubble=False, mode="base"):
    # Orpheus-sized stream: 28 layers x (qkv+o+gate+up+down) + padded head
    layer_bytes = 3072 // 2 * (5120 + 3072 + 2 * 8192) + 8192 // 2 * 3072
    head_bytes = 3072 // 2 * 157696
    total = 28 * layer_bytes + head_bytes
    tile_bytes = (kk // 2) * tn
    n_tiles = total // tile_bytes
    key = jax.random.PRNGKey(0)
    codes = jax.random.randint(key, (n_tiles, kk // 2, tn), -128, 128,
                               jnp.int8)
    scales = (jax.random.uniform(key, (n_tiles, kk // 32, tn),
                                 jnp.float32) * 0.01).astype(jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, kk)),
                    jnp.float32)

    call = pl.pallas_call(
        functools.partial(_kernel, n_tiles=n_tiles, kk=kk, bubble=bubble,
                          mode=mode),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, kk), lambda t: (0, 0)),
            pl.BlockSpec((1, kk // 2, tn), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, kk // 32, tn), lambda t: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((8, 2048), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 2048), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 2048), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )

    @jax.jit
    def loop(x, codes, scales):
        def step(c, _):
            y = call(c, codes, scales)
            nn = min(y.shape[1], c.shape[1])
            return c.at[:, :nn].add(y[:, :nn] * 1e-9), ()
        c, _ = jax.lax.scan(step, x, None, length=STEPS)
        return c

    out = loop(x, codes, scales)
    np.asarray(out).sum()
    best = 1e9
    for i in range(3):
        xi = x + np.float32((time.time() * 997) % 100 + i) * 1e-4
        t0 = time.perf_counter()
        out = loop(xi, codes, scales)
        np.asarray(out).sum()
        best = min(best, (time.perf_counter() - t0 - 0.033) / STEPS)
    nbytes = n_tiles * (tile_bytes + (kk // 32) * tn * 2)
    print(f"{label:10s}: {n_tiles} tiles  {best*1e3:7.3f} ms/step  "
          f"{nbytes/1e9:.2f} GB -> {nbytes/best/1e9:6.1f} GB/s", flush=True)


def run_dyn(label, tn, kk, n_maps=2):
    """Like run() but the tile index comes from a PREFETCHED SCALAR array
    through a dynamic index map (the real kernel's pattern) instead of the
    static identity map — isolates the scalar-core map-evaluation cost."""
    layer_bytes = 3072 // 2 * (5120 + 3072 + 2 * 8192) + 8192 // 2 * 3072
    total = 28 * layer_bytes + 3072 // 2 * 157696
    tile_bytes = (kk // 2) * tn
    n_tiles = total // tile_bytes
    key = jax.random.PRNGKey(0)
    codes = jax.random.randint(key, (n_tiles, kk // 2, tn), -128, 128,
                               jnp.int8)
    scales = (jax.random.uniform(key, (n_tiles, kk // 32, tn),
                                 jnp.float32) * 0.01).astype(jnp.bfloat16)
    meta = jnp.asarray(np.arange(n_tiles, dtype=np.int32)[None, :])
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, kk)),
                    jnp.float32)

    def _dk(meta_ref, x_ref, c_ref, s_ref, o_ref, acc, *, n_tiles):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        part = _dqdot(x_ref[:], c_ref[0], s_ref[0], 8.0)
        acc[:, : part.shape[1]] += part * 1e-6

        @pl.when(t == n_tiles - 1)
        def _():
            o_ref[:] = acc[:]

    def dmap(t, m):
        return (m[0, t], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, kk), lambda t, m: (0, 0)),
            pl.BlockSpec((1, kk // 2, tn), dmap),
            pl.BlockSpec((1, kk // 32, tn), dmap),
        ],
        out_specs=pl.BlockSpec((8, 2048), lambda t, m: (0, 0)),
        scratch_shapes=[pltpu.VMEM((8, 2048), jnp.float32)],
    )
    call = pl.pallas_call(
        functools.partial(_dk, n_tiles=n_tiles),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, 2048), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )

    @jax.jit
    def loop(meta, x, codes, scales):
        def step(c, _):
            y = call(meta, c, codes, scales)
            return c + y[:, :c.shape[1]] * 1e-9, ()
        c, _ = jax.lax.scan(step, x, None, length=STEPS)
        return c

    out = loop(meta, x, codes, scales)
    np.asarray(out).sum()
    best = 1e9
    for i in range(3):
        xi = x + np.float32((time.time() * 997) % 100 + i) * 1e-4
        t0 = time.perf_counter()
        out = loop(meta, xi, codes, scales)
        np.asarray(out).sum()
        best = min(best, (time.perf_counter() - t0 - 0.033) / STEPS)
    nbytes = n_tiles * (tile_bytes + (kk // 32) * tn * 2)
    print(f"{label:10s}: {n_tiles} tiles  {best*1e3:7.3f} ms/step  "
          f"{nbytes/1e9:.2f} GB -> {nbytes/best/1e9:6.1f} GB/s", flush=True)


def run_branchy(label, tn, kk, n_roles=7):
    """Pure stream with a role-dispatch body: n_roles pl.when branches per
    grid step, only one taken (the real kernel's shape). Isolates per-step
    branch/dispatch overhead."""
    layer_bytes = 3072 // 2 * (5120 + 3072 + 2 * 8192) + 8192 // 2 * 3072
    total = 28 * layer_bytes + 3072 // 2 * 157696
    tile_bytes = (kk // 2) * tn
    n_tiles = total // tile_bytes
    key = jax.random.PRNGKey(0)
    codes = jax.random.randint(key, (n_tiles, kk // 2, tn), -128, 128,
                               jnp.int8)
    scales = (jax.random.uniform(key, (n_tiles, kk // 32, tn),
                                 jnp.float32) * 0.01).astype(jnp.bfloat16)
    meta = jnp.asarray(
        np.stack([np.arange(n_tiles, dtype=np.int32),
                  np.arange(n_tiles, dtype=np.int32) % n_roles]))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, kk)),
                    jnp.float32)

    def _bk(meta_ref, x_ref, c_ref, s_ref, o_ref, acc, *, n_tiles):
        t = pl.program_id(0)
        role = meta_ref[1, t]

        @pl.when(t == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        for r in range(n_roles):
            @pl.when(role == r)
            def _(r=r):
                part = _dqdot(x_ref[:], c_ref[0], s_ref[0], 8.0)
                acc[:, : part.shape[1]] += part * (1e-6 + r * 1e-9)

        @pl.when(t == n_tiles - 1)
        def _():
            o_ref[:] = acc[:]

    def dmap(t, m):
        return (m[0, t], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, kk), lambda t, m: (0, 0)),
            pl.BlockSpec((1, kk // 2, tn), dmap),
            pl.BlockSpec((1, kk // 32, tn), dmap),
        ],
        out_specs=pl.BlockSpec((8, 2048), lambda t, m: (0, 0)),
        scratch_shapes=[pltpu.VMEM((8, 2048), jnp.float32)],
    )
    call = pl.pallas_call(
        functools.partial(_bk, n_tiles=n_tiles),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, 2048), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )

    @jax.jit
    def loop(meta, x, codes, scales):
        def step(c, _):
            y = call(meta, c, codes, scales)
            return c + y[:, :c.shape[1]] * 1e-9, ()
        c, _ = jax.lax.scan(step, x, None, length=STEPS)
        return c

    out = loop(meta, x, codes, scales)
    np.asarray(out).sum()
    best = 1e9
    for i in range(3):
        xi = x + np.float32((time.time() * 997) % 100 + i) * 1e-4
        t0 = time.perf_counter()
        out = loop(meta, xi, codes, scales)
        np.asarray(out).sum()
        best = min(best, (time.perf_counter() - t0 - 0.033) / STEPS)
    nbytes = n_tiles * (tile_bytes + (kk // 32) * tn * 2)
    print(f"{label:10s}: {n_tiles} tiles  {best*1e3:7.3f} ms/step  "
          f"{nbytes/1e9:.2f} GB -> {nbytes/best/1e9:6.1f} GB/s", flush=True)


def main():
    import sys as _s
    which = _s.argv[1] if len(_s.argv) > 1 else "round2"
    if which == "round4":
        # full-K column tiles (a) and branch-overhead isolation (b)
        run("fullK", 1024, 3072)          # (1536, 1024) 1.5 MB tiles
        run_branchy("branchy", 1024, 1024)
        run_branchy("branchy2k", 2048, 1024)
        return
    if which == "round3":
        for label, tn, kk in (("dyn1024", 1024, 1024),
                              ("dyn2048", 2048, 1024)):
            try:
                run_dyn(label, tn, kk)
            except Exception as e:  # noqa: BLE001
                print(f"{label:10s}: FAILED {str(e)[:300]}", flush=True)
        run("static2048", 2048, 1024)
        return
    if which == "round1":
        cases = (("tn1024", 1024, 1024), ("tn2048", 2048, 1024),
                 ("kk2048", 1024, 2048), ("bubble", 1024, 1024, True))
    else:
        # round 2: is 512 GB/s a wall?  dma-only (no dequant compute),
        # dual stream (2x concurrent DMAs), wider tiles
        cases = (("dma2048", 2048, 1024, False, "dma"),
                 ("tn4096", 4096, 1024),)
    for args in cases:
        try:
            run(*args)
        except Exception as e:  # noqa: BLE001
            print(f"{args[0]:10s}: FAILED {str(e)[:300]}", flush=True)
    if which != "round1":
        for label, tn, kk in (("dual1024", 1024, 1024),
                              ("dual2048", 2048, 1024)):
            try:
                run_dual(label, tn, kk)
            except Exception as e:  # noqa: BLE001
                print(f"{label:10s}: FAILED {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
