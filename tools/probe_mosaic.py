"""Probe Mosaic (Pallas TPU) primitives needed by the decode megakernel.

Each probe is a tiny pallas kernel checked against numpy. Run on the real
chip; prints PASS/FAIL per feature so the megakernel design only uses
primitives that actually compile + are correct on this toolchain.
"""
from __future__ import annotations

import functools
import os
import sys
import traceback

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name):
    def deco(fn):
        def run():
            try:
                fn()
                print(f"PASS {name}", flush=True)
            except Exception as e:  # noqa: BLE001
                msg = str(e).split("\n")[0][:160]
                print(f"FAIL {name}: {msg}", flush=True)
        return run
    return deco


@probe("reshape row (1,1024)->(16,64) in-kernel")
def p1():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[0].reshape(16, 64) * 2.0
    x = jnp.arange(8 * 1024, dtype=jnp.float32).reshape(8, 1024)
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((16, 64), jnp.float32))(x)
    assert np.allclose(np.asarray(out), np.asarray(x)[0].reshape(16, 64) * 2)


@probe("static lane slice at 64 offset")
def p2():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:, 64:128] * 2.0
    x = jnp.arange(8 * 1024, dtype=jnp.float32).reshape(8, 1024)
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 64), jnp.float32))(x)
    assert np.allclose(np.asarray(out), np.asarray(x)[:, 64:128] * 2)


@probe("f32 -> i8 quant cast chain")
def p3():
    def k(x_ref, o_ref):
        q = jnp.round(x_ref[:] * 3.0)
        o_ref[:] = q.astype(jnp.int32).astype(jnp.int8)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 256)).astype(np.float32))
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int8))(x)
    ref = np.round(np.asarray(x) * 3.0).astype(np.int8)
    assert np.array_equal(np.asarray(out), ref)


@probe("block-diag i8 embed + int8 dot")
def p4():
    K, B, N = 1024, 32, 512
    def k(xq_ref, c_ref, o_ref):
        xq = xq_ref[:]                                   # (1 pad 8, K) i8 int32?
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (B, K), 0)
        xb = jnp.broadcast_to(xq[0:1], (B, K))
        xd = jnp.where(cols // 32 == rows, xb, jnp.int8(0))
        o_ref[:] = jax.lax.dot_general(
            xd, c_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.integers(-127, 127, (8, K)).astype(np.int8))
    c = jnp.asarray(rng.integers(-8, 8, (K, N)).astype(np.int8))
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((B, N), jnp.int32))(xq, c)
    xdr = np.zeros((B, K), np.int64)
    for b in range(B):
        xdr[b, b * 32:(b + 1) * 32] = np.asarray(xq)[0, b * 32:(b + 1) * 32]
    ref = xdr @ np.asarray(c, np.int64)
    assert np.array_equal(np.asarray(out, np.int64), ref)


@probe("scratch carry across grid steps + last-step output")
def p5():
    def k(x_ref, o_ref, acc_ref):
        i = pl.program_id(0)
        @pl.when(i == 0)
        def _():
            acc_ref[:] = x_ref[:]
        @pl.when(i > 0)
        def _():
            acc_ref[:] = acc_ref[:] * 2.0 + x_ref[:]
        @pl.when(i == 3)
        def _():
            o_ref[:] = acc_ref[:]
    x = jnp.ones((8, 128), jnp.float32)
    out = pl.pallas_call(
        k, grid=(4,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )(x)
    assert np.allclose(np.asarray(out), 15.0)


@probe("bf16 cache read + pos mask + f32 softmax accum")
def p6():
    CTX, D, H = 256, 64, 16
    def k(pos_ref, q_ref, kc_ref, o_ref):
        pos = pos_ref[0]
        q = q_ref[:].astype(jnp.float32)                 # (H, D)
        kcache = kc_ref[:].astype(jnp.float32)           # (H, CTX, D)
        s = jnp.einsum("hd,htd->ht", q, kcache,
                       preferred_element_type=jnp.float32)
        t = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(t <= pos, s, -jnp.inf)
        o_ref[:] = jax.nn.softmax(s, axis=-1).astype(o_ref.dtype)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((H, D)).astype(np.float32))
    kc = jnp.asarray(rng.standard_normal((H, CTX, D)).astype(np.float32)).astype(jnp.bfloat16)
    pos = jnp.asarray([100], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec((H, D), lambda i, p: (0, 0)),
                  pl.BlockSpec((H, CTX, D), lambda i, p: (0, 0, 0))],
        out_specs=pl.BlockSpec((H, CTX), lambda i, p: (0, 0)))
    out = pl.pallas_call(
        k, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, CTX), jnp.float32),
    )(pos, q, kc)
    sf = np.asarray(q) @ np.asarray(kc.astype(jnp.float32)).transpose(0, 2, 1)
    s = np.einsum("hd,htd->ht", np.asarray(q), np.asarray(kc.astype(jnp.float32)))
    s[:, 101:] = -np.inf
    ref = np.exp(s - s.max(1, keepdims=True))
    ref /= ref.sum(1, keepdims=True)
    assert np.allclose(np.asarray(out), ref, atol=2e-2), np.abs(np.asarray(out) - ref).max()


@probe("dynamic sublane store at pos (write kv row)")
def p7():
    CTX, D = 256, 64
    def k(pos_ref, v_ref, o_ref):
        pos = pos_ref[0]
        o_ref[:] = jnp.zeros_like(o_ref)
        pl.store(o_ref, (pl.ds(pos, 1), slice(None)), v_ref[0:1])
    v = jnp.ones((8, D), jnp.float32) * 7
    pos = jnp.asarray([100], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec((8, D), lambda i, p: (0, 0))],
        out_specs=pl.BlockSpec((CTX, D), lambda i, p: (0, 0)))
    out = pl.pallas_call(
        k, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((CTX, D), jnp.float32),
    )(pos, v)
    o = np.asarray(out)
    assert o[100].sum() == 7 * D and np.abs(o).sum() == 7 * D


@probe("gelu tanh + layernorm in-kernel")
def p8():
    def k(x_ref, o_ref):
        x = x_ref[:]
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        h = (x - mu) * jax.lax.rsqrt(var + 1e-5)
        o_ref[:] = jax.nn.gelu(h, approximate=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 256)).astype(np.float32))
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32))(x)
    xn = np.asarray(x)
    mu = xn.mean(-1, keepdims=True)
    h = (xn - mu) / np.sqrt(xn.var(-1, keepdims=True) + 1e-5)
    ref = 0.5 * h * (1 + np.tanh(0.7978845608 * (h + 0.044715 * h ** 3)))
    assert np.allclose(np.asarray(out), ref, atol=1e-5)


@probe("reverse reshape (16,64)->(1,1024) in-kernel")
def p9():
    def k(x_ref, o_ref):
        o_ref[:] = jnp.broadcast_to(x_ref[:].reshape(1, 1024), o_ref.shape)
    x = jnp.arange(16 * 64, dtype=jnp.float32).reshape(16, 64)
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 1024), jnp.float32))(x)
    assert np.allclose(np.asarray(out)[0], np.arange(1024))


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform, flush=True)
    for f in (p1, p2, p3, p4, p5, p6, p7, p8, p9):
        f()
