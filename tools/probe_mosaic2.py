"""Probe round 2: fix the failing megakernel primitives."""
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


def probe(name):
    def deco(fn):
        def run():
            try:
                fn()
                print(f"PASS {name}", flush=True)
            except Exception as e:  # noqa: BLE001
                msg = repr(e).split("\\n")[0][:200]
                print(f"FAIL {name}: {msg}", flush=True)
        return run
    return deco


K, B, N = 1024, 32, 512
rng = np.random.default_rng(0)


@probe("block-diag via i32 mask-mult, cast to i8, dot")
def v1():
    def k(xq_ref, c_ref, o_ref):
        xq = xq_ref[:].astype(jnp.int32)                 # (8, K)
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (B, K), 0)
        mask = (cols // 32 == rows).astype(jnp.int32)
        xd = (mask * jnp.broadcast_to(xq[0:1], (B, K))).astype(jnp.int8)
        o_ref[:] = jax.lax.dot_general(
            xd, c_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    xq = jnp.asarray(rng.integers(-127, 127, (8, K)).astype(np.int8))
    c = jnp.asarray(rng.integers(-8, 8, (K, N)).astype(np.int8))
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((B, N), jnp.int32))(xq, c)
    xdr = np.zeros((B, K), np.int64)
    for b in range(B):
        xdr[b, b * 32:(b + 1) * 32] = np.asarray(xq)[0, b * 32:(b + 1) * 32]
    ref = xdr @ np.asarray(c, np.int64)
    assert np.array_equal(np.asarray(out, np.int64), ref)


@probe("block-diag f32 mask, i8 dot via two casts")
def v2():
    def k(x_ref, c_ref, o_ref):
        x = x_ref[:]                                     # (8, K) f32 already rounded
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (B, K), 0)
        xb = jnp.broadcast_to(x[0:1], (B, K))
        xd = jnp.where(cols // 32 == rows, xb, 0.0)
        xd8 = xd.astype(jnp.int32).astype(jnp.int8)
        o_ref[:] = jax.lax.dot_general(
            xd8, c_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    xf = jnp.asarray(rng.integers(-127, 127, (8, K)).astype(np.float32))
    c = jnp.asarray(rng.integers(-8, 8, (K, N)).astype(np.int8))
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((B, N), jnp.int32))(xf, c)
    xdr = np.zeros((B, K), np.int64)
    for b in range(B):
        xdr[b, b * 32:(b + 1) * 32] = np.asarray(xf)[0, b * 32:(b + 1) * 32].astype(np.int64)
    ref = xdr @ np.asarray(c, np.int64)
    assert np.array_equal(np.asarray(out, np.int64), ref)


@probe("block-diag f32 x f32->bf16 codes dot (no int8)")
def v3():
    def k(x_ref, c_ref, o_ref):
        x = x_ref[:]
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (B, K), 0)
        xb = jnp.broadcast_to(x[0:1], (B, K))
        xd = jnp.where(cols // 32 == rows, xb, 0.0)
        cf = c_ref[:].astype(jnp.int32).astype(jnp.float32)
        o_ref[:] = jax.lax.dot_general(
            xd, cf, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    xf = jnp.asarray(rng.integers(-127, 127, (8, K)).astype(np.float32))
    c = jnp.asarray(rng.integers(-8, 8, (K, N)).astype(np.int8))
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32))(xf, c)
    xdr = np.zeros((B, K), np.float64)
    for b in range(B):
        xdr[b, b * 32:(b + 1) * 32] = np.asarray(xf)[0, b * 32:(b + 1) * 32]
    ref = xdr @ np.asarray(c, np.float64)
    assert np.allclose(np.asarray(out), ref)


@probe("dynamic sublane store via ref[pl.ds(pos,1)] =")
def p7b():
    CTX, D = 256, 64
    def k(pos_ref, v_ref, o_ref):
        pos = pos_ref[0]
        o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[pl.ds(pos, 1), :] = v_ref[0:1]
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


@probe("bf16 3D cache: per-head static index + dot")
def p6b():
    CTX, D, H = 256, 64, 4
    def k(pos_ref, q_ref, kc_ref, o_ref):
        pos = pos_ref[0]
        for h in range(H):
            qh = q_ref[:, h * D:(h + 1) * D]             # (8, D) f32
            kh = kc_ref[h].astype(jnp.float32)           # (CTX, D)
            s = jax.lax.dot_general(
                qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # (8, CTX)
            t = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(t <= pos, s, -jnp.inf)
            p = jax.nn.softmax(s, axis=-1)
            o_ref[:, h * CTX:(h + 1) * CTX] = p
    q = jnp.asarray(rng.standard_normal((8, H * D)).astype(np.float32))
    kc = jnp.asarray(rng.standard_normal((H, CTX, D)).astype(np.float32)).astype(jnp.bfloat16)
    pos = jnp.asarray([100], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec((8, H * D), lambda i, p: (0, 0)),
                  pl.BlockSpec((H, CTX, D), lambda i, p: (0, 0, 0))],
        out_specs=pl.BlockSpec((8, H * CTX), lambda i, p: (0, 0)))
    out = pl.pallas_call(
        k, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, H * CTX), jnp.float32),
    )(pos, q, kc)
    kf = np.asarray(kc.astype(jnp.float32))
    for h in range(H):
        s = np.asarray(q)[:, h * D:(h + 1) * D] @ kf[h].T
        s[:, 101:] = -np.inf
        ref = np.exp(s - s.max(1, keepdims=True))
        ref /= ref.sum(1, keepdims=True)
        got = np.asarray(out)[:, h * CTX:(h + 1) * CTX]
        assert np.allclose(got, ref, atol=2e-2), np.abs(got - ref).max()


@probe("gelu tanh approx in-kernel (atol 1e-4)")
def p8b():
    def k(x_ref, o_ref):
        o_ref[:] = jax.nn.gelu(x_ref[:], approximate=True)
    x = jnp.asarray(rng.standard_normal((8, 256)).astype(np.float32))
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32))(x)
    xn = np.asarray(x, np.float64)
    ref = 0.5 * xn * (1 + np.tanh(np.sqrt(2 / np.pi) * (xn + 0.044715 * xn ** 3)))
    err = np.abs(np.asarray(out) - ref).max()
    assert err < 1e-4, err


@probe("scale post: i32 P -> f32 * scales + colsum")
def post():
    def k(p_ref, s_ref, o_ref):
        pf = p_ref[:].astype(jnp.float32)
        contrib = pf * s_ref[:]
        tot = jnp.sum(contrib, axis=0, keepdims=True)    # (1, N)
        o_ref[:] = jnp.broadcast_to(tot, o_ref.shape)
    p = jnp.asarray(rng.integers(-1000, 1000, (B, N)).astype(np.int32))
    s = jnp.asarray(rng.standard_normal((B, N)).astype(np.float32))
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32))(p, s)
    ref = (np.asarray(p) * np.asarray(s)).sum(0)
    assert np.allclose(np.asarray(out)[0], ref, rtol=1e-5)


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform, flush=True)
    for f in (v1, v2, v3, p7b, p6b, p8b, post):
        f()
