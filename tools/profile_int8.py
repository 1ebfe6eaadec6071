"""Test: int8 MXU dot in Pallas + the block-diagonal int8 qmm design.

Design (mirrors GGML's vec_dot_q4_0_q8_0, TPU-style): activations are
quantized per 32-block to int8 (Q8_0-alike). Build x' (B, K) int8 where
x'[b, k] = xq[k] if k//32 == b else 0 (block-diagonal). Then ONE int8 MXU
matmul P = x' @ C (K, N) gives per-block partial dots P (B, N) in i32, and
out[n] = sum_b sx[b] * sw[b,n] * (P[b,n] - bias * Sx[b]) with Sx the block
sums of xq — all VPU work shrinks from O(K*N) to O(K*N/32).
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

from tts_tpu.gguf import quants
from tts_tpu.ops import linear
from tts_tpu.ops.quant_matmul import QuantTensor, quant_matmul_xla

STEPS = 64
QK = 32


def timed(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).sum()
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).sum()
    return (time.perf_counter() - t0) / STEPS


def q4(rng, n, k):
    w = rng.standard_normal((n, k)).astype(np.float32) * 0.02
    raw = quants.quantize(w, quants.GGML_TYPE_Q4_0)
    codes, scales = quants.unpack_planar(raw, quants.GGML_TYPE_Q4_0, (n, k))
    return QuantTensor.from_planar(codes, scales, quants.GGML_TYPE_Q4_0)


# --- step 1: does a plain int8 MXU dot work in pallas? ---

def _i8_dot_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def test_i8_dot():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-127, 127, (32, 1024)).astype(np.int8))
    b = jnp.asarray(rng.integers(-8, 8, (1024, 512)).astype(np.int8))
    out = pl.pallas_call(
        _i8_dot_kernel,
        out_shape=jax.ShapeDtypeStruct((32, 512), jnp.int32),
    )(a, b)
    ref = np.asarray(a, np.int64) @ np.asarray(b, np.int64)
    ok = np.array_equal(np.asarray(out, np.int64), ref)
    print("int8 MXU dot in pallas: EXACT" if ok else
          f"int8 MXU dot MISMATCH maxerr={np.abs(np.asarray(out) - ref).max()}",
          flush=True)


# --- step 2: the block-diagonal int8 qmm kernel ---

def _qmm_i8_kernel(xd_ref, sx_ref, sxs_ref, c_ref, s_ref, o_ref, *, bias):
    """xd (B, K) i8 block-diag activations; sx (B, 1) f32 act scales;
    sxs (B, 1) f32 act block sums (already * sx? no: raw int sums as f32);
    c (K, TN) i8 codes; s (B, TN) f32 weight scales. out (8, TN) f32 — only
    row 0 is meaningful (m=1 decode)."""
    p = jax.lax.dot_general(
        xd_ref[:], c_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)               # (B, TN)
    pf = p.astype(jnp.float32)
    corr = sxs_ref[:]                                    # (B, 1) f32 raw sums
    contrib = (pf - bias * corr) * s_ref[:] * sx_ref[:]  # (B, TN)
    tot = jnp.sum(contrib, axis=0, keepdims=True)        # (1, TN)
    o_ref[:] = jnp.broadcast_to(tot, o_ref.shape)


@functools.partial(jax.jit, static_argnames=("tile_n",))
def qmm_i8(x, codes_t, scales_t, tile_n=512):
    """x (1, K) f32 -> (1, N) f32 via int8 MXU block-dot."""
    k = x.shape[1]
    n = codes_t.shape[1]
    b = k // QK
    tile_n = min(tile_n, n)
    xb = x.reshape(b, QK)
    amax = jnp.max(jnp.abs(xb), axis=1, keepdims=True)
    sx = amax / 127.0
    xq = jnp.round(xb / jnp.maximum(sx, 1e-30)).astype(jnp.int8)  # (B, 32)
    sxs = jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)
    # block-diagonal embed: (B, K) with xq[b] at columns [b*32, (b+1)*32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, k), 0)
    xd = jnp.where(cols // QK == rows,
                   jnp.take_along_axis(
                       jnp.broadcast_to(xq.reshape(b, b, QK)[:, 0, :], (b, QK)),
                       jnp.zeros((b, QK), jnp.int32), axis=1) * 0, 0)
    # simpler: scatter via reshape — xd[b, :] has xq[b] in its block
    xd = (cols // QK == rows).astype(jnp.int8) * \
        jnp.repeat(xq, k // QK, axis=0).reshape(b, b, QK)[
            jnp.arange(b), jnp.arange(b)].repeat(1, axis=0)
    raise SystemExit("unused")


# The block-diag construction above is convoluted; do it the obvious way:
@functools.partial(jax.jit, static_argnames=("tile_n",))
def qmm_i8_v2(x, codes_t, scales_t, tile_n=512):
    k = x.shape[1]
    n = codes_t.shape[1]
    b = k // QK
    tile_n = min(tile_n, n)
    xb = x.reshape(b, QK)
    amax = jnp.max(jnp.abs(xb), axis=1, keepdims=True)
    sx = amax / 127.0
    xq = jnp.round(xb / jnp.maximum(sx, 1e-30)).astype(jnp.int8)   # (B, 32)
    sxs = jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)
    # block-diag (B, K): element [r, c] = xq[r, c % 32] if c // 32 == r
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, k), 0)
    xq_tiled = jnp.tile(xq, (1, b))                                 # (B, K)
    xd = jnp.where(cols // QK == rows, xq_tiled, jnp.int8(0))
    out = pl.pallas_call(
        functools.partial(_qmm_i8_kernel, bias=8.0),
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((b, k), lambda i: (0, 0)),
            pl.BlockSpec((b, 1), lambda i: (0, 0)),
            pl.BlockSpec((b, 1), lambda i: (0, 0)),
            pl.BlockSpec((k, tile_n), lambda i: (0, i)),
            pl.BlockSpec((b, tile_n), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((8, tile_n), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
    )(xd, sx, sxs, codes_t, scales_t)
    return out[:1]


def test_qmm_i8(rng):
    qt = q4(rng, 1024, 1024)
    x = jnp.asarray(rng.standard_normal((1, 1024)).astype(np.float32))
    got = np.asarray(qmm_i8_v2(x, qt.codes_t, qt.scales_t))
    ref = np.asarray(quant_matmul_xla(x, qt.codes_t, qt.scales_t, qt.qtype))
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"qmm_i8 vs f32-dequant rel err: {rel:.2e}", flush=True)


def bench_stack(rng, L=24, H=1024, F=4096):
    ws = {nm: linear.stack_weights([q4(rng, n, k) for _ in range(L)])
          for nm, (n, k) in dict(q=(H, H), k=(H, H), v=(H, H), o=(H, H),
                                 cq=(H, H), co=(H, H), f1=(F, H), f2=(H, F)).items()}
    x = jnp.asarray(rng.standard_normal((1, H)).astype(np.float32))
    per_layer = 6 * H * H + 2 * H * F
    nbytes = L * (per_layer + per_layer // 32 * 4)

    def mm(xx, qt):
        return qmm_i8_v2(xx, qt.codes_t, qt.scales_t)

    @jax.jit
    def run(x, ws):
        def step(c, _):
            def layer(cc, lw):
                q, k, v, o, cq, co, f1, f2 = lw
                y = mm(cc, q) + mm(cc, k) + mm(cc, v) + mm(cc, o)
                y = y + mm(cc, cq) + mm(cc, co)
                hh = mm(y, f1)
                return mm(hh, f2) + cc, ()
            cc, _ = jax.lax.scan(
                layer, c, (ws["q"], ws["k"], ws["v"], ws["o"],
                           ws["cq"], ws["co"], ws["f1"], ws["f2"]))
            return cc, ()
        return jax.lax.scan(step, x, None, length=STEPS)[0]

    dt = timed(run, x, ws)
    print(f"qmm_i8 24-layer stack: {dt*1e3:.3f} ms/step ({nbytes/dt/1e9:.0f} GB/s)",
          flush=True)


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    test_i8_dot()
    test_qmm_i8(rng)
    bench_stack(rng)
