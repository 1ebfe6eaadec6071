"""Isolate the per-call cost of the fused dequant matmul on the real chip:
Pallas vs XLA-dequant vs dense-f32, single call vs 8-calls-per-scan-step."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from tts_tpu.gguf import quants
from tts_tpu.ops import linear  # noqa: F401  (registers QuantTensor pytree)
from tts_tpu.ops.quant_matmul import QuantTensor, quant_matmul_xla

STEPS = 64
rng = np.random.default_rng(0)


def q4(n, k):
    w = rng.standard_normal((n, k)).astype(np.float32) * 0.02
    raw = quants.quantize(w, quants.GGML_TYPE_Q4_0)
    codes, scales = quants.unpack_planar(raw, quants.GGML_TYPE_Q4_0, (n, k))
    return QuantTensor.from_planar(codes, scales, quants.GGML_TYPE_Q4_0)


def timed(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).sum()
    t0 = time.perf_counter()
    fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).sum()
    return (time.perf_counter() - t0) / STEPS


x = jnp.asarray(rng.standard_normal((1, 1024)).astype(np.float32))
qt = q4(1024, 1024)


@jax.jit
def run_pallas(x, qt):
    def step(c, _):
        return c + jnp.sum(qt.matmul(c)) * 1e-9, ()
    return jax.lax.scan(step, x, None, length=STEPS)[0]


@jax.jit
def run_xla(x, qt):
    def step(c, _):
        y = quant_matmul_xla(c, qt.codes_t, qt.scales_t, qt.qtype)
        return c + jnp.sum(y) * 1e-9, ()
    return jax.lax.scan(step, x, None, length=STEPS)[0]


w = jnp.asarray(rng.standard_normal((1024, 1024)).astype(np.float32))


@jax.jit
def run_dense(x, w):
    def step(c, _):
        return c + jnp.sum(jnp.dot(c, w.T)) * 1e-9, ()
    return jax.lax.scan(step, x, None, length=STEPS)[0]


qts = [q4(1024, 1024) for _ in range(8)]


@jax.jit
def run_pallas8(x, qts):
    def step(c, _):
        acc = c
        for qq in qts:
            acc = acc + jnp.sum(qq.matmul(c)) * 1e-9
        return acc, ()
    return jax.lax.scan(step, x, None, length=STEPS)[0]


# stacked variant: weights as scan xs (production _transformer pattern)
qstack = linear.stack_weights([q4(1024, 1024) for _ in range(8)])


@jax.jit
def run_stacked(x, qstack):
    def step(c, _):
        def layer(cc, qq):
            return cc + jnp.sum(qq.matmul(cc)) * 1e-9, ()
        return jax.lax.scan(layer, c, qstack)[0], ()
    return jax.lax.scan(step, x, None, length=STEPS)[0]


print("platform:", jax.devices()[0].platform, flush=True)
print("pallas qmm 1024x1024:        %7.1f us/call" % (timed(run_pallas, x, qt) * 1e6), flush=True)
print("xla    qmm 1024x1024:        %7.1f us/call" % (timed(run_xla, x, qt) * 1e6), flush=True)
print("dense  f32 1024x1024:        %7.1f us/call" % (timed(run_dense, x, w) * 1e6), flush=True)
t8 = timed(run_pallas8, x, qts) * 1e6
print("pallas x8/step:              %7.1f us/step (%.1f us/call)" % (t8, t8 / 8), flush=True)
ts = timed(run_stacked, x, qstack) * 1e6
print("pallas stacked-scan x8/step: %7.1f us/step (%.1f us/call)" % (ts, ts / 8), flush=True)
