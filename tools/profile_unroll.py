"""Test whether lax.scan over stacked quantized weights is the bandwidth
killer: same 24-layer matmul workload, but with the layer loop UNROLLED in
python and per-layer weights passed as separate pytree args (XLA can then
stream the original HBM buffers into pallas without a slice copy)."""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from tts_tpu.gguf import quants
from tts_tpu.ops import linear
from tts_tpu.ops.quant_matmul import QuantTensor

STEPS = 64
L, H, F = 24, 1024, 4096


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


def main():
    rng = np.random.default_rng(0)
    print("platform:", jax.devices()[0].platform, flush=True)
    layers = []
    for _ in range(L):
        layers.append(dict(q=q4(rng, H, H), k=q4(rng, H, H), v=q4(rng, H, H),
                           o=q4(rng, H, H), cq=q4(rng, H, H), co=q4(rng, H, H),
                           f1=q4(rng, F, H), f2=q4(rng, H, F)))
    x = jnp.asarray(rng.standard_normal((1, H)).astype(np.float32))
    per_layer = 6 * H * H + 2 * H * F
    nbytes = L * (per_layer + per_layer // 32 * 4)

    @jax.jit
    def run(x, layers):
        def step(c, _):
            cc = c
            for lw in layers:
                y = lw["q"].matmul(cc) + lw["k"].matmul(cc) + \
                    lw["v"].matmul(cc) + lw["o"].matmul(cc) + \
                    lw["cq"].matmul(cc) + lw["co"].matmul(cc)
                hh = lw["f1"].matmul(y)
                cc = lw["f2"].matmul(hh) + cc
            return cc, ()
        return jax.lax.scan(step, x, None, length=STEPS)[0]

    dt = timed(run, x, layers)
    print(f"UNROLLED 24-layer qmm: {dt*1e3:.3f} ms/step "
          f"({nbytes/dt/1e9:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
