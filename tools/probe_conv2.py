"""Probe 2: conv layouts on TPU at DAC shapes — NCH vs NWC vs tap-GEMM,
chained 8x inside one jit so relay overhead amortizes."""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

ITERS = 8


def timed(name, f, *args, flops):
    f(*args)
    t0 = time.perf_counter()
    float(f(*args))
    dt = (time.perf_counter() - t0 - 0.033) / ITERS
    print(f"{name}: {dt*1e3:.2f} ms/conv ({flops/dt/1e9:.0f} GFLOP/s)",
          flush=True)


def main(c=768, t=4096, k=7):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, c, t)).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.standard_normal((c, c, k)).astype(np.float32) * 0.02)
    flops = 2 * c * c * k * t

    @jax.jit
    def nch(x, w):
        def body(xc, _):
            dn = lax.conv_dimension_numbers(xc.shape, w.shape,
                                            ("NCH", "OIH", "NCH"))
            y = lax.conv_general_dilated(xc, w, (1,), [(k // 2, k // 2)],
                                         dimension_numbers=dn)
            return jnp.tanh(y), ()
        y, _ = lax.scan(body, x, None, length=ITERS)
        return jnp.sum(y)

    @jax.jit
    def nwc(x, w):
        xt = x.transpose(0, 2, 1)                    # (1, T, C)
        wt = w.transpose(2, 1, 0)                    # (K, C_in, C_out)
        def body(xc, _):
            dn = lax.conv_dimension_numbers(xt.shape, wt.shape,
                                            ("NWC", "WIO", "NWC"))
            y = lax.conv_general_dilated(xc, wt, (1,), [(k // 2, k // 2)],
                                         dimension_numbers=dn)
            return jnp.tanh(y), ()
        y, _ = lax.scan(body, xt, None, length=ITERS)
        return jnp.sum(y)

    @jax.jit
    def nwc_bf16(x, w):
        xt = x.transpose(0, 2, 1).astype(jnp.bfloat16)
        wt = w.transpose(2, 1, 0).astype(jnp.bfloat16)
        def body(xc, _):
            dn = lax.conv_dimension_numbers(xt.shape, wt.shape,
                                            ("NWC", "WIO", "NWC"))
            y = lax.conv_general_dilated(
                xc, wt, (1,), [(k // 2, k // 2)], dimension_numbers=dn,
                preferred_element_type=jnp.float32)
            return jnp.tanh(y).astype(jnp.bfloat16), ()
        y, _ = lax.scan(body, xt, None, length=ITERS)
        return jnp.sum(y.astype(jnp.float32))

    timed("NCH f32 ", nch, x, w, flops=flops)
    timed("NWC f32 ", nwc, x, w, flops=flops)
    timed("NWC bf16", nwc_bf16, x, w, flops=flops)


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform, flush=True)
    main()
    print("-- small-channel late block (96ch, T=262144) --", flush=True)
    main(c=96, t=262144, k=7)
