"""Isolate the llama-megastep slowdown: pure weight-streaming grid kernel.

RESOLVED (round 5): the round-4 mystery — the pure stream improving at
fc=2048 (355 -> 503 GB/s) while the REAL kernel regressed (6.05 -> 7.32
ms/step) — came down to two interacting effects quantified by
tools/probe_flat_stream.py and the flat-kernel rebuild (ops/llama_flat):
(1) with only 1-deep double buffering, finer FFN phases shrink the DMA
window hidden under the attention phase's long compute, so the real
kernel's exposed bubble GROWS as phases shrink (the synthetic proxy has
no attention and only sees the granularity win); (2) per-phase overhead
is real but small per phase — it only dominates past ~3000 phases (the
k-sliced flat grid) and is negligible at ~30 (this grid) or ~1000 (the
shipped fullk flat grid). The fix was neither fc value: the fullk flat
redesign streams whole-K column tiles with the LM head in-stream and a
cheap vectorized attention phase (4.04-4.09 ms/step, RTF 3.0).

The single-call dequant matvec runs at ~860 GB/s (probe_dqdot) but the full
megastep streams weights at only ~340 GB/s. This kernel reproduces the
megastep's GRID STRUCTURE (grid (L, 3): attn-sized block at p0, two
FFN-sized phases) with the same _dqdot dequant but NO attention / KV /
norms — pure dequant chain through an activation scratch. If this also
runs at ~340 GB/s the loss is grid/pipelining; if it hits ~860 the loss is
in the attention phase / extra blocks.

Variants: base (as megastep), nokv (no kv blocks), fc8k (single FFN phase).
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

L = 28
H = 3072
KVN = H + 2 * 1024          # qkv out dim 5120
F = 8192
STEPS = 64


def _touch(c_ref, s_ref):
    """Near-zero compute: one strided row read per block keeps the DMA
    honest without dequantizing."""
    return (jnp.sum(c_ref[0, ::256, :].astype(jnp.float32)) +
            jnp.sum(s_ref[0, ::8, :].astype(jnp.float32)))


def _kernel(x_ref, qkv_c, qkv_s, o_c, o_s, g_c, g_s, u_c, u_s, d_c, d_s,
            kc_ref, vc_ref, x_out, x_scr, h_scr, *, n_layers, n_phases,
            use_kv, mode):
    l = pl.program_id(0)
    p = pl.program_id(1)
    reps = 2 if mode == "double" else 1

    @pl.when(p == 0)
    def _():
        @pl.when(l == 0)
        def _():
            x_scr[:] = x_ref[:]

        x = x_scr[:]
        if mode == "dma":
            x_scr[:] = x + (_touch(qkv_c, qkv_s) + _touch(o_c, o_s)) * 1e-9
            h_scr[:] = x_scr[:]
        else:
            a = x
            for _ in range(reps):
                qkv = _dqdot(a, qkv_c[0], qkv_s[0], 8.0)    # (8, KVN)
                a = qkv[:, :H] * 1e-3 + x
            if use_kv:
                a = a + jnp.sum(kc_ref[0, 0, :8, :].astype(jnp.float32)) * 1e-9
                a = a + jnp.sum(vc_ref[0, 0, :8, :].astype(jnp.float32)) * 1e-9
            o = _dqdot(a, o_c[0], o_s[0], 8.0)              # (8, H)
            x_scr[:] = x + o * 1e-3
            h_scr[:] = x_scr[:]

    @pl.when(p > 0)
    def _():
        h = h_scr[:]
        if mode == "dma":
            x_scr[:] = x_scr[:] + (_touch(g_c, g_s) + _touch(u_c, u_s) +
                                   _touch(d_c, d_s)) * 1e-9
        else:
            acc = x_scr[:]
            for _ in range(reps):
                gate = _dqdot(h, g_c[0], g_s[0], 8.0)
                up = _dqdot(h, u_c[0], u_s[0], 8.0)
                down = _dqdot(gate * 1e-3 + up * 1e-3, d_c[0], d_s[0], 8.0)
                acc = acc + down * 1e-3
            x_scr[:] = acc

        @pl.when((l == n_layers - 1) & (p == n_phases - 1))
        def _():
            x_out[:] = x_scr[:]


def run(fc, use_kv, label, mode="base"):
    rng = np.random.default_rng(0)
    ctx, kvh, d = 1024, 8, 128
    n_ph = 1 + F // fc

    def q4pair(k, n):
        return (jnp.asarray(rng.integers(-128, 128, (L, k // 2, n)), jnp.int8),
                jnp.asarray(rng.uniform(0.001, 0.01, (L, k // 32, n)),
                            jnp.float32))

    qkv_c, qkv_s = q4pair(H, KVN)
    o_c, o_s = q4pair(H, H)
    g_c, g_s = q4pair(H, fc) if fc == F else q4pair(H, F)
    u_c, u_s = q4pair(H, F)
    d_c, d_s = q4pair(F, H)
    g_c, g_s = q4pair(H, F)
    kv = jnp.zeros((L, kvh, ctx, d), jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((8, H)), jnp.float32)

    def at_l(l, p):
        return (l, 0, 0)

    def at_l4(l, p):
        return (l, 0, 0, 0)

    def ffn_hk(l, p):
        return (l, 0, jnp.maximum(p - 1, 0))

    def ffn_kh(l, p):
        return (l, jnp.maximum(p - 1, 0), 0)

    call = pl.pallas_call(
        functools.partial(_kernel, n_layers=L, n_phases=n_ph, use_kv=use_kv,
                          mode=mode),
        grid=(L, n_ph),
        in_specs=[
            pl.BlockSpec((8, H), lambda l, p: (0, 0)),
            pl.BlockSpec((1, H // 2, KVN), at_l),
            pl.BlockSpec((1, H // 32, KVN), at_l),
            pl.BlockSpec((1, H // 2, H), at_l),
            pl.BlockSpec((1, H // 32, H), at_l),
            pl.BlockSpec((1, H // 2, fc), ffn_hk),
            pl.BlockSpec((1, H // 32, fc), ffn_hk),
            pl.BlockSpec((1, H // 2, fc), ffn_hk),
            pl.BlockSpec((1, H // 32, fc), ffn_hk),
            pl.BlockSpec((1, fc // 2, H), ffn_kh),
            pl.BlockSpec((1, fc // 32, H), ffn_kh),
            pl.BlockSpec((1, kvh, ctx, d), at_l4),
            pl.BlockSpec((1, kvh, ctx, d), at_l4),
        ],
        out_specs=pl.BlockSpec((8, H), lambda l, p: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, H), jnp.float32),
                        pltpu.VMEM((8, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )

    @jax.jit
    def loop(x, *args):
        def step(c, _):
            y = call(c, *args)
            return c + y * 1e-9, ()
        c, _ = jax.lax.scan(step, x, None, length=STEPS)
        return c

    args = (qkv_c, qkv_s, o_c, o_s, g_c, g_s, u_c, u_s, d_c, d_s, kv, kv)
    out = loop(x, *args)
    np.asarray(out).sum()
    best = 1e9
    for i in range(3):
        xi = x + np.float32((time.time() * 997) % 100 + i) * 1e-4
        t0 = time.perf_counter()
        out = loop(xi, *args)
        np.asarray(out).sum()
        best = min(best, (time.perf_counter() - t0 - 0.033) / STEPS)
    nbytes = L * (H // 2 * (KVN + H + 2 * F) + F // 2 * H +
                  H // 32 * (KVN + H + 2 * F) * 4 + F // 32 * H * 4)
    print(f"{label:8s}: {best*1e3:7.3f} ms/step  weights {nbytes/1e9:.2f} GB "
          f"-> {nbytes/best/1e9:6.1f} GB/s")


def main():
    for args in ((4096, True, "kv4k", "base"), (2048, True, "kv2k", "base")):
        try:
            run(*args)
        except Exception as e:  # noqa: BLE001
            print(f"{args[2]:8s}: FAILED {str(e)[:200]}")


if __name__ == "__main__":
    main()
