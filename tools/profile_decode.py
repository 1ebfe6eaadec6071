"""Microbenchmark the Parler Q4 decode step's components on the real chip.

Each component is measured as a jitted lax.scan of `STEPS` iterations so
per-dispatch relay overhead is amortized exactly like the production
host-chunked decode loop. Prints per-step times and effective HBM GB/s for
the weight-streaming parts.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

STEPS = 64


def timed(fn, *args):
    out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a).sum() if hasattr(a, "shape") else a, out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a).sum() if hasattr(a, "shape") else a, out)
    return (time.perf_counter() - t0) / STEPS


def q4(rng, n, k):
    from tts_tpu.gguf import quants
    from tts_tpu.ops.quant_matmul import QuantTensor
    w = rng.standard_normal((n, k)).astype(np.float32) * 0.02
    raw = quants.quantize(w, quants.GGML_TYPE_Q4_0)
    codes, scales = quants.unpack_planar(raw, quants.GGML_TYPE_Q4_0, (n, k))
    return QuantTensor.from_planar(codes, scales, quants.GGML_TYPE_Q4_0)


def bench_qmm(rng, n, k, m=1, label=""):
    qt = q4(rng, n, k)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))

    @jax.jit
    def run(x):
        def step(c, _):
            y = qt.matmul(c)
            # keep shapes stable: fold back to (m, k) with a cheap reduce
            return c + jnp.sum(y) * 1e-9, ()
        c, _ = jax.lax.scan(step, x, None, length=STEPS)
        return c

    dt = timed(run, x)
    nbytes = n * k + (n * k // 32) * 4
    print(f"qmm {label or f'{n}x{k}'} m={m}: {dt*1e6:.1f} us/call, "
          f"{nbytes/dt/1e9:.1f} GB/s")
    return dt


def bench_layer_matmuls(rng, L=24, H=1024, F=4096):
    """All 10 per-layer matmuls of the Parler step, scanned over L layers,
    repeated STEPS times (matches production _transformer weight streaming)."""
    from tts_tpu.ops.linear import stack_weights

    def mk(n, k):
        return stack_weights([q4(rng, n, k) for _ in range(L)])

    ws = dict(q=mk(H, H), k=mk(H, H), v=mk(H, H), o=mk(H, H),
              cq=mk(H, H), co=mk(H, H), f1=mk(F, H), f2=mk(H, F))
    x = jnp.asarray(rng.standard_normal((1, H)).astype(np.float32))

    @jax.jit
    def run(x, ws):
        def step(c, _):
            def layer(cc, lw):
                q, k, v, o, cq, co, f1, f2 = lw
                y = q.matmul(cc) + k.matmul(cc) + v.matmul(cc) + o.matmul(cc)
                y = y + cq.matmul(cc) + co.matmul(cc)
                h = f1.matmul(y)
                return f2.matmul(h) + cc, ()
            cc, _ = jax.lax.scan(
                layer, c, (ws["q"], ws["k"], ws["v"], ws["o"],
                           ws["cq"], ws["co"], ws["f1"], ws["f2"]))
            return cc, ()
        c, _ = jax.lax.scan(step, x, None, length=STEPS)
        return c

    dt = timed(run, x, ws)
    per_layer = 6 * H * H + 2 * H * F
    nbytes = L * (per_layer + per_layer // 32 * 4)
    print(f"layer-matmul stack (L={L}): {dt*1e3:.3f} ms/step, "
          f"{nbytes/dt/1e9:.1f} GB/s weight stream")
    return dt


def bench_decode_attention(rng, L=24, heads=16, ctx=1024, d=64):
    from tts_tpu.ops.decode_attention import decode_attention
    kv_k = jnp.asarray(rng.standard_normal((L, heads, ctx, d)).astype(np.float32))
    kv_v = jnp.asarray(rng.standard_normal((L, heads, ctx, d)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((heads, d)).astype(np.float32))

    @jax.jit
    def run(q, kv_k, kv_v):
        def step(c, _):
            def layer(cc, kv):
                kk, vv = kv
                return cc + decode_attention(cc, kk, vv, jnp.int32(700)), ()
            cc, _ = jax.lax.scan(layer, c, (kv_k, kv_v))
            return cc * 1e-3, ()
        c, _ = jax.lax.scan(step, q, None, length=STEPS)
        return c

    dt = timed(run, q, kv_k, kv_v)
    nbytes = L * heads * 704 * d * 2 * 4
    print(f"decode attention (pos=700): {dt*1e3:.3f} ms/step, "
          f"{nbytes/dt/1e9:.1f} GB/s")
    return dt


def bench_sampling(rng, nh=9, vocab=1088):
    from tts_tpu.ops import sampling
    logits = jnp.asarray(rng.standard_normal((nh, vocab)).astype(np.float32))
    st0 = sampling.init_state(nh)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def run(logits, key):
        def step(c, _):
            lg, st, k = c
            k, sub = jax.random.split(k)
            toks, st = sampling.sample_or_greedy(
                sub, lg, st, do_sample=True, temperature=1.0, top_k=50,
                top_p=1.0, repetition_penalty=1.0)
            return (lg + toks.sum() * 1e-9, st, k), ()
        c, _ = jax.lax.scan(step, (logits, st0, key), None, length=STEPS)
        return c[0]

    dt = timed(run, logits, key)
    print(f"sampling (9 heads, top-k 50): {dt*1e6:.1f} us/step")
    return dt


def bench_full_step(rng):
    import bench as benchmod
    from tts_tpu.models.parler.model import (_parler_decode_body,
                                             _parler_init_state,
                                             parler_prefill)
    cfg, w = benchmod.build_q4_parler(rng)
    cfg.max_generation_size = 192
    shape = (cfg.n_layers, cfg.n_attn_heads, cfg.max_ctx_length, cfg.head_size)
    kv_k, kv_v = parler_prefill(
        cfg, w, jnp.asarray(rng.integers(0, 900, 64).astype(np.int32)),
        jnp.zeros(shape), jnp.zeros(shape))
    st = _parler_init_state(cfg, jnp.int32(64), kv_k, kv_v, jax.random.PRNGKey(0))
    body = _parler_decode_body(cfg, w, cfg.max_ctx_length, use_cross=True,
                               do_sample=True, temperature=1.0, top_k=50,
                               top_p=1.0, repetition_penalty=1.0)

    @jax.jit
    def run(st, w):
        bd = _parler_decode_body(cfg, w, cfg.max_ctx_length, use_cross=True,
                                 do_sample=True, temperature=1.0, top_k=50,
                                 top_p=1.0, repetition_penalty=1.0)
        def step(s, _):
            return bd(s), ()
        s, _ = jax.lax.scan(step, st, None, length=STEPS)
        return s.out_tokens

    dt = timed(run, st, w)
    print(f"FULL decode step: {dt*1e3:.3f} ms/step "
          f"({0.01161/dt:.2f}x realtime single-stream)")
    return dt


def main():
    rng = np.random.default_rng(0)
    print(f"platform: {jax.devices()[0].platform}")
    bench_layer_matmuls(rng)
    bench_decode_attention(rng)
    bench_sampling(rng)
    bench_full_step(rng)


if __name__ == "__main__":
    main()
