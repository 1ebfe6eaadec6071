"""Break down the batched Orpheus step (B=8, 9.75 ms): batched megastep
kernel vs LM head vs batched sampling vs KV writes."""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

STEPS = 32


def timed(fn, *args):
    out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a).sum() if hasattr(a, "shape") else a,
                 out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(lambda a: np.asarray(a).sum()
                     if hasattr(a, "shape") else a, out)
        best = min(best, (time.perf_counter() - t0 - 0.033) / STEPS)
    return best


def main():
    import bench
    from tts_tpu.common import kv_cache_dtype
    from tts_tpu.models.orpheus.model import maybe_prep_llama_mega
    from tts_tpu.ops import sampling
    from tts_tpu.ops.llama_megastep import llama_megastep_batched
    from tts_tpu.ops.quant_matmul import quant_matmul

    cfg, w = bench.build_q4_orpheus()
    w = w._replace(head=w.head.fast_lm_head())
    mega, qtype = maybe_prep_llama_mega(cfg, w)
    B = 8
    dt = kv_cache_dtype()
    ctx = -(-(cfg.max_context_length + cfg.max_generation_size) // 256) * 256
    rng = np.random.default_rng(0)
    kv_k = jnp.zeros((cfg.n_layers, B, cfg.n_kv_heads, ctx, cfg.head_size),
                     dt)
    kv_v = jnp.zeros_like(kv_k)
    x = jnp.asarray(rng.standard_normal((B, cfg.hidden_size)) * 0.5,
                    jnp.float32)
    pos = jnp.full((B,), 100, jnp.int32)

    @jax.jit
    def run_mega(mega, rf, x, kv_k, kv_v):
        def step(c, _):
            xo, kn, vn = llama_megastep_batched(
                mega, c, kv_k, kv_v, pos, qtype=qtype,
                n_heads=cfg.n_attn_heads, n_kv=cfg.n_kv_heads,
                rope_base=cfg.rope_theta, rope_freq_factors=rf)
            return c + xo * 1e-9, ()
        c, _ = jax.lax.scan(step, x, None, length=STEPS)
        return c

    t = timed(run_mega, mega, w.rope_freqs, x, kv_k, kv_v)
    print(f"batched megastep : {t*1e3:7.3f} ms/step", flush=True)

    @jax.jit
    def run_head(hc, hs, x):
        def step(c, _):
            y = quant_matmul(c, hc, hs, w.head.qtype)
            return c + y[:, : cfg.hidden_size] * 1e-9, ()
        c, _ = jax.lax.scan(step, x, None, length=STEPS)
        return c

    t = timed(run_head, w.head.codes_t, w.head.scales_t, x)
    print(f"head matmul B=8  : {t*1e3:7.3f} ms/step", flush=True)

    logits = jnp.asarray(rng.standard_normal((B, cfg.vocab_size)),
                         jnp.float32)

    @jax.jit
    def run_sample(logits, key):
        st = sampling.init_batched_state(B, 1)
        ds = jnp.ones((B,), bool)
        tk = jnp.full((B,), 50, jnp.int32)
        ones = jnp.ones((B,), jnp.float32)

        def step(c, _):
            lg, key, st = c
            key, sub = jax.random.split(key)
            toks, st = sampling.sample_batched(
                sub, lg[:, None, :], st, do_sample=ds, temperature=ones,
                top_k=tk, top_p=ones, repetition_penalty=ones)
            return (lg + toks[:, 0:1] * 1e-9, key, st), ()
        c, _ = jax.lax.scan(step, (logits, key, st), None, length=STEPS)
        return c[0]

    t = timed(run_sample, logits, jax.random.PRNGKey(0))
    print(f"batched sampling : {t*1e3:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
