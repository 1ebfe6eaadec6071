"""Break down the flat-megastep decode step: kernel-only scan vs top-k
sampling vs full chunk (orpheus_decode_chunk), to locate the remaining
ms between the kernel and the 4.2 ms/step target."""
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
    from tts_tpu.models.orpheus.model import maybe_prep_llama_flat
    from tts_tpu.ops import sampling
    from tts_tpu.ops.llama_flat import llama_flat_megastep

    cfg, w = bench.build_q4_orpheus()
    w = w._replace(head=w.head.fast_lm_head())
    flat, qtype = maybe_prep_llama_flat(cfg, w, ctx=cfg.max_context_length)
    dt = kv_cache_dtype()
    shape = (cfg.n_layers, cfg.n_kv_heads, cfg.max_context_length,
             cfg.head_size)
    rng = np.random.default_rng(0)
    kv_k = jnp.zeros(shape, dt)
    kv_v = jnp.zeros(shape, dt)
    x = jnp.asarray(rng.standard_normal((1, cfg.hidden_size)) * 0.5,
                    jnp.float32)

    @jax.jit
    def run_kernel(flat, rf, x, kv_k, kv_v):
        def step(c, _):
            lg, kn, vn = llama_flat_megastep(
                flat, c, kv_k, kv_v, jnp.int32(100), qtype=qtype,
                n_heads=cfg.n_attn_heads, n_kv=cfg.n_kv_heads,
                rope_base=cfg.rope_theta, rope_freq_factors=rf)
            return c + lg[:, :cfg.hidden_size] * 1e-9, ()
        c, _ = jax.lax.scan(step, x, None, length=STEPS)
        return c

    t = timed(run_kernel, flat, w.rope_freqs, x, kv_k, kv_v)
    gb = (flat.codes0.nbytes + flat.scales0.nbytes + flat.codes1.nbytes + flat.scales1.nbytes) / 1e9
    print(f"kernel only : {t*1e3:7.3f} ms/step ({gb/t:.0f} GB/s)", flush=True)

    logits = jnp.asarray(rng.standard_normal((1, cfg.vocab_size)),
                         jnp.float32)

    @jax.jit
    def run_sample(logits, key):
        st = sampling.init_state(1)

        def step(c, _):
            lg, key, st = c
            key, sub = jax.random.split(key)
            toks, st = sampling.sample_or_greedy(
                sub, lg, st, do_sample=True, top_k=50, temperature=1.0,
                top_p=1.0, repetition_penalty=1.0)
            return (lg + toks[0] * 1e-9, key, st), ()
        c, _ = jax.lax.scan(step, (logits, key, st), None, length=STEPS)
        return c[0]

    t = timed(run_sample, logits, jax.random.PRNGKey(0))
    print(f"sampling    : {t*1e3:7.3f} ms/step (top_k=50, V={cfg.vocab_size})",
          flush=True)

    @jax.jit
    def run_argmax(logits):
        def step(c, _):
            return c + jnp.argmax(c, axis=-1) * 1e-9, ()
        c, _ = jax.lax.scan(step, (logits), None, length=STEPS)
        return c

    t = timed(run_argmax, logits)
    print(f"argmax      : {t*1e3:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
