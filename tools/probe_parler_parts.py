"""Break down the Parler flat decode step on the real chip: kernel-only
scan vs 9-head sampling vs embed+glue, to find where 0.94 ms/step goes
when the weight stream alone should cost ~0.5 ms."""
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
    from tts_tpu.models.parler.model import (_logits_last,
                                             maybe_prep_parler_flat)
    from tts_tpu.ops import sampling
    from tts_tpu.ops.parler_flat import parler_flat_megastep

    rng = np.random.default_rng(0)
    cfg, w = bench.build_q4_parler(rng)
    flat, qtype = maybe_prep_parler_flat(cfg, w)
    dt = kv_cache_dtype()
    L, heads, d = cfg.n_layers, cfg.n_attn_heads, cfg.head_size
    kv_k = jnp.zeros((L, heads, cfg.max_ctx_length, d), dt)
    kv_v = jnp.zeros((L, heads, cfg.max_ctx_length, d), dt)
    x = jnp.asarray(rng.standard_normal((1, cfg.hidden_size)) * 0.5,
                    jnp.float32)

    @jax.jit
    def run_kernel(flat, x, kv_k, kv_v):
        def step(c, _):
            xo, kn, vn = parler_flat_megastep(
                flat, c, kv_k, kv_v, jnp.int32(100), qtype=qtype,
                n_heads=heads)
            return c + xo * 1e-9, ()
        c, _ = jax.lax.scan(step, x, None, length=STEPS)
        return c

    t = timed(run_kernel, flat, x, kv_k, kv_v)
    gb = (flat.codes0.nbytes + flat.scales0.nbytes + flat.codes1.nbytes +
          flat.scales1.nbytes) / 1e9
    print(f"kernel only : {t*1e3:7.3f} ms/step ({gb/t*1e3:.0f} GB/s)",
          flush=True)

    # heads + sampling (the per-step tail after the megastep)
    hvec = jnp.asarray(rng.standard_normal(cfg.hidden_size), jnp.float32)

    @jax.jit
    def run_tail(heads_c, heads_s, hvec, key):
        st = sampling.init_state(cfg.n_output_heads)

        def step(c, _):
            hv, key, st = c
            from tts_tpu.ops.quant_matmul import quant_matmul
            out = quant_matmul(hv[None, :], heads_c, heads_s,
                               w.heads.qtype)[0]
            vocab_p = out.shape[-1] // cfg.n_output_heads
            lg = out.reshape(cfg.n_output_heads,
                             vocab_p)[:, : cfg.output_vocab_size]
            key, sub = jax.random.split(key)
            toks, st = sampling.sample_or_greedy(
                sub, lg, st, do_sample=True, top_k=50, temperature=1.0,
                top_p=1.0, repetition_penalty=1.0)
            return (hv + toks[0] * 1e-9, key, st), ()
        c, _ = jax.lax.scan(step, (hvec, key, st), None, length=STEPS)
        return c[0]

    t = timed(run_tail, w.heads.codes_t, w.heads.scales_t, hvec,
              jax.random.PRNGKey(0))
    print(f"heads+sample: {t*1e3:7.3f} ms/step", flush=True)

    # embed path: 9 codebook gathers + pos embed
    toks = jnp.asarray(rng.integers(0, 1024, cfg.n_output_heads), jnp.int32)

    @jax.jit
    def run_embed(embds, pos_embd, toks):
        def step(c, _):
            embs = jax.vmap(lambda e, t: e[t])(embds, c)
            x = jnp.sum(embs, axis=0) + pos_embd[100]
            return (c + 1) % 1024, ()
        c, _ = jax.lax.scan(step, toks, None, length=STEPS)
        return c

    t = timed(run_embed, w.embds, w.pos_embd, toks)
    print(f"embed       : {t*1e3:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
