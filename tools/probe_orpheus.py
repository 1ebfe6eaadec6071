"""Break down the Orpheus-3B Q4 decode step on the real chip.

Times (each as a jitted 64-step scan, relay overhead amortized):
  1. llama megastep alone (28 layers)
  2. LM head matmul, current path (vocab 156940 -> XLA fallback)
  3. LM head matmul, padded to 157184 (Pallas packed path)
  4. top-k sampling over the vocab
  5. full orpheus_decode_chunk
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


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench
    from tts_tpu.common import kv_cache_dtype
    from tts_tpu.models.orpheus.model import (OrpheusState, orpheus_decode_chunk,
                                              orpheus_prefill,
                                              maybe_prep_llama_mega)
    from tts_tpu.ops import sampling
    from tts_tpu.ops.llama_megastep import llama_megastep
    from tts_tpu.ops.quant_matmul import QuantTensor

    cfg, w = bench.build_q4_orpheus()
    mega, qtype = maybe_prep_llama_mega(cfg, w)
    print("mega:", mega is not None, "qtype:", qtype)
    dt = kv_cache_dtype()
    shape = (cfg.n_layers, cfg.n_kv_heads, cfg.max_context_length, cfg.head_size)
    kv_k = jnp.zeros(shape, dt)
    kv_v = jnp.zeros(shape, dt)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, cfg.hidden_size)),
                    jnp.float32)

    # 1. megastep alone (mega/weights passed as ARGS — closures over big
    # arrays become inline constants shipped through the compile relay)
    @jax.jit
    def run_mega(mega, rf, x, kv_k, kv_v):
        def step(c, _):
            xo, kn, vn = llama_megastep(
                mega, c, kv_k, kv_v, jnp.int32(100), qtype=qtype,
                n_heads=cfg.n_attn_heads, n_kv=cfg.n_kv_heads,
                rope_base=cfg.rope_theta, rope_freq_factors=rf)
            return xo + jnp.sum(kn) * 1e-9, ()
        c, _ = jax.lax.scan(step, x, None, length=STEPS)
        return c

    t = timed(run_mega, mega, w.rope_freqs, x, kv_k, kv_v)
    gb = (2.82e9 * 0.625 + 2 * 28 * 8 * cfg.max_context_length * 128 * 2) / 1e9
    print(f"megastep: {t*1e3:.3f} ms/step  (~{gb/t:.0f} GB/s incl KV)")

    # 2. head, current path
    head = w.head
    print("head type:", type(head).__name__, "packed:", getattr(head, "is_packed", None),
          "shape:", head.shape if isinstance(head, QuantTensor) else head.shape)

    from tts_tpu.ops.quant_matmul import quant_matmul

    @jax.jit
    def run_head(hc, hs, x):
        def step(c, _):
            y = quant_matmul(c, hc, hs, head.qtype)
            return c + jnp.sum(y) * 1e-9, ()
        c, _ = jax.lax.scan(step, x, None, length=STEPS)
        return c

    t = timed(run_head, head.codes_t, head.scales_t, x)
    print(f"head (current): {t*1e3:.3f} ms/step")

    # 3. head padded to multiple of 256
    v = cfg.vocab_size
    vp = ((v + 255) // 256) * 256
    pad = vp - v
    codes_p = jnp.pad(head.codes_t, ((0, 0), (0, pad)))
    scales_p = jnp.pad(head.scales_t, ((0, 0), (0, pad)))
    head_p = QuantTensor(codes_p, scales_p, head.qtype)

    @jax.jit
    def run_head_p(hc, hs, x):
        def step(c, _):
            y = quant_matmul(c, hc, hs, head.qtype)
            return c + jnp.sum(y) * 1e-9, ()
        c, _ = jax.lax.scan(step, x, None, length=STEPS)
        return c

    t = timed(run_head_p, head_p.codes_t, head_p.scales_t, x)
    nb = (codes_p.shape[0] * vp + (3072 // 32) * vp * 4) / 1e9
    print(f"head (padded {vp}, pallas): {t*1e3:.3f} ms/step ({nb/t:.0f} GB/s)")

    # 4. sampling
    logits = jnp.asarray(np.random.default_rng(1).standard_normal((1, v)),
                         jnp.float32)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def run_sample(logits, key):
        st = sampling.init_state(1)
        def step(c, _):
            lg, key, st = c
            key, sub = jax.random.split(key)
            toks, st = sampling.sample_or_greedy(
                sub, lg, st, do_sample=True, top_k=50)
            return (lg + toks[0] * 1e-9, key, st), ()
        c, _ = jax.lax.scan(step, (logits, key, st), None, length=STEPS)
        return c[0]

    t = timed(run_sample, logits, key)
    print(f"sampling top_k=50 over {v}: {t*1e3:.3f} ms/step")

    # 5. full decode chunk
    tokens = jnp.asarray(np.random.default_rng(4).integers(0, 100000, 64),
                         jnp.int32)
    logits0, kv_k, kv_v = orpheus_prefill(cfg, w, tokens, jnp.int32(64),
                                          kv_k, kv_v)
    first = jnp.argmax(logits0).astype(jnp.int32)
    st = OrpheusState(
        kv_k=kv_k, kv_v=kv_v, pos=jnp.int32(64), token_in=first,
        n_out=jnp.int32(1), done=jnp.asarray(False),
        out_tokens=jnp.zeros((256,), jnp.int32).at[0].set(first),
        sampler_state=sampling.init_state(1), key=jax.random.PRNGKey(5))

    def run_chunk(st):
        st = orpheus_decode_chunk(cfg, w, st, n_steps=STEPS, max_steps=256,
                                  do_sample=True, top_k=50, mega=mega,
                                  mega_qtype=qtype)
        int(np.asarray(st.out_tokens).sum())
        return st

    st = run_chunk(st)
    t0 = time.perf_counter()
    run_chunk(st)
    t = (time.perf_counter() - t0 - 0.033) / STEPS
    print(f"full chunk: {t*1e3:.3f} ms/step")


if __name__ == "__main__":
    main()
