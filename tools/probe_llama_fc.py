"""Probe llama megastep phase size (fc) on the packed Q4 layout."""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from bench import build_q4_orpheus
from tts_tpu.ops.llama_megastep import _llama_megastep_tpu, prep_llama_mega


def perf(fc, steps=64):
    cfg, w = build_q4_orpheus()
    mega, qtype = prep_llama_mega(w.layers)
    L, nkv, d = cfg.n_layers, cfg.n_kv_heads, cfg.head_size
    kv_k = jnp.zeros((L, nkv, 1024, d), jnp.bfloat16)
    kv_v = jnp.zeros((L, nkv, 1024, d), jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, cfg.hidden_size)).astype(np.float32)) * 0.3
    kw = dict(qtype=qtype, n_heads=cfg.n_attn_heads, n_kv=nkv,
              rope_base=cfg.rope_theta, rope_freq_factors=None, fc=fc)

    @jax.jit
    def run(x, mega, kv_k, kv_v):
        def step(carry, i):
            xx, kk, vv = carry
            xo, kn, vn = _llama_megastep_tpu(mega, xx, kk, vv, 64 + i, **kw)
            kk = jax.lax.dynamic_update_slice(
                kk, kn.reshape(L, nkv, 1, d).astype(kk.dtype),
                (0, 0, 64 + i, 0))
            vv = jax.lax.dynamic_update_slice(
                vv, vn.reshape(L, nkv, 1, d).astype(vv.dtype),
                (0, 0, 64 + i, 0))
            return (xx * 0 + xo, kk, vv), ()
        (xx, _, _), _ = jax.lax.scan(step, (x, kv_k, kv_v),
                                     jnp.arange(steps))
        return xx

    out = run(x, mega, kv_k, kv_v)
    np.asarray(out).sum()
    t0 = time.perf_counter()
    out = run(x, mega, kv_k, kv_v)
    np.asarray(out).sum()
    per = (time.perf_counter() - t0 - 0.033) / steps
    print(f"fc={fc}: {per*1e3:.3f} ms/step", flush=True)


if __name__ == "__main__":
    for fc in [int(a) for a in sys.argv[1:]] or (2048, 4096, 8192):
        perf(fc)
