"""Quantify TP overhead on the real chip (round-5 task 7): tp=1 shard_map
runs of the Megatron-TP decode steps vs the fused megakernels.

Multi-chip hardware isn't reachable from this box, but a tp=1 mesh on the
one real chip executes the EXACT multi-chip program (shard_map + psum
with trivial collectives), so the measured gap vs the fused megakernels
is what a real tp>1 deployment would pay per chip today: the TP paths
decode through per-projection quant_matmul calls, not the flat-stream
megakernels.

MEASURED (v5e, 2026-08-21, min-of-3 over 32-step scans):
  parler  tp=1 shard_map 2.020 ms/step vs flat megastep 0.645  -> 3.13x
  orpheus tp=1 shard_map 10.41 ms/step vs flat megastep 3.899  -> 2.67x
  (requires check_vma=False on the shard_map wrappers: new JAX rejects
  pallas out_shapes without vma inside checked shard_map)

Both gaps exceed 2x, so per the round-5 contract here is the PLAN for
sharded megastep kernels (not yet implemented):
  The Megatron layout maps onto the flat tile axis — column-shard
  stream A's N-tiles over `tp` (qkv head-group columns, gate/up
  columns, LM-head vocab shard), row-shard o and down on K, KV cache by
  kv-head group as in llama_tp, schedules host-built per shard over the
  local dims. The honest catch: Megatron needs TWO reductions per layer
  (after the o and down partials), so a sharded whole-stack kernel must
  either (a) perform the psums IN-KERNEL with Pallas remote DMAs +
  semaphores (ring all-reduce of the (8, H/2k) partial at each o/down
  boundary — the collective is tiny, ~100 KB, but this is the real
  engineering), or (b) split per layer-group and pay kernel-relaunch +
  exposed-DMA costs at every boundary, or (c) shard ONLY the FFN + LM
  head (1 psum per layer, attention replicated) and accept ~25%
  replicated weight traffic. (c) is the pragmatic first step: per-device
  bytes drop to ~(0.25 + 0.75/tp) of the single-chip stream with one
  tiny psum per layer riding ICI, and the LM-head shard composes with a
  sharded top-k. The per-projection TP paths stay as the correctness
  reference either way.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

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


def parler():
    import bench
    from tts_tpu.common import kv_cache_dtype
    from tts_tpu.models.parler.model import maybe_prep_parler_flat
    from tts_tpu.ops.parler_flat import parler_flat_megastep
    from tts_tpu.parallel.tp_megastep import (megastep_tp, prep_tp_layers)

    rng = np.random.default_rng(0)
    cfg, w = bench.build_q4_parler(rng)
    flat, qtype = maybe_prep_parler_flat(cfg, w)
    tpl, _ = prep_tp_layers(w.layers, 1)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("tp",))
    dt = kv_cache_dtype()
    L, heads, d = cfg.n_layers, cfg.n_attn_heads, cfg.head_size
    kv_k = jnp.zeros((L, heads, cfg.max_ctx_length, d), dt)
    kv_v = jnp.zeros((L, heads, cfg.max_ctx_length, d), dt)
    x = jnp.asarray(rng.standard_normal((1, cfg.hidden_size)) * 0.5,
                    jnp.float32)

    @jax.jit
    def run_tp(tpl, x, kv_k, kv_v):
        def step(c, _):
            xo, kn, vn = megastep_tp(tpl, c, kv_k, kv_v, jnp.int32(100),
                                     mesh=mesh, qtype=qtype, use_cross=True,
                                     n_heads=heads)
            return c + xo * 1e-9, ()
        c, _ = jax.lax.scan(step, x, None, length=STEPS)
        return c

    t_tp = timed(run_tp, tpl, x, kv_k, kv_v)

    @jax.jit
    def run_flat(flat, x, kv_k, kv_v):
        def step(c, _):
            xo, kn, vn = parler_flat_megastep(flat, c, kv_k, kv_v,
                                              jnp.int32(100), qtype=qtype,
                                              n_heads=heads)
            return c + xo * 1e-9, ()
        c, _ = jax.lax.scan(step, x, None, length=STEPS)
        return c

    t_flat = timed(run_flat, flat, x, kv_k, kv_v)
    print(f"parler  tp=1 shard_map: {t_tp*1e3:7.3f} ms/step  "
          f"flat megastep: {t_flat*1e3:7.3f} ms/step  "
          f"gap {t_tp/t_flat:.2f}x", flush=True)


def orpheus():
    import bench
    from tts_tpu.common import kv_cache_dtype
    from tts_tpu.models.orpheus.model import maybe_prep_llama_flat
    from tts_tpu.ops.attention import rope_freqs
    from tts_tpu.ops.llama_flat import llama_flat_megastep
    from tts_tpu.parallel.llama_tp import llama_megastep_tp, prep_llama_tp

    cfg, w = bench.build_q4_orpheus()
    w = w._replace(head=w.head.fast_lm_head())
    flat, qtype = maybe_prep_llama_flat(cfg, w, ctx=cfg.max_context_length)
    tpl, _ = prep_llama_tp(w.layers, 1, n_heads=cfg.n_attn_heads,
                           n_kv=cfg.n_kv_heads, head_d=cfg.head_size)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("tp",))
    dt = kv_cache_dtype()
    rng = np.random.default_rng(0)
    shape = (cfg.n_layers, cfg.n_kv_heads, cfg.max_context_length,
             cfg.head_size)
    kv_k = jnp.zeros(shape, dt)
    kv_v = jnp.zeros(shape, dt)
    x = jnp.asarray(rng.standard_normal((1, cfg.hidden_size)) * 0.5,
                    jnp.float32)
    inv = rope_freqs(cfg.head_size, cfg.rope_theta,
                     w.rope_freqs).reshape(1, -1)

    @jax.jit
    def run_tp(tpl, x, kv_k, kv_v, inv):
        def step(c, _):
            xo, kn, vn = llama_megastep_tp(
                tpl, c, kv_k, kv_v, jnp.int32(100), inv, mesh=mesh,
                qtype=qtype, n_heads=cfg.n_attn_heads, n_kv=cfg.n_kv_heads,
                rope_base=cfg.rope_theta)
            return c + xo * 1e-9, ()
        c, _ = jax.lax.scan(step, x, None, length=STEPS)
        return c

    t_tp = timed(run_tp, tpl, x, kv_k, kv_v, inv)

    @jax.jit
    def run_flat(flat, rf, x, kv_k, kv_v):
        def step(c, _):
            lg, kn, vn = llama_flat_megastep(
                flat, c, kv_k, kv_v, jnp.int32(100), qtype=qtype,
                n_heads=cfg.n_attn_heads, n_kv=cfg.n_kv_heads,
                rope_base=cfg.rope_theta, rope_freq_factors=rf)
            return c + lg[:, : cfg.hidden_size] * 1e-9, ()
        c, _ = jax.lax.scan(step, x, None, length=STEPS)
        return c

    t_flat = timed(run_flat, flat, w.rope_freqs, x, kv_k, kv_v)
    print(f"orpheus tp=1 shard_map: {t_tp*1e3:7.3f} ms/step  "
          f"flat megastep (incl. LM head): {t_flat*1e3:7.3f} ms/step  "
          f"gap {t_tp/t_flat:.2f}x", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "parler"):
        parler()
    if which in ("both", "orpheus"):
        orpheus()
