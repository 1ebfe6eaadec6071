"""Run the flat-tile llama megastep (ops/llama_flat) on the real chip at
full Orpheus-3B size: one-step logits parity vs the phase megastep + LM
head, then chunked decode timing vs the round-4 number (6.008 ms/step).
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


def main():
    import bench
    from tts_tpu.common import kv_cache_dtype
    from tts_tpu.models.orpheus.model import (OrpheusState, _rms,
                                              maybe_prep_llama_flat,
                                              maybe_prep_llama_mega,
                                              orpheus_decode_chunk,
                                              orpheus_prefill)
    from tts_tpu.ops import sampling
    from tts_tpu.ops.llama_flat import LlamaFlatMega, llama_flat_megastep
    from tts_tpu.ops.llama_megastep import llama_megastep
    from tts_tpu.ops.quant_matmul import quant_matmul

    cfg, w = bench.build_q4_orpheus()
    w = w._replace(head=w.head.fast_lm_head())
    t0 = time.perf_counter()
    flat, qtype = maybe_prep_llama_flat(cfg, w, ctx=cfg.max_context_length)
    print(f"prep: {type(flat).__name__} in {time.perf_counter()-t0:.1f}s",
          flush=True)
    assert isinstance(flat, LlamaFlatMega)
    mega, _ = maybe_prep_llama_mega(cfg, w)

    dt = kv_cache_dtype()
    shape = (cfg.n_layers, cfg.n_kv_heads, cfg.max_context_length,
             cfg.head_size)
    rng = np.random.default_rng(0)
    kv_k = jnp.asarray(rng.standard_normal(shape) * 0.3, dt)
    kv_v = jnp.asarray(rng.standard_normal(shape) * 0.3, dt)
    x = jnp.asarray(rng.standard_normal((1, cfg.hidden_size)) * 0.5,
                    jnp.float32)
    pos = jnp.int32(100)

    # --- one-step parity: flat vs phase+head ---
    @jax.jit
    def one_flat(flat, rf, x, kv_k, kv_v):
        lg, kn, vn = llama_flat_megastep(
            flat, x, kv_k, kv_v, pos, qtype=qtype,
            n_heads=cfg.n_attn_heads, n_kv=cfg.n_kv_heads,
            rope_base=cfg.rope_theta, rope_freq_factors=rf)
        return lg, kn, vn

    @jax.jit
    def one_phase(mega, head_c, head_s, onm, rf, x, kv_k, kv_v):
        xo, kn, vn = llama_megastep(
            mega, x, kv_k, kv_v, pos, qtype=qtype,
            n_heads=cfg.n_attn_heads, n_kv=cfg.n_kv_heads,
            rope_base=cfg.rope_theta, rope_freq_factors=rf)
        lg = quant_matmul(_rms(xo, onm), head_c, head_s, w.head.qtype)
        return lg, kn, vn

    t0 = time.perf_counter()
    lg_f, kn_f, vn_f = one_flat(flat, w.rope_freqs, x, kv_k, kv_v)
    lg_f = np.asarray(lg_f)[:, : cfg.vocab_size]
    print(f"flat one-step compiled+ran in {time.perf_counter()-t0:.1f}s",
          flush=True)
    lg_p, kn_p, vn_p = one_phase(mega, w.head.codes_t, w.head.scales_t,
                                 w.out_norm, w.rope_freqs, x, kv_k, kv_v)
    lg_p = np.asarray(lg_p)[:, : cfg.vocab_size]
    rel = np.abs(lg_f - lg_p).max() / (np.abs(lg_p).max() + 1e-9)
    agree = int(lg_f.argmax()) == int(lg_p.argmax())
    print(f"logits rel-err {rel:.4g}  argmax agree {agree}", flush=True)
    for nm, a, b in (("k", kn_f, kn_p), ("v", vn_f, vn_p)):
        r = np.abs(np.asarray(a) - np.asarray(b)).max() / \
            (np.abs(np.asarray(b)).max() + 1e-9)
        print(f"{nm}_new rel-err {r:.4g}", flush=True)

    # --- chunk timing through the model path ---
    tokens = jnp.asarray(rng.integers(0, 100000, 64).astype(np.int32))
    shape0 = (cfg.n_layers, cfg.n_kv_heads, cfg.max_context_length,
              cfg.head_size)
    logits0, kv_k0, kv_v0 = orpheus_prefill(cfg, w, tokens, jnp.int32(64),
                                            jnp.zeros(shape0, dt),
                                            jnp.zeros(shape0, dt))
    first = jnp.argmax(logits0).astype(jnp.int32)
    st = OrpheusState(
        kv_k=kv_k0, kv_v=kv_v0, pos=jnp.int32(64), token_in=first,
        n_out=jnp.int32(1), done=jnp.asarray(False),
        out_tokens=jnp.zeros((256,), jnp.int32).at[0].set(first),
        sampler_state=sampling.init_state(1), key=jax.random.PRNGKey(5))

    def run(st):
        st = orpheus_decode_chunk(cfg, w, st, n_steps=STEPS, max_steps=256,
                                  do_sample=True, top_k=50, mega=flat,
                                  mega_qtype=qtype)
        int(np.asarray(st.out_tokens).sum())
        return st

    t0 = time.perf_counter()
    st = run(st)
    print(f"chunk compiled+ran in {time.perf_counter()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        st = run(st)
        best = min(best, (time.perf_counter() - t0 - 0.033) / STEPS)
    gb = (flat.codes0.nbytes + flat.scales0.nbytes + flat.codes1.nbytes + flat.scales1.nbytes) / 1e9
    print(f"flat decode: {best*1e3:.3f} ms/step  stream {gb:.2f} GB "
          f"-> {gb/best:.0f} GB/s  (round-4: 6.008 ms)", flush=True)


if __name__ == "__main__":
    main()
