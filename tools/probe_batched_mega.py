"""Batched megasteps on the real chip: Orpheus (8 slots) and Dia (4 CFG
pairs) — chunk timing through the batched engines' decode paths vs the
per-projection path, plus aggregate RTF numbers for bench."""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

STEPS = 32


def orpheus(B=8):
    import bench
    from tts_tpu.common import kv_cache_dtype
    from tts_tpu.models.orpheus.model import (maybe_prep_llama_mega,
                                              orpheus_prefill)
    from tts_tpu.runtime.batched_llama import (batched_llama_decode_chunk,
                                               init_batched_llama_state,
                                               insert_llama_request)

    cfg, w = bench.build_q4_orpheus()
    w = w._replace(head=w.head.fast_lm_head())
    mega, qtype = maybe_prep_llama_mega(cfg, w)
    dt = kv_cache_dtype()
    st = init_batched_llama_state(cfg, B, jax.random.PRNGKey(0))
    ctx = st.kv_k.shape[3]
    shape = (cfg.n_layers, cfg.n_kv_heads, ctx, cfg.head_size)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, 100000, 64).astype(np.int32))
    logits, kv_k, kv_v = orpheus_prefill(cfg, w, toks, jnp.int32(64),
                                         jnp.zeros(shape, dt),
                                         jnp.zeros(shape, dt))
    first = jnp.argmax(logits).astype(jnp.int32)
    for s in range(B):
        st = insert_llama_request(cfg, st, s, kv_k, kv_v, 64, first,
                                  True, 1.0, 50, 1.0, 1.0)

    def run(st):
        st = batched_llama_decode_chunk(cfg, w, st, n_steps=STEPS,
                                        mega=mega, mega_qtype=qtype,
                                        kmax=64)
        int(np.asarray(st.out_tokens).sum())
        return st

    t0 = time.perf_counter()
    st = run(st)
    print(f"orpheus batched compiled+ran in {time.perf_counter()-t0:.1f}s",
          flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        st = run(st)
        best = min(best, (time.perf_counter() - t0 - 0.033) / STEPS)
    audio = 2048 / 24000  # 7 tokens -> SNAC frame math folded: per token
    rtf = B * (bench.ORPHEUS_AUDIO_PER_TOKEN / best)
    print(f"orpheus batched B={B}: {best*1e3:.3f} ms/step "
          f"aggregate RTF {rtf:.2f}", flush=True)


def dia(B=4):
    import bench
    from tts_tpu.models.dia.model import (dia_encode, maybe_prep_dia_mega)
    from tts_tpu.ops.dia_megastep import prep_dia_cross
    from tts_tpu.runtime.batched_dia import (batched_dia_decode_chunk,
                                             init_batched_dia_state,
                                             insert_dia_request)

    cfg, w = bench.build_q4_dia()
    w = w._replace(heads=w.heads.fast_stacked_heads(
        cfg.n_output_heads, cfg.output_vocab_size))
    mega, qtype = maybe_prep_dia_mega(cfg, w)
    rng = np.random.default_rng(6)
    toksd = np.zeros((2, cfg.max_encoder_context_length), np.int32)
    toksd[0, :100] = rng.integers(3, 250, 100)
    _, ck, cv = dia_encode(cfg, w, jnp.asarray(toksd), jnp.int32(100))
    sb = 256
    ckb, cvb, vtail, n_tail = prep_dia_cross(ck, cv, 100, buckets=(sb,))
    L, h, d = cfg.n_decoder_layers, cfg.decoder_attn_heads, cfg.head_size
    st = init_batched_dia_state(cfg, B, jax.random.PRNGKey(1),
                                cross_bucket=sb)
    for s in range(B):
        st = insert_dia_request(cfg, st, s, ckb.reshape(L, 2, h, sb, d),
                                cvb.reshape(L, 2, h, sb, d),
                                vtail.reshape(L, 2, h, d),
                                True, 1.0, 50, 1.0, 1.0)

    def run(st):
        st = batched_dia_decode_chunk(cfg, w, st, n_steps=STEPS,
                                      n_tail=n_tail, mega=mega,
                                      mega_qtype=qtype)
        int(np.asarray(st.out_tokens).sum())
        return st

    t0 = time.perf_counter()
    st = run(st)
    print(f"dia batched compiled+ran in {time.perf_counter()-t0:.1f}s",
          flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        st = run(st)
        best = min(best, (time.perf_counter() - t0 - 0.033) / STEPS)
    rtf = B * (bench.SAMPLES_PER_STEP / bench.SAMPLE_RATE / best)
    print(f"dia batched B={B}: {best*1e3:.3f} ms/step "
          f"aggregate RTF {rtf:.2f}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "orpheus"):
        orpheus()
    if which in ("both", "dia"):
        dia()
