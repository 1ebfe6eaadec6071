"""Isolate batched-engine step costs on the TPU: full batched_decode_chunk
vs megastep-kernel-only, so non-kernel overhead (cache writes, sampling,
bookkeeping) is visible."""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from bench import build_q4_parler
from tts_tpu.models.parler.model import maybe_prep_mega, parler_prefill
from tts_tpu.runtime.batched_parler import (batched_decode_chunk,
                                            init_batched_state,
                                            insert_request)

os.environ.setdefault("TTS_TPU_MEGAKERNEL", "1")


def main(b=8, steps=64):
    rng = np.random.default_rng(0)
    cfg, w = build_q4_parler(rng)
    cfg.max_generation_size = 512
    mega, qtype = maybe_prep_mega(cfg, w)
    print("mega:", mega is not None, flush=True)
    from tts_tpu.common import kv_cache_dtype
    dt = kv_cache_dtype()
    shape = (cfg.n_layers, cfg.n_attn_heads, cfg.max_ctx_length,
             cfg.head_size)
    tokens = jnp.asarray(rng.integers(0, 900, 64).astype(np.int32))
    kv_k, kv_v = parler_prefill(cfg, w, tokens, jnp.zeros(shape, dt),
                                jnp.zeros(shape, dt))
    st = init_batched_state(cfg, b, jax.random.PRNGKey(2))
    for slot in range(b):
        st = insert_request(cfg, st, slot, kv_k, kv_v, 64, True, 1.0, 50,
                            1.0, 1.0)

    def run(st):
        st = batched_decode_chunk(cfg, w, st, n_steps=steps, mega=mega,
                                  mega_qtype=qtype)
        int(np.asarray(st.out_tokens).sum())
        return st

    st2 = run(st)  # compile + warm
    t0 = time.perf_counter()
    run(st2)
    dt_full = time.perf_counter() - t0
    per = (dt_full - 0.033) / steps
    print(f"batched chunk B={b}: {per*1e3:.3f} ms/step total "
          f"({b*0.01161/per:.1f}x aggregate RT)", flush=True)

    # greedy-only variant (sampling branch still compiled but params greedy)
    st3 = init_batched_state(cfg, b, jax.random.PRNGKey(3))
    for slot in range(b):
        st3 = insert_request(cfg, st3, slot, kv_k, kv_v, 64, False, 1.0, 0,
                             1.0, 1.0)
    st3 = run(st3)
    t0 = time.perf_counter()
    run(st3)
    dt_g = time.perf_counter() - t0
    print(f"greedy params: {(dt_g-0.033)/steps*1e3:.3f} ms/step", flush=True)


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform, flush=True)
    main()
