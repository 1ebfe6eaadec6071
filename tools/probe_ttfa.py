"""Stage-by-stage timing of the Parler streaming TTFA path on the real chip.

Prints per-stage wall times for the exact sequence generate_stream runs:
tokenize / prefill dispatch+sync / first decode chunk / done-check D2H /
out_tokens D2H / adjust_output_tokens / DAC segment decode.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import bench
from bench import build_q4_parler, build_dac_44k, _BenchTok
from tts_tpu.common import GenerationConfig
from tts_tpu.models.codec.dac import DACRunner
from tts_tpu.models.parler.model import (ParlerRunner, parler_prefill,
                                         parler_decode_chunk,
                                         _parler_init_state,
                                         _parler_not_done_jit,
                                         adjust_output_tokens)


def main():
    rng = np.random.default_rng(0)
    cfg, weights = build_q4_parler(rng)
    cfg.max_generation_size = 512
    dac_cfg, dac_w = build_dac_44k(np.random.default_rng(3))
    dac = DACRunner(dac_cfg, dac_w, buckets=(64, 128, 256, 512, 1024))
    runner = ParlerRunner(cfg, weights, _BenchTok(), dac_runner=dac)
    text = "The quick brown fox jumps over the lazy dog near the river."

    # warm everything through the public API once
    g = runner.generate_stream(text, GenerationConfig(sample=True, top_k=50,
                                                      seed=0))
    next(g)
    g.close()

    for it in range(3):
        t = {}
        t0 = time.perf_counter()
        ids = runner.tokenizer.tokenize(text)
        ids.append(runner.tokenizer.eos_token)
        p = runner._bucket(len(ids))
        tokens = np.zeros((p,), np.int32)
        tokens[: len(ids)] = ids
        t["tokenize"] = time.perf_counter() - t0

        t1 = time.perf_counter()
        kv_k, kv_v = runner._empty_kv()
        t["empty_kv"] = time.perf_counter() - t1

        t1 = time.perf_counter()
        kv_k, kv_v = parler_prefill(cfg, runner.weights, jnp.asarray(tokens),
                                    kv_k, kv_v, use_cross=True)
        jax.block_until_ready(kv_k)
        t["prefill"] = time.perf_counter() - t1

        t1 = time.perf_counter()
        st = _parler_init_state(cfg, jnp.int32(len(ids)), kv_k, kv_v,
                                jax.random.PRNGKey(it + 1))
        st = parler_decode_chunk(cfg, runner.weights, st, n_steps=32,
                                 mega=runner._mega,
                                 mega_qtype=runner._mega_qtype,
                                 use_cross=True, do_sample=True, top_k=50)
        jax.block_until_ready(st.out_tokens)
        t["chunk32"] = time.perf_counter() - t1

        t1 = time.perf_counter()
        done = not bool(_parler_not_done_jit(cfg, st.step, st.eos_seen,
                                             st.pos))
        t["done_check"] = time.perf_counter() - t1

        t1 = time.perf_counter()
        n_steps = int(st.step)
        out = np.asarray(st.out_tokens)
        t["tokens_d2h"] = time.perf_counter() - t1

        t1 = time.perf_counter()
        codes = adjust_output_tokens(out, n_steps, cfg)
        t["adjust"] = time.perf_counter() - t1

        t1 = time.perf_counter()
        seg = dac.decode(codes[:16])
        np.asarray(seg)
        t["dac16"] = time.perf_counter() - t1

        total = sum(t.values())
        print(" ".join(f"{k}={v*1e3:.1f}ms" for k, v in t.items()),
              f"TOTAL={total*1e3:.1f}ms")


if __name__ == "__main__":
    main()
