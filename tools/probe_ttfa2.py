"""Stage timing for the FUSED streaming TTFA path (parler_stream_first):
where do ~600 ms go when the path is one dispatch + one small fetch + one
vocode round?"""
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
from tts_tpu.models.parler.model import (ParlerRunner, parler_stream_first,
                                         adjust_output_tokens)


def main():
    rng = np.random.default_rng(0)
    cfg, weights = build_q4_parler(rng)
    cfg.max_generation_size = 512
    dac_cfg, dac_w = build_dac_44k(np.random.default_rng(3))
    dac = DACRunner(dac_cfg, dac_w, buckets=(64, 128, 256, 512, 1024))
    runner = ParlerRunner(cfg, weights, _BenchTok(), dac_runner=dac)
    text = "The quick brown fox jumps over the lazy dog near the river."

    # warm
    g = runner.generate_stream(text, GenerationConfig(sample=True, top_k=50,
                                                      seed=0))
    next(g)
    g.close()

    gen_kw = dict(use_cross=True, do_sample=True, temperature=1.0, top_k=50,
                  top_p=1.0, repetition_penalty=1.0)
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
        tok_dev = jnp.asarray(tokens)
        pl_dev = jnp.int32(len(ids))
        sd_dev = jnp.int32(it + 1)
        t["h2d"] = time.perf_counter() - t1

        t1 = time.perf_counter()
        st, packed = parler_stream_first(
            cfg, runner.weights, tok_dev, pl_dev, sd_dev, n_steps=32,
            mega=runner._mega, mega_qtype=runner._mega_qtype, **gen_kw)
        t["dispatch"] = time.perf_counter() - t1

        t1 = time.perf_counter()
        packed_np = np.asarray(packed)
        t["fetch"] = time.perf_counter() - t1

        t1 = time.perf_counter()
        n_steps = int(packed_np[0, 1])
        codes = adjust_output_tokens(packed_np[1:], n_steps, cfg)
        t["adjust"] = time.perf_counter() - t1

        t1 = time.perf_counter()
        seg = dac.decode(codes[0:23])
        t["dac_dispatch"] = time.perf_counter() - t1
        t1 = time.perf_counter()
        np.asarray(seg)
        t["dac_fetch"] = time.perf_counter() - t1

        total = sum(t.values())
        print(" ".join(f"{k}={v*1e3:.1f}" for k, v in t.items()),
              f"TOTAL={total*1e3:.1f}ms", flush=True)


if __name__ == "__main__":
    main()
