"""Time dac_decode at several buckets with proper D2H forcing (np.asarray,
not block_until_ready — unreliable on axon). Finds why the 64-frame bucket
costs ~420 ms when the 512-frame one costs ~87 ms."""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import bench
from tts_tpu.models.codec.dac import dac_decode


def main():
    dac_cfg, dac_w = bench.build_dac_44k(np.random.default_rng(3))
    rng = np.random.default_rng(5)
    for t in (64, 128, 256, 512):
        codes = jnp.asarray(rng.integers(0, 1024, (t, 9)).astype(np.int32))
        wav = dac_decode(dac_cfg, dac_w, codes, valid=jnp.int32(t - 3))
        float(np.asarray(wav).sum())
        best = 1e9
        for i in range(3):
            c2 = (codes + i + 1 + int(time.time()) % 97) % 1024
            t0 = time.perf_counter()
            wav = dac_decode(dac_cfg, dac_w, c2, valid=jnp.int32(t - 3))
            float(np.asarray(wav).sum())
            best = min(best, time.perf_counter() - t0 - 0.033)
        print(f"bucket {t:4d}: {best*1e3:8.1f} ms "
              f"({t * 512 / 44100 / best:6.1f}x RT)")


if __name__ == "__main__":
    main()
