"""Memory-regression harness.

Analog of the reference's only test (tests/aPaleBlueDot: generate and eyeball
/proc/self/status RSS): we assert that repeated generations do not grow host
RSS unboundedly (catching host-side leaks across jit dispatches).
"""
import os

import numpy as np
import pytest

from tts_tpu.common import GenerationConfig
from tts_tpu.models.registry import runner_from_file


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0


@pytest.mark.skipif(not os.path.exists("/proc/self/status"),
                    reason="procfs unavailable")
def test_repeated_generation_rss_stable(tmp_path, rng):
    from tests.test_e2e_parler import make_tiny_parler_gguf
    path = str(tmp_path / "tiny.gguf")
    make_tiny_parler_gguf(path, rng)
    runner = runner_from_file(path)
    cfg = GenerationConfig(sample=False, seed=0)
    runner.generate("hello world", cfg)  # compile + warm
    base = _rss_mb()
    for _ in range(10):
        runner.generate("hello world", cfg)
    growth = _rss_mb() - base
    # steady-state generations must not leak (allow jit-cache noise)
    assert growth < 256, f"RSS grew by {growth:.1f} MB over 10 generations"
