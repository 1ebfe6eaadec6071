"""Tracing / profiling utilities.

The reference only has a wall-clock total-time printer (cli.cpp:11-22) —
SURVEY §5 calls for better: per-stage timers (phonemize / tokenize / encode /
decode-loop / vocode) and JAX profiler traces for op-level analysis.
"""
from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, List, Optional


class StageTimer:
    """Accumulating named stage timer.

        t = StageTimer()
        with t.stage("decode"):
            ...
        print(t.report())
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def stage(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - start
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def record(self, name: str, seconds: float) -> None:
        self.totals[name] = self.totals.get(name, 0.0) + seconds
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        total = time.perf_counter() - self._t0
        lines = [f"total: {total * 1000:.2f} ms"]
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            lines.append(f"  {name}: {t * 1000:.2f} ms "
                         f"(n={self.counts[name]}, {t / total * 100:.1f}%)")
        return "\n".join(lines)

    def as_json(self) -> str:
        return json.dumps({k: round(v * 1000, 3) for k, v in self.totals.items()})


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """JAX profiler trace scope; view with TensorBoard / xprof.

        with trace("/tmp/tts-trace"):
            runner.generate(...)
    """
    if log_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
