"""Device mesh runtime.

TPU-native replacement for the reference's two-backend graph scheduler
(src/tts_model.cpp:53-67): instead of splitting a ggml graph across
{Metal, CPU}, we lay out a jax.sharding.Mesh over the chips and annotate
weight/activation shardings; XLA GSPMD inserts the collectives (psum /
all-gather / reduce-scatter) over ICI.

Axes:
  dp — data/request parallelism (continuous batching across replicas)
  tp — tensor parallelism (attention heads / MLP / LM heads)
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(tp: Optional[int] = None, dp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if tp is None:
        tp = len(devices) // dp
    if tp * dp > len(devices):
        raise ValueError(f"mesh {dp}x{tp} needs {dp*tp} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def shard(mesh: Mesh, x, spec: P):
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))
