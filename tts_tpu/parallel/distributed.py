"""Multi-host runtime helpers.

The reference is single-node only — its notion of scale-out is N full model
replicas on server threads (reference examples/server/server.cpp:885-897).
The TPU framework scales across hosts with `jax.distributed`: one process
per host joins a coordinator, `jax.devices()` becomes the global chip list,
and a single (dp, tp) mesh spans the slice — dp laid out across hosts (each
host feeds the request slots that live on its chips, so batch traffic stays
host-local) and tp within a host so tensor-parallel collectives ride ICI,
never DCN.

Single-process use degenerates cleanly: `init_distributed()` is a no-op
when no coordinator/world size is configured, and `serving_mesh` falls back
to the process-local devices.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

_initialized = False


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids: Optional[Sequence[int]] = None) -> bool:
    """Join (or skip) the jax.distributed world.

    Arguments default from the standard env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID), which the TPU runtime sets
    automatically on real pods. Returns True if a multi-process world was
    initialized, False for the single-process fallback.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1 or not coordinator_address:
        return False
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id,
        local_device_ids=local_device_ids)
    _initialized = True
    return True


def serving_mesh(tp: Optional[int] = None,
                 devices: Optional[Sequence] = None) -> Mesh:
    """Global (dp, tp) mesh for batched serving.

    tp defaults to the per-host chip count (so tensor-parallel collectives
    stay on ICI); dp = total_chips / tp spans hosts over DCN. Device order
    is arranged host-major so each dp row is one host's chips.
    """
    devices = list(devices if devices is not None else jax.devices())
    if tp is None:
        tp = max(1, jax.local_device_count()) if devices is None else \
            _local_count(devices)
        tp = min(tp, len(devices))
    if len(devices) % tp:
        raise ValueError(f"{len(devices)} devices not divisible by tp={tp}")
    dp = len(devices) // tp
    # host-major ordering: sort by (process_index, id) so each dp row is
    # a single host's chips and tp collectives never cross DCN
    devices = sorted(devices, key=lambda d: (getattr(d, "process_index", 0),
                                             d.id))
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def _local_count(devices) -> int:
    me = jax.process_index()
    n = sum(1 for d in devices if getattr(d, "process_index", 0) == me)
    return n or len(devices)


def host_slot_range(n_slots_total: int) -> range:
    """Which continuous-batching slots this host owns: the dp axis is split
    evenly over processes, so each host submits/prefills only its share and
    the global batched step runs SPMD over all of them."""
    n_proc = jax.process_count()
    per = n_slots_total // n_proc
    lo = jax.process_index() * per
    hi = n_slots_total if jax.process_index() == n_proc - 1 else lo + per
    return range(lo, hi)
