"""2-process jax.distributed world over localhost (CPU mesh simulation).

Proves the DCN-shaped path in parallel/distributed.py: two processes with 4
virtual CPU devices each join a coordinator, build serving_mesh(tp=4)
(host-major: each dp row is one host's devices), split batch slots with
host_slot_range, and run one SPMD batched decode chunk whose greedy tokens
must match a single-process run of the identical program.
"""
from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys, json
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, %(repo)r)
sys.path.insert(0, %(repo)r + "/tests")
import jax
jax.config.update("jax_platforms", "cpu")
pid, port = int(sys.argv[1]), sys.argv[2]
import numpy as np
from tts_tpu.parallel.distributed import (init_distributed, serving_mesh,
                                          host_slot_range)
ok = init_distributed("127.0.0.1:" + port, 2, pid)
assert ok, "init_distributed fell back to single-process"
assert jax.process_count() == 2
assert jax.device_count() == 8 and jax.local_device_count() == 4
mesh = serving_mesh(tp=4)
assert dict(mesh.shape) == {"dp": 2, "tp": 4}, mesh.shape
row = mesh.devices[jax.process_index()]
assert all(d.process_index == jax.process_index() for d in row.ravel()), \
    "dp rows must be host-major (tp collectives on one host)"
want_slots = [0, 1] if pid == 0 else [2, 3]
assert list(host_slot_range(4)) == want_slots

import __graft_entry__ as g
import jax.numpy as jnp
from tts_tpu.parallel.sharding import (shard_batched_state,
                                       shard_parler_weights)
from tts_tpu.runtime.batched_parler import (batched_decode_chunk,
                                            init_batched_state,
                                            insert_request)
cfg, weights = g._tiny_parler(dict(
    n_attn_heads=8, hidden_size=64, output_vocab_size=32,
    eos_token_id=10 ** 9, bos_token_id=31))
weights = shard_parler_weights(weights, mesh)
st = init_batched_state(cfg, 4, jax.random.PRNGKey(0))
rngk = np.random.default_rng(1)
kv = jnp.asarray(rngk.standard_normal(
    (cfg.n_layers, cfg.n_attn_heads, cfg.max_ctx_length,
     cfg.head_size)).astype(np.float32) * 0.1)
for slot in range(4):
    st = insert_request(cfg, st, slot, kv, kv, 4, False, 1.0, 0, 1.0, 1.0)
st = shard_batched_state(st, mesh)
with mesh:
    st = batched_decode_chunk(cfg, weights, st, n_steps=3)
from jax.experimental import multihost_utils
toks = multihost_utils.process_allgather(st.out_tokens[:, :3, :],
                                         tiled=True)
print("TOKENS " + json.dumps(np.asarray(toks).reshape(-1).tolist()))
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_spmd_decode(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": REPO})
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)
    tok_lines = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("TOKENS ")]
        assert line, out
        tok_lines.append(json.loads(line[0][len("TOKENS "):]))
    # both processes observe the same global result
    assert tok_lines[0] == tok_lines[1]

    # ground truth: the identical program single-process (8 local devices)
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as g
    from tts_tpu.parallel.distributed import serving_mesh
    from tts_tpu.parallel.sharding import (shard_batched_state,
                                           shard_parler_weights)
    from tts_tpu.runtime.batched_parler import (batched_decode_chunk,
                                                init_batched_state,
                                                insert_request)
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = serving_mesh(tp=4)
    cfg, weights = g._tiny_parler(dict(
        n_attn_heads=8, hidden_size=64, output_vocab_size=32,
        eos_token_id=10 ** 9, bos_token_id=31))
    weights = shard_parler_weights(weights, mesh)
    st = init_batched_state(cfg, 4, jax.random.PRNGKey(0))
    rngk = np.random.default_rng(1)
    kv = jnp.asarray(rngk.standard_normal(
        (cfg.n_layers, cfg.n_attn_heads, cfg.max_ctx_length,
         cfg.head_size)).astype(np.float32) * 0.1)
    for slot in range(4):
        st = insert_request(cfg, st, slot, kv, kv, 4, False, 1.0, 0, 1.0, 1.0)
    st = shard_batched_state(st, mesh)
    with mesh:
        st = batched_decode_chunk(cfg, weights, st, n_steps=3)
    want = np.asarray(st.out_tokens[:, :3, :]).reshape(-1).tolist()
    assert tok_lines[0] == want
