"""Multi-chip sharding: the TP decode step and the dp x tp batched decode
chunk must compile and run on the virtual 8-device CPU mesh, and sharded
results must match unsharded single-device results exactly."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from __graft_entry__ import _dryrun_dp_tp, _tiny_parler, dryrun_multichip
from tts_tpu.parallel.mesh import make_mesh
from tts_tpu.parallel.sharding import (shard_batched_state,
                                       shard_parler_weights)
from tts_tpu.runtime.batched_parler import (batched_decode_chunk,
                                            init_batched_state,
                                            insert_request)


def test_dryrun_multichip_8():
    dryrun_multichip(8)


def test_dp_tp_matches_unsharded():
    """Greedy batched decode over a 2x4 mesh == unsharded, token-exact."""
    n_dev = len(jax.devices())
    if n_dev < 8:
        pytest.skip("needs 8 virtual devices")
    cfg, weights = _tiny_parler(dict(
        n_attn_heads=8, hidden_size=64, output_vocab_size=32,
        eos_token_id=10 ** 9, bos_token_id=31))
    rng = np.random.default_rng(3)
    shape = (cfg.n_layers, cfg.n_attn_heads, cfg.max_ctx_length,
             cfg.head_size)
    kv = jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.1)

    def run(mesh):
        b = 4
        st = init_batched_state(cfg, b, jax.random.PRNGKey(0))
        for slot in range(b):
            st = insert_request(cfg, st, slot, kv, kv, 4,
                                False, 1.0, 0, 1.0, 1.0)
        w = weights
        if mesh is not None:
            w = shard_parler_weights(weights, mesh)
            st = shard_batched_state(st, mesh)
            with mesh:
                st = batched_decode_chunk(cfg, w, st, n_steps=6)
        else:
            st = batched_decode_chunk(cfg, w, st, n_steps=6)
        return np.asarray(st.out_tokens)

    ref = run(None)
    got = run(make_mesh(tp=4, dp=2))
    np.testing.assert_array_equal(got, ref)


def test_dryrun_dp_tp_entry():
    _dryrun_dp_tp(8)


def test_sharded_dac_decode_exact(rng):
    """Sequence-parallel DAC decode (frame axis over 4 shards, halo
    exchange) must equal the single-device decode bit-for-bit."""
    from jax.sharding import Mesh
    from tests.test_dac import make_tiny_dac
    from tts_tpu.models.codec.dac import dac_decode
    from tts_tpu.parallel.seq_vocoder import sharded_dac_decode

    cfg, w = make_tiny_dac(rng)
    t = 50
    codes = jnp.asarray(rng.integers(0, 12, (t, cfg.n_heads)).astype(np.int32))
    full = np.asarray(dac_decode(cfg, w, codes))

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
    # tiny strides (4,2) give a proportionally larger receptive field in
    # input frames than the real 512x model; 24 covers it
    got = np.asarray(sharded_dac_decode(cfg, w, codes, mesh, margin=24))
    assert got.shape == full.shape
    np.testing.assert_array_equal(got, full)


def test_distributed_single_process_fallback(monkeypatch):
    from tts_tpu.parallel import distributed as dist
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert dist.init_distributed() is False  # no coordinator -> no-op

    mesh = dist.serving_mesh(tp=4)
    assert mesh.axis_names == ("dp", "tp")
    assert mesh.devices.shape == (len(jax.devices()) // 4, 4)

    slots = dist.host_slot_range(8)
    assert list(slots) == list(range(8))  # single process owns all slots
