"""Megatron-TP llama (Orpheus) decode step parity on a virtual CPU mesh.

Sharded-vs-unsharded: llama_megastep_tp over tp=2/4 must match the
single-device llama megastep reference (bf16-dequant differences bounded by
loose tolerances; a head-mapping or psum bug produces gross errors).
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tts_tpu.gguf import quants
from tts_tpu.models.orpheus.model import OrpheusLayer
from tts_tpu.ops.llama_megastep import (llama_megastep_reference,
                                        prep_llama_mega, _inv_freq_row)
from tts_tpu.ops.quant_matmul import QuantTensor
from tts_tpu.parallel.llama_tp import (llama_megastep_tp, prep_llama_tp,
                                       shard_llama_tp)

# K-row shards of Q4 scales must contain whole 32-row blocks, so the
# K-sharded projections (o: K=NH*D, down: K=F) need K/tp % 32 == 0
L, H, NH, NKV, D, F = 2, 256, 8, 4, 32, 256
CTX = 16


def q4(rng, n, k, layers):
    cs, ss = [], []
    for l in range(layers):
        w = rng.standard_normal((n, k)).astype(np.float32) * 0.05
        raw = quants.quantize(w, quants.GGML_TYPE_Q4_0)
        codes, scales = quants.unpack_planar(raw, quants.GGML_TYPE_Q4_0,
                                             (n, k))
        cs.append(np.ascontiguousarray(codes.T))
        ss.append(np.ascontiguousarray(scales.T.astype(np.float32)))
    return QuantTensor(jnp.asarray(np.stack(cs)), jnp.asarray(np.stack(ss)),
                       quants.GGML_TYPE_Q4_0)


@pytest.fixture(scope="module")
def tiny_layers():
    rng = np.random.default_rng(3)
    layers = OrpheusLayer(
        in_norm=jnp.ones((L, H)),
        q=q4(rng, NH * D, H, L), k=q4(rng, NKV * D, H, L),
        v=q4(rng, NKV * D, H, L), o=q4(rng, H, NH * D, L),
        post_norm=jnp.ones((L, H)),
        gate=q4(rng, F, H, L), up=q4(rng, F, H, L), down=q4(rng, H, F, L))
    x = jnp.asarray(rng.standard_normal((1, H)), jnp.float32)
    kv_k = jnp.asarray(rng.standard_normal((L, NKV, CTX, D)),
                       jnp.float32) * 0.3
    kv_v = jnp.asarray(rng.standard_normal((L, NKV, CTX, D)),
                       jnp.float32) * 0.3
    return layers, x, kv_k, kv_v


@pytest.mark.parametrize("tp", [2, 4])
def test_llama_tp_matches_reference(tiny_layers, tp):
    layers, x, kv_k, kv_v = tiny_layers
    if len(jax.devices()) < tp:
        pytest.skip("not enough devices")
    mesh = Mesh(np.array(jax.devices()[:tp]), ("tp",))
    mega, qtype = prep_llama_mega(layers)
    pos = jnp.int32(5)
    ref_x, ref_k, ref_v = llama_megastep_reference(
        mega, x, kv_k, kv_v, pos, qtype=qtype, n_heads=NH, n_kv=NKV,
        rope_base=10000.0)
    tpl, qtype2 = prep_llama_tp(layers, tp, n_heads=NH, n_kv=NKV, head_d=D)
    assert qtype2 == qtype
    tpl = shard_llama_tp(tpl, mesh)
    inv = _inv_freq_row(D, 10000.0, None)
    got_x, got_k, got_v = llama_megastep_tp(
        tpl, x, kv_k, kv_v, pos, inv, mesh=mesh, qtype=qtype, n_heads=NH,
        n_kv=NKV, rope_base=10000.0)
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(ref_x),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got_k), np.asarray(ref_k),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(ref_v),
                               rtol=2e-2, atol=2e-2)


def test_llama_tp_kv_head_order(tiny_layers):
    """Device-major kv packing: gathered k_new rows must be the kv heads in
    global order (a wrong split silently permutes the KV cache)."""
    layers, x, kv_k, kv_v = tiny_layers
    if len(jax.devices()) < 2:
        pytest.skip("not enough devices")
    tp = 2
    mesh = Mesh(np.array(jax.devices()[:tp]), ("tp",))
    tpl, qtype = prep_llama_tp(layers, tp, n_heads=NH, n_kv=NKV, head_d=D)
    tpl = shard_llama_tp(tpl, mesh)
    inv = _inv_freq_row(D, 10000.0, None)
    _, got_k, _ = llama_megastep_tp(
        tpl, x, kv_k, kv_v, jnp.int32(0), inv, mesh=mesh, qtype=qtype,
        n_heads=NH, n_kv=NKV, rope_base=10000.0)
    mega, _ = prep_llama_mega(layers)
    _, ref_k, _ = llama_megastep_reference(
        mega, x, kv_k, kv_v, jnp.int32(0), qtype=qtype, n_heads=NH,
        n_kv=NKV, rope_base=10000.0)
    got = np.asarray(got_k).reshape(L, NKV, D)
    ref = np.asarray(ref_k).reshape(L, NKV, D)
    for h in range(NKV):
        np.testing.assert_allclose(got[:, h], ref[:, h], rtol=2e-2,
                                   atol=2e-2)
