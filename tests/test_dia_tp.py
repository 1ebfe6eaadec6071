"""Megatron-TP Dia CFG decode parity on a virtual CPU mesh (tp=2/4)."""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tts_tpu.gguf import quants
from tts_tpu.models.dia.model import DiaConfig, DiaDecoderLayer
from tts_tpu.ops.dia_megastep import (dia_megastep_reference, prep_dia_cross,
                                      prep_dia_mega)
from tts_tpu.ops.quant_matmul import QuantTensor
from tts_tpu.parallel.dia_tp import (dia_megastep_tp, prep_dia_tp,
                                     shard_dia_cross, shard_dia_tp)

L, H, NH, NKV, D, F = 2, 256, 8, 4, 32, 256
TC = 64
CTX = 16


def q4(rng, n, k, layers):
    cs, ss = [], []
    for _ in range(layers):
        w = rng.standard_normal((n, k)).astype(np.float32) * 0.05
        raw = quants.quantize(w, quants.GGML_TYPE_Q4_0)
        codes, scales = quants.unpack_planar(raw, quants.GGML_TYPE_Q4_0,
                                             (n, k))
        cs.append(np.ascontiguousarray(codes.T))
        ss.append(np.ascontiguousarray(scales.T.astype(np.float32)))
    return QuantTensor(jnp.asarray(np.stack(cs)), jnp.asarray(np.stack(ss)),
                       quants.GGML_TYPE_Q4_0)


@pytest.fixture(scope="module")
def tiny():
    rng = np.random.default_rng(7)
    qh = NH * D
    dec = DiaDecoderLayer(
        sa_norm=jnp.ones((L, H)),
        self_q=q4(rng, qh, H, L), self_k=q4(rng, NKV * D, H, L),
        self_v=q4(rng, NKV * D, H, L), self_o=q4(rng, H, qh, L),
        ca_norm=jnp.ones((L, H)),
        cross_q=q4(rng, qh, H, L), cross_k=q4(rng, qh, 64, L),
        cross_v=q4(rng, qh, 64, L), cross_o=q4(rng, H, qh, L),
        mlp_norm=jnp.ones((L, H)),
        gate=q4(rng, F, H, L), up=q4(rng, F, H, L), wo=q4(rng, H, F, L))
    x = jnp.asarray(rng.standard_normal((2, H)), jnp.float32)
    kv_k = jnp.asarray(rng.standard_normal((L, 2, NKV, CTX, D)),
                       jnp.float32) * 0.3
    kv_v = jnp.asarray(rng.standard_normal((L, 2, NKV, CTX, D)),
                       jnp.float32) * 0.3
    ck = rng.standard_normal((L, 2, NH, TC, D)).astype(np.float32) * 0.3
    cv = rng.standard_normal((L, 2, NH, TC, D)).astype(np.float32) * 0.3
    ck[:, :, :, 11:, :] = 0.0
    return dec, x, kv_k, kv_v, jnp.asarray(ck), jnp.asarray(cv)


@pytest.mark.parametrize("tp", [2, 4])
def test_dia_tp_matches_reference(tiny, tp):
    dec, x, kv_k, kv_v, ck_full, cv_full = tiny
    if len(jax.devices()) < tp:
        pytest.skip("not enough devices")
    mesh = Mesh(np.array(jax.devices()[:tp]), ("tp",))
    ckb, cvb, vt, nt = prep_dia_cross(ck_full, cv_full, 11, buckets=(16, TC))
    assert nt == TC - 16
    mega, qtype = prep_dia_mega(dec)
    pos = jnp.int32(5)
    ref_x, ref_k, ref_v = dia_megastep_reference(
        mega, x, kv_k, kv_v, pos, ckb, cvb, vt, nt, qtype=qtype,
        n_heads=NH, n_kv=NKV)
    tpl, qtype2 = prep_dia_tp(dec, tp, n_heads=NH, n_kv=NKV, head_d=D)
    assert qtype2 == qtype
    tpl = shard_dia_tp(tpl, mesh)
    cks, cvs, vts = shard_dia_cross(ckb, cvb, vt, mesh)
    got_x, got_k, got_v = dia_megastep_tp(
        tpl, x, kv_k, kv_v, pos, cks, cvs, vts, nt, mesh=mesh, qtype=qtype,
        n_heads=NH, n_kv=NKV)
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(ref_x),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got_k),
                               np.asarray(ref_k).reshape(L, 2, NKV * D),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got_v),
                               np.asarray(ref_v).reshape(L, 2, NKV * D),
                               rtol=2e-2, atol=2e-2)
