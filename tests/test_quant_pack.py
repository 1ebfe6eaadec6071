"""Q4_0 nibble packing: exactness of pack/unpack and parity of every
consumer path (QuantTensor matmul/dense/take_rows, megastep prep + reference,
llama megastep reference) between packed and unpacked codes.

Packing is a pure bit rearrangement (2 codes/byte along K), so all
comparisons are EXACT — any mismatch is a real bug, not tolerance noise.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.gguf import quants
from tts_tpu.ops.quant_matmul import (QuantTensor, pack_codes_t,
                                      unpack_codes_t, quant_matmul_xla)


def _qt(rng, n, k):
    w = rng.standard_normal((n, k)).astype(np.float32) * 0.1
    raw = quants.quantize(w, quants.GGML_TYPE_Q4_0)
    codes, scales = quants.unpack_planar(raw, quants.GGML_TYPE_Q4_0, (n, k))
    return QuantTensor.from_planar(codes, scales, quants.GGML_TYPE_Q4_0)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    qt = _qt(rng, 64, 128)
    packed = pack_codes_t(qt.codes_t)
    assert packed.shape == (64, 64)
    up = unpack_codes_t(packed, 128)
    assert jnp.all(up == qt.codes_t.astype(jnp.int32))


def test_pack_unpack_all_nibble_values():
    # exhaustive byte patterns incl. sign-extension-sensitive high nibbles
    codes = jnp.asarray(
        np.tile(np.arange(16, dtype=np.int8), 16).reshape(2, 128).T)
    packed = pack_codes_t(codes)
    up = unpack_codes_t(packed, 128)
    assert jnp.all(up == codes.astype(jnp.int32))


def test_quanttensor_pack_parity():
    rng = np.random.default_rng(1)
    qt = _qt(rng, 256, 128)
    qp = qt.pack()
    assert qp.is_packed and not qt.is_packed
    assert qp.shape == qt.shape == (256, 128)
    assert qp.pack() is qp  # idempotent
    x = jnp.asarray(rng.standard_normal((5, 128)).astype(np.float32))
    assert jnp.all(qt.matmul(x) == qp.matmul(x))
    assert jnp.all(qt.dense() == qp.dense())
    ids = jnp.asarray([0, 3, 255, 17])
    assert jnp.all(qt.take_rows(ids) == qp.take_rows(ids))


def test_pack_noop_q8():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((32, 64)).astype(np.float32) * 0.1
    raw = quants.quantize(w, quants.GGML_TYPE_Q8_0)
    codes, scales = quants.unpack_planar(raw, quants.GGML_TYPE_Q8_0, (32, 64))
    qt = QuantTensor.from_planar(codes, scales, quants.GGML_TYPE_Q8_0)
    assert qt.pack() is qt


def test_quant_matmul_xla_packed():
    rng = np.random.default_rng(3)
    qt = _qt(rng, 128, 64)
    qp = qt.pack()
    x = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    a = quant_matmul_xla(x, qt.codes_t, qt.scales_t, qt.qtype)
    b = quant_matmul_xla(x, qp.codes_t, qp.scales_t, qp.qtype)
    assert jnp.all(a == b)


def test_megastep_prep_packs_q4():
    from bench import build_q4_parler
    from tts_tpu.ops.parler_megastep import (prep_mega_layers,
                                             parler_megastep_reference)
    rng = np.random.default_rng(4)
    cfg, w = build_q4_parler(rng, n_layers=2, hidden=128, heads=4, ffn=256,
                             enc_len=16, max_ctx=64)
    mega, qtype = prep_mega_layers(w.layers)
    H = cfg.hidden_size
    assert mega.qkv_codes.shape == (2, H // 2, 3 * H)   # packed
    assert mega.fc2_codes.shape == (2, 256 // 2, H)
    # prep is idempotent w.r.t. packing: feeding packed QuantTensors is what
    # build_q4_parler does (its q4() packs), so re-derive from unpacked ones
    from tts_tpu.ops.linear import stack_weights

    def unpack_qt(m):
        if isinstance(m, QuantTensor) and m.is_packed:
            k = m.shape[1]
            return QuantTensor(
                unpack_codes_t(m.codes_t, k).astype(jnp.int8),
                m.scales_t, m.qtype)
        return m

    layers_u = jax.tree_util.tree_map(
        unpack_qt, w.layers,
        is_leaf=lambda x: isinstance(x, QuantTensor))
    mega_u, _ = prep_mega_layers(layers_u)
    assert mega_u.qkv_codes.shape == mega.qkv_codes.shape
    assert jnp.all(mega_u.qkv_codes == mega.qkv_codes)

    # reference forward identical through packed prep vs hand-unpacked mega
    mega_unpacked = mega._replace(
        qkv_codes=unpack_codes_t(mega.qkv_codes, H).astype(jnp.int8),
        occ_codes=unpack_codes_t(mega.occ_codes, H).astype(jnp.int8),
        fc1_codes=unpack_codes_t(mega.fc1_codes, H).astype(jnp.int8),
        fc2_codes=unpack_codes_t(mega.fc2_codes, 256).astype(jnp.int8))
    shape = (2, cfg.n_attn_heads, 64, cfg.head_size)
    kv = jnp.zeros(shape, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((1, H)).astype(np.float32))
    kw = dict(qtype=qtype, use_cross=True, n_heads=cfg.n_attn_heads)
    xo_p, kn_p, vn_p = parler_megastep_reference(mega, x, kv, kv,
                                                 jnp.int32(0), **kw)
    xo_u, kn_u, vn_u = parler_megastep_reference(mega_unpacked, x, kv, kv,
                                                 jnp.int32(0), **kw)
    # same values, but XLA may split the post-unpack dot differently ->
    # f32 accumulation-order ULPs; tight tolerance, not bitwise
    np.testing.assert_allclose(np.asarray(xo_p), np.asarray(xo_u),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(kn_p), np.asarray(kn_u),
                               rtol=1e-5, atol=1e-5)


def test_llama_megastep_prep_packs_q4():
    from bench import build_q4_orpheus
    from tts_tpu.models.orpheus.model import OrpheusConfig
    from tts_tpu.ops.llama_megastep import (prep_llama_mega,
                                            llama_megastep_reference)
    # tiny llama-shaped stack via the bench device builder pattern
    from bench import _q4_dev
    from tts_tpu.models.orpheus.model import OrpheusLayer

    L, H, F, KV = 2, 128, 256, 64
    key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 12))
    layers = OrpheusLayer(
        in_norm=jnp.ones((L, H)),
        q=_q4_dev(next(ks), H, H, L), k=_q4_dev(next(ks), KV, H, L),
        v=_q4_dev(next(ks), KV, H, L), o=_q4_dev(next(ks), H, H, L),
        post_norm=jnp.ones((L, H)),
        gate=_q4_dev(next(ks), F, H, L), up=_q4_dev(next(ks), F, H, L),
        down=_q4_dev(next(ks), H, F, L))
    mega, qtype = prep_llama_mega(layers)
    assert mega.qkv_codes.shape == (L, H // 2, H + 2 * KV)  # stays packed
    assert mega.down_codes.shape == (L, F // 2, H)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, H)).astype(np.float32))
    kv = jnp.zeros((L, 2, 32, 32), jnp.bfloat16)  # 2 kv heads, d=32
    xo, kn, vn = llama_megastep_reference(
        mega, x, kv, kv, jnp.int32(0), qtype=qtype, n_heads=4, n_kv=2,
        rope_base=10000.0)
    assert np.isfinite(np.asarray(xo)).all()
    assert xo.shape == (1, H)
