"""Quantized TP decode (parallel/tp_megastep) — 8-virtual-device mesh tests.

Sharded-vs-unsharded parity on Q4 weights for both TP layouts (megatron
head-split + weight-gather with layer-ahead all-gather), against the
single-device megastep reference. Addresses SURVEY §2.8 (TP for the AR
decoders + comm/compute overlap) on the path that actually serves traffic.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tts_tpu.ops.parler_megastep import (parler_megastep_reference,
                                         prep_mega_layers)
from tts_tpu.parallel.mesh import make_mesh
from tts_tpu.parallel.tp_megastep import (megastep_tp, megastep_weight_gather,
                                          prep_tp_layers, shard_mega_gather,
                                          shard_tp_layers)


@pytest.fixture(scope="module")
def q4_setup():
    from bench import build_q4_parler
    rng = np.random.default_rng(3)
    cfg, w = build_q4_parler(rng, n_layers=2, hidden=256, heads=8, ffn=512,
                             enc_len=32, max_ctx=128)
    mega, qtype = prep_mega_layers(w.layers)
    L, H, nh, d = (cfg.n_layers, cfg.hidden_size, cfg.n_attn_heads,
                   cfg.head_size)
    kv = rng.standard_normal((2, L, nh, 128, d)).astype(np.float32) * 0.3
    x = rng.standard_normal((1, H)).astype(np.float32) * 0.5
    return cfg, w, mega, qtype, jnp.asarray(kv[0]), jnp.asarray(kv[1]), \
        jnp.asarray(x)


@pytest.mark.parametrize("tp", [2, 4, 8])
def test_megatron_tp_matches_unsharded(q4_setup, tp):
    cfg, w, mega, qtype, kv_k, kv_v, x = q4_setup
    pos = jnp.int32(41)
    want_x, want_k, want_v = parler_megastep_reference(
        mega, x, kv_k, kv_v, pos, qtype=qtype, use_cross=True,
        n_heads=cfg.n_attn_heads)

    mesh = make_mesh(tp=tp, dp=1)
    tpl, qt2 = prep_tp_layers(w.layers, tp)
    assert qt2 == qtype
    tpl = shard_tp_layers(tpl, mesh)
    got_x, got_k, got_v = megastep_tp(
        tpl, x, kv_k, kv_v, pos, mesh=mesh, qtype=qtype, use_cross=True,
        n_heads=cfg.n_attn_heads)
    # tolerance floor: the unsharded reference rounds dequantized weights to
    # bf16 (megastep kernel math) while the TP path's quant_matmul
    # dequantizes at f32 HIGHEST -- a documented ~2^-9 weight-rounding
    # difference, far below the Q4 quantization noise (~2%%)
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x),
                               atol=4e-3)
    np.testing.assert_allclose(np.asarray(got_k), np.asarray(want_k),
                               atol=4e-3)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               atol=4e-3)


def test_weight_gather_tp_matches_unsharded(q4_setup):
    cfg, w, mega, qtype, kv_k, kv_v, x = q4_setup
    pos = jnp.int32(77)
    want_x, want_k, want_v = parler_megastep_reference(
        mega, x, kv_k, kv_v, pos, qtype=qtype, use_cross=True,
        n_heads=cfg.n_attn_heads)

    mesh = make_mesh(tp=8, dp=1)
    mega_sh = shard_mega_gather(mega, mesh)
    got_x, got_k, got_v = megastep_weight_gather(
        mega_sh, x, kv_k, kv_v, pos, mesh=mesh, qtype=qtype, use_cross=True,
        n_heads=cfg.n_attn_heads)
    # gathered weights are bit-identical to the unsharded ones -> exact
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_k), np.asarray(want_k),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=1e-6, atol=1e-6)


def test_megatron_tp_multi_step_greedy_consistency(q4_setup):
    """Run 4 TP decode steps with cache writes; compare the evolving
    activation against the unsharded reference at every step."""
    cfg, w, mega, qtype, kv_k, kv_v, x = q4_setup
    L, nh, d = cfg.n_layers, cfg.n_attn_heads, cfg.head_size
    mesh = make_mesh(tp=4, dp=1)
    tpl, _ = prep_tp_layers(w.layers, 4)
    tpl = shard_tp_layers(tpl, mesh)
    kv_k_r, kv_v_r = kv_k, kv_v
    kv_k_t, kv_v_t = kv_k, kv_v
    xr = xt = x
    for step in range(4):
        pos = jnp.int32(40 + step)
        xr, kr, vr = parler_megastep_reference(
            mega, xr, kv_k_r, kv_v_r, pos, qtype=qtype, use_cross=True,
            n_heads=nh)
        xt, kt, vt = megastep_tp(
            tpl, xt, kv_k_t, kv_v_t, pos, mesh=mesh, qtype=qtype,
            use_cross=True, n_heads=nh)
        np.testing.assert_allclose(np.asarray(xt), np.asarray(xr),
                                   atol=8e-3)
        for kv, kn in ((kv_k_r, kr), (kv_v_r, vr)):
            pass
        upd = lambda kv, kn: jax.lax.dynamic_update_slice(
            kv, kn.reshape(L, nh, 1, d), (0, 0, 40 + step, 0))
        kv_k_r, kv_v_r = upd(kv_k_r, kr), upd(kv_v_r, vr)
        kv_k_t, kv_v_t = upd(kv_k_t, kt), upd(kv_v_t, vt)
