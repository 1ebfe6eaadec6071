"""Megakernel decode path (ops/parler_megastep) — CPU tests.

On CPU `parler_megastep` dispatches to the XLA reference, which implements
the SAME math as the pallas kernel (int8 per-row activation quant + per-32
block-scale epilogue); the TPU kernel itself is cross-checked against this
reference by tools/test_megastep_tpu.py and its correctness relative to the
f32 path is bounded here.
"""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tts_tpu.models.parler.model import (ParlerConfig, _layer_step,
                                         _parler_init_state,
                                         maybe_prep_mega,
                                         parler_decode_chunk, parler_prefill)
from tts_tpu.ops.parler_megastep import (parler_megastep_reference,
                                         prep_mega_layers)


def tiny_q4(rng):
    from bench import build_q4_parler
    cfg, w = build_q4_parler(rng, n_layers=2, hidden=256, heads=4, ffn=512,
                             enc_len=32, max_ctx=128)
    cfg.max_generation_size = 48
    return cfg, w


def test_megastep_reference_matches_f32_transformer(rng):
    cfg, w = tiny_q4(rng)
    mega, qtype = prep_mega_layers(w.layers)
    L, H = cfg.n_layers, cfg.hidden_size
    shape = (L, cfg.n_attn_heads, cfg.max_ctx_length, cfg.head_size)
    kv_k = jnp.asarray(rng.standard_normal(shape).astype(np.float32)) * 0.3
    kv_v = jnp.asarray(rng.standard_normal(shape).astype(np.float32)) * 0.3
    x = jnp.asarray(rng.standard_normal((1, H)).astype(np.float32)) * 0.5
    pos = 37

    xo, k_new, v_new = parler_megastep_reference(
        mega, x, kv_k, kv_v, jnp.int32(pos), qtype=qtype, use_cross=True,
        n_heads=cfg.n_attn_heads)

    def transformer_no_final(c):
        def body(cc, inp):
            lw, kk, vv = inp
            j = jnp.arange(shape[-2])[None, :]
            bias = jnp.where(j <= pos, 0.0, -jnp.inf)
            xo, kk, vv = _layer_step(cfg, lw, cc, kk, vv, jnp.int32(pos),
                                     bias, True)
            return xo, (kk, vv)
        return jax.lax.scan(body, c, (w.layers, kv_k, kv_v))

    xf, (kk2, _) = transformer_no_final(x)
    rel = np.abs(np.asarray(xo) - np.asarray(xf)).max() / \
        (np.abs(np.asarray(xf)).max() + 1e-9)
    # int8 per-row activation quant noise — must stay below the Q4 weight
    # noise floor (~2-3%)
    assert rel < 2e-2, rel
    k_written = np.asarray(kk2)[:, :, pos, :].reshape(L, H)
    krel = np.abs(np.asarray(k_new) - k_written).max() / \
        (np.abs(k_written).max() + 1e-9)
    assert krel < 5e-2, krel


def test_megastep_decode_chunk_integration(rng, monkeypatch):
    """Full decode chunk through the mega path (reference on CPU) — token
    streams should broadly agree with the f32 path under greedy decoding."""
    monkeypatch.setenv("TTS_TPU_MEGAKERNEL", "1")
    cfg, w = tiny_q4(rng)
    mega, qtype = maybe_prep_mega(cfg, w)
    assert mega is not None
    shape = (cfg.n_layers, cfg.n_attn_heads, cfg.max_ctx_length, cfg.head_size)
    toks = jnp.asarray(rng.integers(0, 900, 16).astype(np.int32))
    kv_k, kv_v = parler_prefill(cfg, w, toks, jnp.zeros(shape), jnp.zeros(shape))
    st0 = _parler_init_state(cfg, jnp.int32(16), kv_k, kv_v,
                             jax.random.PRNGKey(0))
    st_mega = parler_decode_chunk(cfg, w, st0, n_steps=12, do_sample=False,
                                  mega=mega, mega_qtype=qtype)
    st_f32 = parler_decode_chunk(cfg, w, st0, n_steps=12, do_sample=False)
    a = np.asarray(st_mega.out_tokens[:12])
    b = np.asarray(st_f32.out_tokens[:12])
    # greedy streams may diverge after an early flip; require strong
    # agreement on the first steps
    agree = (a == b).mean()
    assert agree > 0.7, (agree, a, b)
    assert int(st_mega.step) == 12


def test_maybe_prep_mega_gates(rng, monkeypatch):
    cfg, w = tiny_q4(rng)
    # CPU default: off
    monkeypatch.delenv("TTS_TPU_MEGAKERNEL", raising=False)
    mega, qt = maybe_prep_mega(cfg, w)
    assert mega is None
    # forced on (CPU -> reference dispatch)
    monkeypatch.setenv("TTS_TPU_MEGAKERNEL", "1")
    mega, qt = maybe_prep_mega(cfg, w)
    assert mega is not None
    # forced off
    monkeypatch.setenv("TTS_TPU_MEGAKERNEL", "0")
    mega, qt = maybe_prep_mega(cfg, w)
    assert mega is None
    # dense weights: no mega
    monkeypatch.setenv("TTS_TPU_MEGAKERNEL", "1")
    h = cfg.hidden_size
    dense_layers = w.layers._replace(
        q_w=jnp.zeros((cfg.n_layers, h, h), jnp.float32))
    mega, qt = maybe_prep_mega(cfg, w._replace(layers=dense_layers))
    assert mega is None
