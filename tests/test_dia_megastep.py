"""Parity tests for the fused Dia CFG decode megastep (ops/dia_megastep).

On CPU `dia_megastep` dispatches to `dia_megastep_reference` (same math as
the TPU kernel: bf16 block dequant, analytic softmax folds, cross-attention
pad-tail correction), so these tests cover the integrated decode path the
TPU runs. Reference hot loop: /root/reference/src/models/dia/model.cpp:697-721.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.gguf import quants
from tts_tpu.models.dia.model import (DiaConfig, DiaDecoderLayer, DiaWeights,
                                      DiaEncoderLayer, _dia_decoder_step,
                                      _dia_init_state, _dia_mega_logits,
                                      dia_decode_chunk)
from tts_tpu.ops.dia_megastep import (dia_megastep, prep_dia_cross,
                                      prep_dia_mega)
from tts_tpu.ops.quant_matmul import QuantTensor


def tiny_cfg():
    return DiaConfig(
        n_encoder_layers=1, n_decoder_layers=2,
        encoder_hidden_size=128, decoder_hidden_size=256,
        decoder_attn_heads=4, decoder_query_heads=2, head_size=64,
        output_vocab_size=256, max_generation_size=32,
        max_encoder_context_length=64)


def q4(rng, n, k, layers=None):
    shape = (n, k) if layers is None else (layers, n, k)
    w = rng.standard_normal(shape).astype(np.float32) * 0.05
    if layers is None:
        raw = quants.quantize(w, quants.GGML_TYPE_Q4_0)
        codes, scales = quants.unpack_planar(raw, quants.GGML_TYPE_Q4_0, (n, k))
        return QuantTensor.from_planar(codes, scales, quants.GGML_TYPE_Q4_0)
    cs, ss = [], []
    for l in range(layers):
        raw = quants.quantize(w[l], quants.GGML_TYPE_Q4_0)
        codes, scales = quants.unpack_planar(raw, quants.GGML_TYPE_Q4_0, (n, k))
        cs.append(np.ascontiguousarray(codes.T))
        ss.append(np.ascontiguousarray(scales.T.astype(np.float32)))
    return QuantTensor(jnp.asarray(np.stack(cs)), jnp.asarray(np.stack(ss)),
                       quants.GGML_TYPE_Q4_0)


def tiny_weights(cfg, seed=0):
    rng = np.random.default_rng(seed)
    L, H = cfg.n_decoder_layers, cfg.decoder_hidden_size
    QH = cfg.decoder_attn_heads * cfg.head_size
    KVH = cfg.n_kv_heads * cfg.head_size
    F = 512
    dec = DiaDecoderLayer(
        sa_norm=jnp.ones((L, H)),
        self_q=q4(rng, QH, H, L), self_k=q4(rng, KVH, H, L),
        self_v=q4(rng, KVH, H, L), self_o=q4(rng, H, QH, L),
        ca_norm=jnp.ones((L, H)),
        cross_q=q4(rng, QH, H, L), cross_k=q4(rng, QH, 128, L),
        cross_v=q4(rng, QH, 128, L), cross_o=q4(rng, H, QH, L),
        mlp_norm=jnp.ones((L, H)),
        gate=q4(rng, F, H, L), up=q4(rng, F, H, L), wo=q4(rng, H, F, L))
    enc = DiaEncoderLayer(
        sa_norm=jnp.ones((1, 128)), q=q4(rng, 128, 128, 1),
        k=q4(rng, 128, 128, 1), v=q4(rng, 128, 128, 1), o=q4(rng, 128, 128, 1),
        mlp_norm=jnp.ones((1, 128)), gate=q4(rng, 256, 128, 1),
        up=q4(rng, 256, 128, 1), wo=q4(rng, 128, 256, 1))
    return DiaWeights(
        enc_embedding=jnp.asarray(
            rng.standard_normal((64, 128)).astype(np.float32)) * 0.05,
        enc_layers=enc, enc_norm=jnp.ones((128,)),
        dec_embds=jnp.asarray(rng.standard_normal(
            (cfg.n_output_heads, cfg.output_vocab_size + 4, H))
            .astype(np.float32)) * 0.05,
        dec_layers=dec, dec_norm=jnp.ones((H,)),
        heads=q4(rng, cfg.n_output_heads * cfg.output_vocab_size, H))


def fake_cross(cfg, seed=1, sentence_len=11):
    """(L, 2, heads, Tc, D) cross K/V with K rows past the prompt zeroed,
    mimicking dia_encode's cache semantics."""
    rng = np.random.default_rng(seed)
    L, nh, d = cfg.n_decoder_layers, cfg.decoder_attn_heads, cfg.head_size
    tc = cfg.max_encoder_context_length
    ck = rng.standard_normal((L, 2, nh, tc, d)).astype(np.float32) * 0.3
    cv = rng.standard_normal((L, 2, nh, tc, d)).astype(np.float32) * 0.3
    ck[:, :, :, sentence_len:, :] = 0.0
    return jnp.asarray(ck), jnp.asarray(cv)


def test_cross_tail_fold_exact():
    """Bucketed cross-KV + analytic tail == full-window attention."""
    cfg = tiny_cfg()
    w = tiny_weights(cfg)
    mega, qtype = prep_dia_mega(w.dec_layers)
    ck, cv = fake_cross(cfg, sentence_len=11)
    tc = cfg.max_encoder_context_length
    # full window: Sb == Tc, no tail
    ckf, cvf, vt0, nt0 = prep_dia_cross(ck, cv, tc, buckets=(tc,))
    assert nt0 == 0
    # bucketed: Sb == 16 < Tc, tail folded analytically
    ckb, cvb, vt, nt = prep_dia_cross(ck, cv, 11, buckets=(16, tc))
    assert nt == tc - 16
    L, nkv, d = cfg.n_decoder_layers, cfg.n_kv_heads, cfg.head_size
    kv = jnp.zeros((L, 2, nkv, 8, d))
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 256)),
                    jnp.float32)
    args = dict(qtype=qtype, n_heads=cfg.decoder_attn_heads, n_kv=nkv)
    xf, _, _ = dia_megastep(mega, x, kv, kv, jnp.int32(0), ckf, cvf, vt0, 0,
                            **args)
    xb, _, _ = dia_megastep(mega, x, kv, kv, jnp.int32(0), ckb, cvb, vt, nt,
                            **args)
    # the fold sums tail V rows in f32 while the full window reads them as
    # bf16 rows — differences are bf16 V rounding (~2^-8 relative), not
    # tail-fold math errors
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xb),
                               rtol=2e-2, atol=2e-2)


def test_megastep_matches_per_matmul_step():
    """Fused step logits ~= the per-projection decode step (bf16 dequant is
    the documented divergence -> loose tolerance)."""
    cfg = tiny_cfg()
    w = tiny_weights(cfg)
    mega, qtype = prep_dia_mega(w.dec_layers)
    ck, cv = fake_cross(cfg, sentence_len=9)
    ckb, cvb, vt, nt = prep_dia_cross(ck, cv, 9, buckets=(16,))
    L, nkv, d = cfg.n_decoder_layers, cfg.n_kv_heads, cfg.head_size
    rng = np.random.default_rng(5)
    kv_k = jnp.asarray(rng.standard_normal((L, 2, nkv, 8, d)), jnp.float32) * 0.3
    kv_v = jnp.asarray(rng.standard_normal((L, 2, nkv, 8, d)), jnp.float32) * 0.3
    toks = jnp.asarray(rng.integers(0, 200, cfg.n_output_heads), jnp.int32)
    pos = jnp.int32(3)
    ref_logits, ref_k, ref_v = _dia_decoder_step(cfg, w, ck, cv, toks, pos,
                                                 kv_k, kv_v)
    got_logits, got_k, got_v = _dia_mega_logits(
        cfg, w, mega, qtype, toks, pos, kv_k, kv_v, ckb, cvb, vt, nt)
    # CFG merge (cond + 3*(cond-uncond)) amplifies bf16 scale/weight
    # rounding by ~4x on the logits
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               rtol=0.1, atol=0.12)
    np.testing.assert_allclose(np.asarray(got_k), np.asarray(ref_k),
                               rtol=0.05, atol=0.02)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(ref_v),
                               rtol=0.05, atol=0.02)


def test_decode_chunk_mega_runs_and_tracks():
    """Chunked decode with the fused path advances identically (greedy, same
    argmax with margin) to the per-matmul path on a few steps."""
    cfg = tiny_cfg()
    w = tiny_weights(cfg)
    mega, qtype = prep_dia_mega(w.dec_layers)
    ck, cv = fake_cross(cfg, sentence_len=9)
    ckb, cvb, vt, nt = prep_dia_cross(ck, cv, 9, buckets=(16,))
    st0 = _dia_init_state(cfg, jax.random.PRNGKey(0), cfg.max_generation_size)
    base = dict(n_steps=6, max_steps=cfg.max_generation_size, do_sample=False)
    st_ref = dia_decode_chunk(cfg, w, ck, cv, st0, **base)
    st_mega = dia_decode_chunk(cfg, w, ckb, cvb, st0, mega=mega,
                               mega_qtype=qtype, vtail=vt, n_tail=nt, **base)
    assert int(st_mega.pos) == int(st_ref.pos)
    ref_t = np.asarray(st_ref.out_tokens[:6])
    got_t = np.asarray(st_mega.out_tokens[:6])
    # greedy argmax can flip on bf16-rounding near-ties; demand near-total
    # agreement rather than exact
    agree = (ref_t == got_t).mean()
    assert agree >= 0.8, (agree, ref_t, got_t)


def test_runner_pads_quantized_heads():
    """DiaRunner pads a 1028-vocab quantized head stack to 128-aligned
    columns and still emits only valid tokens."""
    from tts_tpu.models.dia.model import DiaRunner
    cfg = tiny_cfg()
    cfg.output_vocab_size = 260                      # not 128-aligned
    w = tiny_weights(cfg)
    rng = np.random.default_rng(9)
    w = w._replace(heads=q4(rng, cfg.n_output_heads * 260, 256))
    runner = DiaRunner(cfg, w)
    h = runner.weights.heads
    assert h.shape[0] == cfg.n_output_heads * 512    # padded per head
    x = jnp.asarray(rng.standard_normal((1, 256)), jnp.float32)
    out = h.matmul(x)
    padded = np.asarray(out).reshape(cfg.n_output_heads, 512)
    np.testing.assert_allclose(padded[:, 260:], 0.0, atol=1e-6)
