"""Flat-tile llama megastep (ops/llama_flat) — CPU tests.

The kernel runs in Pallas interpret mode off-TPU, so these tests execute
the REAL kernel logic (schedule, roles, accumulators, vectorized GQA
attention, in-stream LM head) against the phase-megastep XLA reference;
the on-chip run is covered by tools/test_megastep_tpu.py.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_llama_megastep import tiny_q4_llama

from tts_tpu.models.orpheus.model import (OrpheusState, _rms,
                                          maybe_prep_llama_flat,
                                          orpheus_decode_chunk,
                                          orpheus_prefill)
from tts_tpu.ops import sampling
from tts_tpu.ops.llama_flat import (LlamaFlatMega, M_ROLE, M_SID, R_ATTF,
                                    R_ATTP, build_schedule,
                                    llama_flat_megastep, prep_llama_flat)
from tts_tpu.ops.llama_megastep import (llama_megastep_reference,
                                        prep_llama_mega)
from tts_tpu.ops.quant_matmul import quant_matmul_xla


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_schedule_invariants():
    m = build_schedule(2, 256, 512, 512, 256, 256, 256, 4)
    role, sid = m[M_ROLE], m[M_SID]
    att = (role == R_ATTP) | (role == R_ATTF)
    # 4 page phases + 1 final per layer
    assert att.sum() == 2 * 5
    # sid advances by one exactly on weight tiles and stalls on attention
    d = np.diff(sid)
    assert (d[~att[:-1]] == 1).all()
    assert (d[att[:-1]] == 0).all()
    assert sid[0] == 0 and sid[-1] == (~att).sum() - 1


@pytest.mark.parametrize("ctx,pos,mode", [
    (128, 41, "fullk"), (1024, 700, "fullk"), (1024, 3, "fullk"),
    (128, 41, "whole"), (128, 41, "split")])
def test_flat_matches_phase_reference(rng, ctx, pos, mode):
    """All three tile modes (fullk default, k-sliced whole, K-split).
    ctx=1024 runs 2 flash pages (pick_page -> 512); pos=3 leaves page 1
    dead (clamped index map + skipped compute)."""
    cfg, w = tiny_q4_llama(rng, ctx=ctx)
    mega, qtype = prep_llama_mega(w.layers)
    flat = prep_llama_flat(mega, w.head, w.out_norm, qtype, cfg.vocab_size,
                           cfg.n_attn_heads, cfg.n_kv_heads, ctx, mode=mode)
    L, H, nkv, d = (cfg.n_layers, cfg.hidden_size, cfg.n_kv_heads,
                    cfg.head_size)
    kv = rng.standard_normal((2, L, nkv, ctx, d)).astype(np.float32) * 0.3
    kv_k, kv_v = jnp.asarray(kv[0]), jnp.asarray(kv[1])
    x = jnp.asarray(rng.standard_normal((1, H)).astype(np.float32)) * 0.5

    lg, kn, vn = llama_flat_megastep(
        flat, x, kv_k, kv_v, jnp.int32(pos), qtype=qtype,
        n_heads=cfg.n_attn_heads, n_kv=nkv, rope_base=cfg.rope_theta,
        rope_freq_factors=w.rope_freqs, interpret=True)
    assert lg.shape == (1, flat.vocab_pad)

    xo, kr, vr = llama_megastep_reference(
        mega, x, kv_k, kv_v, jnp.int32(pos), qtype=qtype,
        n_heads=cfg.n_attn_heads, n_kv=nkv, rope_base=cfg.rope_theta,
        rope_freq_factors=w.rope_freqs)
    h = _rms(xo, w.out_norm)
    lg_ref = quant_matmul_xla(h, w.head.codes_t, w.head.scales_t,
                              w.head.qtype)

    got = np.asarray(lg[0, : cfg.vocab_size])
    want = np.asarray(lg_ref[0])
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 2e-2, rel
    # padded logits lanes are exact partial sums of zero weights
    np.testing.assert_allclose(np.asarray(lg[0, cfg.vocab_size:]), 0.0)
    for a, b in ((kn, kr), (vn, vr)):
        r = np.abs(np.asarray(a) - np.asarray(b)).max() / \
            (np.abs(np.asarray(b)).max() + 1e-9)
        assert r < 1e-2, r


def test_flat_decode_chunk_greedy_parity(rng, monkeypatch):
    monkeypatch.setenv("TTS_TPU_MEGAKERNEL", "1")
    cfg, w = tiny_q4_llama(rng)
    flat, qtype = maybe_prep_llama_flat(cfg, w, ctx=cfg.max_context_length)
    assert isinstance(flat, LlamaFlatMega)
    L, nkv, d, ctx = (cfg.n_layers, cfg.n_kv_heads, cfg.head_size,
                      cfg.max_context_length)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, 16).astype(np.int32))
    logits, kv_k, kv_v = orpheus_prefill(cfg, w, toks, jnp.int32(16),
                                         jnp.zeros((L, nkv, ctx, d)),
                                         jnp.zeros((L, nkv, ctx, d)))
    first = jnp.argmax(logits).astype(jnp.int32)

    def init():
        return OrpheusState(
            kv_k=kv_k, kv_v=kv_v, pos=jnp.int32(16), token_in=first,
            n_out=jnp.int32(1), done=jnp.asarray(False),
            out_tokens=jnp.zeros((64,), jnp.int32).at[0].set(first),
            sampler_state=sampling.init_state(1), key=jax.random.PRNGKey(0))

    st_m = orpheus_decode_chunk(cfg, w, init(), n_steps=10, max_steps=64,
                                do_sample=False, mega=flat, mega_qtype=qtype)
    st_f = orpheus_decode_chunk(cfg, w, init(), n_steps=10, max_steps=64,
                                do_sample=False)
    a = np.asarray(st_m.out_tokens[:11])
    b = np.asarray(st_f.out_tokens[:11])
    agree = (a == b).mean()
    assert agree > 0.7, (agree, a, b)


def test_flat_batched_matches_per_slot_reference(rng):
    """Batched flat kernel (B=8 slots on the sublane rows, per-slot RoPE
    positions + per-slot KV pages, LM head in-stream) vs the per-slot XLA
    reference + head matmul. Positions straddle the 128-row page boundary
    and include an empty slot (pos=0, no history)."""
    from tts_tpu.ops.llama_flat import llama_flat_megastep_batched
    from tts_tpu.ops.llama_megastep import llama_megastep_batched_reference
    from test_llama_megastep import tiny_q4_llama as _tiny

    cfg, w = _tiny(rng, heads=2, kv=1, ctx=256)   # head_d = 128
    mega, qtype = prep_llama_mega(w.layers)
    ctx = 256
    flat = prep_llama_flat(mega, w.head, w.out_norm, qtype, cfg.vocab_size,
                           cfg.n_attn_heads, cfg.n_kv_heads, ctx,
                           mode="fullk", page=128)
    b = 8
    L, H, nkv, d = (cfg.n_layers, cfg.hidden_size, cfg.n_kv_heads,
                    cfg.head_size)
    kv = rng.standard_normal((2, L, b, nkv, ctx, d)).astype(np.float32) * 0.3
    kv_k, kv_v = jnp.asarray(kv[0]), jnp.asarray(kv[1])
    x = jnp.asarray(rng.standard_normal((b, H)).astype(np.float32)) * 0.5
    pos = jnp.asarray(np.array([3, 41, 127, 128, 129, 200, 255, 0],
                               np.int32))

    lg, kn, vn = llama_flat_megastep_batched(
        flat, x, kv_k, kv_v, pos, qtype=qtype, n_heads=cfg.n_attn_heads,
        n_kv=nkv, rope_base=cfg.rope_theta, rope_freq_factors=w.rope_freqs,
        interpret=True)
    assert lg.shape == (b, flat.vocab_pad)

    xo, kr, vr = llama_megastep_batched_reference(
        mega, x, kv_k, kv_v, pos, qtype=qtype, n_heads=cfg.n_attn_heads,
        n_kv=nkv, rope_base=cfg.rope_theta, rope_freq_factors=w.rope_freqs)
    h = _rms(xo, w.out_norm)
    lg_ref = quant_matmul_xla(h, w.head.codes_t, w.head.scales_t,
                              w.head.qtype)

    got = np.asarray(lg[:, : cfg.vocab_size])
    want = np.asarray(lg_ref)
    for s in range(b):
        rel = np.abs(got[s] - want[s]).max() / \
            (np.abs(want[s]).max() + 1e-9)
        assert rel < 2e-2, (s, rel)   # bf16 page dots
    np.testing.assert_allclose(np.asarray(lg[:, cfg.vocab_size:]), 0.0)
    for a, bref in ((kn, kr), (vn, vr)):
        r = np.abs(np.asarray(a) - np.asarray(bref)).max() / \
            (np.abs(np.asarray(bref)).max() + 1e-9)
        assert r < 1e-2, r


def test_batched_engine_uses_flat_and_matches(rng, monkeypatch):
    """The batched engine's decode chunk routes through the FLAT batched
    kernel (in-stream LM head) and matches the no-megakernel engine.

    Token equality is asserted on the FIRST step from pos=0 (no history
    pages -> the only bf16 rounding in the flat path never runs, so
    greedy argmax must agree exactly); later steps involve bf16 page
    dots whose ~0.5% logit deltas legitimately flip argmax on a random
    tiny model (kernel-level parity with tolerance is covered above), so
    they are checked structurally (pos/n_out advance, tokens in-vocab)."""
    monkeypatch.setenv("TTS_TPU_MEGAKERNEL", "1")
    from tts_tpu.runtime.batched_llama import (batched_llama_decode_chunk,
                                               init_batched_llama_state)
    from tts_tpu.models.orpheus.model import maybe_prep_llama_flat

    cfg, w = tiny_q4_llama(rng, heads=2, kv=1, ctx=64)
    # engine ctx formula (256-row pages)
    ctx = -(-(cfg.max_context_length + cfg.max_generation_size) // 256) * 256
    flat, qtype = maybe_prep_llama_flat(cfg, w, ctx=ctx, page=256)
    assert isinstance(flat, LlamaFlatMega) and flat.psz == 256
    toks = rng.integers(0, cfg.vocab_size, (8,)).astype(np.int32)

    def run(mega, qt, n_steps):
        st = init_batched_llama_state(cfg, 8, jax.random.PRNGKey(0))
        st = st._replace(token_in=jnp.asarray(toks),
                         active=jnp.ones((8,), bool))
        st = batched_llama_decode_chunk(cfg, w, st, n_steps=n_steps,
                                        mega=mega, mega_qtype=qt)
        return st

    got = run(flat, qtype, 1)
    want = run(None, None, 1)
    np.testing.assert_array_equal(np.asarray(got.out_tokens[:, 0]),
                                  np.asarray(want.out_tokens[:, 0]))

    st4 = run(flat, qtype, 4)
    assert np.asarray(st4.pos).tolist() == [4] * 8
    assert np.asarray(st4.n_out).tolist() == [4] * 8
    out = np.asarray(st4.out_tokens[:, :4])
    assert ((out >= 0) & (out < cfg.vocab_size)).all()
    np.testing.assert_array_equal(out[:, 0],
                                  np.asarray(want.out_tokens[:, 0]))


def test_engine_pads_batch_to_sublane_multiple(rng, monkeypatch):
    """n_slots that isn't a multiple of 8 still rides the batched flat
    kernel: the engine pads the compiled batch (padded slots inactive)
    while admission stays at n_slots."""
    monkeypatch.setenv("TTS_TPU_MEGAKERNEL", "1")
    from tts_tpu.common import GenerationConfig
    from tts_tpu.runtime.batched_llama import BatchedLlamaEngine

    import dataclasses
    cfg, w = tiny_q4_llama(rng, heads=2, kv=1, ctx=64)
    cfg = dataclasses.replace(cfg, max_generation_size=8)

    class Tok:
        def tokenize(self, text):
            return [1, 2, 3]

    eng = BatchedLlamaEngine(cfg, w, Tok(), n_slots=5, chunk=4)
    assert isinstance(eng.mega, LlamaFlatMega)
    assert eng.state.pos.shape[0] == 8 and eng.n_slots == 5
    rid = eng.submit("hi", GenerationConfig(sample=False))
    eng.run_until_done(max_chunks=4)
    assert rid in eng.results
