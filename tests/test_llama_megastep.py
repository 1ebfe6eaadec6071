"""Fused llama decode megastep (ops/llama_megastep) — CPU tests.

On CPU `llama_megastep` dispatches to the XLA reference (same bf16
block-dequant math as the Pallas kernel; the kernel itself is checked
against this reference on the chip by tools/test_megastep_tpu.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tts_tpu.gguf import quants
from tts_tpu.models.orpheus.model import (OrpheusConfig, OrpheusLayer,
                                          OrpheusState, OrpheusWeights,
                                          _llama_step, maybe_prep_llama_mega,
                                          orpheus_decode_chunk)
from tts_tpu.ops import sampling
from tts_tpu.ops.llama_megastep import (llama_megastep_reference,
                                        prep_llama_mega)
from tts_tpu.ops.quant_matmul import QuantTensor
from tts_tpu.ops.linear import stack_weights


def tiny_q4_llama(rng, L=2, H=256, heads=4, kv=2, F=512, vocab=64, ctx=128):
    cfg = OrpheusConfig(vocab_size=vocab, n_attn_heads=heads, n_kv_heads=kv,
                        head_size=H // heads, hidden_size=H, n_layers=L,
                        max_context_length=ctx, stopping_token_id=10 ** 9,
                        rope_theta=500000.0)

    def q4(n, k):
        w = rng.standard_normal((n, k)).astype(np.float32) * 0.05
        raw = quants.quantize(w, quants.GGML_TYPE_Q4_0)
        codes, scales = quants.unpack_planar(raw, quants.GGML_TYPE_Q4_0,
                                             (n, k))
        return QuantTensor.from_planar(codes, scales, quants.GGML_TYPE_Q4_0)

    def f32(*s, scale=0.05):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * scale)

    KV = kv * (H // heads)
    layers = OrpheusLayer(
        in_norm=f32(L, H) + 1,
        q=stack_weights([q4(H, H) for _ in range(L)]),
        k=stack_weights([q4(KV, H) for _ in range(L)]),
        v=stack_weights([q4(KV, H) for _ in range(L)]),
        o=stack_weights([q4(H, H) for _ in range(L)]),
        post_norm=f32(L, H) + 1,
        gate=stack_weights([q4(F, H) for _ in range(L)]),
        up=stack_weights([q4(F, H) for _ in range(L)]),
        down=stack_weights([q4(H, F) for _ in range(L)]))
    w = OrpheusWeights(
        embd=f32(vocab, H),
        layers=layers,
        out_norm=f32(H) + 1,
        head=q4(vocab, H),
        rope_freqs=jnp.ones((H // heads // 2,)) * 1.25)
    return cfg, w


def test_llama_megastep_reference_matches_f32_step(rng):
    cfg, w = tiny_q4_llama(rng)
    mega, qtype = prep_llama_mega(w.layers)
    L, H, nkv, d = (cfg.n_layers, cfg.hidden_size, cfg.n_kv_heads,
                    cfg.head_size)
    ctx = cfg.max_context_length
    kv = rng.standard_normal((2, L, nkv, ctx, d)).astype(np.float32) * 0.3
    kv_k, kv_v = jnp.asarray(kv[0]), jnp.asarray(kv[1])
    x = jnp.asarray(rng.standard_normal((1, H)).astype(np.float32)) * 0.5
    pos = 41

    xo, kn, vn = llama_megastep_reference(
        mega, x, kv_k, kv_v, jnp.int32(pos), qtype=qtype,
        n_heads=cfg.n_attn_heads, n_kv=nkv, rope_base=cfg.rope_theta,
        rope_freq_factors=w.rope_freqs)

    # f32 path: _llama_step masks rows > pos (inclusive of the current
    # token, which it first writes into the cache at `pos`)
    j = jnp.arange(ctx)[None, :]
    bias = jnp.where(j <= pos, 0.0, -jnp.inf)
    xf, kk, vv = _llama_step(cfg, w, x, jnp.asarray([pos]), kv_k, kv_v,
                             jnp.int32(pos), bias)
    # _llama_step applies the final out_norm; undo by comparing pre-norm:
    # recompute the reference's final norm instead
    from tts_tpu.models.orpheus.model import _rms
    xo_n = _rms(xo, w.out_norm)
    rel = np.abs(np.asarray(xo_n) - np.asarray(xf)).max() / \
        (np.abs(np.asarray(xf)).max() + 1e-9)
    # bf16 weight dequant vs f32 dequant: well under the Q4 noise floor
    assert rel < 1e-2, rel
    k_written = np.asarray(kk)[:, :, pos, :].reshape(L, nkv * d)
    krel = np.abs(np.asarray(kn) - k_written).max() / \
        (np.abs(k_written).max() + 1e-9)
    assert krel < 1e-2, krel


def test_orpheus_decode_chunk_mega_greedy_parity(rng, monkeypatch):
    monkeypatch.setenv("TTS_TPU_MEGAKERNEL", "1")
    cfg, w = tiny_q4_llama(rng)
    mega, qtype = maybe_prep_llama_mega(cfg, w)
    assert mega is not None
    L, nkv, d, ctx = (cfg.n_layers, cfg.n_kv_heads, cfg.head_size,
                      cfg.max_context_length)
    kv_k = jnp.zeros((L, nkv, ctx, d))
    kv_v = jnp.zeros((L, nkv, ctx, d))
    from tts_tpu.models.orpheus.model import orpheus_prefill
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, 16).astype(np.int32))
    logits, kv_k, kv_v = orpheus_prefill(cfg, w, toks, jnp.int32(16),
                                         kv_k, kv_v)
    first = jnp.argmax(logits).astype(jnp.int32)

    def init():
        return OrpheusState(
            kv_k=kv_k, kv_v=kv_v, pos=jnp.int32(16), token_in=first,
            n_out=jnp.int32(1), done=jnp.asarray(False),
            out_tokens=jnp.zeros((64,), jnp.int32).at[0].set(first),
            sampler_state=sampling.init_state(1), key=jax.random.PRNGKey(0))

    st_m = orpheus_decode_chunk(cfg, w, init(), n_steps=12, max_steps=64,
                                do_sample=False, mega=mega, mega_qtype=qtype)
    st_f = orpheus_decode_chunk(cfg, w, init(), n_steps=12, max_steps=64,
                                do_sample=False)
    a = np.asarray(st_m.out_tokens[:13])
    b = np.asarray(st_f.out_tokens[:13])
    agree = (a == b).mean()
    assert agree > 0.7, (agree, a, b)


def test_maybe_prep_llama_mega_gates(rng, monkeypatch):
    cfg, w = tiny_q4_llama(rng)
    monkeypatch.delenv("TTS_TPU_MEGAKERNEL", raising=False)
    mega, _ = maybe_prep_llama_mega(cfg, w)
    assert mega is None  # CPU default off
    monkeypatch.setenv("TTS_TPU_MEGAKERNEL", "1")
    mega, _ = maybe_prep_llama_mega(cfg, w)
    assert mega is not None
    dense_layers = w.layers._replace(
        q=jnp.zeros((cfg.n_layers, cfg.hidden_size, cfg.hidden_size)))
    mega, _ = maybe_prep_llama_mega(cfg, w._replace(layers=dense_layers))
    assert mega is None
