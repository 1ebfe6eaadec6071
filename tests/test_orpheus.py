"""Orpheus + SNAC tests on tiny random models."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tts_tpu.models.codec.dac import (CodecLayerWeights, QuantizeLayerWeights,
                                      ResidualUnitWeights)
from tts_tpu.models.codec.snac import SNACConfig, SNACRunner, SNACWeights, snac_decode
from tts_tpu.models.orpheus.model import (
    HEAD_MAP, OrpheusConfig, OrpheusLayer, OrpheusWeights, orpheus_prefill,
    orpheus_generate_tokens, prepare_output_tokens,
)
from tts_tpu.ops.linear import stack_weights


def _r(rng, *s, scale=0.3):
    return jnp.asarray(rng.standard_normal(s).astype(np.float32) * scale)


def make_orpheus(rng):
    cfg = OrpheusConfig(
        vocab_size=64, n_attn_heads=4, n_kv_heads=2, head_size=8,
        max_context_length=32, max_generation_size=21, stopping_token_id=60,
        hidden_size=16, n_layers=2)
    L, H = cfg.n_layers, cfg.hidden_size
    lw = OrpheusLayer(
        in_norm=_r(rng, L, H) * 0.1 + 1,
        q=_r(rng, L, 32, H), k=_r(rng, L, 16, H), v=_r(rng, L, 16, H),
        o=_r(rng, L, H, 32),
        post_norm=_r(rng, L, H) * 0.1 + 1,
        gate=_r(rng, L, 2 * H, H), up=_r(rng, L, 2 * H, H),
        down=_r(rng, L, H, 2 * H),
    )
    w = OrpheusWeights(
        embd=_r(rng, cfg.vocab_size, H),
        layers=lw,
        out_norm=_r(rng, H) * 0.1 + 1,
        head=_r(rng, cfg.vocab_size, H),
        rope_freqs=jnp.ones(cfg.head_size // 2),
    )
    return cfg, w


def test_orpheus_greedy_matches_stepwise(rng):
    """Prefill+loop greedy decode == naive per-token full recompute."""
    cfg, w = make_orpheus(rng)
    ids = [5, 9, 3]
    p = 8
    toks = np.zeros(p, np.int32)
    toks[: len(ids)] = ids
    ctx = 64
    shape = (cfg.n_layers, cfg.n_kv_heads, ctx, cfg.head_size)
    kv_k = jnp.zeros(shape); kv_v = jnp.zeros(shape)
    logits, kv_k, kv_v = orpheus_prefill(cfg, w, jnp.asarray(toks),
                                         jnp.int32(len(ids)), kv_k, kv_v)
    first = jnp.argmax(logits).astype(jnp.int32)
    out, n_out = orpheus_generate_tokens(
        cfg, w, first, jnp.int32(len(ids)), kv_k, kv_v,
        jax.random.PRNGKey(0), max_steps=6, do_sample=False)
    got = np.asarray(out)[: int(n_out)]

    # naive reference: recompute the full sequence each step (no cache)
    seq = list(ids)
    ref = []
    for _ in range(int(n_out)):
        pb = 32
        tk = np.zeros(pb, np.int32)
        tk[: len(seq)] = seq
        kv0 = jnp.zeros((cfg.n_layers, cfg.n_kv_heads, 40, cfg.head_size))
        lg, _, _ = orpheus_prefill(cfg, w, jnp.asarray(tk),
                                   jnp.int32(len(seq)), kv0, jnp.zeros_like(kv0))
        t = int(np.argmax(np.asarray(lg)))
        ref.append(t)
        seq.append(t)
    np.testing.assert_array_equal(got, ref)


def test_orpheus_stops_on_stop_token(rng):
    cfg, w = make_orpheus(rng)
    toks = np.zeros(8, np.int32)
    toks[:2] = [1, 2]
    shape = (cfg.n_layers, cfg.n_kv_heads, 40, cfg.head_size)
    logits, kv_k, kv_v = orpheus_prefill(cfg, w, jnp.asarray(toks),
                                         jnp.int32(2), jnp.zeros(shape),
                                         jnp.zeros(shape))
    first = jnp.argmax(logits).astype(jnp.int32)
    # declare whatever greedy emits first to be the stopping token: the loop
    # must then terminate immediately with a single output
    import dataclasses
    cfg2 = dataclasses.replace(cfg, stopping_token_id=int(first))
    out, n_out = orpheus_generate_tokens(
        cfg2, w, first, jnp.int32(2), kv_k, kv_v, jax.random.PRNGKey(0),
        max_steps=10, do_sample=False)
    assert int(n_out) == 1
    assert int(np.asarray(out)[0]) == int(first)


def test_prepare_output_tokens_redistribution():
    # two groups of 7
    base = 128266
    out = np.array([base + 0 + (i % 7) * 4096 + (gi * 10 + i)
                    for gi in range(2) for i in range(7)], np.int64)
    heads = prepare_output_tokens(out, len(out))
    assert len(heads[0]) == 2      # 1 per group
    assert len(heads[1]) == 4      # 2 per group
    assert len(heads[2]) == 8      # 4 per group
    # head assignment follows HEAD_MAP with offsets undone
    assert heads[0] == [0, 10]
    assert heads[1] == [1, 4, 11, 14]
    assert heads[2] == [2, 3, 5, 6, 12, 13, 15, 16]


def make_tiny_snac(rng):
    cfg = SNACConfig(n_layers=2, n_heads=3, up_sampling_factor=8,
                     embd=8, repeats=(4, 2, 1), noise_steps=(4, 8),
                     strides=(4, 2), paddings=(2, 1), groupings=(1, 2))
    ch = [8, 6, 4]
    quantizers = [QuantizeLayerWeights(codebook=_r(rng, 10, 4),
                                       out_w=_r(rng, 8, 4, 1), out_b=_r(rng, 8))
                  for _ in range(3)]
    layers = []
    for i in range(2):
        cin, cout = ch[i], ch[i + 1]
        groups = cfg.groupings[i]
        units = [ResidualUnitWeights(
            in_alpha=jnp.abs(_r(rng, cout, 1)) + 0.5,
            in_w=_r(rng, cout, 1 if groups > 1 else cout, 7), in_b=_r(rng, cout),
            out_alpha=jnp.abs(_r(rng, cout, 1)) + 0.5,
            out_w=_r(rng, cout, cout, 1), out_b=_r(rng, cout),
        ) for _ in range(3)]
        layers.append(CodecLayerWeights(
            alpha=jnp.abs(_r(rng, cin, 1)) + 0.5,
            up_w=_r(rng, cin, cout, 2 * cfg.strides[i]), up_b=_r(rng, cout),
            noise_w=_r(rng, cout, cout, 1),
            units=units))
    w = SNACWeights(
        quantizers=quantizers,
        in_w=_r(rng, 8, 1, 7), in_b=_r(rng, 8),
        up_w=_r(rng, 8, 8, 1), up_b=_r(rng, 8),
        layers=layers,
        final_alpha=jnp.abs(_r(rng, 4, 1)) + 0.5,
        out_w=_r(rng, 1, 4, 7), out_b=_r(rng, 1),
    )
    return cfg, w


def test_snac_decode_shapes(rng):
    cfg, w = make_tiny_snac(rng)
    t = 8
    fine = jnp.asarray(rng.integers(0, 10, t).astype(np.int32))
    mid = jnp.asarray(rng.integers(0, 10, t // 2).astype(np.int32))
    coarse = jnp.asarray(rng.integers(0, 10, t // 4).astype(np.int32))
    noise = jnp.asarray(rng.standard_normal(sum(cfg.noise_steps) * t).astype(np.float32))
    wav = snac_decode(cfg, w, fine, mid, coarse, noise)
    assert wav.shape == (t * 8,)
    assert np.abs(np.asarray(wav)).max() > 0


def test_snac_runner_bucket_equals_exact(rng):
    cfg, w = make_tiny_snac(rng)
    runner = SNACRunner(cfg, w, buckets=(16,))
    t = 8
    fine = rng.integers(0, 10, t).astype(np.int32).tolist()
    mid = rng.integers(0, 10, t // 2).astype(np.int32).tolist()
    coarse = rng.integers(0, 10, t // 4).astype(np.int32).tolist()
    wav = runner.decode([coarse, mid, fine], seed=7)
    assert wav.shape == (t * 8,)
