"""T5 encoder golden test vs HuggingFace transformers on a tiny random model."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tts_tpu.models.t5.model import (
    T5Config, T5LayerWeights, T5Runner, T5Weights, reference_pos_buckets,
    t5_encode,
)
from tts_tpu.ops.linear import stack_weights


def tiny_hf_t5():
    from transformers import T5Config as HFT5Config, T5EncoderModel
    cfg = HFT5Config(
        vocab_size=50, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", is_encoder_decoder=False,
    )
    torch.manual_seed(0)
    return T5EncoderModel(cfg), cfg


def convert_weights(model, hf_cfg):
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    L = hf_cfg.num_layers
    lws = []
    for l in range(L):
        p = f"encoder.block.{l}."
        lws.append(T5LayerWeights(
            attn_norm=jnp.asarray(sd[p + "layer.0.layer_norm.weight"]),
            q=jnp.asarray(sd[p + "layer.0.SelfAttention.q.weight"]),
            k=jnp.asarray(sd[p + "layer.0.SelfAttention.k.weight"]),
            v=jnp.asarray(sd[p + "layer.0.SelfAttention.v.weight"]),
            o=jnp.asarray(sd[p + "layer.0.SelfAttention.o.weight"]),
            mlp_norm=jnp.asarray(sd[p + "layer.1.layer_norm.weight"]),
            wi_0=jnp.asarray(sd[p + "layer.1.DenseReluDense.wi_0.weight"]),
            wi_1=jnp.asarray(sd[p + "layer.1.DenseReluDense.wi_1.weight"]),
            wo=jnp.asarray(sd[p + "layer.1.DenseReluDense.wo.weight"]),
        ))
    layers = T5LayerWeights(*[stack_weights([getattr(lw, f) for lw in lws])
                              for f in T5LayerWeights._fields])
    return T5Weights(
        embd=jnp.asarray(sd["shared.weight"]),
        rel_bias=jnp.asarray(
            sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"]),
        layers=layers,
        out_norm=jnp.asarray(sd["encoder.final_layer_norm.weight"]),
        down_proj=None, down_proj_bias=None,
    )


def test_t5_matches_hf():
    model, hf_cfg = tiny_hf_t5()
    w = convert_weights(model, hf_cfg)
    cfg = T5Config(n_layers=2, n_attn_heads=4, hidden_size=32,
                   relative_attn_buckets=32, vocab_size=50, output_size=32)
    ids = np.array([3, 17, 42, 7, 1], np.int32)
    from tts_tpu.ops.attention import t5_relative_buckets
    pos = jnp.arange(5)
    buckets = t5_relative_buckets(pos, pos, 32, 128).astype(jnp.int32)
    out = np.asarray(t5_encode(cfg, w, jnp.asarray(ids), jnp.int32(5),
                               buckets))
    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(ids[None].astype(np.int64))
                    ).last_hidden_state[0].numpy()
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_t5_padding_invariance():
    model, hf_cfg = tiny_hf_t5()
    w = convert_weights(model, hf_cfg)
    cfg = T5Config(n_layers=2, n_attn_heads=4, hidden_size=32,
                   relative_attn_buckets=32, vocab_size=50, output_size=32)
    runner = T5Runner(cfg, w, tokenizer=None, buckets=(8, 16))
    ids = [3, 17, 42]
    short = runner.encode_tokens(ids)
    # longer bucket should produce the same valid prefix
    runner2 = T5Runner(cfg, w, tokenizer=None, buckets=(16,))
    long = runner2.encode_tokens(ids)
    np.testing.assert_allclose(short, long, atol=1e-5)


def test_reference_bucket_quirk():
    # integer-division quirk: distances 8..15 all collapse to bucket 8
    b = reference_pos_buckets(32, 32)
    # distance 12 (i=0, ii=12): HF would give 9; reference gives 8
    assert b[0, 12] == 8
    assert b[0, 8] == 8
    # distance 16 -> int(log(2)/log(16)*8) = 2 -> bucket 10
    assert b[0, 16] == 10
    # positive direction offset by n_buckets=16
    assert b[12, 0] == 16 + 8
