"""End-to-end conditional prompt: tiny T5 GGUF re-encodes the voice prompt
and rebuilds the Parler cross K/V (reference update_conditional_prompt)."""
import numpy as np
import pytest

from tests.test_e2e_parler import make_tiny_parler_gguf
from tts_tpu.common import GenerationConfig
from tts_tpu.convert import write_t5_gguf
from tts_tpu.models.registry import runner_from_file


def make_tiny_t5_gguf(path, rng, hidden=32, out_size=32):
    r = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.3
    t = {}
    L = 2
    for l in range(L):
        b = f"t5encoder.enc.blk.{l}."
        t[b + "attn_norm"] = r(hidden) * 0.1 + 1
        t[b + "attn_q"] = r(hidden, hidden)
        t[b + "attn_k"] = r(hidden, hidden)
        t[b + "attn_v"] = r(hidden, hidden)
        t[b + "attn_o"] = r(hidden, hidden)
        if l == 0:
            t[b + "attn_rel_b"] = r(32, 4)
        t[b + "ffn_norm"] = r(hidden) * 0.1 + 1
        t[b + "ffn_up"] = r(2 * hidden, hidden)
        t[b + "ffn_gate"] = r(2 * hidden, hidden)
        t[b + "ffn_down"] = r(hidden, 2 * hidden)
    t["t5encoder.token_embd"] = r(40, hidden)
    t["t5encoder.enc.final_layer_norm"] = r(hidden) * 0.1 + 1
    t["t5encoder.down_proj"] = r(out_size, hidden)
    t["t5encoder.down_proj_bias"] = r(out_size)
    tokens = ["<pad>", "</s>", "<unk>", " ", "calm", "voice", "fast"]
    scores = [-10.0, -1.0, -10.0, -1.0, -2.0, -2.0, -2.0]
    write_t5_gguf(path, hidden_size=hidden, n_layers=L, n_attn_heads=4,
                  vocab_size=40, output_size=out_size, tensors=t,
                  tokenizer_tokens=tokens, tokenizer_scores=scores)


def test_update_conditional_prompt(tmp_path, rng):
    model_path = str(tmp_path / "parler.gguf")
    t5_path = str(tmp_path / "t5.gguf")
    make_tiny_parler_gguf(model_path, rng)
    make_tiny_t5_gguf(t5_path, rng)

    runner = runner_from_file(model_path)
    cfg = GenerationConfig(sample=False, seed=0)
    codes_before = runner.generate_codes("hello world", cfg)
    old_enc_len = runner.cfg.n_encode_length

    runner.update_conditional_prompt(t5_path, "calm voice")
    assert runner.cfg.n_encode_length != 0
    # cross K/V actually changed shape/content to the new prompt length
    new_k = runner.weights.layers.cross_k
    assert new_k.shape[2] == runner.cfg.n_encode_length
    codes_after = runner.generate_codes("hello world", cfg)
    # a different conditioning prompt generally changes the token stream
    assert codes_before.shape != codes_after.shape or \
        not np.array_equal(codes_before, codes_after)
