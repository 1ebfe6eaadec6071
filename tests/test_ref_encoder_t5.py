"""Golden parity through the reference's T5 GGUF converter
(/root/reference/py-gguf/tts_encoders/t5_encoder_gguf_encoder.py), driven
unmodified over a tiny real-transformers T5 encoder. Verifies the file loads
through tts_tpu's `text_encoder_from_file` (the runtime conditional-prompt
path, reference t5/model.cpp:370-402), the tokenizer round-trips, and the
full encoder forward (incl. the 64->48 down-projection) matches torch.
"""
from __future__ import annotations

from types import SimpleNamespace

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from ref_encoder_common import import_tts_encoders, t5_encoder_model, \
    unigram_tokenizer

H, OUT = 64, 48


class _FakeParlerForT5(nn.Module):
    """Attribute surface T5Encoder reads: text_encoder (real HF T5),
    decoder.config.hidden_size, enc_to_dec_proj (since hidden != output)."""

    def __init__(self):
        super().__init__()
        self.text_encoder = t5_encoder_model(hidden=H)
        torch.manual_seed(3)
        self.enc_to_dec_proj = nn.Linear(H, OUT)
        self.decoder = SimpleNamespace(config=SimpleNamespace(hidden_size=OUT))


@pytest.fixture(scope="module")
def t5_gguf(tmp_path_factory):
    tts_encoders, _ = import_tts_encoders()
    path = tmp_path_factory.mktemp("refenc_t5") / "t5.gguf"
    enc = tts_encoders.T5Encoder(model_path=path, repo_id="tiny/fake-t5")
    model = _FakeParlerForT5().eval()
    enc._model = model
    enc._tokenizer = unigram_tokenizer()
    enc.write()
    return path, model, enc


def test_t5_encoder_file_metadata(t5_gguf):
    path, model, enc = t5_gguf
    from tts_tpu.gguf.reader import GGUFReader
    r = GGUFReader(str(path))
    md = r.metadata
    assert md["general.architecture"] == "t5encoder"
    assert md["t5encoder.embedding_length"] == H
    assert md["t5encoder.block_count"] == 2
    assert md["t5encoder.attention.head_count"] == 4
    assert md["t5encoder.output_size"] == OUT
    assert md["tokenizer.ggml.eos_token_id"] == 1
    # every tensor the reference encoder wrote is consumed by the loader
    from tts_tpu.models.t5.model import T5Config, load_t5_weights
    cfg = T5Config.from_gguf(r)
    w = load_t5_weights(r, cfg)
    consumed = {"t5encoder.token_embd", "t5encoder.enc.final_layer_norm",
                "t5encoder.down_proj", "t5encoder.down_proj_bias",
                "t5encoder.enc.blk.0.attn_rel_b"}
    for l in range(2):
        for part in ("attn_q", "attn_k", "attn_v", "attn_o", "attn_norm",
                     "ffn_up", "ffn_gate", "ffn_down", "ffn_norm"):
            consumed.add(f"t5encoder.enc.blk.{l}.{part}")
    assert set(r.tensors) == consumed


def test_t5_encoder_forward_parity(t5_gguf):
    """tts_tpu encoding of the GGUF == torch T5 forward + down-proj."""
    path, model, enc = t5_gguf
    from tts_tpu.models.t5.model import text_encoder_from_file
    runner = text_encoder_from_file(str(path))
    text = "female voice a calm"
    ids_hf = enc._tokenizer(text, return_tensors="pt").input_ids
    # tts_tpu's unigram tokenizer (from tokenizer.ggml.*) must agree with
    # the HF tokenizers-lib Unigram it was written from (+ trailing EOS=1,
    # add_eos_token=True)
    got_ids = runner.tokenizer.tokenize(text) + [1]
    assert got_ids == ids_hf[0].tolist() + [1]
    with torch.no_grad():
        hs = model.text_encoder(input_ids=torch.tensor([got_ids])
                                ).last_hidden_state[0]
        want = model.enc_to_dec_proj(hs)
    got = np.asarray(runner.generate(text))
    np.testing.assert_allclose(got, want.numpy(), rtol=2e-4, atol=2e-4)
