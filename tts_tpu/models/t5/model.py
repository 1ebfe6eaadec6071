"""T5 text encoder (flan-t5 variant) — TPU-native.

Used by Parler for runtime conditional prompts (reference
src/models/parler/t5/model.cpp). One jitted forward with bucketed sequence
length; the relative-position bias is computed on device.

Math parity (build_t5_graph, t5/model.cpp:216-298): RMS norm (eps 1e-6),
attention with NO 1/sqrt(d) scaling (softmax scale 1.0) + shared
relative-attention bias, gated-GELU MLP gelu(wi_0 x) * (wi_1 x), final norm,
optional down-projection (2048 -> decoder hidden) with bias.

NOTE on reference quirks (t5/model.cpp:308-317): the reference computes
buckets with C++ INTEGER division inside the log, and adds the direction
offset when query>key — the TRANSPOSE of the HF convention the weights were
trained with. We follow HF semantics (float division, offset when key>query)
because the checkpoints are HF-trained; `reference_pos_buckets` preserves
the reference's exact quirky formula for documentation/testing.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...gguf.reader import GGUFReader
from ...ops.linear import Weight, from_gguf_tensor, matmul, stack_weights, take_rows, dense
from ...text import UnigramTokenizer


@dataclasses.dataclass(eq=False)
class T5Config:
    """Defaults = flan-t5-xl-ish (t5/model.h:40-51)."""

    n_layers: int = 24
    n_attn_heads: int = 32
    hidden_size: int = 2048
    relative_attn_buckets: int = 32
    eos_token_id: int = 1
    bos_token_id: int = 0
    max_context_length: int = 512
    output_size: int = 1536
    vocab_size: int = 0

    @property
    def head_size(self) -> int:
        return 64 if self.hidden_size == 2048 else self.hidden_size // self.n_attn_heads

    @classmethod
    def from_gguf(cls, r: GGUFReader) -> "T5Config":
        c = cls()
        c.n_layers = int(r.get("t5encoder.block_count", c.n_layers))
        c.hidden_size = int(r.get("t5encoder.embedding_length", c.hidden_size))
        c.n_attn_heads = int(r.get("t5encoder.attention.head_count", c.n_attn_heads))
        c.max_context_length = int(r.get("t5encoder.context_length", c.max_context_length))
        c.bos_token_id = int(r.get("tokenizer.ggml.bos_token_id", c.bos_token_id))
        c.eos_token_id = int(r.get("tokenizer.ggml.eos_token_id", c.eos_token_id))
        c.vocab_size = int(r.get("t5encoder.vocab_size", 0))
        c.output_size = int(r.get("t5encoder.output_size", c.output_size))
        return c


class T5LayerWeights(NamedTuple):
    attn_norm: Any
    q: Weight; k: Weight; v: Weight; o: Weight
    mlp_norm: Any
    wi_0: Weight; wi_1: Weight; wo: Weight


class T5Weights(NamedTuple):
    embd: Weight
    rel_bias: Any               # (buckets, heads)
    layers: T5LayerWeights      # stacked (L, ...)
    out_norm: Any
    down_proj: Any              # or None
    down_proj_bias: Any         # or None


def _rms(x, w, eps=1e-6):
    ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(ms + eps) * w


def reference_pos_buckets(t: int, n_total_buckets: int = 32) -> np.ndarray:
    """Bucket matrix exactly as the reference computes it host-side
    (t5/model.cpp:308-317, including the integer division quirk)."""
    n_buckets = n_total_buckets // 2
    max_exact = n_buckets // 2
    denom = np.log(128.0 / max_exact)
    out = np.zeros((t, t), np.int32)
    for i in range(t):
        for ii in range(t):
            rpos = i - ii
            ab = abs(rpos)
            if ab < max_exact:
                b = ab
            else:
                # C++: (int)((log(ab / max_exact) / denom) * max_exact) with
                # INTEGER division ab / max_exact
                b = min(n_buckets - 1,
                        max_exact + int(np.log(ab // max_exact) / denom * max_exact))
            out[i, ii] = (n_buckets if rpos > 0 else 0) + b
    return out


@functools.partial(jax.jit, static_argnames=("cfg",))
def t5_encode(cfg: T5Config, w: T5Weights, tokens: jax.Array,
              valid_len, pos_buckets: jax.Array) -> jax.Array:
    """tokens (T,) -> encoding (T, output_size). Positions >= valid_len are
    masked out of attention so bucketed padding cannot leak in."""
    t = tokens.shape[0]
    x = take_rows(w.embd, tokens)
    bias = jnp.take(w.rel_bias, pos_buckets.reshape(-1), axis=0)
    bias = bias.reshape(t, t, -1).transpose(2, 0, 1)   # (heads, T, T)
    pad = jnp.where(jnp.arange(t) < valid_len, 0.0, -jnp.inf)[None, None, :]
    bias = bias + pad

    def body(xc, lw: T5LayerWeights):
        h = _rms(xc, lw.attn_norm)
        nh = cfg.n_attn_heads
        q = matmul(h, lw.q).reshape(t, nh, -1).transpose(1, 0, 2)
        k = matmul(h, lw.k).reshape(t, nh, -1).transpose(1, 0, 2)
        v = matmul(h, lw.v).reshape(t, nh, -1).transpose(1, 0, 2)
        logits = jnp.einsum("hqd,hkd->hqk", q, k,
                            preferred_element_type=jnp.float32) + bias
        probs = jax.nn.softmax(logits, axis=-1)
        a = jnp.einsum("hqk,hkd->hqd", probs, v)
        a = a.transpose(1, 0, 2).reshape(t, -1)
        xc = xc + matmul(a, lw.o)
        h = _rms(xc, lw.mlp_norm)
        # tanh-approx gelu: both ggml_gelu and HF's gated-gelu (gelu_new)
        up = jax.nn.gelu(matmul(h, lw.wi_0), approximate=True)
        gate = matmul(h, lw.wi_1)
        xc = xc + matmul(up * gate, lw.wo)
        return xc, None

    x, _ = jax.lax.scan(body, x, w.layers)
    x = _rms(x, w.out_norm)
    if w.down_proj is not None:
        x = matmul(x, w.down_proj)
        if w.down_proj_bias is not None:
            x = x + w.down_proj_bias
    return x


def load_t5_weights(r: GGUFReader, cfg: T5Config) -> T5Weights:
    names = set(r.tensor_names())
    get = lambda n: from_gguf_tensor(r, n)
    lws = []
    rel_bias = None
    for l in range(cfg.n_layers):
        b = f"t5encoder.enc.blk.{l}."
        if (b + "attn_rel_b") in names:
            rel_bias = dense(get(b + "attn_rel_b"))
        lws.append(T5LayerWeights(
            attn_norm=get(b + "attn_norm"),
            q=get(b + "attn_q"), k=get(b + "attn_k"), v=get(b + "attn_v"),
            o=get(b + "attn_o"),
            mlp_norm=get(b + "ffn_norm"),
            wi_0=get(b + "ffn_up"), wi_1=get(b + "ffn_gate"),
            wo=get(b + "ffn_down"),
        ))
    layers = T5LayerWeights(*[stack_weights([getattr(lw, f) for lw in lws])
                              for f in T5LayerWeights._fields])
    return T5Weights(
        embd=get("t5encoder.token_embd"),
        rel_bias=rel_bias,
        layers=layers,
        out_norm=get("t5encoder.enc.final_layer_norm"),
        down_proj=get("t5encoder.down_proj") if "t5encoder.down_proj" in names else None,
        down_proj_bias=get("t5encoder.down_proj_bias") if "t5encoder.down_proj_bias" in names else None,
    )


class T5Runner:
    """Parity: t5_runner (t5/model.cpp:322-368)."""

    def __init__(self, cfg: T5Config, weights: T5Weights,
                 tokenizer: UnigramTokenizer, buckets=(32, 64, 128, 256, 512)):
        self.cfg = cfg
        self.weights = weights
        self.tokenizer = tokenizer
        self.buckets = buckets
        self._bucket_cache = {}

    def encode_tokens(self, ids) -> np.ndarray:
        t = len(ids)
        tb = next((b for b in self.buckets if t <= b), t)
        toks = np.zeros(tb, np.int32)
        toks[:t] = ids
        if tb not in self._bucket_cache:
            from ...ops.attention import t5_relative_buckets
            pos = jnp.arange(tb)
            self._bucket_cache[tb] = jnp.asarray(t5_relative_buckets(
                pos, pos, self.cfg.relative_attn_buckets, 128)).astype(jnp.int32)
        out = t5_encode(self.cfg, self.weights, jnp.asarray(toks),
                        jnp.int32(t), self._bucket_cache[tb])
        return np.asarray(out)[:t]

    def generate(self, prompt: str) -> np.ndarray:
        ids = self.tokenizer.tokenize(prompt)
        ids.append(self.cfg.eos_token_id)
        return self.encode_tokens(ids)


def text_encoder_from_file(path: str, tokenizer: UnigramTokenizer | None = None) -> T5Runner:
    r = GGUFReader(path)
    cfg = T5Config.from_gguf(r)
    if tokenizer is None:
        tokenizer = UnigramTokenizer.from_gguf(r)
    w = load_t5_weights(r, cfg)
    return T5Runner(cfg, w, tokenizer)
