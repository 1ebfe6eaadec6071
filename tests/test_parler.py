"""Parler decoder tests: the jitted whole-generation loop is cross-checked
against an independent NumPy step-by-step implementation of the same math
(KV cache, causal masks, cross-attn, delay/EOS protocol) on tiny dims."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tts_tpu.models.parler.model import (
    ParlerConfig, ParlerLayerWeights, ParlerWeights, adjust_output_tokens,
    parler_generate_tokens, parler_prefill, precompute_cross_kv,
)


def make_cfg():
    return ParlerConfig(
        n_output_heads=3, n_encode_length=6, hidden_size=16, max_ctx_length=64,
        n_attn_heads=2, output_vocab_size=12, eos_token_id=8,
        audio_vocab_size=8, max_generation_size=24, n_layers=2,
        bos_token_id=9, use_cross_attn=True,
    )


def make_weights(cfg, rng, scale=0.5):
    L, H, NH = cfg.n_layers, cfg.hidden_size, cfg.n_output_heads
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * scale)
    text_enc = r(cfg.n_encode_length, H)
    k_ws = [r(H, H) for _ in range(L)]
    v_ws = [r(H, H) for _ in range(L)]
    cross_k, cross_v = precompute_cross_kv(cfg, text_enc, k_ws, v_ws)
    layers = ParlerLayerWeights(
        ln1_w=r(L, H) * 0.1 + 1, ln1_b=r(L, H) * 0.1,
        q_w=r(L, H, H), k_w=r(L, H, H), v_w=r(L, H, H), o_w=r(L, H, H),
        lnc_w=r(L, H) * 0.1 + 1, lnc_b=r(L, H) * 0.1,
        cq_w=r(L, H, H), co_w=r(L, H, H),
        cross_k=cross_k, cross_v=cross_v,
        ln2_w=r(L, H) * 0.1 + 1, ln2_b=r(L, H) * 0.1,
        fc1=r(L, 2 * H, H), fc2=r(L, H, 2 * H),
    )
    return ParlerWeights(
        layers=layers,
        embds=r(NH, cfg.bos_token_id + 1, H),
        prompt_embd=r(20, H),
        pos_embd=r(cfg.max_ctx_length, H),
        final_ln_w=r(H) * 0.1 + 1, final_ln_b=r(H) * 0.1,
        heads=r(NH * cfg.output_vocab_size, H),
    ), np.asarray(text_enc), [np.asarray(k) for k in k_ws], [np.asarray(v) for v in v_ws]


# ---------------------------------------------------------------------------
# independent numpy reference
# ---------------------------------------------------------------------------

def np_ln(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def _gelu(x):
    # tanh approximation (ggml_gelu)
    return 0.5 * x * (1.0 + np.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)))


def np_attn(q, k, v, mask=None):
    # q (heads, Tq, D), k/v (heads, Tk, D)
    d = q.shape[-1]
    logits = q @ k.transpose(0, 2, 1) / np.sqrt(d)
    if mask is not None:
        logits = logits + mask
    m = logits.max(-1, keepdims=True)
    p = np.exp(logits - m)
    p /= p.sum(-1, keepdims=True)
    return p @ v


class NpParlerRef:
    """Step-by-step reference decoder (mirrors reference C++ data flow)."""

    def __init__(self, cfg, w, text_enc, k_ws, v_ws):
        self.cfg = cfg
        self.w = jax.tree_util.tree_map(np.asarray, w)
        self.kv = [[None, None] for _ in range(cfg.n_layers)]
        self.cross = []
        for l in range(cfg.n_layers):
            ck = (text_enc @ k_ws[l].T).reshape(cfg.n_encode_length, cfg.n_attn_heads, -1).transpose(1, 0, 2)
            cv = (text_enc @ v_ws[l].T).reshape(cfg.n_encode_length, cfg.n_attn_heads, -1).transpose(1, 0, 2)
            self.cross.append((ck, cv))

    def _layer(self, l, x, causal_from):
        cfg, w = self.cfg, self.w
        lw = jax.tree_util.tree_map(lambda a: a[l], w.layers)
        t = x.shape[0]
        h = np_ln(x, lw.ln1_w, lw.ln1_b)
        q = (h @ lw.q_w.T).reshape(t, cfg.n_attn_heads, -1).transpose(1, 0, 2)
        k = (h @ lw.k_w.T).reshape(t, cfg.n_attn_heads, -1).transpose(1, 0, 2)
        v = (h @ lw.v_w.T).reshape(t, cfg.n_attn_heads, -1).transpose(1, 0, 2)
        if self.kv[l][0] is None:
            self.kv[l] = [k, v]
        else:
            self.kv[l][0] = np.concatenate([self.kv[l][0], k], axis=1)
            self.kv[l][1] = np.concatenate([self.kv[l][1], v], axis=1)
        kk, vv = self.kv[l]
        tk = kk.shape[1]
        mask = np.zeros((t, tk), np.float32)
        for i in range(t):
            mask[i, causal_from + i + 1:] = -np.inf
        a = np_attn(q, kk, vv, mask[None])
        a = a.transpose(1, 0, 2).reshape(t, -1)
        x = x + a @ lw.o_w.T
        ck, cv = self.cross[l]
        h = np_ln(x, lw.lnc_w, lw.lnc_b)
        q = (h @ lw.cq_w.T).reshape(t, cfg.n_attn_heads, -1).transpose(1, 0, 2)
        a = np_attn(q, ck, cv).transpose(1, 0, 2).reshape(t, -1)
        x = x + a @ lw.co_w.T
        h = np_ln(x, lw.ln2_w, lw.ln2_b)
        h = _gelu(h @ lw.fc1.T)
        return x + h @ lw.fc2.T

    def forward(self, x, causal_from):
        for l in range(self.cfg.n_layers):
            x = self._layer(l, x, causal_from)
        x = np_ln(x, self.w.final_ln_w, self.w.final_ln_b)
        return x

    def generate_greedy(self, prompt_ids, max_steps=None):
        cfg, w = self.cfg, self.w
        # prefill
        x = self.w.prompt_embd[prompt_ids] + self.w.pos_embd[: len(prompt_ids)]
        self.forward(x, 0)
        pos = len(prompt_ids)
        tokens_in = np.full(cfg.n_output_heads, cfg.bos_token_id)
        eos_seen = np.zeros(cfg.n_output_heads, bool)
        out = []
        step = 0
        while (step == 0 or not eos_seen.all()) and pos < cfg.max_generation_size:
            x = w.embds[np.arange(cfg.n_output_heads), tokens_in].sum(0)[None]
            x = x + w.pos_embd[pos][None]
            h = self.forward(x, pos)
            logits = (h[0] @ w.heads.T).reshape(cfg.n_output_heads, -1)
            toks = logits.argmax(-1)
            out.append(toks)
            nxt = np.where(step + 1 > np.arange(cfg.n_output_heads),
                           np.where(eos_seen, cfg.eos_token_id, toks),
                           cfg.bos_token_id)
            eos_seen = eos_seen | (toks == cfg.eos_token_id)
            tokens_in = nxt
            pos += 1
            step += 1
            if max_steps and step >= max_steps:
                break
        return np.stack(out)


def test_greedy_matches_numpy_reference(rng):
    cfg = make_cfg()
    w, text_enc, k_ws, v_ws = make_weights(cfg, rng)
    ref = NpParlerRef(cfg, w, text_enc, k_ws, v_ws)
    prompt = [1, 4, 2, 7, 3]

    ref_out = ref.generate_greedy(prompt)

    shape = (cfg.n_layers, cfg.n_attn_heads, cfg.max_ctx_length, cfg.head_size)
    kv_k = jnp.zeros(shape); kv_v = jnp.zeros(shape)
    tokens = np.zeros(8, np.int32)  # bucket to 8
    tokens[: len(prompt)] = prompt
    kv_k, kv_v = parler_prefill(cfg, w, jnp.asarray(tokens), kv_k, kv_v)
    out, n_steps = parler_generate_tokens(
        cfg, w, jnp.int32(len(prompt)), kv_k, kv_v, jax.random.PRNGKey(0),
        do_sample=False)
    n_steps = int(n_steps)
    got = np.asarray(out)[:n_steps]
    assert n_steps == ref_out.shape[0], (n_steps, ref_out.shape)
    np.testing.assert_array_equal(got, ref_out)


def test_generation_terminates_by_position(rng):
    cfg = make_cfg()
    w, *_ = make_weights(cfg, rng)
    shape = (cfg.n_layers, cfg.n_attn_heads, cfg.max_ctx_length, cfg.head_size)
    kv_k = jnp.zeros(shape); kv_v = jnp.zeros(shape)
    tokens = jnp.asarray(np.array([1, 2, 3, 0, 0, 0, 0, 0], np.int32))
    kv_k, kv_v = parler_prefill(cfg, w, tokens, kv_k, kv_v)
    out, n_steps = parler_generate_tokens(
        cfg, w, jnp.int32(3), kv_k, kv_v, jax.random.PRNGKey(1),
        do_sample=True, temperature=2.0)
    assert int(n_steps) <= cfg.max_generation_size - 3


def test_adjust_output_tokens_delay_undo():
    cfg = ParlerConfig(n_output_heads=3, audio_vocab_size=8, eos_token_id=8)
    # steps x heads, head ii's frame i value lives at out[i+ii, ii]
    out = np.array([
        [0, 9, 9],   # step 0: heads 1,2 BOS-ish (>=8 -> invalid)
        [1, 10, 9],
        [2, 11, 20],
        [3, 4, 21],
        [4, 5, 6],
        [8, 6, 7],   # head 0 EOS
        [8, 8, 1],
        [8, 8, 8],
    ], np.int32)
    frames = adjust_output_tokens(out, 8, cfg)
    # frame i = [out[i,0], out[i+1,1], out[i+2,2]]
    # i=0: [0,10,20] -> 10,20 >= 8 invalid
    # i=1: [1,11,21] invalid
    # i=2: [2,4,6] valid; i=3: [3,5,7] valid; i=4: [4,6,1] valid
    # i=5: [8,...] invalid (EOS)
    np.testing.assert_array_equal(frames, [[2, 4, 6], [3, 5, 7], [4, 6, 1]])
