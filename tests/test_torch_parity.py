"""Full-stack torch logit parity for Orpheus and Dia.

Independent torch re-implementations of the two decoder stacks (written
directly from the reference math: src/models/orpheus/model.cpp llama graph,
src/models/dia/model.cpp CFG encoder-decoder) are compared against the JAX
models end to end — embeddings -> all layers -> final norm -> LM head ->
(Dia) CFG merge + clamp. This pins down exactly the bug-prone pieces the
per-op tests can't see composed: NeoX RoPE with llama3 freq factors at real
decode positions, the GQA kv->q group mapping, Dia's scale-1.0 softmax, the
zeroed padded cross-K rows, and the cfg_scale merge with the >cfg_max_output
clamp (the reference's documented dead-clamp quirk, util.cpp:175-200).
"""
from __future__ import annotations

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tts_tpu.models.orpheus.model import (OrpheusConfig, OrpheusLayer,
                                          OrpheusWeights, orpheus_prefill,
                                          orpheus_generate_tokens)
from tts_tpu.models.dia.model import (DiaConfig, DiaDecoderLayer,
                                      DiaEncoderLayer, DiaWeights,
                                      _dia_decoder_step, dia_encode)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _t(x):
    return torch.from_numpy(np.asarray(x)).to(torch.float32)


def _rms_t(x, w, eps=1e-5):
    return x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + eps) * w


def _rope_neox_t(x, pos, base, ff=None):
    """x (..., T, D); NeoX half-split rotation, llama3 factors divide inv."""
    d = x.shape[-1]
    inv = 1.0 / base ** (torch.arange(0, d, 2, dtype=torch.float32) / d)
    if ff is not None:
        inv = inv / ff
    ang = pos.to(torch.float32)[:, None] * inv          # (T, d/2)
    cos, sin = ang.cos(), ang.sin()
    x1, x2 = x[..., : d // 2], x[..., d // 2:]
    return torch.cat([x1 * cos - x2 * sin, x2 * cos + x1 * sin], dim=-1)


# ---------------------------------------------------------------------------
# Orpheus
# ---------------------------------------------------------------------------

def make_orpheus(rng):
    cfg = OrpheusConfig(
        vocab_size=64, n_attn_heads=4, n_kv_heads=2, head_size=8,
        max_context_length=32, max_generation_size=24,
        stopping_token_id=10 ** 9, hidden_size=16, n_layers=3,
        rope_theta=500000.0)
    L, H = cfg.n_layers, cfg.hidden_size

    def r(*s, scale=0.3):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * scale)

    lw = OrpheusLayer(
        in_norm=r(L, H) * 0.1 + 1,
        q=r(L, 32, H), k=r(L, 16, H), v=r(L, 16, H), o=r(L, H, 32),
        post_norm=r(L, H) * 0.1 + 1,
        gate=r(L, 2 * H, H), up=r(L, 2 * H, H), down=r(L, H, 2 * H))
    w = OrpheusWeights(
        embd=r(cfg.vocab_size, H), layers=lw, out_norm=r(H) * 0.1 + 1,
        head=r(cfg.vocab_size, H),
        # non-trivial llama3 freq factors to exercise the divided-inv path
        rope_freqs=jnp.asarray([1.0, 1.25, 2.0, 4.0], jnp.float32))
    return cfg, w


def torch_orpheus_logits(cfg, w, ids):
    """Full no-cache forward over ids; logits for every position (T, V)."""
    x = _t(w.embd)[torch.tensor(ids)]                      # (T, H)
    T = x.shape[0]
    pos = torch.arange(T)
    ff = _t(w.rope_freqs)
    nh, nkv, d = cfg.n_attn_heads, cfg.n_kv_heads, cfg.head_size
    g = nh // nkv
    mask = torch.where(torch.arange(T)[None, :] <= torch.arange(T)[:, None],
                       0.0, -torch.inf)
    for l in range(cfg.n_layers):
        h = _rms_t(x, _t(w.layers.in_norm[l]))
        q = (h @ _t(w.layers.q[l]).T).reshape(T, nh, d).transpose(0, 1)
        k = (h @ _t(w.layers.k[l]).T).reshape(T, nkv, d).transpose(0, 1)
        v = (h @ _t(w.layers.v[l]).T).reshape(T, nkv, d).transpose(0, 1)
        q = _rope_neox_t(q, pos, cfg.rope_theta, ff)
        k = _rope_neox_t(k, pos, cfg.rope_theta, ff)
        # GQA: kv head j serves q heads [j*g, (j+1)*g)
        k = k.repeat_interleave(g, dim=0)
        v = v.repeat_interleave(g, dim=0)
        s = q @ k.transpose(1, 2) / np.sqrt(d) + mask
        a = torch.softmax(s, dim=-1) @ v                   # (nh, T, d)
        a = a.transpose(0, 1).reshape(T, nh * d)
        x = x + a @ _t(w.layers.o[l]).T
        h = _rms_t(x, _t(w.layers.post_norm[l]))
        gate = torch.nn.functional.silu(h @ _t(w.layers.gate[l]).T)
        x = x + (gate * (h @ _t(w.layers.up[l]).T)) @ _t(w.layers.down[l]).T
    x = _rms_t(x, _t(w.out_norm))
    return x @ _t(w.head).T


def test_orpheus_fullstack_logits_vs_torch(rng):
    cfg, w = make_orpheus(rng)
    ids = [5, 9, 3, 44, 12, 7]
    ref = torch_orpheus_logits(cfg, w, ids)

    shape = (cfg.n_layers, cfg.n_kv_heads, cfg.max_context_length,
             cfg.head_size)
    tokens = jnp.zeros(16, jnp.int32).at[: len(ids)].set(jnp.asarray(ids))
    logits, _, _ = orpheus_prefill(cfg, w, tokens, jnp.int32(len(ids)),
                                   jnp.zeros(shape), jnp.zeros(shape))
    np.testing.assert_allclose(np.asarray(logits),
                               ref[len(ids) - 1].numpy(),
                               rtol=2e-4, atol=2e-4)


def test_orpheus_fullstack_greedy_rollout_vs_torch(rng):
    """Greedy AR rollout: torch full-recompute argmax per step must emit the
    identical token sequence as the jitted cached decode loop."""
    cfg, w = make_orpheus(rng)
    ids = [5, 9, 3]
    n_new = 10

    seq = list(ids)
    torch_toks = []
    for _ in range(n_new):
        nxt = int(torch_orpheus_logits(cfg, w, seq)[-1].argmax())
        torch_toks.append(nxt)
        seq.append(nxt)

    shape = (cfg.n_layers, cfg.n_kv_heads, cfg.max_context_length,
             cfg.head_size)
    tokens = jnp.asarray(ids, jnp.int32)
    logits, kv_k, kv_v = orpheus_prefill(cfg, w, tokens, jnp.int32(len(ids)),
                                         jnp.zeros(shape), jnp.zeros(shape))
    first = jnp.argmax(logits).astype(jnp.int32)
    out, n = orpheus_generate_tokens(
        cfg, w, first, jnp.int32(len(ids)), kv_k, kv_v,
        jax.random.PRNGKey(0), max_steps=n_new, do_sample=False)
    assert list(np.asarray(out)[: int(n)]) == torch_toks


# ---------------------------------------------------------------------------
# Dia
# ---------------------------------------------------------------------------

def make_dia(rng):
    cfg = DiaConfig(
        n_output_heads=3, n_encoder_layers=2, n_decoder_layers=2,
        encoder_hidden_size=16, decoder_hidden_size=32,
        encoder_attn_heads=4, decoder_attn_heads=4, decoder_query_heads=2,
        head_size=8, eos_token_id=8, pad_token_id=9, bos_token_id=10,
        output_vocab_size=12, audio_vocab_size=8, max_generation_size=40,
        max_encoder_context_length=16, max_delay=4,
        delay_pattern=(0, 2, 4), cfg_max_output=8)

    def r(*s, scale=0.3):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * scale)

    eh, dh, hs = (cfg.encoder_hidden_size, cfg.decoder_hidden_size,
                  cfg.head_size)
    ea, da, nkv = (cfg.encoder_attn_heads, cfg.decoder_attn_heads,
                   cfg.n_kv_heads)
    Le, Ld = cfg.n_encoder_layers, cfg.n_decoder_layers
    enc = DiaEncoderLayer(
        sa_norm=r(Le, eh) * 0.1 + 1,
        q=r(Le, ea * hs, eh), k=r(Le, ea * hs, eh), v=r(Le, ea * hs, eh),
        o=r(Le, eh, ea * hs),
        mlp_norm=r(Le, eh) * 0.1 + 1,
        gate=r(Le, 2 * eh, eh), up=r(Le, 2 * eh, eh), wo=r(Le, eh, 2 * eh))
    dec = DiaDecoderLayer(
        sa_norm=r(Ld, dh) * 0.1 + 1,
        self_q=r(Ld, da * hs, dh), self_k=r(Ld, nkv * hs, dh),
        self_v=r(Ld, nkv * hs, dh), self_o=r(Ld, dh, da * hs),
        ca_norm=r(Ld, dh) * 0.1 + 1,
        cross_q=r(Ld, da * hs, dh), cross_k=r(Ld, da * hs, eh),
        cross_v=r(Ld, da * hs, eh), cross_o=r(Ld, dh, da * hs),
        mlp_norm=r(Ld, dh) * 0.1 + 1,
        gate=r(Ld, 2 * dh, dh), up=r(Ld, 2 * dh, dh), wo=r(Ld, dh, 2 * dh))
    w = DiaWeights(
        enc_embedding=r(260, eh), enc_layers=enc, enc_norm=r(eh) * 0.1 + 1,
        dec_embds=r(cfg.n_output_heads, cfg.bos_token_id + 1, dh),
        dec_layers=dec, dec_norm=r(dh) * 0.1 + 1,
        heads=r(cfg.n_output_heads * cfg.output_vocab_size, dh))
    return cfg, w


def torch_dia_encode(cfg, w, ids):
    """Returns (cross_k, cross_v) lists per layer, each (2, heads, T, D)."""
    T = cfg.max_encoder_context_length
    hs = cfg.head_size
    tokens = torch.zeros(2, T, dtype=torch.long)
    tokens[0, : len(ids)] = torch.tensor(ids)
    x = _t(w.enc_embedding)[tokens]                        # (2, T, H)
    pos = torch.arange(T)
    real = pos < len(ids)
    bias = torch.where(real[:, None] == real[None, :], 0.0, -torch.inf)
    ea = cfg.encoder_attn_heads

    def heads_t(y, nh):
        return y.reshape(2, T, nh, hs).permute(0, 2, 1, 3)

    for l in range(cfg.n_encoder_layers):
        lw = w.enc_layers
        h = _rms_t(x, _t(lw.sa_norm[l]))
        q = _rope_neox_t(heads_t(h @ _t(lw.q[l]).T, ea), pos, 10000.0)
        k = _rope_neox_t(heads_t(h @ _t(lw.k[l]).T, ea), pos, 10000.0)
        v = heads_t(h @ _t(lw.v[l]).T, ea)
        s = q @ k.transpose(-1, -2) + bias                 # scale 1.0
        a = torch.softmax(s, dim=-1) @ v
        a = a.permute(0, 2, 1, 3).reshape(2, T, -1)
        x = x + a @ _t(lw.o[l]).T
        h = _rms_t(x, _t(lw.mlp_norm[l]))
        gate = torch.nn.functional.silu(h @ _t(lw.gate[l]).T)
        x = x + (gate * (h @ _t(lw.up[l]).T)) @ _t(lw.wo[l]).T
    hid = _rms_t(x, _t(w.enc_norm))

    cks, cvs = [], []
    da = cfg.decoder_attn_heads
    for l in range(cfg.n_decoder_layers):
        lw = w.dec_layers
        k = _rope_neox_t(heads_t(hid @ _t(lw.cross_k[l]).T, da), pos, 10000.0)
        k = k * real[None, None, :, None]                  # zero pad K rows
        v = heads_t(hid @ _t(lw.cross_v[l]).T, da)
        cks.append(k)
        cvs.append(v)
    return cks, cvs


def torch_dia_decode_steps(cfg, w, cks, cvs, token_steps):
    """AR decode with explicit per-layer K/V caches; returns the CFG-merged
    logits (n_heads, vocab) per step for the given forced token inputs."""
    hs, da, nkv = cfg.head_size, cfg.decoder_attn_heads, cfg.n_kv_heads
    g = da // nkv
    Ld = cfg.n_decoder_layers
    kcache = [[] for _ in range(Ld)]
    vcache = [[] for _ in range(Ld)]
    out_logits = []
    for pos, toks in enumerate(token_steps):
        emb = sum(_t(w.dec_embds[i])[toks[i]] for i in range(len(toks)))
        x = emb[None, None, :].repeat(2, 1, 1)             # (2, 1, H)
        posv = torch.tensor([pos])
        for l in range(Ld):
            lw = w.dec_layers
            h = _rms_t(x, _t(lw.sa_norm[l]))
            q = (h @ _t(lw.self_q[l]).T).reshape(2, 1, da, hs).permute(0, 2, 1, 3)
            k = (h @ _t(lw.self_k[l]).T).reshape(2, 1, nkv, hs).permute(0, 2, 1, 3)
            v = (h @ _t(lw.self_v[l]).T).reshape(2, 1, nkv, hs).permute(0, 2, 1, 3)
            q = _rope_neox_t(q, posv, 10000.0)
            k = _rope_neox_t(k, posv, 10000.0)
            kcache[l].append(k)
            vcache[l].append(v)
            kk = torch.cat(kcache[l], dim=2)               # (2, nkv, t, D)
            vv = torch.cat(vcache[l], dim=2)
            kk = kk.repeat_interleave(g, dim=1)
            vv = vv.repeat_interleave(g, dim=1)
            s = q @ kk.transpose(-1, -2)                   # scale 1.0
            a = torch.softmax(s, dim=-1) @ vv
            x = x + a.permute(0, 2, 1, 3).reshape(2, 1, -1) @ _t(lw.self_o[l]).T
            h = _rms_t(x, _t(lw.ca_norm[l]))
            cq = (h @ _t(lw.cross_q[l]).T).reshape(2, 1, da, hs).permute(0, 2, 1, 3)
            cq = _rope_neox_t(cq, posv, 10000.0)
            s = cq @ cks[l].transpose(-1, -2)              # full padded ctx
            ca = torch.softmax(s, dim=-1) @ cvs[l]
            x = x + ca.permute(0, 2, 1, 3).reshape(2, 1, -1) @ _t(lw.cross_o[l]).T
            h = _rms_t(x, _t(lw.mlp_norm[l]))
            gate = torch.nn.functional.silu(h @ _t(lw.gate[l]).T)
            x = x + (gate * (h @ _t(lw.up[l]).T)) @ _t(lw.wo[l]).T
        x = _rms_t(x, _t(w.dec_norm))
        out = (x[:, 0, :] @ _t(w.heads).T).reshape(
            2, cfg.n_output_heads, cfg.output_vocab_size)
        cond, uncond = out[0], out[1]
        merged = cond + cfg.cfg_scale * (cond - uncond)
        tok = torch.arange(cfg.output_vocab_size)
        merged = torch.where(tok > cfg.cfg_max_output,
                             torch.tensor(-torch.inf), merged)
        out_logits.append(merged)
    return out_logits


def test_dia_fullstack_logits_vs_torch(rng):
    cfg, w = make_dia(rng)
    ids = [1, 40, 41, 42, 2, 43, 44]
    n_steps = 6
    step_rng = np.random.default_rng(7)
    token_steps = [[cfg.bos_token_id] * cfg.n_output_heads] + [
        list(step_rng.integers(0, cfg.audio_vocab_size, cfg.n_output_heads))
        for _ in range(n_steps - 1)]

    cks, cvs = torch_dia_encode(cfg, w, ids)
    ref_logits = torch_dia_decode_steps(cfg, w, cks, cvs, token_steps)

    tokens = np.zeros((2, cfg.max_encoder_context_length), np.int32)
    tokens[0, : len(ids)] = ids
    _, ck, cv = dia_encode(cfg, w, jnp.asarray(tokens), jnp.int32(len(ids)))
    np.testing.assert_allclose(
        np.asarray(ck[0]), cks[0].numpy(), rtol=2e-4, atol=2e-4)

    L, nkv, d = cfg.n_decoder_layers, cfg.n_kv_heads, cfg.head_size
    kv_k = jnp.zeros((L, 2, nkv, 16, d))
    kv_v = jnp.zeros((L, 2, nkv, 16, d))
    step = jax.jit(_dia_decoder_step, static_argnames=("cfg",))
    for pos, toks in enumerate(token_steps):
        merged, kv_k, kv_v = step(cfg, w, ck, cv,
                                  jnp.asarray(toks, jnp.int32),
                                  jnp.int32(pos), kv_k, kv_v)
        got = np.asarray(merged)
        ref = ref_logits[pos].numpy()
        # compare finite lanes; clamp lanes are -inf on both sides
        assert (np.isinf(got) == np.isinf(ref)).all()
        m = np.isfinite(ref)
        np.testing.assert_allclose(got[m], ref[m], rtol=3e-4, atol=3e-4)
