"""Dia (1.6B, 2-speaker dialogue) — TPU-native implementation.

Behavior parity with reference src/models/dia/model.cpp. Encoder-decoder
with classifier-free guidance: conditional and unconditional sequences run
as a batch dim of 2 throughout (model.cpp:697-704). TPU-first design: the
encoder + cross-K/V precompute is one jitted prefill, and the whole
autoregressive decode (GQA self-attention with KV cache, CFG logit merge,
9-head sampling, delay-pattern EOS wind-down) is one jitted lax.while_loop.

Math parity:
  * RMS norm eps 1e-5, no bias (dia_layer_norm, model.cpp:344-349)
  * NeoX RoPE on q/k, including cross-attention K at encode positions
    (model.cpp:394, 452, 489)
  * softmax scale 1.0 — Dia does NOT scale by 1/sqrt(d) (model.cpp:399,563)
  * SiLU-gated MLP: silu(gate(x)) * up(x) -> wo (model.cpp:416)
  * encoder pad mask is block-diagonal: real tokens attend real tokens, pads
    attend pads (set_inputs, model.cpp:728-737)
  * cross-attention attends the FULL padded encoder context; K rows beyond
    the prompt are zeros (cache semantics, model.cpp:486-500)
  * CFG merge cond + scale*(cond - uncond) with tokens > audio-vocab masked
    (build_dia_head_outputs, model.cpp:358-371; util.cpp:175-200)
  * delay pattern {0,8,...,15}: EOS on channel 0 triggers a max_delay=15
    wind-down forcing EOS/PAD per channel (check_stopping, model.cpp:806-823)
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...common import GenerationConfig, TTSResponse, SAMPLE_RATE_DAC
from ...gguf.reader import GGUFReader
from ...ops import sampling
from ...ops.attention import apply_rope_neox
from ...ops.linear import Weight, from_gguf_tensor, matmul, stack_weights, dense
from ..base import TTSRunner


@dataclasses.dataclass(eq=False)
class DiaConfig:
    """Defaults = Dia 1.6B (dia/model.h:64-87)."""

    n_output_heads: int = 9
    n_encoder_layers: int = 12
    n_decoder_layers: int = 18
    encoder_hidden_size: int = 1024
    decoder_hidden_size: int = 2048
    encoder_attn_heads: int = 16
    decoder_attn_heads: int = 16
    decoder_query_heads: int = 4
    head_size: int = 128
    eos_token_id: int = 1024
    pad_token_id: int = 1025
    bos_token_id: int = 1026
    output_vocab_size: int = 1028
    audio_vocab_size: int = 1024
    max_generation_size: int = 3072
    max_encoder_context_length: int = 1024
    cfg_scale: float = 3.0
    cfg_max_output: int = 1024
    max_delay: int = 15
    delay_pattern: tuple = (0, 8, 9, 10, 11, 12, 13, 14, 15)

    @property
    def n_kv_heads(self) -> int:
        # reference computes kv heads as attn/query (model.cpp:452)
        return self.decoder_attn_heads // self.decoder_query_heads

    @classmethod
    def from_gguf(cls, r: GGUFReader) -> "DiaConfig":
        c = cls()
        g = r.metadata.get
        c.head_size = int(g("dia.attn_head_size", c.head_size))
        c.eos_token_id = int(g("dia.eos_token_id", c.eos_token_id))
        c.bos_token_id = int(g("dia.bos_token_id", c.bos_token_id))
        c.pad_token_id = int(g("dia.pad_token_id", c.pad_token_id))
        c.max_delay = int(g("dia.max_delay", c.max_delay))
        c.max_encoder_context_length = int(g("dia.encoder.max_context_length", c.max_encoder_context_length))
        c.encoder_attn_heads = int(g("dia.encoder.attn_heads", c.encoder_attn_heads))
        c.n_encoder_layers = int(g("dia.encoder.layers", c.n_encoder_layers))
        enc_h = g("dia.encoder.hidden_size")
        if enc_h is None and "dia.encoder.embedding" in r.tensors:
            # the reference converter (py-gguf dia_gguf_encoder.py
            # set_gguf_parameters) never writes this key — the C++ loader
            # relies on the 1.6B default. Infer from the embedding tensor so
            # arbitrary-size converter outputs load correctly.
            enc_h = r.tensors["dia.encoder.embedding"].shape[-1]
        if enc_h is not None:
            c.encoder_hidden_size = int(enc_h)
        c.decoder_hidden_size = int(g("dia.decoder.hidden_size", c.decoder_hidden_size))
        c.n_decoder_layers = int(g("dia.decoder.layers", c.n_decoder_layers))
        c.n_output_heads = int(g("dia.decoder.output_heads", c.n_output_heads))
        c.decoder_attn_heads = int(g("dia.decoder.attn_heads", c.decoder_attn_heads))
        c.decoder_query_heads = int(g("dia.decoder.query_heads", c.decoder_query_heads))
        c.output_vocab_size = int(g("dia.decoder.output_vocab_size", c.output_vocab_size))
        c.audio_vocab_size = int(g("dia.decoder.audio_vocab_size", c.audio_vocab_size))
        c.max_generation_size = int(g("dia.decoder.max_generation_size", c.max_generation_size))
        dp = g("dia.decoder.delay_pattern")
        if dp is not None:
            c.delay_pattern = tuple(int(x) for x in dp)
        elif c.n_output_heads != len(c.delay_pattern):
            # non-default head count without an explicit pattern: spread
            # delays 0..max_delay (channel 0 always undelayed)
            n = c.n_output_heads
            c.delay_pattern = (0,) + tuple(
                c.max_delay - (n - 1 - i) for i in range(1, n))
        return c


class DiaEncoderLayer(NamedTuple):
    sa_norm: Any
    q: Weight; k: Weight; v: Weight; o: Weight
    mlp_norm: Any
    gate: Weight; up: Weight; wo: Weight


class DiaDecoderLayer(NamedTuple):
    sa_norm: Any
    self_q: Weight; self_k: Weight; self_v: Weight; self_o: Weight
    ca_norm: Any
    cross_q: Weight; cross_k: Weight; cross_v: Weight; cross_o: Weight
    mlp_norm: Any
    gate: Weight; up: Weight; wo: Weight


class DiaWeights(NamedTuple):
    enc_embedding: Any
    enc_layers: DiaEncoderLayer      # stacked (L, ...)
    enc_norm: Any
    dec_embds: Any                   # (n_heads, vocab+, H)
    dec_layers: DiaDecoderLayer      # stacked (L, ...)
    dec_norm: Any
    heads: Weight                    # (n_heads * vocab, H)


def _rms(x, w, eps=1e-5):
    ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(ms + eps) * w


def _heads(x, nh):
    # (B, T, H) -> (B, nh, T, D)
    b, t, _ = x.shape
    return x.reshape(b, t, nh, -1).transpose(0, 2, 1, 3)


@functools.partial(jax.jit, static_argnames=("cfg",))
def dia_encode(cfg: DiaConfig, w: DiaWeights, tokens, sentence_length):
    """tokens (2, 1024) byte ids (row 0 = conditional, row 1 = zeros).

    Returns (hidden (2, 1024, enc_H), cross_k (L, 2, heads, 1024, D),
    cross_v (L, 2, heads, 1024, D)). Cross-K columns >= sentence_length are
    zeroed, matching the reference cache semantics.
    """
    t = cfg.max_encoder_context_length
    pos = jnp.arange(t)
    x = jnp.take(w.enc_embedding, tokens, axis=0)          # (2, T, H)
    real = pos < sentence_length
    # block-diagonal mask: real<->real, pad<->pad (model.cpp:728-737)
    m = real[:, None] == real[None, :]
    bias = jnp.where(m, 0.0, -jnp.inf)[None, None]

    def layer(xc, lw: DiaEncoderLayer):
        h = _rms(xc, lw.sa_norm)
        q = _heads(matmul(h, lw.q), cfg.encoder_attn_heads)
        k = _heads(matmul(h, lw.k), cfg.encoder_attn_heads)
        v = _heads(matmul(h, lw.v), cfg.encoder_attn_heads)
        q = apply_rope_neox(q, pos)
        k = apply_rope_neox(k, pos)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) + bias
        probs = jax.nn.softmax(logits, axis=-1)
        a = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        a = a.transpose(0, 2, 1, 3).reshape(2, t, -1)
        xc = xc + matmul(a, lw.o)
        h = _rms(xc, lw.mlp_norm)
        xc = xc + matmul(jax.nn.silu(matmul(h, lw.gate)) * matmul(h, lw.up), lw.wo)
        return xc, None

    x, _ = jax.lax.scan(layer, x, w.enc_layers)
    hidden = _rms(x, w.enc_norm)

    def cross_kv(lw: DiaDecoderLayer):
        k = _heads(matmul(hidden, lw.cross_k), cfg.decoder_attn_heads)
        k = apply_rope_neox(k, pos)
        k = k * real[None, None, :, None]                  # zero pad K rows
        v = _heads(matmul(hidden, lw.cross_v), cfg.decoder_attn_heads)
        return k, v

    # lax.map (NOT vmap): vmapping the Pallas quant-matmul over the stacked
    # QuantTensor layer axis makes Mosaic allocate the whole (L, T, H) output
    # block in VMEM (observed 37 MB > 16 MB scoped limit at Dia-1.6B scale);
    # sequential per-layer kernel calls are fine for this run-once prefill.
    ck, cv = jax.lax.map(cross_kv, w.dec_layers)
    return hidden, ck, cv


class DiaDecodeState(NamedTuple):
    kv_k: Any                # (L, 2, n_kv, max_gen, D)
    kv_v: Any
    pos: Any
    tokens_in: Any           # (n_heads,)
    delay_steps: Any         # int32, -1 = not triggered
    done: Any
    out_tokens: Any          # (max_gen, n_heads)
    sampler_state: sampling.SamplerState
    key: Any


def _dia_decoder_step(cfg: DiaConfig, w: DiaWeights, cross_k, cross_v,
                      tokens_in, pos, kv_k, kv_v):
    """One decode step at position pos. tokens_in (n_heads,). Returns
    (cfg-merged logits (n_heads, vocab), kv_k, kv_v)."""
    nh = cfg.decoder_attn_heads
    nkv = cfg.n_kv_heads
    embs = jax.vmap(lambda e, tk: e[tk])(w.dec_embds, tokens_in)  # (nh9, H)
    x = jnp.broadcast_to(jnp.sum(embs, axis=0), (2, 1, cfg.decoder_hidden_size))
    posv = jnp.array([0]) + pos
    ctx = kv_k.shape[-2]
    jmask = jnp.where(jnp.arange(ctx) <= pos, 0.0, -jnp.inf)

    def layer(carry, inp):
        xc = carry
        lw, kk, vv, ckl, cvl = inp
        h = _rms(xc, lw.sa_norm)
        q = _heads(matmul(h, lw.self_q), nh)               # (2, nh, 1, D)
        k = _heads(matmul(h, lw.self_k), nkv)              # (2, nkv, 1, D)
        v = _heads(matmul(h, lw.self_v), nkv)
        q = apply_rope_neox(q, posv)
        k = apply_rope_neox(k, posv)
        kk = jax.lax.dynamic_update_slice(kk, k.astype(kk.dtype), (0, 0, pos, 0))
        vv = jax.lax.dynamic_update_slice(vv, v.astype(vv.dtype), (0, 0, pos, 0))
        # paged decode attention with merged (batch, head) leading dim; the
        # GQA group mapping (kv head j -> q heads [j*g,(j+1)*g)) matches the
        # reference repeat_interleave. Dia uses softmax scale 1.0.
        from ...ops.decode_attention import decode_attention
        d = q.shape[-1]
        ctx2 = kk.shape[2]
        a = decode_attention(q[:, :, 0, :].reshape(2 * nh, d),
                             kk.reshape(2 * nkv, ctx2, d),
                             vv.reshape(2 * nkv, ctx2, d), pos, scale=1.0)
        a = a.reshape(2, nh, d).reshape(2, 1, nh * d)
        xc = xc + matmul(a, lw.self_o)
        # cross attention (full MHA over padded encoder context, no mask)
        h = _rms(xc, lw.ca_norm)
        cq = _heads(matmul(h, lw.cross_q), nh)
        cq = apply_rope_neox(cq, posv)
        clog = jnp.einsum("bhqd,bhkd->bhqk", cq, ckl,
                          preferred_element_type=jnp.float32)
        cprobs = jax.nn.softmax(clog, axis=-1)
        ca = jnp.einsum("bhqk,bhkd->bhqd", cprobs, cvl)
        ca = ca.transpose(0, 2, 1, 3).reshape(2, 1, -1)
        xc = xc + matmul(ca, lw.cross_o)
        h = _rms(xc, lw.mlp_norm)
        xc = xc + matmul(jax.nn.silu(matmul(h, lw.gate)) * matmul(h, lw.up),
                         lw.wo)
        return xc, (kk, vv)

    x, (kv_k, kv_v) = jax.lax.scan(layer, x,
                                   (w.dec_layers, kv_k, kv_v, cross_k, cross_v))
    x = _rms(x, w.dec_norm)
    out = matmul(x[:, 0, :], w.heads)                      # (2, nh9*vocab+)
    vocab_p = out.shape[-1] // cfg.n_output_heads          # >= vocab if padded
    out = out.reshape(2, cfg.n_output_heads, vocab_p)
    out = out[:, :, :cfg.output_vocab_size]
    cond, uncond = out[0], out[1]
    merged = cond + cfg.cfg_scale * (cond - uncond)
    tok = jnp.arange(cfg.output_vocab_size)
    merged = jnp.where(tok > cfg.cfg_max_output, -jnp.inf, merged)
    return merged, kv_k, kv_v


@functools.partial(jax.jit, static_argnames=("cfg", "max_steps", "do_sample",
                                             "temperature", "top_k", "top_p",
                                             "repetition_penalty"))
def dia_generate_tokens(cfg: DiaConfig, w: DiaWeights, cross_k, cross_v, key,
                        *, max_steps: int, do_sample: bool = True,
                        temperature: float = 1.0, top_k: int = 0,
                        top_p: float = 1.0, repetition_penalty: float = 1.0):
    """Full on-device AR loop with delay wind-down. Returns (out, n_steps)."""
    nh = cfg.n_output_heads
    L, nkv, d = cfg.n_decoder_layers, cfg.n_kv_heads, cfg.head_size
    delay = jnp.asarray(cfg.delay_pattern, jnp.int32)

    from ...common import kv_cache_dtype as _kvdt
    _dt = _kvdt()
    st0 = DiaDecodeState(
        kv_k=jnp.zeros((L, 2, nkv, max_steps, d), _dt),
        kv_v=jnp.zeros((L, 2, nkv, max_steps, d), _dt),
        pos=jnp.int32(0),
        tokens_in=jnp.full((nh,), cfg.bos_token_id, jnp.int32),
        delay_steps=jnp.int32(-1),
        done=jnp.asarray(False),
        out_tokens=jnp.zeros((max_steps, nh), jnp.int32),
        sampler_state=sampling.init_state(nh),
        key=key,
    )

    def cond_fn(st: DiaDecodeState):
        return (~st.done) & (st.pos < max_steps)

    def body(st: DiaDecodeState):
        # check_stopping semantics (model.cpp:806-823), applied to the INPUT
        t_in = st.tokens_in
        ds = st.delay_steps
        trigger = (ds == -1) & ((t_in[0] == cfg.eos_token_id) |
                                (st.pos >= max_steps - cfg.max_delay))
        ds = jnp.where(trigger, cfg.max_delay, ds)
        in_delay = ds > 0
        step_after = cfg.max_delay - ds
        t_in = jnp.where(in_delay & (delay == step_after), cfg.eos_token_id, t_in)
        t_in = jnp.where(in_delay & (step_after > delay), cfg.pad_token_id, t_in)
        ds = jnp.where(in_delay, ds - 1, ds)
        done = ds == 0

        def do_step(st, t_in, ds):
            logits, kv_k, kv_v = _dia_decoder_step(
                cfg, w, cross_k, cross_v, t_in, st.pos, st.kv_k, st.kv_v)
            key, sub = jax.random.split(st.key)
            toks, s_state = sampling.sample_or_greedy(
                sub, logits, st.sampler_state, do_sample=do_sample,
                temperature=temperature, top_k=top_k, top_p=top_p,
                repetition_penalty=repetition_penalty)
            out = jax.lax.dynamic_update_slice(st.out_tokens, toks[None, :],
                                               (st.pos, 0))
            new_pos = st.pos + 1
            nxt = jnp.where(new_pos > jnp.arange(nh), toks,
                            cfg.bos_token_id).astype(jnp.int32)
            return DiaDecodeState(kv_k, kv_v, new_pos, nxt, ds,
                                  jnp.asarray(False), out, s_state, key)

        def skip(st, t_in, ds):
            return st._replace(tokens_in=t_in, delay_steps=ds,
                               done=jnp.asarray(True))

        return jax.lax.cond(done, skip, do_step, st, t_in, ds)

    st = jax.lax.while_loop(cond_fn, body, st0)
    return st.out_tokens, st.pos


def _dia_init_state(cfg: DiaConfig, key, max_steps: int):
    nh = cfg.n_output_heads
    L, nkv, d = cfg.n_decoder_layers, cfg.n_kv_heads, cfg.head_size
    from ...common import kv_cache_dtype as _kvdt
    _dt = _kvdt()
    return DiaDecodeState(
        kv_k=jnp.zeros((L, 2, nkv, max_steps, d), _dt),
        kv_v=jnp.zeros((L, 2, nkv, max_steps, d), _dt),
        pos=jnp.int32(0),
        tokens_in=jnp.full((nh,), cfg.bos_token_id, jnp.int32),
        delay_steps=jnp.int32(-1),
        done=jnp.asarray(False),
        out_tokens=jnp.zeros((max_steps, nh), jnp.int32),
        sampler_state=sampling.init_state(nh),
        key=key,
    )


def maybe_prep_dia_mega(cfg: DiaConfig, w: DiaWeights):
    """(DiaMegaLayers, qtype) when the fused Dia CFG decode kernel applies
    (TPU, uniformly quantized decoder projections, kernel-friendly dims),
    else (None, None) -> the per-matmul path. Same gating pattern as
    Parler's maybe_prep_mega."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    import os
    force = os.environ.get("TTS_TPU_MEGAKERNEL")
    if force == "0" or (not on_tpu and force != "1"):
        return None, None
    if cfg.decoder_hidden_size % 128 or cfg.head_size % 64:
        return None, None
    try:
        from ...ops.dia_megastep import prep_dia_mega
        return prep_dia_mega(w.dec_layers)
    except ValueError:
        return None, None


def _dia_mega_logits(cfg: DiaConfig, w: DiaWeights, mega, mega_qtype,
                     tokens_in, pos, kv_k, kv_v, ck, cv, vtail, n_tail):
    """One fused decode step via ops/dia_megastep. Same contract as
    _dia_decoder_step but with packed bf16 cross K/V (prep_dia_cross)."""
    from ...ops.dia_megastep import dia_megastep
    L, nkv, d = cfg.n_decoder_layers, cfg.n_kv_heads, cfg.head_size
    embs = jax.vmap(lambda e, tk: e[tk])(w.dec_embds, tokens_in)
    x = jnp.broadcast_to(jnp.sum(embs, axis=0), (2, cfg.decoder_hidden_size))
    xo, kn, vn = dia_megastep(mega, x, kv_k, kv_v, pos, ck, cv, vtail,
                              n_tail, qtype=mega_qtype,
                              n_heads=cfg.decoder_attn_heads, n_kv=nkv)
    kv_k = jax.lax.dynamic_update_slice(
        kv_k, kn.reshape(L, 2, nkv, 1, d).astype(kv_k.dtype), (0, 0, 0, pos, 0))
    kv_v = jax.lax.dynamic_update_slice(
        kv_v, vn.reshape(L, 2, nkv, 1, d).astype(kv_v.dtype), (0, 0, 0, pos, 0))
    x = _rms(xo, w.dec_norm)
    out = matmul(x, w.heads)                                 # (2, nh*vocab+)
    vocab_p = out.shape[-1] // cfg.n_output_heads
    out = out.reshape(2, cfg.n_output_heads, vocab_p)
    out = out[:, :, :cfg.output_vocab_size]
    cond, uncond = out[0], out[1]
    merged = cond + cfg.cfg_scale * (cond - uncond)
    tok = jnp.arange(cfg.output_vocab_size)
    merged = jnp.where(tok > cfg.cfg_max_output, -jnp.inf, merged)
    return merged, kv_k, kv_v


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "max_steps",
                                             "do_sample", "temperature",
                                             "top_k", "top_p",
                                             "repetition_penalty",
                                             "mega_qtype", "n_tail"))
def dia_decode_chunk(cfg: DiaConfig, w: DiaWeights, cross_k, cross_v,
                     st: DiaDecodeState, *, n_steps: int, max_steps: int,
                     do_sample: bool = True, temperature: float = 1.0,
                     top_k: int = 0, top_p: float = 1.0,
                     repetition_penalty: float = 1.0,
                     mega=None, mega_qtype=None, vtail=None, n_tail=0):
    """n_steps decode steps as lax.scan with compute-always + masked updates
    (Pallas-friendly: no while_loop, no cond around kernels). With `mega`
    the whole layer stack runs as one fused kernel per step and
    cross_k/cross_v are the PACKED bf16 arrays from prep_dia_cross."""
    nh = cfg.n_output_heads
    delay = jnp.asarray(cfg.delay_pattern, jnp.int32)

    def step(st: DiaDecodeState, _):
        t_in = st.tokens_in
        ds = st.delay_steps
        trigger = (ds == -1) & ((t_in[0] == cfg.eos_token_id) |
                                (st.pos >= max_steps - cfg.max_delay))
        ds = jnp.where(trigger, cfg.max_delay, ds)
        in_delay = ds > 0
        step_after = cfg.max_delay - ds
        t_in = jnp.where(in_delay & (delay == step_after), cfg.eos_token_id, t_in)
        t_in = jnp.where(in_delay & (step_after > delay), cfg.pad_token_id, t_in)
        ds = jnp.where(in_delay, ds - 1, ds)
        now_done = (ds == 0) | st.done | (st.pos >= max_steps)

        pos_c = jnp.minimum(st.pos, max_steps - 1)
        if mega is not None:
            logits, kv_k, kv_v = _dia_mega_logits(
                cfg, w, mega, mega_qtype, t_in, pos_c, st.kv_k, st.kv_v,
                cross_k, cross_v, vtail, n_tail)
        else:
            logits, kv_k, kv_v = _dia_decoder_step(
                cfg, w, cross_k, cross_v, t_in, pos_c, st.kv_k, st.kv_v)
        key, sub = jax.random.split(st.key)
        toks, s_state = sampling.sample_or_greedy(
            sub, logits, st.sampler_state, do_sample=do_sample,
            temperature=temperature, top_k=top_k, top_p=top_p,
            repetition_penalty=repetition_penalty)
        out = jax.lax.dynamic_update_slice(
            st.out_tokens, toks[None, :], (jnp.minimum(st.pos, max_steps - 1), 0))
        new_pos = st.pos + 1
        nxt = jnp.where(new_pos > jnp.arange(nh), toks,
                        cfg.bos_token_id).astype(jnp.int32)
        new_st = DiaDecodeState(kv_k, kv_v, new_pos, nxt, ds,
                                jnp.asarray(False), out, s_state, key)
        frozen = st._replace(done=jnp.asarray(True))
        # KV passes through unmasked (a select would stream the whole cache
        # per step); frozen-state row writes at the stale pos are harmless.
        st = jax.tree_util.tree_map(
            lambda a, b: jnp.where(jnp.reshape(now_done, (1,) * a.ndim), a, b)
            if a.ndim else jnp.where(now_done, a, b),
            frozen._replace(kv_k=new_st.kv_k, kv_v=new_st.kv_v), new_st)
        return st, None

    st, _ = jax.lax.scan(step, st, None, length=n_steps)
    return st


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "max_steps",
                                             "do_sample", "temperature",
                                             "top_k", "top_p",
                                             "repetition_penalty",
                                             "mega_qtype", "n_tail"))
def dia_decode_chunk_status(cfg: DiaConfig, w: DiaWeights, cross_k, cross_v,
                            st: DiaDecodeState, *, n_steps: int,
                            max_steps: int, do_sample: bool = True,
                            temperature: float = 1.0, top_k: int = 0,
                            top_p: float = 1.0,
                            repetition_penalty: float = 1.0,
                            mega=None, mega_qtype=None, vtail=None,
                            n_tail=0):
    """Chunk + packed [done, pos] status in ONE dispatch (each extra
    dispatch/fetch costs a ~25-35 ms relay round trip)."""
    st = dia_decode_chunk(
        cfg, w, cross_k, cross_v, st, n_steps=n_steps, max_steps=max_steps,
        do_sample=do_sample, temperature=temperature, top_k=top_k,
        top_p=top_p, repetition_penalty=repetition_penalty, mega=mega,
        mega_qtype=mega_qtype, vtail=vtail, n_tail=n_tail)
    return st, jnp.stack([st.done.astype(jnp.int32), st.pos])


def dia_generate_tokens_chunked(cfg: DiaConfig, w: DiaWeights, cross_k,
                                cross_v, key, *, max_steps: int,
                                chunk: int | None = None, **gen_kw):
    """Host-chunked Dia generation (early stop between chunks; chunk sizes
    grow 64->128->256 per common.chunk_schedule unless pinned)."""
    from ...common import chunk_schedule
    sched = iter(lambda: chunk, None) if chunk else chunk_schedule()
    st = _dia_init_state(cfg, key, max_steps)
    n = 0
    for c in sched:
        if n >= max_steps + cfg.max_delay + c:
            break
        st, status = dia_decode_chunk_status(cfg, w, cross_k, cross_v, st,
                                             n_steps=c, max_steps=max_steps,
                                             **gen_kw)
        n += c
        if bool(np.asarray(status)[0]):
            break
    return st.out_tokens, st.pos


def adjust_output_tokens(out: np.ndarray, n_steps: int, cfg: DiaConfig) -> np.ndarray:
    """Delay undo (reference model.cpp:825-847): frame i channel ii reads
    out[i + delay_pattern[ii], ii]; frames with invalid tokens dropped."""
    delay = np.asarray(cfg.delay_pattern)
    out = np.asarray(out[:n_steps])
    frames = []
    for i in range(max(0, n_steps - cfg.max_delay)):
        idx = i + delay
        if np.any(idx >= n_steps):
            break
        row = out[idx, np.arange(cfg.n_output_heads)]
        if np.all(row < cfg.audio_vocab_size):
            frames.append(row)
    if not frames:
        return np.zeros((0, cfg.n_output_heads), np.int64)
    return np.stack(frames).astype(np.int64)


def tokenize_sentence(text: str, cfg: DiaConfig) -> List[int]:
    """Byte tokenizer with [S1]/[S2] -> 0x01/0x02 (model.cpp:639-684)."""
    text = text.strip()
    if not text.startswith("[S1]") and not text.startswith("[S2]"):
        text = "[S1] " + text
    if not text.endswith("."):
        text = text + "."
    text = text.replace("[S1]", "\x01").replace("[S2]", "\x02")
    data = text.encode("utf-8")
    if len(data) > cfg.max_encoder_context_length:
        raise ValueError(
            f"Dia supports at most {cfg.max_encoder_context_length} "
            f"characters; got {len(data)}")
    return list(data)


# ---------------------------------------------------------------------------
# Loading
# ---------------------------------------------------------------------------

def load_dia_weights(r: GGUFReader, cfg: DiaConfig) -> DiaWeights:
    get = lambda n: from_gguf_tensor(r, n)

    enc_layers = []
    for l in range(cfg.n_encoder_layers):
        b = f"dia.encoder.layers.{l}."
        enc_layers.append(DiaEncoderLayer(
            sa_norm=get(b + "pre_sa_norm"),
            q=get(b + "q_proj"), k=get(b + "k_proj"), v=get(b + "v_proj"),
            o=get(b + "o_proj"),
            mlp_norm=get(b + "post_sa_norm"),
            gate=get(b + "gate"), up=get(b + "up"), wo=get(b + "wo"),
        ))
    dec_layers = []
    for l in range(cfg.n_decoder_layers):
        b = f"dia.decoder.layers.{l}."
        dec_layers.append(DiaDecoderLayer(
            sa_norm=get(b + "pre_sa_norm"),
            self_q=get(b + "self_q_proj"), self_k=get(b + "self_k_proj"),
            self_v=get(b + "self_v_proj"), self_o=get(b + "self_o_proj"),
            ca_norm=get(b + "pre_ca_norm"),
            cross_q=get(b + "cross_q_proj"), cross_k=get(b + "cross_k_proj"),
            cross_v=get(b + "cross_v_proj"), cross_o=get(b + "cross_o_proj"),
            mlp_norm=get(b + "pre_mlp_norm"),
            gate=get(b + "gate"), up=get(b + "up"), wo=get(b + "wo"),
        ))
    embds = jnp.stack([dense(get(f"dia.decoder.embeddings.{i}"))
                       for i in range(cfg.n_output_heads)])
    heads = stack_weights([get(f"dia.decoder.heads.{i}")
                           for i in range(cfg.n_output_heads)])
    if isinstance(heads, jnp.ndarray):
        heads = heads.reshape(-1, heads.shape[-1])
    else:
        from ...ops.quant_matmul import QuantTensor
        heads = QuantTensor(
            heads.codes_t.transpose(1, 0, 2).reshape(heads.codes_t.shape[1], -1),
            heads.scales_t.transpose(1, 0, 2).reshape(heads.scales_t.shape[1], -1),
            heads.qtype)
    stack = lambda lws, cls: cls(*[stack_weights([getattr(lw, f) for lw in lws])
                                   for f in cls._fields])
    return DiaWeights(
        enc_embedding=dense(get("dia.encoder.embedding")),
        enc_layers=stack(enc_layers, DiaEncoderLayer),
        enc_norm=get("dia.encoder.norm"),
        dec_embds=embds,
        dec_layers=stack(dec_layers, DiaDecoderLayer),
        dec_norm=get("dia.decoder.norm"),
        heads=heads,
    )


class DiaRunner(TTSRunner):
    arch = "dia"

    def __init__(self, cfg: DiaConfig, weights: DiaWeights, dac_runner=None):
        self.cfg = cfg
        self.weights = weights
        self.dac = dac_runner
        from ...ops.quant_matmul import QuantTensor
        if isinstance(self.weights.heads, QuantTensor):
            # per-head vocab padding to the Pallas alignment (1028 -> N 9252
            # otherwise falls back to the XLA dense-dequant path) + bf16
            # scales + nibble-packed Q4 codes; padded logits are zero and
            # sliced off before the CFG merge
            self.weights = self.weights._replace(
                heads=self.weights.heads.fast_stacked_heads(
                    cfg.n_output_heads, cfg.output_vocab_size))
        self._mega, self._mega_qtype = maybe_prep_dia_mega(cfg, self.weights)

    def _encode_for_decode(self, ids):
        """Encoder pass + cross-K/V packing for the active decode path."""
        cfg = self.cfg
        tokens = np.zeros((2, cfg.max_encoder_context_length), np.int32)
        tokens[0, : len(ids)] = ids
        _, ck, cv = dia_encode(cfg, self.weights, jnp.asarray(tokens),
                               jnp.int32(len(ids)))
        if self._mega is None:
            return ck, cv, {}
        from ...ops.dia_megastep import prep_dia_cross
        ckp, cvp, vtail, n_tail = prep_dia_cross(ck, cv, len(ids))
        return ckp, cvp, dict(mega=self._mega, mega_qtype=self._mega_qtype,
                              vtail=vtail, n_tail=n_tail)

    def generate_codes(self, text: str, config: GenerationConfig):
        cfg = self.cfg
        ids = tokenize_sentence(text, cfg)
        ck, cv, mega_kw = self._encode_for_decode(ids)
        max_steps = cfg.max_generation_size
        if config.max_tokens and config.max_tokens > cfg.max_delay:
            max_steps = config.max_tokens
        seed = config.seed if config.seed is not None else np.random.randint(2 ** 31)
        out, n_steps = dia_generate_tokens_chunked(
            cfg, self.weights, ck, cv, jax.random.PRNGKey(seed),
            max_steps=max_steps, do_sample=config.sample,
            temperature=float(config.temperature), top_k=int(config.top_k),
            top_p=float(config.top_p),
            repetition_penalty=float(config.repetition_penalty), **mega_kw)
        return adjust_output_tokens(np.asarray(out), int(n_steps), cfg)

    def generate(self, text: str, config: GenerationConfig | None = None) -> TTSResponse:
        config = config or GenerationConfig()
        codes = self.generate_codes(text, config)
        if self.dac is None or codes.shape[0] == 0:
            return TTSResponse(np.zeros(0, np.float32), SAMPLE_RATE_DAC)
        audio = self.dac.decode(codes)
        return TTSResponse(np.asarray(audio, np.float32), SAMPLE_RATE_DAC)

    def generate_stream(self, text: str, config: GenerationConfig | None = None,
                        chunk: int = 64, margin: int = 16):
        """Streaming generation: encoder + CFG decode in host chunks, DAC
        vocoded incrementally with `margin` frames of conv context on each
        side of the emitted span (same scheme as Parler — exact away from
        chunk seams, since delay-undone frames are append-only). TTFA path."""
        config = config or GenerationConfig()
        cfg = self.cfg
        ids = tokenize_sentence(text, cfg)
        ck, cv, mega_kw = self._encode_for_decode(ids)
        max_steps = cfg.max_generation_size
        if config.max_tokens and config.max_tokens > cfg.max_delay:
            max_steps = config.max_tokens
        seed = config.seed if config.seed is not None else np.random.randint(2 ** 31)
        st = _dia_init_state(cfg, jax.random.PRNGKey(seed), max_steps)
        gen_kw = dict(do_sample=config.sample,
                      temperature=float(config.temperature),
                      top_k=int(config.top_k), top_p=float(config.top_p),
                      repetition_penalty=float(config.repetition_penalty),
                      **mega_kw)
        emitted = 0
        up = self.dac.cfg.up_sampling_factor if self.dac is not None else 0
        n = 0
        while True:
            st, status = dia_decode_chunk_status(
                cfg, self.weights, ck, cv, st, n_steps=chunk,
                max_steps=max_steps, **gen_kw)
            n += chunk
            status_np = np.asarray(status)      # one fetch: [done, pos]
            done = bool(status_np[0]) or \
                n >= max_steps + cfg.max_delay + chunk
            codes = adjust_output_tokens(np.asarray(st.out_tokens),
                                         int(status_np[1]), cfg)
            ready = codes.shape[0] if done else max(0, codes.shape[0] - margin)
            if self.dac is not None and ready > emitted:
                lo = max(0, emitted - margin)
                hi = min(codes.shape[0], ready + (0 if done else margin))
                seg = self.dac.decode(codes[lo:hi])
                yield np.asarray(
                    seg[(emitted - lo) * up: (ready - lo) * up], np.float32)
                emitted = ready
            if done:
                break
