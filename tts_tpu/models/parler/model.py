"""Parler-TTS decoder — TPU-native implementation.

Behavior parity with reference src/models/parler/model.cpp, re-architected
for XLA: instead of rebuilding a ggml graph every decode step
(model.cpp:648-693), the WHOLE autoregressive generation is one jitted
`lax.while_loop` with static shapes — tokens, KV cache, sampling, per-channel
delay/EOS logic all stay on device; only the final token buffer crosses to
host, then the DAC vocoder runs as a second jitted program.

Model math (reference build_parler_graph, model.cpp:520-614):
  pre-LN transformer, learned positional embeddings, causal self-attention
  with KV cache, cross-attention against K/V precomputed from the baked T5
  text encoding (prep_cross_key_values, model.cpp:110-173), GELU MLP,
  9 codebook LM heads. Decode embeds the 9 previous codebook tokens by
  summing 9 embedding tables (model.cpp:387-410).

Generation protocol (model.cpp:762-858):
  prompt prefill (no sampling) -> per-step 9-head sampling with per-channel
  delay (head i receives BOS until step > i) and EOS latching; stop when all
  channels saw EOS or position reaches max_generation; delay-undo + invalid
  token filtering (adjust_output_tokens, model.cpp:734-760) -> DAC.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...common import GenerationConfig, TTSResponse, SAMPLE_RATE_DAC
from ...gguf.reader import GGUFReader
from ...ops import sampling
from ...ops.attention import sdpa
from ...ops.linear import Weight, from_gguf_tensor, matmul, stack_weights, take_rows, dense
from ...text import UnigramTokenizer
from ..base import TTSRunner


@dataclasses.dataclass(eq=False)  # identity hash -> stable jit static arg
class ParlerConfig:
    """Reference defaults = Parler Mini v1 (parler/model.h:66-82); overridden
    by GGUF keys parler-tts.decoder.* (model.cpp:51-108)."""

    n_output_heads: int = 9
    n_encode_length: int = 0
    hidden_size: int = 1024
    max_ctx_length: int = 4096
    n_attn_heads: int = 16
    output_vocab_size: int = 1088
    eos_token_id: int = 1024
    audio_vocab_size: int = 1024
    max_generation_size: int = 2580
    n_layers: int = 24
    bos_token_id: int = 1025
    use_cross_attn: bool = True

    @property
    def head_size(self) -> int:
        return self.hidden_size // self.n_attn_heads

    @classmethod
    def from_gguf(cls, r: GGUFReader) -> "ParlerConfig":
        g = lambda keys, d: r.first_key(keys, d)
        c = cls()
        c.n_encode_length = int(g(["parler-tts.decoder.encode_length", "encode_length"], 0))
        c.hidden_size = int(g(["parler-tts.decoder.hidden_size", "hidden_size"], c.hidden_size))
        c.n_output_heads = int(g(["parler-tts.decoder.output_heads", "output_heads"], c.n_output_heads))
        c.max_ctx_length = int(g(["parler-tts.decoder.context_length", "ctx_length"], c.max_ctx_length))
        c.n_attn_heads = int(g(["parler-tts.decoder.attention.head_count", "attn_heads"], c.n_attn_heads))
        c.output_vocab_size = int(g(["parler-tts.decoder.out_vocab_size", "out_vocab_size"], c.output_vocab_size))
        c.audio_vocab_size = int(g(["parler-tts.decoder.audio_vocab_size", "audio_vocab_size"], c.audio_vocab_size))
        c.max_generation_size = int(g(["parler-tts.decoder.max_generation", "max_generation"], c.max_generation_size))
        c.n_layers = int(g(["parler-tts.decoder.num_hidden_layers", "num_hidden_layers"], c.n_layers))
        c.bos_token_id = int(g(["audio.bos_token_id", "bos_token_id"], c.bos_token_id))
        c.eos_token_id = int(g(["audio.eos_token_id", "eos_token_id"], c.eos_token_id))
        return c


class ParlerLayerWeights(NamedTuple):
    ln1_w: Any; ln1_b: Any
    q_w: Weight; k_w: Weight; v_w: Weight; o_w: Weight
    lnc_w: Any; lnc_b: Any          # cross-attn norm (zeros if disabled)
    cq_w: Weight; co_w: Weight      # cross q / out proj
    cross_k: Any; cross_v: Any      # (heads, Tc, D) precomputed
    ln2_w: Any; ln2_b: Any
    fc1: Weight; fc2: Weight


class ParlerWeights(NamedTuple):
    layers: ParlerLayerWeights      # leaves stacked on axis 0 (L, ...)
    embds: Any                      # (n_heads, vocab+, H) audio codebook embeds
    prompt_embd: Weight             # (prompt_vocab, H)
    pos_embd: Any                   # (max_ctx, H)
    final_ln_w: Any; final_ln_b: Any
    heads: Weight                   # (n_heads * vocab, H) stacked LM heads


def _layer_norm(x, w, b, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _split_heads(x, n_heads):
    # (T, H) -> (heads, T, D)
    t = x.shape[0]
    return x.reshape(t, n_heads, -1).transpose(1, 0, 2)


def _layer_step(cfg: ParlerConfig, lw: ParlerLayerWeights, x, kv_k, kv_v,
                pos, attn_bias, use_cross: bool):
    """One transformer layer over x (T, H). kv_k/kv_v (heads, ctx, D) are this
    layer's cache slices; new K/V rows are written at [pos, pos+T)."""
    t = x.shape[0]
    h = _layer_norm(x, lw.ln1_w, lw.ln1_b)
    q = _split_heads(matmul(h, lw.q_w), cfg.n_attn_heads)
    k = _split_heads(matmul(h, lw.k_w), cfg.n_attn_heads)
    v = _split_heads(matmul(h, lw.v_w), cfg.n_attn_heads)
    kv_k = jax.lax.dynamic_update_slice(kv_k, k.astype(kv_k.dtype), (0, pos, 0))
    kv_v = jax.lax.dynamic_update_slice(kv_v, v.astype(kv_v.dtype), (0, pos, 0))
    if t == 1:
        # decode step: paged flash attention reads only pages up to pos
        from ...ops.decode_attention import decode_attention
        attn = decode_attention(q[:, 0, :], kv_k, kv_v, pos)[:, None, :]
    else:
        attn = sdpa(q, kv_k, kv_v, bias=attn_bias)      # (heads, T, D)
    attn = attn.transpose(1, 0, 2).reshape(t, cfg.hidden_size)
    x = x + matmul(attn, lw.o_w)
    if use_cross:
        h = _layer_norm(x, lw.lnc_w, lw.lnc_b)
        q = _split_heads(matmul(h, lw.cq_w), cfg.n_attn_heads)
        attn = sdpa(q, lw.cross_k, lw.cross_v)
        attn = attn.transpose(1, 0, 2).reshape(t, cfg.hidden_size)
        x = x + matmul(attn, lw.co_w)
    h = _layer_norm(x, lw.ln2_w, lw.ln2_b)
    h = matmul(h, lw.fc1)
    h = jax.nn.gelu(h, approximate=True)  # ggml_gelu is the tanh approximation
    x = x + matmul(h, lw.fc2)
    return x, kv_k, kv_v


def _transformer(cfg: ParlerConfig, w: ParlerWeights, x, kv_k, kv_v, pos,
                 attn_bias, use_cross: bool):
    """Scan over stacked layers. kv_k/kv_v: (L, heads, ctx, D)."""

    def body(carry, inp):
        xc = carry
        lw, kk, vv = inp
        xo, kk, vv = _layer_step(cfg, lw, xc, kk, vv, pos, attn_bias, use_cross)
        return xo, (kk, vv)

    x, (kv_k, kv_v) = jax.lax.scan(body, x, (w.layers, kv_k, kv_v))
    x = _layer_norm(x, w.final_ln_w, w.final_ln_b)
    return x, kv_k, kv_v


def _logits_last(cfg: ParlerConfig, w: ParlerWeights, x_last):
    """(H,) hidden -> (n_heads, vocab) logits via the stacked head matmul.
    Heads may carry per-head vocab padding (fast_stacked_heads) — padded
    columns are exactly zero and sliced off here."""
    out = matmul(x_last[None, :], w.heads)[0]
    vocab_p = out.shape[-1] // cfg.n_output_heads
    return out.reshape(cfg.n_output_heads, vocab_p)[:, : cfg.output_vocab_size]


@functools.partial(jax.jit, static_argnames=("cfg", "use_cross"))
def parler_prefill(cfg: ParlerConfig, w: ParlerWeights, tokens,
                   kv_k, kv_v, use_cross: bool = True):
    """Prompt prefill: tokens (P,) padded; writes KV rows [0, P).

    Padded rows are junk but are always overwritten by later audio steps
    before any query attends to them (audio step s writes row valid_len+s and
    attends rows <= valid_len+s).
    """
    p = tokens.shape[0]
    x = take_rows(w.prompt_embd, tokens) + w.pos_embd[:p]
    i = jnp.arange(p)[:, None]
    j = jnp.arange(kv_k.shape[-2])[None, :]
    bias = jnp.where(j <= i, 0.0, -jnp.inf).astype(x.dtype)  # (P, ctx)
    x, kv_k, kv_v = _transformer(cfg, w, x, kv_k, kv_v, 0, bias, use_cross)
    return kv_k, kv_v


class DecodeState(NamedTuple):
    kv_k: Any
    kv_v: Any
    pos: Any            # current cache position (prompt_len + step)
    step: Any           # audio step counter
    tokens_in: Any      # (n_heads,) next input codebook tokens
    eos_seen: Any       # (n_heads,) bool — lags one step for the feed
    out_tokens: Any     # (max_gen, n_heads)
    sampler_state: sampling.SamplerState
    key: Any


def _parler_decode_body(cfg: ParlerConfig, w: ParlerWeights, ctx: int, *,
                        use_cross, do_sample, temperature, top_k, top_p,
                        repetition_penalty, mega=None, mega_qtype=None):
    """One decode step: DecodeState -> DecodeState (shared by the while-loop
    and the chunked-scan drivers).

    With mega/mega_qtype set, the transformer stack runs as the single-
    pallas-call megakernel (ops.parler_megastep) instead of the per-matmul
    scan — ~5x faster per step on TPU; the KV row write and the final layer
    norm move out here."""
    nh = cfg.n_output_heads
    j = jnp.arange(ctx)[None, :]

    def body(st: DecodeState):
        # embed: sum the 9 per-codebook embeddings + positional
        embs = jax.vmap(lambda e, t: e[t])(w.embds, st.tokens_in)  # (nh, H)
        x = jnp.sum(embs, axis=0, keepdims=True) + w.pos_embd[st.pos][None, :]
        from ...ops.parler_flat import ParlerFlatMega
        flat_ok = isinstance(mega, ParlerFlatMega) and \
            mega.use_cross == use_cross
        if flat_ok or (mega is not None
                       and not isinstance(mega, ParlerFlatMega)):
            if flat_ok:
                from ...ops.parler_flat import parler_flat_megastep
                xo, kn, vn = parler_flat_megastep(
                    mega, x, st.kv_k, st.kv_v, st.pos, qtype=mega_qtype,
                    n_heads=cfg.n_attn_heads,
                    interpret=jax.devices()[0].platform != "tpu")
            else:
                from ...ops.parler_megastep import parler_megastep
                xo, kn, vn = parler_megastep(
                    mega, x, st.kv_k, st.kv_v, st.pos, qtype=mega_qtype,
                    use_cross=use_cross, n_heads=cfg.n_attn_heads)
            L, heads, d = cfg.n_layers, cfg.n_attn_heads, cfg.head_size
            kv_k2 = jax.lax.dynamic_update_slice(
                st.kv_k, kn.reshape(L, heads, 1, d).astype(st.kv_k.dtype),
                (0, 0, st.pos, 0))
            kv_v2 = jax.lax.dynamic_update_slice(
                st.kv_v, vn.reshape(L, heads, 1, d).astype(st.kv_v.dtype),
                (0, 0, st.pos, 0))
            x = _layer_norm(xo, w.final_ln_w, w.final_ln_b)
        else:
            bias = jnp.where(j <= st.pos, 0.0, -jnp.inf).astype(x.dtype)  # (1, ctx)
            x, kv_k2, kv_v2 = _transformer(cfg, w, x, st.kv_k, st.kv_v, st.pos,
                                           bias, use_cross)
        logits = _logits_last(cfg, w, x[0])
        key, sub = jax.random.split(st.key)
        toks, s_state = sampling.sample_or_greedy(
            sub, logits, st.sampler_state, do_sample=do_sample,
            temperature=temperature, top_k=top_k, top_p=top_p,
            repetition_penalty=repetition_penalty)
        out = jax.lax.dynamic_update_slice(st.out_tokens, toks[None, :],
                                           (st.step, 0))
        # feed uses eos_seen as of BEFORE this sample (reference lag,
        # model.cpp:779-785), then latch with the new sample
        heads_i = jnp.arange(nh)
        nxt = jnp.where(st.step + 1 > heads_i,
                        jnp.where(st.eos_seen, cfg.eos_token_id, toks),
                        cfg.bos_token_id).astype(jnp.int32)
        eos = st.eos_seen | (toks == cfg.eos_token_id)
        return DecodeState(kv_k2, kv_v2, st.pos + 1, st.step + 1, nxt, eos,
                           out, s_state, key)

    return body


def _parler_not_done(cfg: ParlerConfig, st: DecodeState):
    # reference check_stopping (model.cpp:715-732): stop at max position or
    # when every channel latched EOS (only checked once outputs exist)
    max_steps = cfg.max_generation_size
    return ((st.step == 0) | ~jnp.all(st.eos_seen)) & \
        (st.pos < max_steps) & (st.step < max_steps)


def _parler_init_state(cfg: ParlerConfig, prompt_len, kv_k, kv_v, key):
    nh = cfg.n_output_heads
    return DecodeState(
        kv_k=kv_k, kv_v=kv_v,
        pos=prompt_len.astype(jnp.int32),
        step=jnp.int32(0),
        tokens_in=jnp.full((nh,), cfg.bos_token_id, jnp.int32),
        eos_seen=jnp.zeros((nh,), bool),
        out_tokens=jnp.zeros((cfg.max_generation_size, nh), jnp.int32),
        sampler_state=sampling.init_state(nh),
        key=key,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "use_cross", "do_sample",
                                             "temperature", "top_k", "top_p",
                                             "repetition_penalty"))
def parler_generate_tokens(cfg: ParlerConfig, w: ParlerWeights, prompt_len,
                           kv_k, kv_v, key, *, use_cross: bool = True,
                           do_sample: bool = True, temperature: float = 1.0,
                           top_k: int = 0, top_p: float = 1.0,
                           repetition_penalty: float = 1.0):
    """Full on-device AR generation as one lax.while_loop.

    Returns (out_tokens, n_steps). NOTE: some TPU toolchains compile Pallas
    kernels inside while_loop pathologically slowly; quantized weights should
    prefer `parler_generate_tokens_chunked`.
    """
    st0 = _parler_init_state(cfg, prompt_len, kv_k, kv_v, key)
    body = _parler_decode_body(
        cfg, w, kv_k.shape[-2], use_cross=use_cross, do_sample=do_sample,
        temperature=temperature, top_k=top_k, top_p=top_p,
        repetition_penalty=repetition_penalty)
    st = jax.lax.while_loop(lambda s: _parler_not_done(cfg, s), body, st0)
    return st.out_tokens, st.step


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "use_cross",
                                             "do_sample", "temperature",
                                             "top_k", "top_p",
                                             "repetition_penalty",
                                             "mega_qtype"))
def parler_decode_chunk(cfg: ParlerConfig, w: ParlerWeights, st: DecodeState,
                        *, n_steps: int, use_cross: bool = True,
                        do_sample: bool = True, temperature: float = 1.0,
                        top_k: int = 0, top_p: float = 1.0,
                        repetition_penalty: float = 1.0,
                        mega=None, mega_qtype=None):
    """n_steps decode steps as a lax.scan (fixed trip count -> Pallas-friendly
    on every backend); finished state passes through unchanged."""
    body = _parler_decode_body(
        cfg, w, st.kv_k.shape[-2], use_cross=use_cross, do_sample=do_sample,
        temperature=temperature, top_k=top_k, top_p=top_p,
        repetition_penalty=repetition_penalty, mega=mega,
        mega_qtype=mega_qtype)

    def step(st, _):
        keep = _parler_not_done(cfg, st)
        st2 = body(st)
        # Freeze the small state leaves when done — but pass the KV caches
        # through UNMASKED: a keep-masked select would stream the whole
        # (L, heads, ctx, D) cache through HBM every step (~0.6 ms). The
        # frozen-state body writes K/V at the stale `pos`, which is harmless:
        # pos does not advance, attention masks rows >= pos, and a real step
        # would overwrite that row.
        def sel(a, b):
            return jnp.where(keep, b, a) if a.ndim == 0 else \
                jnp.where(jnp.reshape(keep, (1,) * a.ndim), b, a)
        st = DecodeState(
            kv_k=st2.kv_k, kv_v=st2.kv_v,
            pos=sel(st.pos, st2.pos), step=sel(st.step, st2.step),
            tokens_in=sel(st.tokens_in, st2.tokens_in),
            eos_seen=sel(st.eos_seen, st2.eos_seen),
            out_tokens=sel(st.out_tokens, st2.out_tokens),
            sampler_state=jax.tree_util.tree_map(sel, st.sampler_state,
                                                 st2.sampler_state),
            key=sel(st.key, st2.key))
        return st, None

    st, _ = jax.lax.scan(step, st, None, length=n_steps)
    return st


@functools.partial(jax.jit, static_argnames=("cfg",))
def _parler_not_done_jit(cfg: ParlerConfig, step, eos_seen, pos):
    max_steps = cfg.max_generation_size
    return ((step == 0) | ~jnp.all(eos_seen)) & (pos < max_steps) & \
        (step < max_steps)


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "use_cross",
                                             "do_sample", "temperature",
                                             "top_k", "top_p",
                                             "repetition_penalty",
                                             "mega_qtype"))
def parler_decode_chunk_status(cfg: ParlerConfig, w: ParlerWeights,
                               st: DecodeState, *, n_steps: int,
                               use_cross: bool = True, do_sample: bool = True,
                               temperature: float = 1.0, top_k: int = 0,
                               top_p: float = 1.0,
                               repetition_penalty: float = 1.0,
                               mega=None, mega_qtype=None):
    """Decode chunk + packed [continue, step] status in ONE dispatch. On the
    remote-compile relay every extra dispatch/fetch costs a ~25-35 ms round
    trip (tools/probe_ttfa.py), so the host loop reads one small status
    array instead of dispatching a separate done-check."""
    st = parler_decode_chunk(
        cfg, w, st, n_steps=n_steps, use_cross=use_cross,
        do_sample=do_sample, temperature=temperature, top_k=top_k,
        top_p=top_p, repetition_penalty=repetition_penalty, mega=mega,
        mega_qtype=mega_qtype)
    cont = _parler_not_done(cfg, st)
    return st, jnp.stack([cont.astype(jnp.int32), st.step])


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "use_cross",
                                             "do_sample", "temperature",
                                             "top_k", "top_p",
                                             "repetition_penalty",
                                             "mega_qtype"))
def parler_stream_first(cfg: ParlerConfig, w: ParlerWeights, tokens,
                        prompt_len, seed, *, n_steps: int,
                        use_cross: bool = True, do_sample: bool = True,
                        temperature: float = 1.0, top_k: int = 0,
                        top_p: float = 1.0, repetition_penalty: float = 1.0,
                        mega=None, mega_qtype=None):
    """The ENTIRE first streaming round — KV-cache allocation, prompt
    prefill, state init, and the first decode chunk — fused into one
    dispatch, returning (state, packed) where packed (1 + n_steps, nh) i32
    stacks [continue, step, 0...] over the first chunk's out_tokens rows.

    Rationale (tools/probe_ttfa.py): each dispatch or fetch costs a ~33 ms
    relay round trip; the old path spent ~600 ms on zeros/prefill/init/
    chunk/status/out_tokens as separate dispatches. One dispatch + ONE
    small fetch (this packed array) + one vocode round gets p50 TTFA under
    300 ms (BASELINE north star)."""
    from ...common import kv_cache_dtype
    dt = kv_cache_dtype()
    shape = (cfg.n_layers, cfg.n_attn_heads, cfg.max_ctx_length,
             cfg.head_size)
    kv_k, kv_v = parler_prefill(cfg, w, tokens, jnp.zeros(shape, dt),
                                jnp.zeros(shape, dt), use_cross=use_cross)
    st = _parler_init_state(cfg, prompt_len.astype(jnp.int32), kv_k, kv_v,
                            jax.random.PRNGKey(seed))
    st = parler_decode_chunk(
        cfg, w, st, n_steps=n_steps, use_cross=use_cross,
        do_sample=do_sample, temperature=temperature, top_k=top_k,
        top_p=top_p, repetition_penalty=repetition_penalty, mega=mega,
        mega_qtype=mega_qtype)
    cont = _parler_not_done(cfg, st)
    status = jnp.stack([cont.astype(jnp.int32), st.step])
    nh = cfg.n_output_heads
    packed = jnp.concatenate(
        [jnp.pad(status[None, :], ((0, 0), (0, nh - 2))),
         st.out_tokens[:n_steps]], axis=0)
    return st, packed


def parler_generate_tokens_chunked(cfg: ParlerConfig, w: ParlerWeights,
                                   prompt_len, kv_k, kv_v, key,
                                   chunk: int | None = None, **gen_kw):
    """Host-chunked generation: jitted scan chunks with early stop between
    chunks (one host sync per chunk). Chunk sizes grow 64->128->256 to
    amortize the per-dispatch relay cost (common.chunk_schedule); pass
    `chunk` to pin a fixed size."""
    from ...common import chunk_schedule
    sched = iter(lambda: chunk, None) if chunk else chunk_schedule()
    st = _parler_init_state(cfg, jnp.int32(prompt_len), kv_k, kv_v, key)
    for c in sched:
        st, status = parler_decode_chunk_status(cfg, w, st, n_steps=c,
                                                **gen_kw)
        if not bool(np.asarray(status)[0]):
            break
    return st.out_tokens, st.step


def maybe_prep_mega(cfg: ParlerConfig, w: ParlerWeights):
    """(MegaLayers, qtype) when the megakernel decode path applies (on TPU,
    all projections block-quantized with one qtype, kernel-friendly dims),
    else (None, None) -> the per-matmul path."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    import os
    force = os.environ.get("TTS_TPU_MEGAKERNEL")
    if force == "0" or (not on_tpu and force != "1"):
        return None, None
    if (cfg.hidden_size % 128 or cfg.head_size % 64 or
            cfg.hidden_size // 32 < 8):
        return None, None
    try:
        from ...ops.parler_megastep import prep_mega_layers
        return prep_mega_layers(w.layers)
    except ValueError:
        return None, None


def maybe_prep_parler_flat(cfg: ParlerConfig, w: ParlerWeights):
    """Flat-tile megastep prep for Parler (ops/parler_flat). NOTE: at
    Parler scale the PHASE megastep measured faster in the full
    generation loop (0.816 vs 1.127 ms/step-eff head-to-head on v5e —
    24 layers x 8.2 MB phases pipeline fine, and the fine grid's
    per-phase overhead dominates), so the runner preps maybe_prep_mega;
    this stays as the measured alternative. Returns
    (flat_or_mega_or_None, qtype)."""
    mega, qtype = maybe_prep_mega(cfg, w)
    if mega is None:
        return None, None
    try:
        from ...ops.parler_flat import prep_parler_flat
        flat = prep_parler_flat(mega, qtype, cfg.max_ctx_length,
                                use_cross=cfg.use_cross_attn)
        return flat, qtype
    except ValueError:
        return mega, qtype


def adjust_output_tokens(out: np.ndarray, n_steps: int, cfg: ParlerConfig) -> np.ndarray:
    """Delay-undo + invalid-frame filtering (reference model.cpp:734-760).

    frame i channel ii reads out[i+ii, ii]; frames containing any token
    >= audio_vocab_size (EOS/BOS/pad) are dropped.
    """
    nh = cfg.n_output_heads
    out = np.asarray(out[:n_steps])
    frames = []
    for i in range(n_steps):
        idx = i + np.arange(nh)
        if np.any(idx >= n_steps):
            break
        row = out[idx, np.arange(nh)]
        if np.all(row < cfg.audio_vocab_size):
            frames.append(row)
    if not frames:
        return np.zeros((0, nh), np.int64)
    return np.stack(frames).astype(np.int64)


# ---------------------------------------------------------------------------
# Loading
# ---------------------------------------------------------------------------

def precompute_cross_kv(cfg: ParlerConfig, text_encoding: jax.Array,
                        k_ws: list, v_ws: list):
    """Per-layer cross K/V from the baked text encoding
    (reference prep_cross_key_values, model.cpp:110-173)."""
    ks, vs = [], []
    for kw, vw in zip(k_ws, v_ws):
        k = matmul(text_encoding, kw)   # (Tc, H)
        v = matmul(text_encoding, vw)
        ks.append(_split_heads(k, cfg.n_attn_heads))
        vs.append(_split_heads(v, cfg.n_attn_heads))
    return jnp.stack(ks), jnp.stack(vs)


def load_parler_weights(r: GGUFReader, cfg: ParlerConfig,
                        prefix: str = "decoder.") -> ParlerWeights:
    names = set(r.tensor_names())

    def get(name: str) -> Weight:
        return from_gguf_tensor(r, prefix + name)

    lws = []
    k_ws, v_ws = [], []
    for l in range(cfg.n_layers):
        b = f"layers.{l}."
        zeros_h = jnp.zeros((cfg.hidden_size,), jnp.float32)
        has_cross = (prefix + b + "encoder_attn.q_proj.weight") in names and cfg.use_cross_attn
        k_ws.append(get(b + "encoder_attn.k_proj.weight") if has_cross else None)
        v_ws.append(get(b + "encoder_attn.v_proj.weight") if has_cross else None)
        lws.append(dict(
            ln1_w=get(b + "self_attn_layer_norm.weight"),
            ln1_b=get(b + "self_attn_layer_norm.bias"),
            q_w=get(b + "self_attn.q_proj.weight"),
            k_w=get(b + "self_attn.k_proj.weight"),
            v_w=get(b + "self_attn.v_proj.weight"),
            o_w=get(b + "self_attn.out_proj.weight"),
            lnc_w=get(b + "encoder_attn_layer_norm.weight") if has_cross else zeros_h,
            lnc_b=get(b + "encoder_attn_layer_norm.bias") if has_cross else zeros_h,
            cq_w=get(b + "encoder_attn.q_proj.weight") if has_cross else jnp.zeros((cfg.hidden_size, cfg.hidden_size), jnp.float32),
            co_w=get(b + "encoder_attn.out_proj.weight") if has_cross else jnp.zeros((cfg.hidden_size, cfg.hidden_size), jnp.float32),
            ln2_w=get(b + "final_layer_norm.weight"),
            ln2_b=get(b + "final_layer_norm.bias"),
            fc1=get(b + "fc1.weight"),
            fc2=get(b + "fc2.weight"),
        ))

    use_cross = cfg.use_cross_attn and all(k is not None for k in k_ws) and \
        (prefix + "text_encoding") in names
    if use_cross:
        text_encoding = jnp.asarray(np.asarray(r.array(prefix + "text_encoding"),
                                               dtype=np.float32))
        cfg.n_encode_length = text_encoding.shape[0]
        cross_k, cross_v = precompute_cross_kv(cfg, text_encoding, k_ws, v_ws)
    else:
        cfg.use_cross_attn = False
        k_ws = v_ws = None
        tc = max(cfg.n_encode_length, 1)
        cross_k = jnp.zeros((cfg.n_layers, cfg.n_attn_heads, tc, cfg.head_size))
        cross_v = jnp.zeros_like(cross_k)

    layer_stack = ParlerLayerWeights(**{
        f: stack_weights([lw[f] for lw in lws]) for f in ParlerLayerWeights._fields
        if f not in ("cross_k", "cross_v")
    }, cross_k=cross_k, cross_v=cross_v)

    embds = jnp.stack([dense(get(f"embed_tokens.{i}.weight"))
                       for i in range(cfg.n_output_heads)])
    heads = stack_weights([get(f"lm_heads.{i}.weight.head")
                           for i in range(cfg.n_output_heads)])
    # flatten stacked heads (nh, vocab, H) -> (nh*vocab, H) for one matmul
    if isinstance(heads, jnp.ndarray):
        heads = heads.reshape(-1, heads.shape[-1])
    else:
        # quantized heads: concatenate along N (codes_t lane axis)
        from ...ops.quant_matmul import QuantTensor
        heads = QuantTensor(
            heads.codes_t.transpose(1, 0, 2).reshape(heads.codes_t.shape[1], -1),
            heads.scales_t.transpose(1, 0, 2).reshape(heads.scales_t.shape[1], -1),
            heads.qtype)

    weights = ParlerWeights(
        layers=layer_stack,
        embds=embds,
        prompt_embd=get("embed_prompts"),
        pos_embd=dense(get("positional_embed")),
        final_ln_w=get("layer_norm.weight"),
        final_ln_b=get("layer_norm.bias"),
        heads=heads,
    )
    return weights, k_ws, v_ws


class ParlerRunner(TTSRunner):
    arch = "parler-tts"

    def __init__(self, cfg: ParlerConfig, weights: ParlerWeights,
                 tokenizer: UnigramTokenizer, dac_runner=None,
                 cross_kv_projs=None, prompt_buckets=(64, 128, 256, 512)):
        self.cfg = cfg
        self.weights = weights
        self.tokenizer = tokenizer
        self.dac = dac_runner
        self.cross_kv_projs = cross_kv_projs  # (k_ws, v_ws) for re-encoding
        self.prompt_buckets = prompt_buckets
        from ...ops.quant_matmul import QuantTensor
        if isinstance(self.weights.heads, QuantTensor):
            # per-head vocab padding to the Pallas alignment (9*1088 = 9792
            # is NOT 256-aligned -> XLA dense-dequant fallback otherwise)
            # + bf16 scales (fast dequant path) + nibble-packed Q4 codes
            self.weights = self.weights._replace(
                heads=self.weights.heads.fast_stacked_heads(
                    self.cfg.n_output_heads, self.cfg.output_vocab_size))
        self._mega, self._mega_qtype = maybe_prep_mega(self.cfg, self.weights)

    def update_conditional_prompt(self, file_path: str, prompt: str) -> None:
        """Re-encode the voice-conditioning prompt through an external T5
        GGUF and rebuild the cross K/V (reference parler
        update_conditional_prompt, model.cpp:510-518)."""
        if not self.cfg.use_cross_attn or self.cross_kv_projs is None:
            raise RuntimeError("cross-attention disabled; cannot set "
                               "conditional prompt")
        from ..t5.model import text_encoder_from_file
        enc = text_encoder_from_file(file_path, self.tokenizer)
        encoding = jnp.asarray(enc.generate(prompt))
        self.cfg.n_encode_length = encoding.shape[0]
        k_ws, v_ws = self.cross_kv_projs
        cross_k, cross_v = precompute_cross_kv(self.cfg, encoding, k_ws, v_ws)
        self.weights = self.weights._replace(
            layers=self.weights.layers._replace(cross_k=cross_k,
                                                cross_v=cross_v))
        self._mega, self._mega_qtype = maybe_prep_mega(self.cfg, self.weights)

    def _bucket(self, n: int) -> int:
        for b in self.prompt_buckets:
            if n <= b:
                return b
        return self.prompt_buckets[-1]

    def _empty_kv(self):
        from ...common import kv_cache_dtype
        c = self.cfg
        dt = kv_cache_dtype()
        shape = (c.n_layers, c.n_attn_heads, c.max_ctx_length, c.head_size)
        return jnp.zeros(shape, dt), jnp.zeros(shape, dt)

    def generate_codes(self, text: str, config: GenerationConfig):
        """Text -> (frames, n_heads) int codes (delay-undone, filtered)."""
        cfg = self.cfg
        ids = self.tokenizer.tokenize(text)
        ids.append(self.tokenizer.eos_token)
        p = self._bucket(len(ids))
        tokens = np.zeros((p,), np.int32)
        tokens[: len(ids)] = ids
        kv_k, kv_v = self._empty_kv()
        kv_k, kv_v = parler_prefill(cfg, self.weights, jnp.asarray(tokens),
                                    kv_k, kv_v, use_cross=cfg.use_cross_attn)
        seed = config.seed if config.seed is not None else np.random.randint(2**31)
        key = jax.random.PRNGKey(seed)
        out, n_steps = parler_generate_tokens_chunked(
            cfg, self.weights, len(ids), kv_k, kv_v, key,
            use_cross=cfg.use_cross_attn,
            do_sample=config.sample, temperature=float(config.temperature),
            top_k=int(config.top_k), top_p=float(config.top_p),
            repetition_penalty=float(config.repetition_penalty),
            mega=self._mega, mega_qtype=self._mega_qtype)
        n_steps = int(n_steps)
        return adjust_output_tokens(np.asarray(out), n_steps, cfg)

    def generate(self, text: str, config: GenerationConfig | None = None) -> TTSResponse:
        config = config or GenerationConfig()
        codes = self.generate_codes(text, config)
        if self.dac is None or codes.shape[0] == 0:
            return TTSResponse(np.zeros(0, np.float32), SAMPLE_RATE_DAC)
        audio = self.dac.decode(codes)
        return TTSResponse(np.asarray(audio, np.float32), SAMPLE_RATE_DAC)

    def generate_stream(self, text: str, config: GenerationConfig | None = None,
                        chunk: int | None = None, margin: int = 16):
        """Streaming generation: yields float32 waveform chunks as decode
        chunks complete, vocoding incrementally with `margin` frames of
        overlap context on each side (the DAC receptive field) so the
        concatenated stream matches the full decode away from chunk seams.

        This is the time-to-first-audio path (BASELINE north star: p50 TTFA).
        """
        config = config or GenerationConfig()
        cfg = self.cfg
        ids = self.tokenizer.tokenize(text)
        ids.append(self.tokenizer.eos_token)
        p = self._bucket(len(ids))
        tokens = np.zeros((p,), np.int32)
        tokens[: len(ids)] = ids
        seed = config.seed if config.seed is not None else np.random.randint(2**31)
        gen_kw = dict(use_cross=cfg.use_cross_attn, do_sample=config.sample,
                      temperature=float(config.temperature),
                      top_k=int(config.top_k), top_p=float(config.top_p),
                      repetition_penalty=float(config.repetition_penalty))
        emitted = 0
        up = self.dac.cfg.up_sampling_factor if self.dac is not None else 0
        # first round: ONE fused dispatch (kv + prefill + first chunk) and
        # ONE small fetch; the small first chunk minimizes time-to-first-
        # audio, growth amortizes the per-chunk host round-trip after
        from ...common import chunk_schedule
        first = chunk or 32
        sched = iter(lambda: chunk, None) if chunk else \
            chunk_schedule(first=64, cap=256)
        st, packed = parler_stream_first(
            cfg, self.weights, jnp.asarray(tokens), jnp.int32(len(ids)),
            jnp.int32(seed), n_steps=first, mega=self._mega,
            mega_qtype=self._mega_qtype, **gen_kw)
        packed_np = np.asarray(packed)          # the one first-round fetch
        first_round = True
        while True:
            if first_round:
                first_round = False
                done = not bool(packed_np[0, 0])
                n_steps = int(packed_np[0, 1])
                head = packed_np[1:]
            else:
                st, status = parler_decode_chunk_status(
                    cfg, self.weights, st, n_steps=next(sched),
                    mega=self._mega, mega_qtype=self._mega_qtype, **gen_kw)
                status_np = np.asarray(status)  # one small fetch: [cont, step]
                done = not bool(status_np[0])
                n_steps = int(status_np[1])
                head = np.asarray(st.out_tokens)
            codes = adjust_output_tokens(head, n_steps, cfg)
            # frames near the end may still change (delay window); hold back
            # `margin` frames until generation finishes
            ready = codes.shape[0] if done else max(0, codes.shape[0] - margin)
            if self.dac is not None and ready > emitted:
                # decode with margin context on BOTH sides of the emitted
                # span so conv receptive fields see their true neighborhoods
                lo = max(0, emitted - margin)
                hi = min(codes.shape[0], ready + (0 if done else margin))
                seg = self.dac.decode(codes[lo:hi])
                start = (emitted - lo) * up
                stop = (ready - lo) * up
                yield np.asarray(seg[start:stop], np.float32)
                emitted = ready
            if done:
                break
