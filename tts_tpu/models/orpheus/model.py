"""Orpheus (3B, llama-3 architecture) — TPU-native implementation.

Parity: reference src/models/orpheus/model.cpp. A plain llama decoder: RMS
norm (eps 1e-5), GQA (24 q / 8 kv heads), NeoX RoPE theta 500000 with llama3
frequency factors, SiLU MLP, single LM head (vocab 156940). The whole AR
generation is one jitted lax.while_loop (prefill + decode share the KV
cache); tokens stream to SNAC in groups of 7 redistributed over 3 codebook
heads with the fixed offset undo t - 128266 - (i%7)*4096
(prepare_output_tokens, model.cpp:371-387).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...common import GenerationConfig, TTSResponse, SAMPLE_RATE_SNAC
from ...gguf.reader import GGUFReader
from ...ops import sampling
from ...ops.attention import apply_rope_neox
from ...ops.linear import Weight, from_gguf_tensor, matmul, stack_weights, take_rows, dense
from ...text import BPETokenizer
from ..base import TTSRunner

ORPHEUS_VOICES = ("zoe", "zac", "jess", "leo", "mia", "julia", "leah")
PREPENDED_TOKENS = (128259, 128000)
APPENDED_TOKENS = (128009, 128260, 128261, 128257)
HEAD_MAP = (0, 1, 2, 2, 1, 2, 2)  # token slot -> SNAC codebook head


@dataclasses.dataclass(eq=False)
class OrpheusConfig:
    """Defaults = Orpheus 3B (orpheus/model.h:30-46)."""

    vocab_size: int = 156940
    n_attn_heads: int = 24
    n_kv_heads: int = 8
    head_size: int = 128
    max_context_length: int = 1024
    max_generation_size: int = 2100
    stopping_token_id: int = 128258
    eos_token_id: int = 128001
    bos_token_id: int = 128000
    hidden_size: int = 3072
    n_layers: int = 28
    rope_theta: float = 500000.0

    @classmethod
    def from_gguf(cls, r: GGUFReader) -> "OrpheusConfig":
        c = cls()
        g = r.metadata.get
        c.vocab_size = int(g("orpheus.vocab_size", c.vocab_size))
        c.n_attn_heads = int(g("orpheus.attn_heads", c.n_attn_heads))
        c.n_kv_heads = int(g("orpheus.kv_attn_heads", c.n_kv_heads))
        c.head_size = int(g("orpheus.head_dim", c.head_size))
        c.stopping_token_id = int(g("orpheus.stopping_token_id", c.stopping_token_id))
        c.eos_token_id = int(g("tokenizer.ggml.eos_token_id", c.eos_token_id))
        c.bos_token_id = int(g("tokenizer.ggml.bos_token_id", c.bos_token_id))
        c.hidden_size = int(g("orpheus.hidden_size", c.hidden_size))
        c.n_layers = int(g("orpheus.layers", c.n_layers))
        return c


class OrpheusLayer(NamedTuple):
    in_norm: Any
    q: Weight; k: Weight; v: Weight; o: Weight
    post_norm: Any
    gate: Weight; up: Weight; down: Weight


class OrpheusWeights(NamedTuple):
    embd: Weight
    layers: OrpheusLayer
    out_norm: Any
    head: Weight
    rope_freqs: Any


def _rms(x, w, eps=1e-5):
    ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(ms + eps) * w


def _llama_step(cfg: OrpheusConfig, w: OrpheusWeights, x, positions, kv_k,
                kv_v, pos, attn_bias):
    """x (T, H) at cache positions [pos, pos+T). kv (L, n_kv, ctx, D)."""
    t = x.shape[0]
    nh, nkv = cfg.n_attn_heads, cfg.n_kv_heads

    def layer(carry, inp):
        xc = carry
        lw, kk, vv = inp
        h = _rms(xc, lw.in_norm)
        q = matmul(h, lw.q).reshape(t, nh, -1).transpose(1, 0, 2)
        k = matmul(h, lw.k).reshape(t, nkv, -1).transpose(1, 0, 2)
        v = matmul(h, lw.v).reshape(t, nkv, -1).transpose(1, 0, 2)
        q = apply_rope_neox(q, positions, base=cfg.rope_theta,
                            freq_factors=w.rope_freqs)
        k = apply_rope_neox(k, positions, base=cfg.rope_theta,
                            freq_factors=w.rope_freqs)
        kk = jax.lax.dynamic_update_slice(kk, k.astype(kk.dtype), (0, pos, 0))
        vv = jax.lax.dynamic_update_slice(vv, v.astype(vv.dtype), (0, pos, 0))
        scale = 1.0 / np.sqrt(cfg.head_size)
        if t == 1:
            from ...ops.decode_attention import decode_attention
            a = decode_attention(q[:, 0, :], kk, vv, pos, scale=scale)
            a = a.reshape(1, nh * q.shape[-1])
        else:
            g = nh // nkv
            qs = q.reshape(nkv, g, t, -1)
            logits = jnp.einsum("hgqd,hkd->hgqk", qs, kk,
                                preferred_element_type=jnp.float32) * scale
            logits = logits + attn_bias
            probs = jax.nn.softmax(logits, axis=-1)
            a = jnp.einsum("hgqk,hkd->hgqd", probs, vv)
            a = a.reshape(nh, t, -1).transpose(1, 0, 2).reshape(t, -1)
        xc = xc + matmul(a, lw.o)
        h = _rms(xc, lw.post_norm)
        xc = xc + matmul(jax.nn.silu(matmul(h, lw.gate)) * matmul(h, lw.up),
                         lw.down)
        return xc, (kk, vv)

    x, (kv_k, kv_v) = jax.lax.scan(layer, x, (w.layers, kv_k, kv_v))
    return _rms(x, w.out_norm), kv_k, kv_v


@functools.partial(jax.jit, static_argnames=("cfg",))
def orpheus_prefill(cfg: OrpheusConfig, w: OrpheusWeights, tokens, valid_len,
                    kv_k, kv_v):
    """Prompt prefill over padded tokens (P,); returns (last_logits, kv)."""
    p = tokens.shape[0]
    x = take_rows(w.embd, tokens)
    positions = jnp.arange(p)
    i = positions[:, None]
    j = jnp.arange(kv_k.shape[-2])[None, :]
    bias = jnp.where(j <= i, 0.0, -jnp.inf)
    x, kv_k, kv_v = _llama_step(cfg, w, x, positions, kv_k, kv_v, 0, bias)
    last = x[valid_len - 1]
    # head may be vocab-padded for the Pallas fast path (fast_lm_head);
    # padded columns are exactly zero — slice before sampling
    logits = matmul(last[None, :], w.head)[0, : cfg.vocab_size]
    return logits, kv_k, kv_v


class OrpheusState(NamedTuple):
    kv_k: Any
    kv_v: Any
    pos: Any
    token_in: Any       # scalar int32
    n_out: Any
    done: Any
    out_tokens: Any     # (max_gen,)
    sampler_state: sampling.SamplerState
    key: Any


@functools.partial(jax.jit, static_argnames=("cfg", "max_steps", "do_sample",
                                             "temperature", "top_k", "top_p",
                                             "repetition_penalty"))
def orpheus_generate_tokens(cfg: OrpheusConfig, w: OrpheusWeights, first_token,
                            prompt_len, kv_k, kv_v, key, *, max_steps: int,
                            do_sample: bool = True, temperature: float = 1.0,
                            top_k: int = 0, top_p: float = 1.0,
                            repetition_penalty: float = 1.0):
    """AR loop after prefill; first_token is the token sampled from the
    prefill logits. Stops on stopping_token_id or max_steps
    (generate_from_batch, model.cpp:389-405)."""
    ctx = kv_k.shape[-2]
    j = jnp.arange(ctx)[None, :]

    out0 = jnp.zeros((max_steps,), jnp.int32).at[0].set(first_token)
    st0 = OrpheusState(
        kv_k=kv_k, kv_v=kv_v, pos=prompt_len.astype(jnp.int32),
        token_in=first_token.astype(jnp.int32),
        n_out=jnp.int32(1),
        done=first_token == cfg.stopping_token_id,
        out_tokens=out0,
        sampler_state=sampling.init_state(1),
        key=key,
    )

    def cond(st):
        return (~st.done) & (st.n_out < max_steps)

    def body(st: OrpheusState):
        x = take_rows(w.embd, st.token_in[None])
        bias = jnp.where(j <= st.pos, 0.0, -jnp.inf)
        h, kv_k2, kv_v2 = _llama_step(cfg, w, x, st.pos[None], st.kv_k,
                                      st.kv_v, st.pos, bias)
        logits = matmul(h, w.head)[:, : cfg.vocab_size]  # (1, vocab)
        key, sub = jax.random.split(st.key)
        toks, s_state = sampling.sample_or_greedy(
            sub, logits, st.sampler_state, do_sample=do_sample,
            temperature=temperature, top_k=top_k, top_p=top_p,
            repetition_penalty=repetition_penalty)
        tok = toks[0]
        out = st.out_tokens.at[st.n_out].set(tok)
        return OrpheusState(kv_k2, kv_v2, st.pos + 1, tok, st.n_out + 1,
                            tok == cfg.stopping_token_id, out, s_state, key)

    st = jax.lax.while_loop(cond, body, st0)
    return st.out_tokens, st.n_out


def maybe_prep_llama_mega(cfg: OrpheusConfig, w: OrpheusWeights):
    """(LlamaMegaLayers, qtype) when the fused llama decode kernel applies
    (TPU, uniformly quantized projections, kernel-friendly dims), else
    (None, None) -> the per-matmul path. Same gating pattern as Parler's
    maybe_prep_mega."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    import os
    force = os.environ.get("TTS_TPU_MEGAKERNEL")
    if force == "0" or (not on_tpu and force != "1"):
        return None, None
    if cfg.hidden_size % 128 or cfg.head_size % 64:
        return None, None
    try:
        from ...ops.llama_megastep import prep_llama_mega
        return prep_llama_mega(w.layers)
    except ValueError:
        return None, None


def cache_ctx(cfg: OrpheusConfig) -> int:
    """KV-cache context rounded up to the 512-row flash page so the flat
    megastep's paged attention gets whole pages (extra rows are masked)."""
    n = cfg.max_context_length + cfg.max_generation_size
    return -(-n // 512) * 512


def maybe_prep_llama_flat(cfg: OrpheusConfig, w: OrpheusWeights,
                          ctx: int | None = None,
                          page: int | None = None):
    """Prefer the flat-tile megastep (ops/llama_flat: whole stack + LM head
    in one fine-grained weight stream); fall back to the phase megastep,
    then to the per-matmul path. Returns (mega_or_flat_or_None, qtype).

    `ctx` is the KV-cache context the decode will run with (defaults to
    the runner's padded prompt+generation window); `page` overrides the
    flash page size (the batched engine uses its 256-row KV pages)."""
    mega, qtype = maybe_prep_llama_mega(cfg, w)
    if mega is None:
        return None, None
    try:
        from ...ops.llama_flat import prep_llama_flat
        flat = prep_llama_flat(mega, w.head, w.out_norm, qtype,
                               cfg.vocab_size, cfg.n_attn_heads,
                               cfg.n_kv_heads,
                               cache_ctx(cfg) if ctx is None else ctx,
                               page=page)
        return flat, qtype
    except ValueError:
        return mega, qtype


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "max_steps",
                                             "do_sample", "temperature",
                                             "top_k", "top_p",
                                             "repetition_penalty",
                                             "mega_qtype"))
def orpheus_decode_chunk(cfg: OrpheusConfig, w: OrpheusWeights,
                         st: OrpheusState, *, n_steps: int, max_steps: int,
                         do_sample: bool = True, temperature: float = 1.0,
                         top_k: int = 0, top_p: float = 1.0,
                         repetition_penalty: float = 1.0,
                         mega=None, mega_qtype=None):
    """n_steps decode steps as lax.scan with masked updates when done."""
    ctx = st.kv_k.shape[-2]
    j = jnp.arange(ctx)[None, :]

    def step(st: OrpheusState, _):
        now_done = st.done | (st.n_out >= max_steps)
        x = take_rows(w.embd, st.token_in[None])
        from ...ops.llama_flat import LlamaFlatMega
        if isinstance(mega, LlamaFlatMega):
            from ...ops.llama_flat import llama_flat_megastep
            L, nkv, d = cfg.n_layers, cfg.n_kv_heads, cfg.head_size
            lg, kn, vn = llama_flat_megastep(
                mega, x, st.kv_k, st.kv_v, st.pos, qtype=mega_qtype,
                n_heads=cfg.n_attn_heads, n_kv=nkv,
                rope_base=cfg.rope_theta, rope_freq_factors=w.rope_freqs,
                interpret=jax.devices()[0].platform != "tpu")
            kv_k2 = jax.lax.dynamic_update_slice(
                st.kv_k, kn.reshape(L, nkv, 1, d).astype(st.kv_k.dtype),
                (0, 0, st.pos, 0))
            kv_v2 = jax.lax.dynamic_update_slice(
                st.kv_v, vn.reshape(L, nkv, 1, d).astype(st.kv_v.dtype),
                (0, 0, st.pos, 0))
            logits = lg[:, : cfg.vocab_size]
        elif mega is not None:
            from ...ops.llama_megastep import llama_megastep
            L, nkv, d = cfg.n_layers, cfg.n_kv_heads, cfg.head_size
            xo, kn, vn = llama_megastep(
                mega, x, st.kv_k, st.kv_v, st.pos, qtype=mega_qtype,
                n_heads=cfg.n_attn_heads, n_kv=nkv,
                rope_base=cfg.rope_theta, rope_freq_factors=w.rope_freqs)
            kv_k2 = jax.lax.dynamic_update_slice(
                st.kv_k, kn.reshape(L, nkv, 1, d).astype(st.kv_k.dtype),
                (0, 0, st.pos, 0))
            kv_v2 = jax.lax.dynamic_update_slice(
                st.kv_v, vn.reshape(L, nkv, 1, d).astype(st.kv_v.dtype),
                (0, 0, st.pos, 0))
            logits = matmul(_rms(xo, w.out_norm), w.head)[:, : cfg.vocab_size]
        else:
            bias = jnp.where(j <= st.pos, 0.0, -jnp.inf)
            h, kv_k2, kv_v2 = _llama_step(cfg, w, x, st.pos[None], st.kv_k,
                                          st.kv_v, st.pos, bias)
            logits = matmul(h, w.head)[:, : cfg.vocab_size]
        key, sub = jax.random.split(st.key)
        toks, s_state = sampling.sample_or_greedy(
            sub, logits, st.sampler_state, do_sample=do_sample,
            temperature=temperature, top_k=top_k, top_p=top_p,
            repetition_penalty=repetition_penalty)
        tok = toks[0]
        out = st.out_tokens.at[jnp.minimum(st.n_out, max_steps - 1)].set(tok)
        new_st = OrpheusState(kv_k2, kv_v2, st.pos + 1, tok, st.n_out + 1,
                              tok == cfg.stopping_token_id, out, s_state, key)
        frozen = st._replace(done=st.done | now_done)
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
                                             "mega_qtype"))
def orpheus_decode_chunk_status(cfg: OrpheusConfig, w: OrpheusWeights,
                                st: OrpheusState, *, n_steps: int,
                                max_steps: int, do_sample: bool = True,
                                temperature: float = 1.0, top_k: int = 0,
                                top_p: float = 1.0,
                                repetition_penalty: float = 1.0,
                                mega=None, mega_qtype=None):
    """Chunk + packed [done, n_out] status in ONE dispatch (each extra
    dispatch/fetch costs a ~25-35 ms relay round trip)."""
    st = orpheus_decode_chunk(
        cfg, w, st, n_steps=n_steps, max_steps=max_steps,
        do_sample=do_sample, temperature=temperature, top_k=top_k,
        top_p=top_p, repetition_penalty=repetition_penalty, mega=mega,
        mega_qtype=mega_qtype)
    done = st.done | (st.n_out >= max_steps)
    return st, jnp.stack([done.astype(jnp.int32), st.n_out])


def orpheus_generate_tokens_chunked(cfg: OrpheusConfig, w: OrpheusWeights,
                                    first_token, prompt_len, kv_k, kv_v, key,
                                    *, max_steps: int, chunk: int | None = None,
                                    **gen_kw):
    out0 = jnp.zeros((max_steps,), jnp.int32).at[0].set(first_token)
    st = OrpheusState(
        kv_k=kv_k, kv_v=kv_v, pos=jnp.int32(prompt_len),
        token_in=jnp.asarray(first_token, jnp.int32), n_out=jnp.int32(1),
        done=jnp.asarray(first_token == cfg.stopping_token_id).reshape(()),
        out_tokens=out0, sampler_state=sampling.init_state(1),
        key=key)
    from ...common import chunk_schedule
    sched = iter(lambda: chunk, None) if chunk else chunk_schedule()
    n = 1
    for c in sched:
        if n >= max_steps + c:
            break
        st, status = orpheus_decode_chunk_status(cfg, w, st, n_steps=c,
                                                 max_steps=max_steps,
                                                 **gen_kw)
        n += c
        if bool(np.asarray(status)[0]):
            break
    return st.out_tokens, st.n_out


def prepare_output_tokens(out: np.ndarray, n_out: int) -> list:
    """Redistribute flat tokens into 3 SNAC heads with offset undo
    (model.cpp:371-387): slot ii of each 7-group maps to head HEAD_MAP[ii],
    value t - 128266 - (ii%7)*4096."""
    out = np.asarray(out[:n_out], dtype=np.int64)
    chunks = len(out) // 7
    heads = [[], [], []]
    for i in range(chunks):
        for ii in range(7):
            t = out[i * 7 + ii] - 128266 - (ii % 7) * 4096
            heads[HEAD_MAP[ii]].append(int(t))
    return heads


def load_orpheus_weights(r: GGUFReader, cfg: OrpheusConfig) -> OrpheusWeights:
    get = lambda n: from_gguf_tensor(r, n)
    lws = []
    for l in range(cfg.n_layers):
        b = f"orpheus.layers.{l}."
        lws.append(OrpheusLayer(
            in_norm=get(b + "input_layernorm"),
            q=get(b + "self_attn.q_proj"), k=get(b + "self_attn.k_proj"),
            v=get(b + "self_attn.v_proj"), o=get(b + "self_attn.o_proj"),
            post_norm=get(b + "post_attention_layernorm"),
            gate=get(b + "mlp.gate_proj"), up=get(b + "mlp.up_proj"),
            down=get(b + "mlp.down_proj"),
        ))
    layers = OrpheusLayer(*[stack_weights([getattr(lw, f) for lw in lws])
                            for f in OrpheusLayer._fields])
    return OrpheusWeights(
        embd=get("orpheus.embed_tokens"),
        layers=layers,
        out_norm=get("orpheus.norm"),
        head=get("orpheus.lm_head"),
        rope_freqs=dense(get("orpheus.rope_frequencies")),
    )


class OrpheusRunner(TTSRunner):
    arch = "orpheus"
    sample_rate = SAMPLE_RATE_SNAC

    def __init__(self, cfg: OrpheusConfig, weights: OrpheusWeights,
                 tokenizer: BPETokenizer, snac_runner=None,
                 prompt_buckets=(64, 128, 256, 512, 1024)):
        self.cfg = cfg
        self.weights = weights
        self.tokenizer = tokenizer
        self.snac = snac_runner
        self.prompt_buckets = prompt_buckets
        from ...ops.quant_matmul import QuantTensor
        if isinstance(self.weights.head, QuantTensor):
            # 157k x 3072 head: pad N to the Pallas alignment (156940 is
            # NOT 256-aligned -> XLA dense-dequant fallback otherwise),
            # bf16 the scales (fast dequant path) and nibble-pack the Q4
            # codes — the head is ~25% of decode-step HBM+VPU cost
            self.weights = self.weights._replace(
                head=self.weights.head.fast_lm_head())
        # the flat megastep folds the LM head into its weight stream; it
        # preps from the (padded) head above — prefill still uses w.head.
        # Prep is LAZY (first single-stream generate): the tiles are
        # ~1.9 GB of HBM, and under --batch-slots serving the batched
        # engine holds its own copy while the single-stream path may
        # never run (server routes everything through the engine).
        self._mega_prepped = None

    @property
    def _mega(self):
        if self._mega_prepped is None:
            self._mega_prepped = maybe_prep_llama_flat(self.cfg,
                                                       self.weights)
        return self._mega_prepped[0]

    @property
    def _mega_qtype(self):
        if self._mega_prepped is None:
            self._mega_prepped = maybe_prep_llama_flat(self.cfg,
                                                       self.weights)
        return self._mega_prepped[1]

    def list_voices(self):
        return list(ORPHEUS_VOICES)

    def _prompt_ids(self, text: str, voice: str):
        """model.cpp:355-369: <prepend> + BPE("voice: text") + <append>."""
        if voice:
            text = f"{voice}: {text}"
        return list(PREPENDED_TOKENS) + self.tokenizer.tokenize(text) + \
            list(APPENDED_TOKENS)

    def generate(self, text: str, config: GenerationConfig | None = None) -> TTSResponse:
        config = config or GenerationConfig()
        cfg = self.cfg
        if config.voice and config.voice not in ORPHEUS_VOICES:
            raise ValueError(f"Voice '{config.voice}' is not a valid Orpheus voice")
        ids = self._prompt_ids(text, config.voice)
        if len(ids) > cfg.max_context_length:
            raise ValueError("prompt too large for the context window")
        p = next((b for b in self.prompt_buckets if len(ids) <= b),
                 cfg.max_context_length)
        toks = np.zeros(p, np.int32)
        toks[: len(ids)] = ids
        ctx = cache_ctx(cfg)
        shape = (cfg.n_layers, cfg.n_kv_heads, ctx, cfg.head_size)
        from ...common import kv_cache_dtype
        dt = kv_cache_dtype()
        kv_k = jnp.zeros(shape, dt); kv_v = jnp.zeros(shape, dt)
        logits, kv_k, kv_v = orpheus_prefill(cfg, self.weights,
                                             jnp.asarray(toks),
                                             jnp.int32(len(ids)), kv_k, kv_v)
        seed = config.seed if config.seed is not None else np.random.randint(2 ** 31)
        key = jax.random.PRNGKey(seed)
        key, sub = jax.random.split(key)
        first, _ = sampling.sample_or_greedy(
            sub, logits[None, :], sampling.init_state(1),
            do_sample=config.sample, temperature=float(config.temperature),
            top_k=int(config.top_k), top_p=float(config.top_p),
            repetition_penalty=float(config.repetition_penalty))
        out, n_out = orpheus_generate_tokens_chunked(
            cfg, self.weights, first[0], len(ids), kv_k, kv_v, key,
            max_steps=cfg.max_generation_size, do_sample=config.sample,
            temperature=float(config.temperature), top_k=int(config.top_k),
            top_p=float(config.top_p),
            repetition_penalty=float(config.repetition_penalty),
            mega=self._mega, mega_qtype=self._mega_qtype)
        heads = prepare_output_tokens(np.asarray(out), int(n_out))
        if self.snac is None or not heads[2]:
            return TTSResponse(np.zeros(0, np.float32), SAMPLE_RATE_SNAC)
        # guard the codebook gather against out-of-range ids (the reference
        # feeds them to get_rows unchecked)
        cb = self.snac.weights.quantizers[0].codebook.shape[0]
        heads = [np.clip(np.asarray(h, np.int64), 0, cb - 1).tolist()
                 for h in heads]
        from ..codec.snac import make_noise_layers
        noise_layers = make_noise_layers(
            self.snac.cfg, seed, 4 * (cfg.max_generation_size // 7 + 1))
        wav = self.snac.decode(heads, noise_layers=noise_layers)
        return TTSResponse(np.asarray(wav, np.float32), SAMPLE_RATE_SNAC)

    def generate_stream(self, text: str, config: GenerationConfig | None = None,
                        chunk: int = 56, margin: int = 16):
        """Streaming generation: yields float32 waveform chunks as llama
        decode chunks complete, vocoding incrementally through SNAC with
        `margin` fine frames of conv context on each side of the emitted
        span. Position-stable noise (make_noise_layers) makes the stream
        match a full decode away from chunk seams. Time-to-first-audio path
        (BASELINE north star: p50 TTFA)."""
        from ..codec.snac import make_noise_layers
        config = config or GenerationConfig()
        cfg = self.cfg
        if config.voice and config.voice not in ORPHEUS_VOICES:
            raise ValueError(f"Voice '{config.voice}' is not a valid Orpheus voice")
        ids = self._prompt_ids(text, config.voice)
        if len(ids) > cfg.max_context_length:
            raise ValueError("prompt too large for the context window")
        p = next((b for b in self.prompt_buckets if len(ids) <= b),
                 cfg.max_context_length)
        toks = np.zeros(p, np.int32)
        toks[: len(ids)] = ids
        ctx = cache_ctx(cfg)
        shape = (cfg.n_layers, cfg.n_kv_heads, ctx, cfg.head_size)
        from ...common import kv_cache_dtype
        dt = kv_cache_dtype()
        kv_k = jnp.zeros(shape, dt); kv_v = jnp.zeros(shape, dt)
        logits, kv_k, kv_v = orpheus_prefill(cfg, self.weights,
                                             jnp.asarray(toks),
                                             jnp.int32(len(ids)), kv_k, kv_v)
        seed = config.seed if config.seed is not None else np.random.randint(2 ** 31)
        key = jax.random.PRNGKey(seed)
        key, sub = jax.random.split(key)
        gen_kw = dict(do_sample=config.sample,
                      temperature=float(config.temperature),
                      top_k=int(config.top_k), top_p=float(config.top_p),
                      repetition_penalty=float(config.repetition_penalty))
        first, _ = sampling.sample_or_greedy(
            sub, logits[None, :], sampling.init_state(1), **gen_kw)
        max_steps = cfg.max_generation_size
        st = OrpheusState(
            kv_k=kv_k, kv_v=kv_v, pos=jnp.int32(len(ids)),
            token_in=jnp.asarray(first[0], jnp.int32), n_out=jnp.int32(1),
            done=jnp.asarray(first[0] == cfg.stopping_token_id).reshape(()),
            out_tokens=jnp.zeros((max_steps,), jnp.int32).at[0].set(first[0]),
            sampler_state=sampling.init_state(1), key=key)
        t_max = 4 * (max_steps // 7 + 1)
        noise_layers = None
        cb = 0
        if self.snac is not None:
            noise_layers = make_noise_layers(self.snac.cfg, seed, t_max)
            cb = self.snac.weights.quantizers[0].codebook.shape[0]
        emitted = 0          # fine frames already yielded
        up = self.snac.cfg.up_sampling_factor if self.snac is not None else 0
        n = 1
        while True:
            st, status = orpheus_decode_chunk_status(
                cfg, self.weights, st, n_steps=chunk, mega=self._mega,
                mega_qtype=self._mega_qtype, max_steps=max_steps, **gen_kw)
            n += chunk
            status_np = np.asarray(status)      # one fetch: [done, n_out]
            done = bool(status_np[0]) or n >= max_steps + chunk
            n_out = min(int(status_np[1]), max_steps)
            heads = prepare_output_tokens(np.asarray(st.out_tokens), n_out)
            t = len(heads[2])
            ready = t if done else max(0, t - margin)
            ready -= ready % 4
            if self.snac is not None and ready > emitted:
                lo = max(0, emitted - margin); lo -= lo % 4
                hi = t if done else min(t, ready + margin)
                hi -= hi % 4
                seg_heads = [
                    np.clip(np.asarray(heads[0][lo // 4: hi // 4], np.int64),
                            0, cb - 1).tolist(),
                    np.clip(np.asarray(heads[1][lo // 2: hi // 2], np.int64),
                            0, cb - 1).tolist(),
                    np.clip(np.asarray(heads[2][lo: hi], np.int64),
                            0, cb - 1).tolist(),
                ]
                seg = self.snac.decode(seg_heads, noise_layers=noise_layers,
                                       frame_offset=lo)
                yield np.asarray(
                    seg[(emitted - lo) * up: (ready - lo) * up], np.float32)
                emitted = ready
            if done:
                break
