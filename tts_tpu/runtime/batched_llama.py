"""Continuous-batching decode engine for llama-family (Orpheus) decoders.

Same design as runtime/batched_parler (which see): ONE weight set, fixed
batch slots decoded in a single jitted program so the dominant weight-read
HBM cost is amortized across active requests; slots carry independent
positions, sampling params, and stop state, and are refilled between chunks
without recompilation. Replaces the reference's model-replica-per-thread
serving (examples/server/server.cpp:885-897) for Orpheus, which the
reference cannot batch at all.

Decode math matches the single-stream path (models/orpheus/model._llama_step
/ llama megastep): GQA over a kv-head cache with per-slot positions
(ops/decode_attention.decode_attention_batched), NeoX RoPE with llama3
frequency factors at each slot's own position, stop on stopping_token_id
(reference orpheus/model.cpp:389-405).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import GenerationConfig
from ..models.orpheus.model import (OrpheusConfig, OrpheusWeights, _rms,
                                    orpheus_prefill, prepare_output_tokens)
from ..ops import sampling
from ..ops.attention import rope_freqs
from ..ops.decode_attention import decode_attention_batched
from ..ops.linear import matmul, take_rows


class BatchedLlamaState(NamedTuple):
    kv_k: Any           # (L, B, n_kv, ctx, D)
    kv_v: Any
    pos: Any            # (B,) int32 — next cache row
    n_out: Any          # (B,) int32 — tokens emitted
    token_in: Any       # (B,) int32
    active: Any         # (B,) bool
    done: Any           # (B,) bool
    out_tokens: Any     # (B, max_gen)
    sampler_state: sampling.BatchedSamplerState
    key: Any
    do_sample: Any      # (B,) bool
    temperature: Any
    top_k: Any
    top_p: Any
    repetition_penalty: Any


def init_batched_llama_state(cfg: OrpheusConfig, b: int,
                             key) -> BatchedLlamaState:
    from ..common import kv_cache_dtype
    # ctx rounds up to the batched megakernel's 256-row KV page
    ctx = -(-(cfg.max_context_length + cfg.max_generation_size) // 256) * 256
    dt = kv_cache_dtype()
    return BatchedLlamaState(
        kv_k=jnp.zeros((cfg.n_layers, b, cfg.n_kv_heads, ctx, cfg.head_size),
                       dt),
        kv_v=jnp.zeros((cfg.n_layers, b, cfg.n_kv_heads, ctx, cfg.head_size),
                       dt),
        pos=jnp.zeros((b,), jnp.int32),
        n_out=jnp.zeros((b,), jnp.int32),
        token_in=jnp.zeros((b,), jnp.int32),
        active=jnp.zeros((b,), bool),
        done=jnp.zeros((b,), bool),
        out_tokens=jnp.zeros((b, cfg.max_generation_size), jnp.int32),
        sampler_state=sampling.init_batched_state(b, 1),
        key=key,
        do_sample=jnp.zeros((b,), bool),
        temperature=jnp.ones((b,), jnp.float32),
        top_k=jnp.zeros((b,), jnp.int32),
        top_p=jnp.ones((b,), jnp.float32),
        repetition_penalty=jnp.ones((b,), jnp.float32),
    )


def _not_done(cfg: OrpheusConfig, st: BatchedLlamaState):
    return st.active & ~st.done & (st.n_out < cfg.max_generation_size)


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps",
                                             "mega_qtype", "kmax"))
def batched_llama_decode_chunk(cfg: OrpheusConfig, w: OrpheusWeights,
                               st: BatchedLlamaState, *, n_steps: int,
                               mega=None, mega_qtype=None,
                               kmax=None) -> BatchedLlamaState:
    b = st.pos.shape[0]
    nh, nkv, d = cfg.n_attn_heads, cfg.n_kv_heads, cfg.head_size
    inv = rope_freqs(d, cfg.rope_theta, w.rope_freqs)       # (d//2,)

    def step(st: BatchedLlamaState, _):
        cont = _not_done(cfg, st)
        x = take_rows(w.embd, st.token_in)                  # (B, H)

        lg = None
        if mega is not None:
            # batched megakernel: ONE weight read serves every slot
            from ..ops.llama_flat import (LlamaFlatMega,
                                          llama_flat_megastep_batched)
            from ..ops.llama_megastep import llama_megastep_batched
            L = cfg.n_layers
            if isinstance(mega, LlamaFlatMega):
                # flat-tile batched kernel: the LM head rides the stream,
                # so logits come straight out and the separate (B, vocab)
                # head matmul below disappears
                lg, kn, vn = llama_flat_megastep_batched(
                    mega, x, st.kv_k, st.kv_v, st.pos, qtype=mega_qtype,
                    n_heads=nh, n_kv=nkv, rope_base=cfg.rope_theta,
                    rope_freq_factors=w.rope_freqs,
                    interpret=jax.devices()[0].platform != "tpu")
            else:
                xo, kn, vn = llama_megastep_batched(
                    mega, x, st.kv_k, st.kv_v, st.pos, qtype=mega_qtype,
                    n_heads=nh, n_kv=nkv, rope_base=cfg.rope_theta,
                    rope_freq_factors=w.rope_freqs)
            kv_k, kv_v = st.kv_k, st.kv_v
            for s in range(b):
                kv_k = jax.lax.dynamic_update_slice(
                    kv_k, kn[:, s].reshape(L, 1, nkv, 1, d)
                    .astype(kv_k.dtype), (0, s, 0, st.pos[s], 0))
                kv_v = jax.lax.dynamic_update_slice(
                    kv_v, vn[:, s].reshape(L, 1, nkv, 1, d)
                    .astype(kv_v.dtype), (0, s, 0, st.pos[s], 0))
            if lg is None:
                h = _rms(xo, w.out_norm)
        else:
            ang = st.pos[:, None].astype(jnp.float32) * inv[None, :]
            cos = jnp.cos(ang)[:, None, :]                  # (B, 1, d/2)
            sin = jnp.sin(ang)[:, None, :]

            def rope(y):                                    # (B, n, d) NeoX
                y1, y2 = y[..., : d // 2], y[..., d // 2:]
                return jnp.concatenate([y1 * cos - y2 * sin,
                                        y2 * cos + y1 * sin], axis=-1)

            def layer(carry, inp):
                xc = carry
                lw, kk, vv = inp                            # kk (B,nkv,ctx,D)
                h = _rms(xc, lw.in_norm)
                q = rope(matmul(h, lw.q).reshape(b, nh, d))
                k = rope(matmul(h, lw.k).reshape(b, nkv, d))
                v = matmul(h, lw.v).reshape(b, nkv, d)
                # unconditional unrolled per-slot row writes — see
                # batched_parler._batched_layer for why (no cont, no vmap)
                for s in range(b):
                    kk = jax.lax.dynamic_update_slice(
                        kk, k[s][None, :, None, :].astype(kk.dtype),
                        (s, 0, st.pos[s], 0))
                    vv = jax.lax.dynamic_update_slice(
                        vv, v[s][None, :, None, :].astype(vv.dtype),
                        (s, 0, st.pos[s], 0))
                attn = decode_attention_batched(q, kk, vv, st.pos)
                xc = xc + matmul(attn.reshape(b, nh * d), lw.o)
                h = _rms(xc, lw.post_norm)
                xc = xc + matmul(
                    jax.nn.silu(matmul(h, lw.gate)) * matmul(h, lw.up),
                    lw.down)
                return xc, (kk, vv)

            x, (kv_k, kv_v) = jax.lax.scan(layer, x,
                                           (w.layers, st.kv_k, st.kv_v))
            h = _rms(x, w.out_norm)
        logits = (lg if lg is not None
                  else matmul(h, w.head))[:, : cfg.vocab_size]  # (B, vocab)
        key, sub = jax.random.split(st.key)
        toks, s_state = sampling.sample_batched(
            sub, logits[:, None, :], st.sampler_state,
            do_sample=st.do_sample, temperature=st.temperature,
            top_k=st.top_k, top_p=st.top_p,
            repetition_penalty=st.repetition_penalty, kmax=kmax)
        tok = toks[:, 0]                                    # (B,)
        out = jax.vmap(lambda ob, tb, nb: jax.lax.dynamic_update_slice(
            ob, tb[None], (nb,)))(st.out_tokens, tok, st.n_out)
        done = st.done | (tok == cfg.stopping_token_id)

        c1 = cont[:, None]
        return BatchedLlamaState(
            kv_k=kv_k, kv_v=kv_v,
            pos=jnp.where(cont, st.pos + 1, st.pos),
            n_out=jnp.where(cont, st.n_out + 1, st.n_out),
            token_in=jnp.where(cont, tok, st.token_in),
            active=st.active,
            done=jnp.where(cont, done, st.done),
            out_tokens=jnp.where(c1, out, st.out_tokens),
            sampler_state=sampling.BatchedSamplerState(
                last_token=jnp.where(c1, s_state.last_token,
                                     st.sampler_state.last_token),
                repeat_count=jnp.where(c1, s_state.repeat_count,
                                       st.sampler_state.repeat_count)),
            key=key,
            do_sample=st.do_sample, temperature=st.temperature,
            top_k=st.top_k, top_p=st.top_p,
            repetition_penalty=st.repetition_penalty,
        ), None

    st, _ = jax.lax.scan(step, st, None, length=n_steps)
    return st


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def insert_llama_request(cfg: OrpheusConfig, st: BatchedLlamaState, slot,
                         kv_k_req, kv_v_req, prompt_len, first_token,
                         do_sample, temperature, top_k, top_p,
                         repetition_penalty) -> BatchedLlamaState:
    """Place a prefilled request (KV rows [0, prompt_len) + the token
    sampled from the prefill logits) into batch slot `slot`."""
    return st._replace(
        kv_k=jax.lax.dynamic_update_slice(
            st.kv_k, kv_k_req[:, None].astype(st.kv_k.dtype),
            (0, slot, 0, 0, 0)),
        kv_v=jax.lax.dynamic_update_slice(
            st.kv_v, kv_v_req[:, None].astype(st.kv_v.dtype),
            (0, slot, 0, 0, 0)),
        pos=st.pos.at[slot].set(prompt_len),
        n_out=st.n_out.at[slot].set(1),
        token_in=st.token_in.at[slot].set(first_token),
        active=st.active.at[slot].set(True),
        done=st.done.at[slot].set(first_token == cfg.stopping_token_id),
        out_tokens=st.out_tokens.at[slot].set(
            jnp.zeros((cfg.max_generation_size,),
                      jnp.int32).at[0].set(first_token)),
        sampler_state=sampling.BatchedSamplerState(
            last_token=st.sampler_state.last_token.at[slot].set(-1),
            repeat_count=st.sampler_state.repeat_count.at[slot].set(0)),
        do_sample=st.do_sample.at[slot].set(do_sample),
        temperature=st.temperature.at[slot].set(temperature),
        top_k=st.top_k.at[slot].set(top_k),
        top_p=st.top_p.at[slot].set(top_p),
        repetition_penalty=st.repetition_penalty.at[slot].set(
            repetition_penalty),
    )


class BatchedLlamaEngine:
    """Slot-based continuous batching over one Orpheus model. Results are
    the 3 SNAC codebook head lists per request (prepare_output_tokens)."""

    def __init__(self, cfg: OrpheusConfig, weights: OrpheusWeights, tokenizer,
                 n_slots: int = 4, chunk: int = 32, seed: int = 0,
                 prompt_buckets=(64, 128, 256, 512, 1024)):
        self.cfg = cfg
        self.weights = weights
        self.tokenizer = tokenizer
        self.n_slots = n_slots
        self.chunk = chunk
        self.prompt_buckets = prompt_buckets
        from ..models.orpheus.model import (maybe_prep_llama_flat,
                                            maybe_prep_llama_mega)
        # the batched kernels put slots on the f32 sublane rows, so the
        # compiled batch pads up to a multiple of 8 (padded slots stay
        # inactive: they add no weight traffic, and n_slots still governs
        # admission)
        b_pad = -(-n_slots // 8) * 8
        if cfg.head_size % 128 == 0:
            # flat-tile batched megastep: B slots on the sublane rows, the
            # whole weight stream (LM head included) read once per step.
            # ctx must match init_batched_llama_state's 256-row rounding;
            # the flash page shrinks to 128 rows past 8 slots (the
            # (B, n_kv, psz, d) page block + (B*nh, B*nkv*psz) score
            # intermediate would crowd VMEM at 256).
            ctx = -(-(cfg.max_context_length + cfg.max_generation_size)
                    // 256) * 256
            self.mega, self.mega_qtype = maybe_prep_llama_flat(
                cfg, weights, ctx=ctx, page=256 if b_pad <= 8 else 128)
        else:
            self.mega, self.mega_qtype = maybe_prep_llama_mega(cfg, weights)
        # without a kernel (CPU tests) the state stays exactly n_slots wide
        b_state = b_pad if self.mega is not None else n_slots
        self.state = init_batched_llama_state(cfg, b_state,
                                              jax.random.PRNGKey(seed))
        self.slot_req: List[Optional[int]] = [None] * n_slots
        self.pending: List[tuple] = []
        self.results: Dict[int, list] = {}
        self.errors: Dict[int, str] = {}
        self._next_id = 0

    def validate_prompt(self, text: str, config: GenerationConfig) -> None:
        """Raise ValueError before queueing if the prompt can't fit (mirrors
        the single-stream OrpheusRunner's clean error instead of the opaque
        numpy broadcast _prefill would hit)."""
        ids = self._prompt_ids(text, config.voice)
        if len(ids) > self.cfg.max_context_length:
            raise ValueError(
                f"prompt ({len(ids)} tokens) too large for the context "
                f"window ({self.cfg.max_context_length})")

    def submit(self, text: str, config: GenerationConfig) -> int:
        self.validate_prompt(text, config)
        rid = self._next_id
        self._next_id += 1
        self.pending.append((rid, text, config))
        self._fill_slots()
        return rid

    def _prompt_ids(self, text: str, voice: str):
        from ..models.orpheus.model import (APPENDED_TOKENS,
                                            PREPENDED_TOKENS)
        if voice:
            text = f"{voice}: {text}"
        return list(PREPENDED_TOKENS) + self.tokenizer.tokenize(text) + \
            list(APPENDED_TOKENS)

    def _prefill(self, text: str, config: GenerationConfig):
        cfg = self.cfg
        ids = self._prompt_ids(text, config.voice)
        if len(ids) > cfg.max_context_length:
            raise ValueError("prompt too large for the context window")
        p = min(next((bk for bk in self.prompt_buckets if len(ids) <= bk),
                     cfg.max_context_length), cfg.max_context_length)
        toks = np.zeros(p, np.int32)
        toks[: len(ids)] = ids
        from ..common import kv_cache_dtype
        ctx = -(-(cfg.max_context_length
                  + cfg.max_generation_size) // 256) * 256
        shape = (cfg.n_layers, cfg.n_kv_heads, ctx, cfg.head_size)
        dt = kv_cache_dtype()
        logits, kv_k, kv_v = orpheus_prefill(
            cfg, self.weights, jnp.asarray(toks), jnp.int32(len(ids)),
            jnp.zeros(shape, dt), jnp.zeros(shape, dt))
        seed = config.seed if config.seed is not None else \
            np.random.randint(2 ** 31)
        first, _ = sampling.sample_or_greedy(
            jax.random.PRNGKey(seed), logits[None, :], sampling.init_state(1),
            do_sample=config.sample, temperature=float(config.temperature),
            top_k=int(config.top_k), top_p=float(config.top_p),
            repetition_penalty=float(config.repetition_penalty))
        return kv_k, kv_v, len(ids), first[0]

    def _fill_slots(self) -> None:
        for slot in range(self.n_slots):
            if self.slot_req[slot] is not None or not self.pending:
                continue
            rid, text, config = self.pending.pop(0)
            try:
                kv_k, kv_v, plen, first = self._prefill(text, config)
            except Exception as e:  # noqa: BLE001 — fail only this request
                self.errors[rid] = str(e)
                continue
            self.state = insert_llama_request(
                self.cfg, self.state, slot, kv_k, kv_v, plen, first,
                bool(config.sample), float(config.temperature),
                int(config.top_k), float(config.top_p),
                float(config.repetition_penalty))
            self.slot_req[slot] = rid


    def peek(self, rid):
        """(progress, out_tokens) for an in-flight request, else None —
        used by the server's batched streaming drain (one small D2H per
        chunk; worker-thread only)."""
        for slot, r in enumerate(self.slot_req):
            if r == rid:
                return (int(np.asarray(self.state.n_out)[slot]),
                        np.asarray(self.state.out_tokens)[slot])
        return None

    def _kmax_bucket(self) -> int:
        """Static top-k pre-select width for this chunk: 64 when every
        ACTIVE slot's request fits (top_p untruncated needs the full cap).
        Two jit specializations max; exact for the requests running."""
        from ..ops.sampling import BATCHED_TOP_K_CAP
        tks = np.asarray(self.state.top_k)
        tps = np.asarray(self.state.top_p)
        act = np.asarray(self.state.active)
        if act.any() and bool(((tks[act] > 0) & (tks[act] <= 64)
                               & (tps[act] >= 1.0)).all()):
            return 64
        return BATCHED_TOP_K_CAP

    def step(self) -> List[int]:
        """Run one decode chunk; returns newly finished request ids."""
        self.state = batched_llama_decode_chunk(
            self.cfg, self.weights, self.state, n_steps=self.chunk,
            mega=self.mega, mega_qtype=self.mega_qtype,
            kmax=self._kmax_bucket())
        done_mask = ~np.asarray(_not_done(self.cfg, self.state))
        finished = []
        for slot in range(self.n_slots):
            rid = self.slot_req[slot]
            if rid is None or not done_mask[slot]:
                continue
            n_out = int(np.asarray(self.state.n_out)[slot])
            out = np.asarray(self.state.out_tokens)[slot]
            # the stop token stays in the stream exactly as in the
            # single-stream path; prepare_output_tokens drops the
            # incomplete trailing 7-group it lands in
            self.results[rid] = prepare_output_tokens(out, n_out)
            self.slot_req[slot] = None
            self.state = self.state._replace(
                active=self.state.active.at[slot].set(False))
            finished.append(rid)
        self._fill_slots()
        return finished

    def run_until_done(self, max_chunks: int = 1000) -> None:
        for _ in range(max_chunks):
            self.step()
            if not self.pending and all(r is None for r in self.slot_req):
                return
        raise RuntimeError("batched engine did not converge")
