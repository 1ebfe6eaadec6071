"""Continuous-batching decode engine for the Parler decoder.

The reference scales requests with full model replicas on threads
(server.cpp:885-897). TPU-native design: ONE set of weights, a fixed number
of batch slots decoded together in a single jitted program — weight reads
(the dominant HBM cost) are amortized across all active requests. Slots have
independent positions, sampling parameters (dynamic per request), EOS/delay
state, and are refilled between chunks without recompilation.

Decode math matches the single-stream path exactly (tested); batched paged
attention handles per-request positions (ops/decode_attention.py).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import GenerationConfig
from ..models.parler.model import (ParlerConfig, ParlerWeights,
                                   _layer_norm, _logits_last,
                                   adjust_output_tokens, parler_prefill)
from ..ops import sampling
from ..ops.decode_attention import decode_attention_batched
from ..ops.linear import matmul


class BatchedParlerState(NamedTuple):
    kv_k: Any           # (L, B, nh, ctx, D)
    kv_v: Any
    pos: Any            # (B,) int32
    step: Any           # (B,) int32
    tokens_in: Any      # (B, n_out_heads)
    eos_seen: Any       # (B, n_out_heads) bool
    active: Any         # (B,) bool — slot has a live request
    out_tokens: Any     # (B, max_gen, n_out_heads)
    sampler_state: sampling.BatchedSamplerState
    key: Any
    # per-request sampling params (dynamic)
    do_sample: Any      # (B,) bool
    temperature: Any    # (B,) f32
    top_k: Any          # (B,) i32
    top_p: Any          # (B,) f32
    repetition_penalty: Any  # (B,) f32


def init_batched_state(cfg: ParlerConfig, b: int, key) -> BatchedParlerState:
    L, nh, ctx, d = (cfg.n_layers, cfg.n_attn_heads, cfg.max_ctx_length,
                     cfg.head_size)
    no = cfg.n_output_heads
    from ..common import kv_cache_dtype
    dt = kv_cache_dtype()
    return BatchedParlerState(
        kv_k=jnp.zeros((L, b, nh, ctx, d), dt),
        kv_v=jnp.zeros((L, b, nh, ctx, d), dt),
        pos=jnp.zeros((b,), jnp.int32),
        step=jnp.zeros((b,), jnp.int32),
        tokens_in=jnp.full((b, no), cfg.bos_token_id, jnp.int32),
        eos_seen=jnp.zeros((b, no), bool),
        active=jnp.zeros((b,), bool),
        out_tokens=jnp.zeros((b, cfg.max_generation_size, no), jnp.int32),
        sampler_state=sampling.init_batched_state(b, no),
        key=key,
        do_sample=jnp.zeros((b,), bool),
        temperature=jnp.ones((b,), jnp.float32),
        top_k=jnp.zeros((b,), jnp.int32),
        top_p=jnp.ones((b,), jnp.float32),
        repetition_penalty=jnp.ones((b,), jnp.float32),
    )


def _not_done(cfg: ParlerConfig, st: BatchedParlerState):
    m = cfg.max_generation_size
    return st.active & ((st.step == 0) | ~jnp.all(st.eos_seen, axis=1)) & \
        (st.pos < m) & (st.step < m)


def _batched_layer(cfg: ParlerConfig, x, lw, kv_k, kv_v, pos, cont,
                   use_cross: bool):
    """x (B, H); kv (B, nh, ctx, D); pos/cont (B,)."""
    b = x.shape[0]
    nh = cfg.n_attn_heads
    h = _layer_norm(x, lw.ln1_w, lw.ln1_b)
    q = matmul(h, lw.q_w).reshape(b, nh, -1)
    k = matmul(h, lw.k_w).reshape(b, nh, -1)
    v = matmul(h, lw.v_w).reshape(b, nh, -1)
    # Unconditional row write — deliberately NOT masked by `cont`. A full
    # per-slot jnp.where over the (B, nh, ctx, D) cache would stream the
    # whole cache through HBM every layer; instead inactive slots simply
    # overwrite the row at their frozen `pos`, which is harmless: their
    # attention output and every state update are discarded (cont-masked),
    # and insert_request rewrites the whole slot cache on reuse.
    #
    # The per-slot writes are unrolled over the static B (NOT vmapped):
    # vmapping dynamic_update_slice over per-slot start indices makes XLA
    # materialize a select over the whole cache (GB/step of HBM traffic);
    # B scalar-start updates stay tiny in-place row writes.
    del cont
    for s in range(b):
        kv_k = jax.lax.dynamic_update_slice(
            kv_k, k[s][None, :, None, :].astype(kv_k.dtype), (s, 0, pos[s], 0))
        kv_v = jax.lax.dynamic_update_slice(
            kv_v, v[s][None, :, None, :].astype(kv_v.dtype), (s, 0, pos[s], 0))
    attn = decode_attention_batched(q, kv_k, kv_v, pos)   # (B, nh, D)
    x = x + matmul(attn.reshape(b, cfg.hidden_size), lw.o_w)
    if use_cross:
        h = _layer_norm(x, lw.lnc_w, lw.lnc_b)
        cq = matmul(h, lw.cq_w).reshape(b, nh, -1)
        logits = jnp.einsum("bhd,hkd->bhk", cq, lw.cross_k,
                            preferred_element_type=jnp.float32)
        logits = logits / np.sqrt(cfg.head_size)
        probs = jax.nn.softmax(logits, axis=-1)
        ca = jnp.einsum("bhk,hkd->bhd", probs, lw.cross_v)
        x = x + matmul(ca.reshape(b, cfg.hidden_size), lw.co_w)
    h = _layer_norm(x, lw.ln2_w, lw.ln2_b)
    h = matmul(h, lw.fc1)
    h = jax.nn.gelu(h, approximate=True)
    x = x + matmul(h, lw.fc2)
    return x, kv_k, kv_v


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "use_cross",
                                             "mega_qtype"))
def batched_decode_chunk(cfg: ParlerConfig, w: ParlerWeights,
                         st: BatchedParlerState, *, n_steps: int,
                         use_cross: bool = True, mega=None,
                         mega_qtype=None) -> BatchedParlerState:
    nh = cfg.n_output_heads

    def step(st: BatchedParlerState, _):
        cont = _not_done(cfg, st)
        embs = jax.vmap(lambda trow: jax.vmap(lambda e, t: e[t])(
            w.embds, trow))(st.tokens_in)                 # (B, nh, H)
        x = jnp.sum(embs, axis=1) + jnp.take(w.pos_embd, st.pos, axis=0)

        if mega is not None:
            from ..ops.parler_megastep import parler_megastep_batched
            xo, kn, vn = parler_megastep_batched(
                mega, x, st.kv_k, st.kv_v, st.pos, qtype=mega_qtype,
                use_cross=use_cross, n_heads=cfg.n_attn_heads)
            L, hs, d = cfg.n_layers, cfg.n_attn_heads, cfg.head_size
            b = x.shape[0]
            kn = kn.reshape(L, b, hs, 1, d)
            vn = vn.reshape(L, b, hs, 1, d)
            # unrolled scalar-start row writes — see _batched_layer
            kv_k, kv_v = st.kv_k, st.kv_v
            for s in range(b):
                kv_k = jax.lax.dynamic_update_slice(
                    kv_k, kn[:, s:s + 1].astype(kv_k.dtype),
                    (0, s, 0, st.pos[s], 0))
                kv_v = jax.lax.dynamic_update_slice(
                    kv_v, vn[:, s:s + 1].astype(kv_v.dtype),
                    (0, s, 0, st.pos[s], 0))
            x = xo
        else:
            def layer_body(carry, inp):
                xc = carry
                lw, kk, vv = inp
                xo, kk, vv = _batched_layer(cfg, xc, lw, kk, vv, st.pos, cont,
                                            use_cross)
                return xo, (kk, vv)

            x, (kv_k, kv_v) = jax.lax.scan(layer_body, x,
                                           (w.layers, st.kv_k, st.kv_v))
        x = _layer_norm(x, w.final_ln_w, w.final_ln_b)
        out = matmul(x, w.heads)
        # heads may carry per-head vocab padding (fast_stacked_heads)
        logits = out.reshape(-1, nh, out.shape[-1] // nh)[
            :, :, : cfg.output_vocab_size]
        key, sub = jax.random.split(st.key)
        toks, s_state = sampling.sample_batched(
            sub, logits, st.sampler_state, do_sample=st.do_sample,
            temperature=st.temperature, top_k=st.top_k, top_p=st.top_p,
            repetition_penalty=st.repetition_penalty)
        out = jax.vmap(lambda ob, tb, sb: jax.lax.dynamic_update_slice(
            ob, tb[None, :], (sb, 0)))(st.out_tokens, toks, st.step)
        heads_i = jnp.arange(nh)[None, :]
        nxt = jnp.where(st.step[:, None] + 1 > heads_i,
                        jnp.where(st.eos_seen, cfg.eos_token_id, toks),
                        cfg.bos_token_id).astype(jnp.int32)
        eos = st.eos_seen | (toks == cfg.eos_token_id)

        c1 = cont[:, None]
        c2 = cont[:, None, None]
        return BatchedParlerState(
            kv_k=kv_k, kv_v=kv_v,
            pos=jnp.where(cont, st.pos + 1, st.pos),
            step=jnp.where(cont, st.step + 1, st.step),
            tokens_in=jnp.where(c1, nxt, st.tokens_in),
            eos_seen=jnp.where(c1, eos, st.eos_seen),
            active=st.active,
            out_tokens=jnp.where(c2, out, st.out_tokens),
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
def insert_request(cfg: ParlerConfig, st: BatchedParlerState, slot,
                   kv_k_req, kv_v_req, prompt_len, do_sample, temperature,
                   top_k, top_p, repetition_penalty) -> BatchedParlerState:
    """Place a prefilled request into batch slot `slot`."""
    nh = cfg.n_output_heads
    return st._replace(
        kv_k=jax.lax.dynamic_update_slice(
            st.kv_k, kv_k_req[:, None].astype(st.kv_k.dtype), (0, slot, 0, 0, 0)),
        kv_v=jax.lax.dynamic_update_slice(
            st.kv_v, kv_v_req[:, None].astype(st.kv_v.dtype), (0, slot, 0, 0, 0)),
        pos=st.pos.at[slot].set(prompt_len),
        step=st.step.at[slot].set(0),
        tokens_in=st.tokens_in.at[slot].set(
            jnp.full((nh,), cfg.bos_token_id, jnp.int32)),
        eos_seen=st.eos_seen.at[slot].set(jnp.zeros((nh,), bool)),
        active=st.active.at[slot].set(True),
        out_tokens=st.out_tokens.at[slot].set(
            jnp.zeros((cfg.max_generation_size, nh), jnp.int32)),
        sampler_state=sampling.BatchedSamplerState(
            last_token=st.sampler_state.last_token.at[slot].set(-1),
            repeat_count=st.sampler_state.repeat_count.at[slot].set(0)),
        do_sample=st.do_sample.at[slot].set(do_sample),
        temperature=st.temperature.at[slot].set(temperature),
        top_k=st.top_k.at[slot].set(top_k),
        top_p=st.top_p.at[slot].set(top_p),
        repetition_penalty=st.repetition_penalty.at[slot].set(repetition_penalty),
    )


class BatchedParlerEngine:
    """Slot-based continuous batching over one Parler model."""

    def __init__(self, cfg: ParlerConfig, weights: ParlerWeights, tokenizer,
                 n_slots: int = 8, chunk: int = 32, seed: int = 0,
                 prompt_buckets=(64, 128, 256, 512)):
        self.cfg = cfg
        self.weights = weights
        self.tokenizer = tokenizer
        self.n_slots = n_slots
        self.chunk = chunk
        self.prompt_buckets = prompt_buckets
        from ..models.parler.model import maybe_prep_mega
        self.mega, self.mega_qtype = maybe_prep_mega(cfg, weights)
        # the batched megakernel puts slots on the 8 f32 sublane rows: pad
        # the compiled batch to a multiple of 8 when the kernel is
        # available so any --batch-slots value rides it (padded slots stay
        # inactive and add no weight traffic; n_slots governs admission)
        b_state = (-(-n_slots // 8) * 8 if self.mega is not None
                   else n_slots)
        self.state = init_batched_state(cfg, b_state, jax.random.PRNGKey(seed))
        self.slot_req: List[Optional[int]] = [None] * n_slots
        self.pending: List[tuple] = []
        self.results: Dict[int, np.ndarray] = {}
        self.errors: Dict[int, str] = {}
        self._next_id = 0

    def validate_prompt(self, text: str, config: GenerationConfig) -> None:
        """Raise ValueError if this engine cannot take the request (checked
        BEFORE queueing so one bad request never reaches _fill_slots, where
        a failure inside engine.step() used to abort every in-flight task)."""
        ids = self.tokenizer.tokenize(text)
        if len(ids) + 1 > self.prompt_buckets[-1]:
            raise ValueError(
                f"prompt ({len(ids) + 1} tokens) exceeds the batched "
                f"engine's context window ({self.prompt_buckets[-1]})")

    def submit(self, text: str, config: GenerationConfig) -> int:
        self.validate_prompt(text, config)
        rid = self._next_id
        self._next_id += 1
        self.pending.append((rid, text, config))
        self._fill_slots()
        return rid

    def _prefill(self, text: str):
        cfg = self.cfg
        ids = self.tokenizer.tokenize(text)
        ids.append(self.tokenizer.eos_token)
        if len(ids) > self.prompt_buckets[-1]:
            raise ValueError("prompt too large for the context window")
        p = next((bk for bk in self.prompt_buckets if len(ids) <= bk),
                 self.prompt_buckets[-1])
        tokens = np.zeros((p,), np.int32)
        tokens[: len(ids)] = ids
        shape = (cfg.n_layers, cfg.n_attn_heads, cfg.max_ctx_length,
                 cfg.head_size)
        from ..common import kv_cache_dtype
        dt = kv_cache_dtype()
        kv_k, kv_v = parler_prefill(cfg, self.weights, jnp.asarray(tokens),
                                    jnp.zeros(shape, dt), jnp.zeros(shape, dt),
                                    use_cross=cfg.use_cross_attn)
        return kv_k, kv_v, len(ids)

    def _fill_slots(self) -> None:
        for slot in range(self.n_slots):
            if self.slot_req[slot] is not None or not self.pending:
                continue
            rid, text, config = self.pending.pop(0)
            try:
                kv_k, kv_v, plen = self._prefill(text)
            except Exception as e:  # noqa: BLE001 — fail only this request
                self.errors[rid] = str(e)
                continue
            self.state = insert_request(
                self.cfg, self.state, slot, kv_k, kv_v, plen,
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
                # whole-array fetches + numpy indexing: an eager
                # device-array index costs a relay round trip per call
                # (and a compile per novel slot index)
                return (int(np.asarray(self.state.step)[slot]),
                        np.asarray(self.state.out_tokens)[slot])
        return None

    def step(self) -> List[int]:
        """Run one decode chunk; returns newly finished request ids."""
        self.state = batched_decode_chunk(self.cfg, self.weights, self.state,
                                          n_steps=self.chunk,
                                          use_cross=self.cfg.use_cross_attn,
                                          mega=self.mega,
                                          mega_qtype=self.mega_qtype)
        done_mask = ~np.asarray(_not_done(self.cfg, self.state))
        finished = []
        for slot in range(self.n_slots):
            rid = self.slot_req[slot]
            if rid is None or not done_mask[slot]:
                continue
            n_steps = int(np.asarray(self.state.step)[slot])
            out = np.asarray(self.state.out_tokens)[slot]
            self.results[rid] = adjust_output_tokens(out, n_steps, self.cfg)
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
