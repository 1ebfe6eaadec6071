"""Continuous-batching decode engine for Dia (CFG batch-2 per request).

Same slot design as runtime/batched_parler (which see): one weight set,
fixed slots decoded in a single jitted program. Each Dia request carries a
conditional/unconditional CFG PAIR, so B slots decode as 2B activation rows
through the shared quantized matmuls; per-slot state includes the delay
wind-down machine (check_stopping semantics, reference
src/models/dia/model.cpp:806-823) and per-request bucketed cross K/V with
the analytic pad-tail fold (ops/dia_megastep.prep_dia_cross). The engine
fixes one cross bucket so slot cross arrays stack without recompilation.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import GenerationConfig
from ..models.dia.model import (DiaConfig, DiaWeights, _rms,
                                adjust_output_tokens, dia_encode,
                                tokenize_sentence)
from ..ops import sampling
from ..ops.attention import apply_rope_neox
from ..ops.decode_attention import decode_attention_batched
from ..ops.linear import matmul


class BatchedDiaState(NamedTuple):
    kv_k: Any          # (L, B, 2, n_kv, ctx, D)
    kv_v: Any
    cross_k: Any       # (L, B, 2, heads, Sb, D) bf16 — L-major so the
    cross_v: Any       #   batched megastep reshapes it to blocks for free
    vtail: Any         # (L, B, 2, heads, D) f32
    pos: Any           # (B,)
    tokens_in: Any     # (B, n_heads)
    delay_steps: Any   # (B,) int32, -1 = not triggered
    active: Any        # (B,)
    done: Any          # (B,)
    out_tokens: Any    # (B, max_gen, n_heads)
    sampler_state: sampling.BatchedSamplerState
    key: Any
    do_sample: Any
    temperature: Any
    top_k: Any
    top_p: Any
    repetition_penalty: Any


def init_batched_dia_state(cfg: DiaConfig, b: int, key,
                           cross_bucket: int = 256) -> BatchedDiaState:
    from ..common import kv_cache_dtype
    L, nkv, d = cfg.n_decoder_layers, cfg.n_kv_heads, cfg.head_size
    nh, heads = cfg.n_output_heads, cfg.decoder_attn_heads
    ctx = cfg.max_generation_size
    dt = kv_cache_dtype()
    return BatchedDiaState(
        kv_k=jnp.zeros((L, b, 2, nkv, ctx, d), dt),
        kv_v=jnp.zeros((L, b, 2, nkv, ctx, d), dt),
        cross_k=jnp.zeros((L, b, 2, heads, cross_bucket, d), jnp.bfloat16),
        cross_v=jnp.zeros((L, b, 2, heads, cross_bucket, d), jnp.bfloat16),
        vtail=jnp.zeros((L, b, 2, heads, d), jnp.float32),
        pos=jnp.zeros((b,), jnp.int32),
        tokens_in=jnp.full((b, nh), cfg.bos_token_id, jnp.int32),
        delay_steps=jnp.full((b,), -1, jnp.int32),
        active=jnp.zeros((b,), bool),
        done=jnp.zeros((b,), bool),
        out_tokens=jnp.zeros((b, ctx, nh), jnp.int32),
        sampler_state=sampling.init_batched_state(b, nh),
        key=key,
        do_sample=jnp.zeros((b,), bool),
        temperature=jnp.ones((b,), jnp.float32),
        top_k=jnp.zeros((b,), jnp.int32),
        top_p=jnp.ones((b,), jnp.float32),
        repetition_penalty=jnp.ones((b,), jnp.float32),
    )


def _not_done(cfg: DiaConfig, st: BatchedDiaState):
    return st.active & ~st.done & (st.pos < cfg.max_generation_size)


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "n_tail",
                                             "mega_qtype"))
def batched_dia_decode_chunk(cfg: DiaConfig, w: DiaWeights,
                             st: BatchedDiaState, *, n_steps: int,
                             n_tail: int, mega=None,
                             mega_qtype=None) -> BatchedDiaState:
    b = st.pos.shape[0]
    nh = cfg.n_output_heads
    heads, nkv, d = cfg.decoder_attn_heads, cfg.n_kv_heads, cfg.head_size
    H = cfg.decoder_hidden_size
    L = cfg.n_decoder_layers
    delay = jnp.asarray(cfg.delay_pattern, jnp.int32)
    max_steps = cfg.max_generation_size

    def step(st: BatchedDiaState, _):
        cont = _not_done(cfg, st)
        # per-slot delay wind-down on the INPUT tokens (check_stopping)
        t_in = st.tokens_in                              # (B, nh)
        ds = st.delay_steps                              # (B,)
        trigger = (ds == -1) & ((t_in[:, 0] == cfg.eos_token_id) |
                                (st.pos >= max_steps - cfg.max_delay))
        ds = jnp.where(trigger, cfg.max_delay, ds)
        in_delay = (ds > 0)[:, None]
        step_after = (cfg.max_delay - ds)[:, None]
        t_in = jnp.where(in_delay & (delay[None, :] == step_after),
                         cfg.eos_token_id, t_in)
        t_in = jnp.where(in_delay & (step_after > delay[None, :]),
                         cfg.pad_token_id, t_in)
        ds = jnp.where(ds > 0, ds - 1, ds)
        now_done = (ds == 0) | st.done | ~st.active

        pos_c = jnp.minimum(st.pos, max_steps - 1)
        embs = jax.vmap(lambda trow: jax.vmap(lambda e, tk: e[tk])(
            w.dec_embds, trow))(t_in)                    # (B, nh, H)
        x = jnp.broadcast_to(jnp.sum(embs, axis=1)[:, None, :], (b, 2, H))
        x = x.reshape(b * 2, H)
        pos2 = jnp.repeat(pos_c, 2)                      # (B*2,)

        if mega is not None:
            # batched megakernel: one weight read serves every CFG pair
            from ..ops.dia_megastep import dia_megastep_batched
            xo, kn, vn = dia_megastep_batched(
                mega, x, st.kv_k, st.kv_v, pos_c, st.cross_k, st.cross_v,
                st.vtail, n_tail, qtype=mega_qtype, n_heads=heads,
                n_kv=nkv)
            kv_k, kv_v = st.kv_k, st.kv_v
            for s in range(b):
                kv_k = jax.lax.dynamic_update_slice(
                    kv_k, kn[:, 2 * s:2 * s + 2].reshape(
                        L, 1, 2, nkv, 1, d).astype(kv_k.dtype),
                    (0, s, 0, 0, pos_c[s], 0))
                kv_v = jax.lax.dynamic_update_slice(
                    kv_v, vn[:, 2 * s:2 * s + 2].reshape(
                        L, 1, 2, nkv, 1, d).astype(kv_v.dtype),
                    (0, s, 0, 0, pos_c[s], 0))
            x = _rms(xo, w.dec_norm)
            return _finish(st, x, cont, now_done, ds, pos_c, kv_k, kv_v)

        def layer(carry, inp):
            xc = carry                                   # (B*2, H)
            lw, kk, vv, ckl, cvl, vtl = inp
            # kk (B, 2, nkv, ctx, D); ckl (B, 2, heads, Sb, D)
            h = _rms(xc, lw.sa_norm)
            q = matmul(h, lw.self_q).reshape(b * 2, heads, d)
            k = matmul(h, lw.self_k).reshape(b * 2, nkv, d)
            v = matmul(h, lw.self_v).reshape(b * 2, nkv, d)
            q = jax.vmap(lambda qq, pp: apply_rope_neox(
                qq[:, None, :], pp[None])[:, 0, :])(q, pos2)
            k = jax.vmap(lambda qq, pp: apply_rope_neox(
                qq[:, None, :], pp[None])[:, 0, :])(k, pos2)
            kk = kk.reshape(b * 2, nkv, max_steps, d)
            vv = vv.reshape(b * 2, nkv, max_steps, d)
            for s in range(b):
                for c in range(2):
                    r = s * 2 + c
                    kk = jax.lax.dynamic_update_slice(
                        kk, k[r][None, :, None, :].astype(kk.dtype),
                        (r, 0, pos_c[s], 0))
                    vv = jax.lax.dynamic_update_slice(
                        vv, v[r][None, :, None, :].astype(vv.dtype),
                        (r, 0, pos_c[s], 0))
            attn = decode_attention_batched(q, kk, vv, pos2, scale=1.0)
            xc = xc + matmul(attn.reshape(b * 2, heads * d), lw.self_o)
            # cross attention with pad-tail fold
            h = _rms(xc, lw.ca_norm)
            cq = matmul(h, lw.cross_q).reshape(b * 2, heads, d)
            cq = jax.vmap(lambda qq, pp: apply_rope_neox(
                qq[:, None, :], pp[None])[:, 0, :])(cq, pos2)
            ck2 = ckl.reshape(b * 2, heads, -1, d).astype(jnp.float32)
            cv2 = cvl.reshape(b * 2, heads, -1, d).astype(jnp.float32)
            cs = jnp.einsum("rhd,rhtd->rht", cq, ck2)    # scale 1.0
            m = jnp.max(cs, axis=2, keepdims=True)
            if n_tail:
                m = jnp.maximum(m, 0.0)
            ph = jnp.exp(cs - m)
            den = jnp.sum(ph, axis=2, keepdims=True)
            av = jnp.einsum("rht,rhtd->rhd", ph, cv2)
            if n_tail:
                et = jnp.exp(-m)                         # (B*2, heads, 1)
                den = den + n_tail * et
                av = av + et * vtl.reshape(b * 2, heads, d)
            ca = av / den
            xc = xc + matmul(ca.reshape(b * 2, heads * d), lw.cross_o)
            h = _rms(xc, lw.mlp_norm)
            xc = xc + matmul(
                jax.nn.silu(matmul(h, lw.gate)) * matmul(h, lw.up), lw.wo)
            return xc, (kk.reshape(b, 2, nkv, max_steps, d),
                        vv.reshape(b, 2, nkv, max_steps, d))

        # state cross arrays are already L-major (kernel layout)
        x, (kv_k, kv_v) = jax.lax.scan(
            layer, x, (w.dec_layers, st.kv_k, st.kv_v, st.cross_k,
                       st.cross_v, st.vtail))
        x = _rms(x, w.dec_norm)
        return _finish(st, x, cont, now_done, ds, pos_c, kv_k, kv_v)

    def _finish(st, x, cont, now_done, ds, pos_c, kv_k, kv_v):
        out = matmul(x, w.heads)                         # (B*2, nh*vocab+)
        vocab_p = out.shape[-1] // nh
        out = out.reshape(b, 2, nh, vocab_p)[:, :, :, : cfg.output_vocab_size]
        cond, uncond = out[:, 0], out[:, 1]
        merged = cond + cfg.cfg_scale * (cond - uncond)  # (B, nh, vocab)
        tok_i = jnp.arange(cfg.output_vocab_size)
        merged = jnp.where(tok_i > cfg.cfg_max_output, -jnp.inf, merged)
        key, sub = jax.random.split(st.key)
        toks, s_state = sampling.sample_batched(
            sub, merged, st.sampler_state, do_sample=st.do_sample,
            temperature=st.temperature, top_k=st.top_k, top_p=st.top_p,
            repetition_penalty=st.repetition_penalty)
        out_t = jax.vmap(lambda ob, tb, sb: jax.lax.dynamic_update_slice(
            ob, tb[None, :], (sb, 0)))(st.out_tokens, toks, pos_c)
        new_pos = st.pos + 1
        nxt = jnp.where(new_pos[:, None] > jnp.arange(nh)[None, :], toks,
                        cfg.bos_token_id).astype(jnp.int32)

        # freeze semantics exactly as the single-stream dia_decode_chunk:
        # a slot that just hit now_done keeps its PRE-wind-down state (only
        # `done` flips); continuing slots advance with the decremented
        # delay counter and sampled next tokens
        go = cont & ~now_done
        g1 = go[:, None]
        g2 = go[:, None, None]
        return BatchedDiaState(
            kv_k=kv_k, kv_v=kv_v,
            cross_k=st.cross_k, cross_v=st.cross_v, vtail=st.vtail,
            pos=jnp.where(go, new_pos, st.pos),
            tokens_in=jnp.where(g1, nxt, st.tokens_in),
            delay_steps=jnp.where(go, ds, st.delay_steps),
            active=st.active,
            done=jnp.where(cont, now_done, st.done),
            out_tokens=jnp.where(g2, out_t, st.out_tokens),
            sampler_state=sampling.BatchedSamplerState(
                last_token=jnp.where(g1, s_state.last_token,
                                     st.sampler_state.last_token),
                repeat_count=jnp.where(g1, s_state.repeat_count,
                                       st.sampler_state.repeat_count)),
            key=key,
            do_sample=st.do_sample, temperature=st.temperature,
            top_k=st.top_k, top_p=st.top_p,
            repetition_penalty=st.repetition_penalty,
        ), None

    st, _ = jax.lax.scan(step, st, None, length=n_steps)
    return st


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def insert_dia_request(cfg: DiaConfig, st: BatchedDiaState, slot,
                       ck, cv, vtail, do_sample, temperature, top_k, top_p,
                       repetition_penalty) -> BatchedDiaState:
    """Place an encoded request (packed cross K/V from prep_dia_cross,
    reshaped (L, 2, heads, Sb, D)) into batch slot `slot`."""
    nh = cfg.n_output_heads
    L, nkv, d = cfg.n_decoder_layers, cfg.n_kv_heads, cfg.head_size
    ctx = cfg.max_generation_size
    return st._replace(
        kv_k=jax.lax.dynamic_update_slice(
            st.kv_k, jnp.zeros((L, 1, 2, nkv, ctx, d), st.kv_k.dtype),
            (0, slot, 0, 0, 0, 0)),
        kv_v=jax.lax.dynamic_update_slice(
            st.kv_v, jnp.zeros((L, 1, 2, nkv, ctx, d), st.kv_v.dtype),
            (0, slot, 0, 0, 0, 0)),
        cross_k=st.cross_k.at[:, slot].set(ck.astype(st.cross_k.dtype)),
        cross_v=st.cross_v.at[:, slot].set(cv.astype(st.cross_v.dtype)),
        vtail=st.vtail.at[:, slot].set(vtail),
        pos=st.pos.at[slot].set(0),
        tokens_in=st.tokens_in.at[slot].set(
            jnp.full((nh,), cfg.bos_token_id, jnp.int32)),
        delay_steps=st.delay_steps.at[slot].set(-1),
        active=st.active.at[slot].set(True),
        done=st.done.at[slot].set(False),
        out_tokens=st.out_tokens.at[slot].set(
            jnp.zeros((ctx, nh), jnp.int32)),
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


class BatchedDiaEngine:
    """Slot-based continuous batching over one Dia model. Results are the
    delay-undone (frames, n_heads) code arrays (adjust_output_tokens)."""

    def __init__(self, cfg: DiaConfig, weights: DiaWeights, tokenizer=None,
                 n_slots: int = 4, chunk: int = 32, seed: int = 0,
                 cross_bucket: int = 256):
        self.cfg = cfg
        self.weights = weights
        self.n_slots = n_slots
        self.chunk = chunk
        self.cross_bucket = min(cross_bucket,
                                cfg.max_encoder_context_length)
        self.n_tail = cfg.max_encoder_context_length - self.cross_bucket
        from ..models.dia.model import maybe_prep_dia_mega
        self.mega, self.mega_qtype = maybe_prep_dia_mega(cfg, weights)
        # the batched megakernel needs 2B % 8 == 0 (each slot is a CFG
        # pair on two sublane rows): pad the compiled batch to a multiple
        # of 4 slots when the kernel is available (padded slots stay
        # inactive; n_slots governs admission)
        b_state = (-(-n_slots // 4) * 4 if self.mega is not None
                   else n_slots)
        self.state = init_batched_dia_state(cfg, b_state,
                                            jax.random.PRNGKey(seed),
                                            cross_bucket=self.cross_bucket)
        self.slot_req: List[Optional[int]] = [None] * n_slots
        self.pending: List[tuple] = []
        self.results: Dict[int, np.ndarray] = {}
        self.errors: Dict[int, str] = {}
        self._next_id = 0

    def validate_prompt(self, text: str, config: GenerationConfig) -> None:
        """Raise ValueError before queueing when the prompt exceeds the
        engine's cross bucket (256 bytes by default, vs 1024 on the
        single-stream path — the server routes oversized prompts there)."""
        ids = tokenize_sentence(text, self.cfg)
        if len(ids) > self.cross_bucket:
            raise ValueError(
                f"prompt ({len(ids)} bytes) exceeds the batched engine's "
                f"cross bucket ({self.cross_bucket})")

    def submit(self, text: str, config: GenerationConfig) -> int:
        self.validate_prompt(text, config)
        rid = self._next_id
        self._next_id += 1
        self.pending.append((rid, text, config))
        self._fill_slots()
        return rid

    def _encode(self, text: str):
        from ..ops.dia_megastep import prep_dia_cross
        cfg = self.cfg
        ids = tokenize_sentence(text, cfg)
        if len(ids) > self.cross_bucket:
            raise ValueError(
                f"prompt ({len(ids)} bytes) exceeds the engine cross "
                f"bucket ({self.cross_bucket})")
        tokens = np.zeros((2, cfg.max_encoder_context_length), np.int32)
        tokens[0, : len(ids)] = ids
        _, ck, cv = dia_encode(cfg, self.weights, jnp.asarray(tokens),
                               jnp.int32(len(ids)))
        ckb, cvb, vtail, n_tail = prep_dia_cross(
            ck, cv, self.cross_bucket, buckets=(self.cross_bucket,))
        assert n_tail == self.n_tail
        L, heads, d = (cfg.n_decoder_layers, cfg.decoder_attn_heads,
                       cfg.head_size)
        sb = self.cross_bucket
        return (ckb.reshape(L, 2, heads, sb, d),
                cvb.reshape(L, 2, heads, sb, d),
                vtail.reshape(L, 2, heads, d))

    def _fill_slots(self) -> None:
        for slot in range(self.n_slots):
            if self.slot_req[slot] is not None or not self.pending:
                continue
            rid, text, config = self.pending.pop(0)
            try:
                ck, cv, vtail = self._encode(text)
            except Exception as e:  # noqa: BLE001 — fail only this request
                self.errors[rid] = str(e)
                continue
            self.state = insert_dia_request(
                self.cfg, self.state, slot, ck, cv, vtail,
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
                return (int(np.asarray(self.state.pos)[slot]),
                        np.asarray(self.state.out_tokens)[slot])
        return None

    def step(self) -> List[int]:
        self.state = batched_dia_decode_chunk(
            self.cfg, self.weights, self.state, n_steps=self.chunk,
            n_tail=self.n_tail, mega=self.mega,
            mega_qtype=self.mega_qtype)
        done_mask = ~np.asarray(_not_done(self.cfg, self.state))
        finished = []
        for slot in range(self.n_slots):
            rid = self.slot_req[slot]
            if rid is None or not done_mask[slot]:
                continue
            n_steps = int(np.asarray(self.state.pos)[slot])
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
