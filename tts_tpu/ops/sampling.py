"""Device-side multi-head token sampling.

TPU-native replacement for the reference's host C++ sampler
(src/sampler.cpp). Same observable semantics, but fully jittable and running
on device so logits never cross to the host inside the decode loop:

  * greedy argmax over raw logits when sampling is off (sampler::max)
  * repetition penalty: the (single) last token's logit is *divided* by
    rp^consecutive_repeat_count (sampler.cpp:89-100)
  * temperature division, numerically-stable softmax
  * top-k restriction (sampler::topk)
  * top-p nucleus: trim sorted probs at the first prefix reaching top_p,
    sample u ~ U(0,1) * min(prefix_sum, top_p) (sampler::topp + sample)

All heads sample independently (Parler/Dia: 9 codebook heads; Orpheus: 1).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SamplerState(NamedTuple):
    """Per-head repetition-penalty state (reference sampler::reset)."""

    last_token: jax.Array  # (H,) int32, -1 = none
    repeat_count: jax.Array  # (H,) int32


def init_state(n_heads: int) -> SamplerState:
    return SamplerState(
        last_token=jnp.full((n_heads,), -1, jnp.int32),
        repeat_count=jnp.zeros((n_heads,), jnp.int32),
    )


def _penalized(logits: jax.Array, state: SamplerState, rp: float) -> jax.Array:
    """Divide the last token's logit by rp^count, per head."""
    h, v = logits.shape
    tok = jnp.arange(v)[None, :]
    factor = rp ** state.repeat_count.astype(jnp.float32)
    hit = tok == state.last_token[:, None]
    return jnp.where(hit, logits / factor[:, None], logits)


def update_state(state: SamplerState, tokens: jax.Array) -> SamplerState:
    same = tokens == state.last_token
    return SamplerState(
        last_token=tokens.astype(jnp.int32),
        repeat_count=jnp.where(same, state.repeat_count + 1, 1).astype(jnp.int32),
    )


def greedy(logits: jax.Array) -> jax.Array:
    """(H, V) -> (H,) argmax. Reference sampler::max (no penalties applied)."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


# `lax.top_k` cost on TPU grows with BOTH v and k (a masked-max sweep per
# rank); at Orpheus's 157k vocab a direct k=64 top_k costs ~1 ms/step for
# 8 slots — comparable to the whole megakernel's attention. Hierarchical
# EXACT top-k instead: per-tile max (one bandwidth-bound sweep) -> top-k
# over the ~1200 tile maxima -> top-k over only the k winning tiles'
# elements (k*tile candidates, ~19x fewer lanes than v). Exact because the
# true top-k elements occupy at most k tiles, and any tile containing one
# has tile-max >= the k-th value, so the k tiles ranked by max cover them
# all. Tie ORDER among equal values can differ from direct lax.top_k
# (tiles are ranked by max, not element index) — the selected SET and the
# sampling distribution are identical.
_TOPK_TILE = 128
_TOPK_MIN_V = 16384


def top_k_tiled(x: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Exact (values, indices) top-k over the last axis, descending.

    Drop-in for jax.lax.top_k; dispatches to it below _TOPK_MIN_V lanes
    (the hierarchy only pays off when v >> k * tile)."""
    v = x.shape[-1]
    t = -(-v // _TOPK_TILE)
    if v < _TOPK_MIN_V or k > t:
        return jax.lax.top_k(x, k)
    pad = t * _TOPK_TILE - v
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)],
                    constant_values=-jnp.inf)
    xt = x.reshape(*x.shape[:-1], t, _TOPK_TILE)
    tmax = jnp.max(xt, axis=-1)                            # (..., t)
    _, ti = jax.lax.top_k(tmax, k)                         # winning tiles
    cand = jnp.take_along_axis(xt, ti[..., None], axis=-2)  # (..., k, tile)
    flat = cand.reshape(*cand.shape[:-2], k * _TOPK_TILE)
    vals, i2 = jax.lax.top_k(flat, k)
    idx = (jnp.take_along_axis(ti, i2 // _TOPK_TILE, axis=-1) * _TOPK_TILE
           + i2 % _TOPK_TILE)
    return vals, idx


def sample(key: jax.Array, logits: jax.Array, state: SamplerState,
           temperature: float = 1.0, top_k: int = 0, top_p: float = 1.0,
           repetition_penalty: float = 1.0) -> tuple[jax.Array, SamplerState]:
    """Sample one token per head from (H, V) logits.

    temperature/top_k/top_p/repetition_penalty are python-static (they come
    from GenerationConfig and bake into the jitted step). Returns (tokens,
    new_state).
    """
    h, v = logits.shape
    x = logits.astype(jnp.float32)
    if repetition_penalty != 1.0:
        x = _penalized(x, state, repetition_penalty)
    if temperature != 1.0:
        x = x / temperature

    if 0 < top_k < v:
        # Fast path: a full (H, V) argsort costs ~10x the rest of the decode
        # sampler on TPU; only the top_k entries can ever be selected, and
        # their full-softmax probabilities need just the global logsumexp.
        # Semantics identical to the sorted-full-vocab path below (including
        # the overflow-mass-on-last-pick behavior, sampler.cpp:139-169).
        topv, order = top_k_tiled(x, top_k)                # (H, k) desc
        lse = jax.nn.logsumexp(x, axis=-1, keepdims=True)  # full-vocab Z
        sorted_p = jnp.exp(topv - lse)                     # true softmax mass
        keep = jnp.ones((h, top_k), bool)
        v_eff = top_k
    else:
        probs = jax.nn.softmax(x, axis=-1)
        order = jnp.argsort(-probs, axis=-1)  # descending
        sorted_p = jnp.take_along_axis(probs, order, axis=-1)
        keep = jnp.ones((h, v), bool)
        v_eff = v
    kept_p = jnp.where(keep, sorted_p, 0.0)
    cum = jnp.cumsum(kept_p, axis=-1)
    if top_p < 1.0:
        # keep entries whose preceding cumulative mass is < top_p
        # (the entry that crosses top_p is included).
        keep = keep & ((cum - kept_p) < top_p)
        kept_p = jnp.where(keep, sorted_p, 0.0)
        cum = jnp.cumsum(kept_p, axis=-1)
        max_head_prob = jnp.minimum(jnp.sum(kept_p, axis=-1), top_p)
    else:
        # reference: u in [0,1) vs cumsum of top-k probs; overflow mass
        # falls on the last pick, equivalent to clamping u at the sum.
        max_head_prob = jnp.ones((h,))

    u = jax.random.uniform(key, (h,)) * max_head_prob
    found = keep & (cum >= u[:, None])
    first_hit = jnp.argmax(found, axis=-1)
    any_hit = jnp.any(found, axis=-1)
    # fallback: last kept index (reference picks[i].size() - 1 clause)
    last_kept = v_eff - 1 - jnp.argmax(jnp.flip(keep, axis=-1), axis=-1)
    pos = jnp.where(any_hit, first_hit, last_kept)
    tokens = jnp.take_along_axis(order, pos[:, None], axis=-1)[:, 0].astype(jnp.int32)
    new_state = update_state(state, tokens) if repetition_penalty != 1.0 else state
    return tokens, new_state


def sample_or_greedy(key, logits, state, *, do_sample: bool, temperature: float,
                     top_k: int, top_p: float, repetition_penalty: float):
    """Unified entry used by the jitted decode steps."""
    if not do_sample:
        return greedy(logits), state
    return sample(key, logits, state, temperature, top_k, top_p,
                  repetition_penalty)


# ---------------------------------------------------------------------------
# batched sampling: B requests with PER-REQUEST dynamic parameters
# ---------------------------------------------------------------------------

class BatchedSamplerState(NamedTuple):
    last_token: jax.Array   # (B, H) int32
    repeat_count: jax.Array  # (B, H) int32


def init_batched_state(b: int, n_heads: int) -> BatchedSamplerState:
    return BatchedSamplerState(
        last_token=jnp.full((b, n_heads), -1, jnp.int32),
        repeat_count=jnp.zeros((b, n_heads), jnp.int32),
    )


BATCHED_TOP_K_CAP = 256
"""Static cap on per-request top_k in the batched engine: the batched
sampler pre-selects the BATCHED_TOP_K_CAP highest-probability tokens with
`lax.top_k` instead of a full-vocab sort (10x+ faster on TPU). Requests with
top_k == 0 (no restriction) or top_k > the cap are truncated to the cap; for
nucleus sampling this only clips mass deeper than the top-256 tokens."""


def sample_batched(key: jax.Array, logits: jax.Array,
                   state: BatchedSamplerState, *, do_sample: jax.Array,
                   temperature: jax.Array, top_k: jax.Array,
                   top_p: jax.Array, repetition_penalty: jax.Array,
                   kmax: int | None = None):
    """logits (B, H, V); all parameters are (B,) arrays (dynamic per
    request, so one compiled program serves mixed-config batches).

    Semantics per request match `sample`/`greedy`: greedy rows take the raw
    argmax; sampled rows apply penalty/temperature/top-k/top-p (top-k capped
    at BATCHED_TOP_K_CAP, see above). `kmax` (static) tightens the
    pre-selection width when the caller knows every active request's top_k
    fits a smaller bucket — lax.top_k cost on TPU is ~linear in k, and at
    Orpheus's 157k vocab the k=256 pre-select alone costs ~4 ms/step for
    8 slots vs ~1 ms at k=64 (tools/probe_batched_parts.py).
    """
    b, h, v = logits.shape
    kmax = min(kmax or BATCHED_TOP_K_CAP, BATCHED_TOP_K_CAP, v)
    x = logits.astype(jnp.float32)
    # repetition penalty (division of the consecutive last token's logit)
    tok = jnp.arange(v)[None, None, :]
    factor = repetition_penalty[:, None] ** state.repeat_count.astype(jnp.float32)
    hit = tok == state.last_token[:, :, None]
    pen = jnp.where(repetition_penalty[:, None, None] != 1.0,
                    jnp.where(hit, x / factor[:, :, None], x), x)
    temp = jnp.maximum(temperature, 1e-6)[:, None, None]
    scaled = pen / temp
    topv, order = top_k_tiled(scaled, kmax)                # (B, H, kmax) desc
    lse = jax.nn.logsumexp(scaled, axis=-1, keepdims=True)
    sorted_p = jnp.exp(topv - lse)                          # full-softmax mass
    j = jnp.arange(kmax)[None, None, :]
    k_eff = jnp.where(top_k > 0, jnp.minimum(top_k, kmax), kmax)
    keep = j < k_eff[:, None, None]
    kept_p = jnp.where(keep, sorted_p, 0.0)
    cum = jnp.cumsum(kept_p, axis=-1)
    use_tp = top_p[:, None, None] < 1.0
    keep = keep & jnp.where(use_tp, (cum - kept_p) < top_p[:, None, None], True)
    kept_p = jnp.where(keep, sorted_p, 0.0)
    cum = jnp.cumsum(kept_p, axis=-1)
    max_head = jnp.where(top_p[:, None] < 1.0,
                         jnp.minimum(jnp.sum(kept_p, axis=-1), top_p[:, None]),
                         1.0)
    u = jax.random.uniform(key, (b, h)) * max_head
    found = keep & (cum >= u[:, :, None])
    first_hit = jnp.argmax(found, axis=-1)
    any_hit = jnp.any(found, axis=-1)
    last_kept = kmax - 1 - jnp.argmax(jnp.flip(keep, axis=-1), axis=-1)
    posn = jnp.where(any_hit, first_hit, last_kept)
    sampled = jnp.take_along_axis(order, posn[:, :, None], axis=-1)[:, :, 0]
    greedy_t = jnp.argmax(x, axis=-1)
    tokens = jnp.where(do_sample[:, None], sampled, greedy_t).astype(jnp.int32)
    same = tokens == state.last_token
    new_state = BatchedSamplerState(
        last_token=tokens,
        repeat_count=jnp.where(same, state.repeat_count + 1, 1).astype(jnp.int32),
    )
    return tokens, new_state
