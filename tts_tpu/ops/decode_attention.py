"""Paged flash-decode attention — single-query attention over a KV cache
that only READS the pages up to the current position.

XLA attention over a statically-shaped cache touches every row of the
padded cache each step (masked rows still cost HBM bandwidth and batched
tiny-matmul overhead); for Parler-Mini that is hundreds of MB per decoded
token. This kernel pages the cache (PAGE rows), processes ALL heads per grid
step, and uses a scalar-prefetched position with a CLAMPED block index map:
pages beyond the position map to the same block index as the last needed
page, and Mosaic skips the DMA when the block index repeats — so skipped
pages cost nothing. Flash-style running max/denominator accumulation keeps
numerics f32 regardless of cache dtype.

Grid: (n_pages,). q (H, D), k/v (H, CTX, D) -> out (H, D).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(pos_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
            page: int, n_pages: int, scale: float, n_rep: int):
    p = pl.program_id(0)
    pos = pos_ref[0]
    last_page = pos // page

    @pl.when(p == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(p <= last_page)
    def _():
        # batched per-head attention as VPU multiply+reduce: at these shapes
        # (H tiny matvecs) batched MXU dots cost ~1us of launch each; the VPU
        # does the whole page in a few microseconds.
        q = q_ref[:].astype(jnp.float32)                  # (Hq, D)
        k = k_ref[:].astype(jnp.float32)                  # (Hkv, PAGE, D)
        v = v_ref[:].astype(jnp.float32)
        if n_rep > 1:                                     # GQA: expand kv
            k = jnp.repeat(k, n_rep, axis=0)              # (Hq, PAGE, D)
            v = jnp.repeat(v, n_rep, axis=0)
        s = jnp.sum(q[:, None, :] * k, axis=2) * scale    # (Hq, PAGE)
        j = p * page + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(j <= pos, s, -jnp.inf)
        m_prev = m_ref[:, 0]                              # (H,)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1))
        alpha = jnp.exp(m_prev - m_new)                   # (H,)
        pexp = jnp.exp(s - m_new[:, None])                # (H, PAGE)
        l_ref[:, 0] = l_ref[:, 0] * alpha + jnp.sum(pexp, axis=1)
        pv = jnp.sum(pexp[:, :, None] * v, axis=1)        # (H, D)
        acc_ref[:] = acc_ref[:] * alpha[:, None] + pv
        m_ref[:, 0] = m_new

    @pl.when(p == n_pages - 1)
    def _():
        o_ref[:] = (acc_ref[:] / l_ref[:, 0][:, None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("page", "scale"))
def paged_decode_attention(q: jax.Array, kv_k: jax.Array, kv_v: jax.Array,
                           pos, page: int = 256,
                           scale: float | None = None) -> jax.Array:
    """q (Hq, D); kv_k/kv_v (Hkv, CTX, D) with Hq % Hkv == 0 (GQA: kv head j
    serves q heads [j*g, (j+1)*g)); attends rows [0, pos]. -> (Hq, D)."""
    h, d = q.shape
    hkv = kv_k.shape[0]
    ctx = kv_k.shape[1]
    n_rep = h // hkv
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    if ctx % page or h % hkv:
        return _xla_fallback(q, kv_k, kv_v, pos, scale)
    n_pages = ctx // page
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    def clamp(p, pos_ref):
        return (0, jnp.minimum(p, pos_ref[0] // page), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pages,),
        in_specs=[
            pl.BlockSpec((h, d), lambda p, pos_ref: (0, 0)),
            pl.BlockSpec((hkv, page, d), clamp),
            pl.BlockSpec((hkv, page, d), clamp),
        ],
        out_specs=pl.BlockSpec((h, d), lambda p, pos_ref: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h, d), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, page=page, n_pages=n_pages, scale=scale,
                          n_rep=n_rep),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h, d), q.dtype),
    )(pos_arr, q, kv_k, kv_v)


def _xla_fallback(q, kv_k, kv_v, pos, scale):
    n_rep = q.shape[0] // kv_k.shape[0]
    kk = jnp.repeat(kv_k, n_rep, axis=0) if n_rep > 1 else kv_k
    vv = jnp.repeat(kv_v, n_rep, axis=0) if n_rep > 1 else kv_v
    logits = jnp.einsum("hd,hkd->hk", q.astype(jnp.float32),
                        kk.astype(jnp.float32),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST) * scale
    mask = jnp.arange(kv_k.shape[1]) <= pos
    logits = jnp.where(mask[None, :], logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("hk,hkd->hd", probs, vv.astype(jnp.float32),
                      precision=jax.lax.Precision.HIGHEST).astype(q.dtype)


def decode_attention(q, kv_k, kv_v, pos, page: int = 256,
                     scale: float | None = None, use_pallas: bool | None = None):
    """Dispatching entry: XLA masked softmax for short caches (measured
    faster than the paged kernel up to ~1.5k rows — the pallas per-call cost
    exceeds the masked rows' read), paged Pallas kernel for long caches on
    TPU, XLA elsewhere."""
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    if use_pallas is None:
        try:
            on_tpu = jax.devices()[0].platform == "tpu"
        except Exception:
            on_tpu = False
        use_pallas = on_tpu and kv_k.shape[-2] > 1536
    if use_pallas:
        return paged_decode_attention(q, kv_k, kv_v, pos, page=page, scale=scale)
    return _xla_fallback(q, kv_k, kv_v, pos, scale)


# ---------------------------------------------------------------------------
# batched variant: B independent sequences, per-request positions
# ---------------------------------------------------------------------------

def _batched_kernel(pos_ref, q_ref, k_ref, v_ref, o_ref, acc_ref,
                    m_ref, l_ref, *, page: int, n_pages: int, scale: float,
                    n_rep: int):
    bb = pl.program_id(0)
    p = pl.program_id(1)
    pos = pos_ref[bb]
    last_page = pos // page

    @pl.when(p == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(p <= last_page)
    def _():
        q = q_ref[0].astype(jnp.float32)                  # (Hq, D)
        k = k_ref[0].astype(jnp.float32)                  # (Hkv, PAGE, D)
        v = v_ref[0].astype(jnp.float32)
        if n_rep > 1:
            k = jnp.repeat(k, n_rep, axis=0)
            v = jnp.repeat(v, n_rep, axis=0)
        s = jnp.sum(q[:, None, :] * k, axis=2) * scale    # (Hq, PAGE)
        j = p * page + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(j <= pos, s, -jnp.inf)
        m_prev = m_ref[:, 0]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1))
        alpha = jnp.exp(m_prev - m_new)
        pexp = jnp.exp(s - m_new[:, None])
        l_ref[:, 0] = l_ref[:, 0] * alpha + jnp.sum(pexp, axis=1)
        pv = jnp.sum(pexp[:, :, None] * v, axis=1)
        acc_ref[:] = acc_ref[:] * alpha[:, None] + pv
        m_ref[:, 0] = m_new

    @pl.when(p == n_pages - 1)
    def _():
        denom = jnp.maximum(l_ref[:, 0], 1e-30)
        o_ref[0] = (acc_ref[:] / denom[:, None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("page", "scale"))
def paged_decode_attention_batched(q: jax.Array, kv_k: jax.Array,
                                   kv_v: jax.Array, pos, page: int = 256,
                                   scale: float | None = None) -> jax.Array:
    """q (B, Hq, D); kv (B, Hkv, CTX, D); pos (B,) int32 per request. Grid
    runs (B, pages) so each request skips its own tail pages independently.
    -> (B, Hq, D)."""
    b, h, d = q.shape
    hkv = kv_k.shape[1]
    ctx = kv_k.shape[2]
    n_rep = h // hkv
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    pos = jnp.asarray(pos, jnp.int32)
    if ctx % page:
        outs = jax.vmap(lambda qq, kk, vv, pp: _xla_fallback(qq, kk, vv, pp, scale))(
            q, kv_k, kv_v, pos)
        return outs
    n_pages = ctx // page

    def clamp(bb, p, pos_ref):
        return (bb, 0, jnp.minimum(p, pos_ref[bb] // page), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_pages),
        in_specs=[
            pl.BlockSpec((1, h, d), lambda bb, p, pos_ref: (bb, 0, 0)),
            pl.BlockSpec((1, hkv, page, d), clamp),
            pl.BlockSpec((1, hkv, page, d), clamp),
        ],
        out_specs=pl.BlockSpec((1, h, d), lambda bb, p, pos_ref: (bb, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h, d), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_batched_kernel, page=page, n_pages=n_pages,
                          scale=scale, n_rep=n_rep),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
    )(pos, q, kv_k, kv_v)


def decode_attention_batched(q, kv_k, kv_v, pos, page: int = 256,
                             scale: float | None = None,
                             use_pallas: bool | None = None):
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    if use_pallas is None:
        try:
            use_pallas = jax.devices()[0].platform == "tpu"
        except Exception:
            use_pallas = False
    if use_pallas:
        return paged_decode_attention_batched(q, kv_k, kv_v, pos, page=page,
                                              scale=scale)
    return jax.vmap(lambda qq, kk, vv, pp: _xla_fallback(qq, kk, vv, pp,
                                                         scale))(
        q, kv_k, kv_v, jnp.asarray(pos, jnp.int32))
