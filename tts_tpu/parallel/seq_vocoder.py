"""Sequence-parallel vocoder decode — conv halo exchange over a mesh axis.

The reference vocodes the whole token sequence in one graph on one device
(reference dac_runner::run, src/decoder/dac_model.cpp:172-212); long-audio
generation is its sequence-scaling problem (SURVEY §2.8/§5). TPU-native
answer: shard the FRAME axis over the mesh and decode each shard against a
halo of neighbor frames covering the decoder's receptive field.

Exact by construction: shard i decodes the clamped window
    [i*Tl - m, i*Tl + Tl + m)  (clamped to [0, T_padded])
assembled from its own block plus both neighbors (jax.lax.ppermute), then
keeps only its own Tl frames of output. Every kept output sample's receptive
field lies inside the window, and edge-shard windows are flush with the
global edges (so conv zero-padding matches the unsharded computation). The
result equals the single-device decode bit-for-bit (tested).

Margin: the DAC decoder's receptive field in input frames is
~3 (in conv) + sum_l 39 / prod(strides[:l+1]) + ~1/layer; 16 covers the
real 512x model (strides 8,8,4,2) with slack.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.codec.dac import DACConfig, DACWeights, dac_decode


def sharded_dac_decode(cfg: DACConfig, w: DACWeights, codes: jax.Array,
                       mesh: Mesh, axis: str = "sp",
                       margin: int = 16) -> jax.Array:
    """codes (T, n_heads) int32 -> waveform (T * up,), frames sharded on
    `axis`. Equals dac_decode(cfg, w, codes) exactly."""
    n = mesh.shape[axis]
    t, h = codes.shape
    up = cfg.up_sampling_factor
    if n == 1:
        return dac_decode(cfg, w, codes, valid=None)
    tl = -(-t // n)  # ceil
    tl = max(tl, 2 * margin)  # window arithmetic needs Tl >= 2m
    t_pad = tl * n
    codes_p = jnp.pad(codes, ((0, t_pad - t), (0, 0)))
    win = tl + 2 * margin

    def local(codes_blk):
        i = jax.lax.axis_index(axis)
        left = jax.lax.ppermute(codes_blk, axis,
                                [(j, j + 1) for j in range(n - 1)])
        right = jax.lax.ppermute(codes_blk, axis,
                                 [(j + 1, j) for j in range(n - 1)])
        ctx3 = jnp.concatenate([left, codes_blk, right], axis=0)  # (3Tl, H)
        start = jnp.clip(i * tl - margin, 0, t_pad - win)
        off = tl + (start - i * tl)          # window start within ctx3
        ctx = jax.lax.dynamic_slice(ctx3, (off, 0), (win, h))
        # valid masking handles the global tail padding exactly (dac _mask)
        valid = jnp.clip(t - start, 0, win)
        wav = dac_decode(cfg, w, ctx, valid=valid)               # (win*up,)
        keep_from = (i * tl - start) * up
        out = jax.lax.dynamic_slice(wav, (keep_from,), (tl * up,))
        return out

    fn = shard_map(local, mesh=mesh, check_vma=False,
                   in_specs=(P(axis, None),), out_specs=P(axis))
    out = fn(codes_p)
    return out[: t * up]
