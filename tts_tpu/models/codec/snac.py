"""SNAC (Scale Neural Audio Codec, 24 kHz) decoder — TPU-native.

Parity: reference src/decoder/snac_model.{h,cpp}. Differences from DAC:
multi-rate codebook heads repeat-interleaved (x4/x2/x1), depthwise in-conv +
1x1 up-conv, per-layer Gaussian noise injection (noise length = layer output
length), grouped residual units.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...gguf.reader import GGUFReader
from ...ops.conv import conv1d
from ...ops.dsp import snake_1d
from .dac import (CodecLayerWeights, QuantizeLayerWeights, ResidualUnitWeights,
                  codec_layer, _mask)


@dataclasses.dataclass(eq=False)
class SNACConfig:
    n_layers: int = 4
    n_heads: int = 3
    up_sampling_factor: int = 512
    embd: int = 768
    repeats: tuple = (4, 2, 1)
    noise_steps: tuple = (8, 64, 256, 512)
    strides: tuple = (8, 8, 4, 2)
    paddings: tuple = (4, 4, 2, 1)
    groupings: tuple = (1, 1, 1, 1)

    @classmethod
    def from_gguf(cls, r: GGUFReader) -> "SNACConfig":
        c = cls()
        c.n_heads = int(r.get("snac.audio_token_channels", c.n_heads))
        c.up_sampling_factor = int(r.get("snac.up_sampling_factor", c.up_sampling_factor))
        s, p, gr = [], [], []
        i = 0
        while True:
            sv = r.get(f"snac.snac_layer_stride_{i}")
            pv = r.get(f"snac.snac_layer_padding_{i}")
            gv = r.get(f"snac.snac_layer_grouping_{i}")
            if sv is None:
                break
            s.append(int(sv)); p.append(int(pv)); gr.append(int(gv))
            i += 1
        if s:
            c.strides, c.paddings, c.groupings = tuple(s), tuple(p), tuple(gr)
            c.n_layers = len(s)
            # per-layer noise length = layer output length = cumprod(strides)
            # (the reference hardcodes {8,64,256,512} for strides 8,8,4,2 —
            # snac_model.h:19)
            c.noise_steps = tuple(int(x) for x in np.cumprod(s))
        return c


class SNACWeights(NamedTuple):
    quantizers: List[QuantizeLayerWeights]
    in_w: Any; in_b: Any                 # depthwise k7
    up_w: Any; up_b: Any                 # 1x1
    layers: List[CodecLayerWeights]      # with noise_w set
    final_alpha: Any
    out_w: Any; out_b: Any


@functools.partial(jax.jit, static_argnames=("cfg",))
def snac_decode(cfg: SNACConfig, w: SNACWeights, codes_fine: jax.Array,
                codes_mid: jax.Array, codes_coarse: jax.Array,
                noise: jax.Array, valid=None) -> jax.Array:
    """codes_coarse (T/4,), codes_mid (T/2,), codes_fine (T,) -> waveform
    (T*512,). noise: (noise_total, ) standard normal where noise_total =
    sum(noise_steps)*T — sliced per layer like the reference
    (snac_model.cpp:147-151).
    """
    t = codes_fine.shape[0]
    heads = [codes_coarse, codes_mid, codes_fine]
    x = None
    for i, (q, codes) in enumerate(zip(w.quantizers, heads)):
        z = jnp.take(q.codebook, codes, axis=0)            # (T/rep, dim)
        z = conv1d(z.T, q.out_w, q.out_b)                  # (embd, T/rep)
        if cfg.repeats[i] > 1:
            z = jnp.repeat(z, cfg.repeats[i], axis=-1)
        x = z if x is None else x + z
    x = _mask(x, valid)
    c = x.shape[0]
    x = conv1d(x, w.in_w, w.in_b, padding=3, groups=c)     # depthwise
    x = _mask(x, valid)
    x = conv1d(x, w.up_w, w.up_b)
    x = _mask(x, valid)
    off = 0
    v = valid
    for l, lw in enumerate(w.layers):
        ln = cfg.noise_steps[l] * t
        nz = jax.lax.dynamic_slice(noise, (off,), (ln,))
        off += ln
        x, v = codec_layer(x, lw, cfg.strides[l], cfg.paddings[l],
                           noise=nz[None, :], valid=v)
    x = snake_1d(x, w.final_alpha)
    x = _mask(conv1d(x, w.out_w, w.out_b, padding=3), v)
    return jnp.tanh(x)[0]


def _get(r, name):
    return jnp.asarray(np.asarray(r.array(name), dtype=np.float32))


def load_snac_weights(r: GGUFReader, cfg: SNACConfig,
                      prefix: str = "snac.") -> SNACWeights:
    def alpha(name):
        return _get(r, name).reshape(-1, 1)

    def bias(name):
        return _get(r, name).reshape(-1)

    quantizers = []
    for i in range(cfg.n_heads):
        b = f"{prefix}quantizers.{i}."
        quantizers.append(QuantizeLayerWeights(
            codebook=_get(r, b + "codebook.weight"),
            out_w=_get(r, b + "out_proj.weight"),
            out_b=bias(b + "out_proj.bias")))
    layers = []
    for i in range(cfg.n_layers):
        b = f"{prefix}layers.{i}."
        units = []
        for j in range(3):
            ub = b + f"residual_unit.{j}.res."
            # fall back to flat in_/out_ names if present
            names = r.tensors
            if ub + "initial.alpha" in names:
                units.append(ResidualUnitWeights(
                    in_alpha=alpha(ub + "initial.alpha"),
                    in_w=_get(r, ub + "initial.weight"),
                    in_b=bias(ub + "initial.bias"),
                    out_alpha=alpha(ub + "final.alpha"),
                    out_w=_get(r, ub + "final.weight"),
                    out_b=bias(ub + "final.bias")))
            else:
                ub2 = b + f"{j}."
                units.append(ResidualUnitWeights(
                    in_alpha=alpha(ub2 + "in_alpha"),
                    in_w=_get(r, ub2 + "in_weight"),
                    in_b=bias(ub2 + "in_bias"),
                    out_alpha=alpha(ub2 + "out_alpha"),
                    out_w=_get(r, ub2 + "out_weight"),
                    out_b=bias(ub2 + "out_bias")))
        noise_name = b + "noise_weight"
        layers.append(CodecLayerWeights(
            alpha=alpha(b + "alpha" if b + "alpha" in r.tensors else b + "final.alpha"),
            up_w=_get(r, b + "weight" if b + "weight" in r.tensors else b + "final.weight"),
            up_b=bias(b + "bias" if b + "bias" in r.tensors else b + "final.bias"),
            noise_w=_get(r, noise_name) if noise_name in r.tensors else None,
            units=units))
    return SNACWeights(
        quantizers=quantizers,
        in_w=_get(r, prefix + "in.weight"), in_b=bias(prefix + "in.bias"),
        up_w=_get(r, prefix + "up.weight"), up_b=bias(prefix + "up.bias"),
        layers=layers,
        final_alpha=alpha(prefix + "alpha_out"),
        out_w=_get(r, prefix + "final.weight"),
        out_b=bias(prefix + "final.bias"),
    )


def make_noise_layers(cfg: SNACConfig, seed, t_max: int) -> list:
    """Per-layer noise arrays laid out by ABSOLUTE frame position: layer l
    holds noise_steps[l] values per fine frame, for t_max frames. Streaming
    decodes slice these by frame offset so a streamed segment sees exactly
    the noise a full decode would (the reference fills one flat host buffer
    per run, snac_model.cpp:178 — position-stable layout is our streaming
    extension)."""
    rng = np.random.default_rng(seed)
    return [rng.standard_normal(ns * t_max).astype(np.float32)
            for ns in cfg.noise_steps]


class SNACRunner:
    """Parity: snac_runner::run (snac_model.cpp:181-209)."""

    def __init__(self, cfg: SNACConfig, weights: SNACWeights,
                 buckets=(32, 64, 128, 256, 512, 1200)):
        self.cfg = cfg
        self.weights = weights
        self.buckets = buckets

    def decode(self, heads: list, seed=None, *, noise_layers=None,
               frame_offset: int = 0) -> np.ndarray:
        """heads = [coarse (T/4), mid (T/2), fine (T)] token id lists.

        noise_layers/frame_offset: optional position-stable noise (see
        make_noise_layers) — segment decodes at `frame_offset` reuse the
        same per-frame noise as a full decode from frame 0.
        """
        cfg = self.cfg
        t = len(heads[2])
        tb = next((b for b in self.buckets if t <= b), t)
        tb = max(tb - tb % 4, 4)
        if tb < t:
            tb = t + (-t) % 4
        fine = np.zeros(tb, np.int32); fine[:t] = heads[2]
        mid = np.zeros(tb // 2, np.int32); mid[: len(heads[1])] = heads[1]
        coarse = np.zeros(tb // 4, np.int32); coarse[: len(heads[0])] = heads[0]
        if noise_layers is not None:
            parts = []
            for ns, full in zip(cfg.noise_steps, noise_layers):
                seg = full[ns * frame_offset: ns * (frame_offset + tb)]
                if seg.shape[0] < ns * tb:
                    seg = np.concatenate(
                        [seg, np.zeros(ns * tb - seg.shape[0], np.float32)])
                parts.append(seg)
            noise = np.concatenate(parts)
        else:
            rng = np.random.default_rng(seed)
            noise = rng.standard_normal(
                sum(cfg.noise_steps) * tb).astype(np.float32)
        wav = snac_decode(cfg, self.weights, jnp.asarray(fine),
                          jnp.asarray(mid), jnp.asarray(coarse),
                          jnp.asarray(noise), jnp.int32(t))
        return np.asarray(wav)[: t * cfg.up_sampling_factor]
