"""DAC (Descript Audio Codec) decoder — TPU-native.

Parity: reference src/decoder/dac_model.{h,cpp} + shared blocks in
src/decoder/general_neural_audio_codec.cpp. 44.1 kHz, 512 samples/token,
9 codebooks. Whole decode is one jitted feed-forward conv stack (the
reference builds a ggml graph over the full token sequence, dac_model.cpp:
146-170); we bucket the token-sequence length so XLA compiles a few static
shapes and the convs land on the MXU.

Structure (dac_model.cpp:146-170, general_neural_audio_codec.cpp:133-172):
  embd   = sum_i out_proj_i(codebook_i[codes_i])         (quantize layers)
  x      = conv1d(embd, k=7, p=3)
  4x layer: snake -> conv_transpose(stride,pad) -> bias
            -> 3 residual units (dilation 3^j, pad 3^(j+1))
  x      = snake -> conv1d(k=7, p=3) -> tanh
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...gguf.reader import GGUFReader
from ...ops.conv import conv1d, conv_transpose_1d
from ...ops.dsp import snake_1d


class ResidualUnitWeights(NamedTuple):
    in_alpha: Any
    in_w: Any; in_b: Any
    out_alpha: Any
    out_w: Any; out_b: Any


class CodecLayerWeights(NamedTuple):
    alpha: Any
    up_w: Any; up_b: Any            # conv_transpose kernel/bias
    noise_w: Any                    # 1x1 conv or None (SNAC only)
    units: List[ResidualUnitWeights]


class QuantizeLayerWeights(NamedTuple):
    codebook: Any                   # (codebook_size, dim)
    out_w: Any; out_b: Any          # 1x1 conv


class DACWeights(NamedTuple):
    quantizers: List[QuantizeLayerWeights]
    in_w: Any; in_b: Any
    layers: List[CodecLayerWeights]
    final_alpha: Any
    out_w: Any; out_b: Any


@dataclasses.dataclass(eq=False)
class DACConfig:
    n_layers: int = 4
    n_heads: int = 9
    up_sampling_factor: int = 512
    strides: tuple = (8, 8, 4, 2)
    paddings: tuple = (4, 4, 2, 1)

    @classmethod
    def from_gguf(cls, r: GGUFReader) -> "DACConfig":
        c = cls()
        c.n_heads = int(r.first_key(["parler-tts.decoder.output_heads",
                                     "output_heads", "dia.decoder.output_heads"],
                                    c.n_heads))
        c.up_sampling_factor = int(r.first_key(
            ["dac.up_sampling_factor", "up_sampling_factor",
             "dac.up_scaling_factor"], c.up_sampling_factor))
        strides, paddings = [], []
        i = 0
        while True:
            s = r.first_key([f"dac.dac_layer_stride_{i}", f"dac_layer_stride_{i}"])
            p = r.first_key([f"dac.dac_layer_padding_{i}", f"dac_layer_padding_{i}"])
            if s is None or p is None:
                break
            strides.append(int(s)); paddings.append(int(p))
            i += 1
        if strides:
            c.strides, c.paddings = tuple(strides), tuple(paddings)
            c.n_layers = len(strides)
        return c


def _mask(x, valid):
    """Zero the padded tail: (C, T) with columns >= valid zeroed.

    Masking after every conv makes a bucket-padded decode EXACTLY equal to an
    exact-length decode on the valid prefix: convs see zeros past the
    boundary, which is precisely the zero padding an exact-length conv would
    apply. (snake(0)=0 and residual adds preserve zeros, so only conv biases
    re-dirty the tail.)
    """
    if valid is None:
        return x
    t = x.shape[-1]
    return x * (jnp.arange(t) < valid)[None, :]


def residual_unit(x, u: ResidualUnitWeights, dilation: int, padding: int,
                  valid=None):
    """snake -> (depthwise if grouped) dilated conv -> snake -> 1x1 conv -> +res
    (general_neural_audio_codec.cpp:133-149)."""
    res = x
    h = snake_1d(x, u.in_alpha)
    groups = x.shape[0] if u.in_w.shape[1] == 1 else 1
    h = conv1d(h, u.in_w, u.in_b, padding=padding, dilation=dilation,
               groups=groups)
    h = _mask(h, valid)
    h = snake_1d(h, u.out_alpha)
    h = conv1d(h, u.out_w, u.out_b)
    return _mask(h, valid) + res


def codec_layer(x, lw: CodecLayerWeights, stride: int, padding: int,
                noise=None, valid=None):
    """snake -> conv_transpose -> optional noise branch -> residual units
    (general_neural_audio_codec.cpp:151-164). valid is the input valid
    length; output valid length is valid*stride (codec kernels use k=2s,
    p=s/2 so lengths scale exactly by the stride)."""
    h = snake_1d(x, lw.alpha)
    h = conv_transpose_1d(h, lw.up_w, lw.up_b, stride=stride, padding=padding)
    v_out = None if valid is None else valid * stride
    h = _mask(h, v_out)
    if lw.noise_w is not None and noise is not None:
        n = conv1d(h, lw.noise_w)
        h = h + _mask(n, v_out) * noise
    for j, u in enumerate(lw.units):
        h = residual_unit(h, u, dilation=3 ** j, padding=3 ** (j + 1),
                          valid=v_out)
    return h, v_out


@functools.partial(jax.jit, static_argnames=("cfg",))
def dac_decode(cfg: DACConfig, w: DACWeights, codes: jax.Array,
               valid=None) -> jax.Array:
    """codes (T, n_heads) int32 -> waveform (T * 512,).

    With `valid` (true frame count, traced scalar), bucket-padded decode is
    exactly equal to an unpadded decode of the first `valid` frames.
    """
    embds = []
    for i, q in enumerate(w.quantizers):
        z = jnp.take(q.codebook, codes[:, i], axis=0)  # (T, dim)
        z = conv1d(z.T, q.out_w, q.out_b)              # 1x1 -> (latent, T)
        embds.append(z)
    x = _mask(sum(embds), valid)
    x = _mask(conv1d(x, w.in_w, w.in_b, padding=3), valid)
    for lw, s, p in zip(w.layers, cfg.strides, cfg.paddings):
        x, valid = codec_layer(x, lw, s, p, valid=valid)
    x = snake_1d(x, w.final_alpha)
    x = _mask(conv1d(x, w.out_w, w.out_b, padding=3), valid)
    return jnp.tanh(x)[0]


def _get(r: GGUFReader, name: str):
    return jnp.asarray(np.asarray(r.array(name), dtype=np.float32))


def load_dac_weights(r: GGUFReader, cfg: DACConfig,
                     prefix: str = "audio_encoder.") -> DACWeights:
    """GGUF names per the reference converter (py-gguf dac_gguf_encoder.py):
    initial.*, decoder_block.{1..4}.final.*, decoder_block.N.residual_unit.M.
    res.{initial,final}.*, final.*, quantizers.N.{codebook.weight,out_proj.*}.
    Conv biases are stored (C,); alphas (1, C, 1) or (C, 1)."""

    def alpha(name):
        a = _get(r, name)
        return a.reshape(-1, 1)  # broadcast over time, per channel

    def bias(name):
        return _get(r, name).reshape(-1)

    quantizers = []
    for i in range(cfg.n_heads):
        b = f"{prefix}quantizers.{i}."
        quantizers.append(QuantizeLayerWeights(
            codebook=_get(r, b + "codebook.weight"),
            out_w=_get(r, b + "out_proj.weight"),
            out_b=bias(b + "out_proj.bias"),
        ))
    layers = []
    for i in range(1, cfg.n_layers + 1):
        b = f"{prefix}decoder_block.{i}."
        units = []
        for j in range(3):
            ub = b + f"residual_unit.{j}.res."
            units.append(ResidualUnitWeights(
                in_alpha=alpha(ub + "initial.alpha"),
                in_w=_get(r, ub + "initial.weight"),
                in_b=bias(ub + "initial.bias"),
                out_alpha=alpha(ub + "final.alpha"),
                out_w=_get(r, ub + "final.weight"),
                out_b=bias(ub + "final.bias"),
            ))
        layers.append(CodecLayerWeights(
            alpha=alpha(b + "final.alpha"),
            up_w=_get(r, b + "final.weight"),
            up_b=bias(b + "final.bias"),
            noise_w=None,
            units=units,
        ))
    return DACWeights(
        quantizers=quantizers,
        in_w=_get(r, prefix + "initial.weight"),
        in_b=bias(prefix + "initial.bias"),
        layers=layers,
        final_alpha=alpha(prefix + "final.alpha"),
        out_w=_get(r, prefix + "final.weight"),
        out_b=bias(prefix + "final.bias"),
    )


def bf16_conv_weights(w: DACWeights) -> DACWeights:
    """Cast the conv kernels (ndim >= 3 leaves) to bf16 so the vocoder's
    MXU GEMMs run bf16-in/f32-accumulate (conv1d casts activations to match).
    Codebooks, biases, and snake alphas stay f32. OPT-IN
    (TTS_TPU_DAC_DTYPE=bfloat16): the reference records that reduced-
    precision DAC costs no audible quality on the trained model
    (perf_battery/README.md final note), but bf16 kernel rounding compounds
    through the conv stack (~1 dB on a tiny random net,
    tests/test_dac.py::test_bf16_conv_weights_close), so the default stays
    f32 to hold the <0.1 dB waveform-delta contract."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "ndim") and a.ndim >= 3 else a, w)


def _default_dac_dtype() -> str:
    import os
    return os.environ.get("TTS_TPU_DAC_DTYPE", "float32")


class DACRunner:
    """Length-bucketed decode wrapper (reference dac_runner::run,
    dac_model.cpp:172-212). Conv kernels run f32 by default;
    TTS_TPU_DAC_DTYPE=bfloat16 opts into bf16 kernels (~1.5x vocode)."""

    def __init__(self, cfg: DACConfig, weights: DACWeights,
                 buckets=(64, 128, 256, 512, 1024, 2580),
                 compute_dtype: str | None = None):
        self.cfg = cfg
        if (compute_dtype or _default_dac_dtype()) == "bfloat16":
            weights = bf16_conv_weights(weights)
        self.weights = weights
        self.buckets = buckets

    def decode(self, codes: np.ndarray) -> np.ndarray:
        t = codes.shape[0]
        tb = next((b for b in self.buckets if t <= b), t)
        padded = np.zeros((tb, self.cfg.n_heads), np.int32)
        padded[:t] = codes
        wav = dac_decode(self.cfg, self.weights, jnp.asarray(padded),
                         jnp.int32(t))
        # fetch the whole bucket and slice in numpy: an eager device-array
        # slice recompiles per novel length (~400 ms on the compile relay)
        # and was the bulk of TTFA (tools/probe_ttfa2.py)
        return np.asarray(wav)[: t * self.cfg.up_sampling_factor]
