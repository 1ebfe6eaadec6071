"""Flat-tile Parler megastep (ops/parler_flat) — CPU tests via Pallas
interpret mode, against the phase-megastep XLA reference."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bench import build_q4_parler

from tts_tpu.models.parler.model import (ParlerRunner,
                                         maybe_prep_parler_flat)
from tts_tpu.ops.parler_flat import (ParlerFlatMega, build_parler_schedule,
                                     M_ROLE, M_SID, R_ATTP, R_XATT,
                                     parler_flat_megastep, prep_parler_flat)
from tts_tpu.ops.parler_megastep import (parler_megastep_reference,
                                         prep_mega_layers)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def tiny(rng, **kw):
    return build_q4_parler(rng, n_layers=2, hidden=256, heads=4, ffn=512,
                           enc_len=24, max_ctx=256, **kw)


def test_parler_schedule_invariants():
    m = build_parler_schedule(2, 256, 512, 256, 256, 2, True)
    role, sid = m[M_ROLE], m[M_SID]
    att = role >= R_ATTP
    d = np.diff(sid)
    assert (d[~att[:-1]] == 1).all()
    assert (d[att[:-1]] == 0).all()
    # 2 pages + final + xatt per layer
    assert att.sum() == 2 * 4
    # no-cross drops the xq/xatt/xo block
    m2 = build_parler_schedule(2, 256, 512, 256, 256, 2, False)
    assert (m2[M_ROLE] == R_XATT).sum() == 0
    assert m2.shape[1] < m.shape[1]


@pytest.mark.parametrize("use_cross,pos", [(True, 41), (True, 200),
                                           (False, 41)])
def test_parler_flat_matches_phase_reference(rng, use_cross, pos):
    cfg, w = tiny(rng)
    mega, qtype = prep_mega_layers(w.layers)
    flat = prep_parler_flat(mega, qtype, cfg.max_ctx_length,
                            use_cross=use_cross)
    L, H, heads, d = (cfg.n_layers, cfg.hidden_size, cfg.n_attn_heads,
                      cfg.head_size)
    ctx = cfg.max_ctx_length
    kv = rng.standard_normal((2, L, heads, ctx, d)).astype(np.float32) * 0.3
    kv_k, kv_v = jnp.asarray(kv[0]), jnp.asarray(kv[1])
    x = jnp.asarray(rng.standard_normal((1, H)).astype(np.float32)) * 0.5

    xo, kn, vn = parler_flat_megastep(
        flat, x, kv_k, kv_v, jnp.int32(pos), qtype=qtype, n_heads=heads,
        interpret=True)
    xr, kr, vr = parler_megastep_reference(
        mega, x, kv_k, kv_v, jnp.int32(pos), qtype=qtype,
        use_cross=use_cross, n_heads=heads)
    for a, b in ((xo, xr), (kn, kr), (vn, vr)):
        r = np.abs(np.asarray(a) - np.asarray(b)).max() / \
            (np.abs(np.asarray(b)).max() + 1e-9)
        assert r < 2e-2, r


def test_parler_flat_chunk_matches_phase(rng, monkeypatch):
    """Decode chunks through the flat megastep track the phase-megastep
    chunks greedily (same bf16 dequant math; the runner itself preps the
    phase kernel — measured faster at Parler scale — but the flat kernel
    stays a supported, tested alternative)."""
    monkeypatch.setenv("TTS_TPU_MEGAKERNEL", "1")
    from bench import _BenchTok
    from tts_tpu.models.parler.model import maybe_prep_mega
    cfg, w = tiny(rng)
    cfg.max_generation_size = 48
    runner = ParlerRunner(cfg, w, _BenchTok())
    # the runner default is the PHASE megastep
    assert runner._mega is not None
    assert not isinstance(runner._mega, ParlerFlatMega)
    from tts_tpu.common import GenerationConfig
    codes2 = runner.generate_codes("hello flat",
                                   GenerationConfig(sample=False))

    flat, fq = maybe_prep_parler_flat(cfg, w)
    assert isinstance(flat, ParlerFlatMega)
    runner._mega, runner._mega_qtype = flat, fq
    codes = runner.generate_codes("hello flat", GenerationConfig(sample=False))
    n = min(codes.shape[0], codes2.shape[0])
    agree = (codes[:n] == codes2[:n]).mean()
    assert agree > 0.9, agree
