"""TPU check: pallas megastep == XLA reference megastep (single-stream and
batched, incl. per-slot positions straddling KV page boundaries), then perf
at Parler-Mini scale."""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from bench import build_q4_parler
from tts_tpu.ops.parler_megastep import (parler_megastep,
                                         parler_megastep_batched,
                                         parler_megastep_batched_reference,
                                         parler_megastep_reference,
                                         prep_mega_layers)


def check_small():
    rng = np.random.default_rng(0)
    cfg, w = build_q4_parler(rng, n_layers=2, hidden=256, heads=4, ffn=512,
                             enc_len=64, max_ctx=256)
    mega, qtype = prep_mega_layers(w.layers)
    L, H = cfg.n_layers, cfg.hidden_size
    shape = (L, cfg.n_attn_heads, 256, cfg.head_size)
    kv_k = (jnp.asarray(rng.standard_normal(shape).astype(np.float32)) * 0.3
            ).astype(jnp.bfloat16)
    kv_v = (jnp.asarray(rng.standard_normal(shape).astype(np.float32)) * 0.3
            ).astype(jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((1, H)).astype(np.float32)) * 0.5
    pos = jnp.int32(37)
    xo_k, kn_k, vn_k = parler_megastep(mega, x, kv_k, kv_v, pos, qtype=qtype,
                                       use_cross=True, n_heads=cfg.n_attn_heads)
    xo_r, kn_r, vn_r = parler_megastep_reference(
        mega, x, kv_k, kv_v, pos, qtype=qtype, use_cross=True,
        n_heads=cfg.n_attn_heads)
    for name, a, b in (("x", xo_k, xo_r), ("k", kn_k, kn_r), ("v", vn_k, vn_r)):
        an, bn = np.asarray(a), np.asarray(b)
        rel = np.abs(an - bn).max() / (np.abs(bn).max() + 1e-9)
        print(f"kernel vs ref {name}: rel {rel:.3e}", flush=True)


def check_batched():
    """Batched kernel vs vmapped reference with slots at positions that
    straddle the KV page boundary (page=256 below): exercises the -1e30
    masked-page sentinel, the mp page clamp, and pos=0 (empty history)."""
    rng = np.random.default_rng(2)
    cfg, w = build_q4_parler(rng, n_layers=2, hidden=256, heads=4, ffn=512,
                             enc_len=64, max_ctx=1024)
    mega, qtype = prep_mega_layers(w.layers)
    L, H, nh, d = (cfg.n_layers, cfg.hidden_size, cfg.n_attn_heads,
                   cfg.head_size)
    B, ctx = 8, 1024
    shape = (L, B, nh, ctx, d)
    kv_k = (jnp.asarray(rng.standard_normal(shape).astype(np.float32)) * 0.3
            ).astype(jnp.bfloat16)
    kv_v = (jnp.asarray(rng.standard_normal(shape).astype(np.float32)) * 0.3
            ).astype(jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32)) * 0.5
    pos = jnp.asarray([0, 3, 255, 256, 257, 511, 768, 1023], jnp.int32)
    xo_k, kn_k, vn_k = parler_megastep_batched(
        mega, x, kv_k, kv_v, pos, qtype=qtype, use_cross=True, n_heads=nh,
        page=256)
    xo_r, kn_r, vn_r = parler_megastep_batched_reference(
        mega, x, kv_k, kv_v, pos, qtype=qtype, use_cross=True, n_heads=nh)
    ok = True
    for name, a, b in (("x", xo_k, xo_r), ("k", kn_k, kn_r),
                       ("v", vn_k, vn_r)):
        an, bn = np.asarray(a), np.asarray(b)
        rel = np.abs(an - bn).max() / (np.abs(bn).max() + 1e-9)
        print(f"batched kernel vs ref {name}: rel {rel:.3e}", flush=True)
        ok &= rel < 2e-3
    assert ok, "batched kernel diverges from reference"


def perf_batched(b=8, ctx=1024, pos0=64):
    rng = np.random.default_rng(3)
    cfg, w = build_q4_parler(rng)          # 24L/1024H/16 heads/4096 ffn
    mega, qtype = prep_mega_layers(w.layers)
    L, H, nh, d = (cfg.n_layers, cfg.hidden_size, cfg.n_attn_heads,
                   cfg.head_size)
    kv_k = jnp.zeros((L, b, nh, ctx, d), jnp.bfloat16)
    kv_v = jnp.zeros((L, b, nh, ctx, d), jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((b, H)).astype(np.float32)) * 0.5
    STEPS = 256

    @jax.jit
    def run(x, mega, kv_k, kv_v):
        def step(carry, i):
            xx, kk, vv = carry
            pos = jnp.full((b,), pos0, jnp.int32) + i
            xo, kn, vn = parler_megastep_batched(
                mega, xx, kk, vv, pos, qtype=qtype, use_cross=True,
                n_heads=nh)
            kk = jax.lax.dynamic_update_slice(
                kk, kn.reshape(L, b, nh, 1, d).astype(kk.dtype),
                (0, 0, 0, pos0 + i, 0))
            vv = jax.lax.dynamic_update_slice(
                vv, vn.reshape(L, b, nh, 1, d).astype(vv.dtype),
                (0, 0, 0, pos0 + i, 0))
            return (xo, kk, vv), ()
        (xx, _, _), _ = jax.lax.scan(step, (x, kv_k, kv_v),
                                     jnp.arange(STEPS))
        return xx

    out = run(x, mega, kv_k, kv_v)
    np.asarray(out).sum()
    t0 = time.perf_counter()
    out = run(x, mega, kv_k, kv_v)
    np.asarray(out).sum()
    dt = time.perf_counter() - t0
    per = (dt - 0.033) / STEPS
    print(f"batched megastep B={b}: {per*1e3:.3f} ms/step "
          f"({b*0.01161/per:.1f}x aggregate RT)", flush=True)


def perf_full():
    rng = np.random.default_rng(1)
    cfg, w = build_q4_parler(rng)          # 24L/1024H/16 heads/4096 ffn
    mega, qtype = prep_mega_layers(w.layers)
    L, H = cfg.n_layers, cfg.hidden_size
    shape = (L, cfg.n_attn_heads, cfg.max_ctx_length, cfg.head_size)
    kv_k = jnp.zeros(shape, jnp.bfloat16)
    kv_v = jnp.zeros(shape, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((1, H)).astype(np.float32)) * 0.5

    STEPS = 256

    @jax.jit
    def run(x, mega, kv_k, kv_v):
        def step(carry, i):
            xx, kk, vv = carry
            xo, kn, vn = parler_megastep(mega, xx, kk, vv, 64 + i,
                                         qtype=qtype, use_cross=True,
                                         n_heads=cfg.n_attn_heads)
            kk = jax.lax.dynamic_update_slice(
                kk, kn.reshape(L, cfg.n_attn_heads, 1, cfg.head_size
                               ).astype(kk.dtype), (0, 0, 64 + i, 0))
            vv = jax.lax.dynamic_update_slice(
                vv, vn.reshape(L, cfg.n_attn_heads, 1, cfg.head_size
                               ).astype(vv.dtype), (0, 0, 64 + i, 0))
            return (xo, kk, vv), ()
        (xx, _, _), _ = jax.lax.scan(step, (x, kv_k, kv_v),
                                     jnp.arange(STEPS))
        return xx

    out = run(x, mega, kv_k, kv_v)
    np.asarray(out).sum()
    t0 = time.perf_counter()
    out = run(x, mega, kv_k, kv_v)
    np.asarray(out).sum()
    dt = time.perf_counter() - t0
    per = (dt - 0.033) / STEPS
    nbytes = L * (6 * H * H + 2 * H * 4096)
    print(f"megastep full-scale: {per*1e3:.3f} ms/step "
          f"({nbytes/per/1e9:.0f} GB/s codes, {0.01161/per:.1f}x RT headroom)",
          flush=True)


def check_llama_small():
    """Llama megastep kernel vs XLA reference at tiny GQA dims."""
    from tests.test_llama_megastep import tiny_q4_llama
    from tts_tpu.ops.llama_megastep import (llama_megastep,
                                            llama_megastep_reference,
                                            prep_llama_mega)
    rng = np.random.default_rng(4)
    cfg, w = tiny_q4_llama(rng, L=2, H=256, heads=4, kv=2, F=512, ctx=256)
    mega, qtype = prep_llama_mega(w.layers)
    L, nkv, d = cfg.n_layers, cfg.n_kv_heads, cfg.head_size
    shape = (L, nkv, 256, d)
    kv_k = (jnp.asarray(rng.standard_normal(shape).astype(np.float32)) * 0.3
            ).astype(jnp.bfloat16)
    kv_v = (jnp.asarray(rng.standard_normal(shape).astype(np.float32)) * 0.3
            ).astype(jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((1, cfg.hidden_size)
                                        ).astype(np.float32)) * 0.5
    kw = dict(qtype=qtype, n_heads=cfg.n_attn_heads, n_kv=nkv,
              rope_base=cfg.rope_theta, rope_freq_factors=w.rope_freqs)
    xo_k, kn_k, vn_k = llama_megastep(mega, x, kv_k, kv_v, jnp.int32(37), **kw)
    xo_r, kn_r, vn_r = llama_megastep_reference(mega, x, kv_k, kv_v,
                                                jnp.int32(37), **kw)
    for name, a, b in (("x", xo_k, xo_r), ("k", kn_k, kn_r),
                       ("v", vn_k, vn_r)):
        an, bn = np.asarray(a), np.asarray(b)
        rel = np.abs(an - bn).max() / (np.abs(bn).max() + 1e-9)
        print(f"llama kernel vs ref {name}: rel {rel:.3e}", flush=True)


def perf_llama(ctx=1024):
    """Orpheus-3B-shaped megastep kernel, steps timed inside one scan."""
    from bench import build_q4_orpheus
    from tts_tpu.ops.llama_megastep import llama_megastep, prep_llama_mega
    cfg, w = build_q4_orpheus()
    mega, qtype = prep_llama_mega(w.layers)
    L, nkv, d = cfg.n_layers, cfg.n_kv_heads, cfg.head_size
    kv_k = jnp.zeros((L, nkv, ctx, d), jnp.bfloat16)
    kv_v = jnp.zeros((L, nkv, ctx, d), jnp.bfloat16)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, cfg.hidden_size)
                                        ).astype(np.float32)) * 0.5
    STEPS = 128
    kw = dict(qtype=qtype, n_heads=cfg.n_attn_heads, n_kv=nkv,
              rope_base=cfg.rope_theta)

    @jax.jit
    def run(x, mega, kv_k, kv_v, ff):
        def step(carry, i):
            xx, kk, vv = carry
            xo, kn, vn = llama_megastep(mega, xx, kk, vv, 64 + i,
                                        rope_freq_factors=ff, **kw)
            kk = jax.lax.dynamic_update_slice(
                kk, kn.reshape(L, nkv, 1, d).astype(kk.dtype),
                (0, 0, 64 + i, 0))
            vv = jax.lax.dynamic_update_slice(
                vv, vn.reshape(L, nkv, 1, d).astype(vv.dtype),
                (0, 0, 64 + i, 0))
            return (xo, kk, vv), ()
        (xx, _, _), _ = jax.lax.scan(step, (x, kv_k, kv_v),
                                     jnp.arange(STEPS))
        return jnp.sum(xx)

    float(run(x, mega, kv_k, kv_v, w.rope_freqs))
    t0 = time.perf_counter()
    float(run(x * 1.001, mega, kv_k, kv_v, w.rope_freqs))
    per = (time.perf_counter() - t0 - 0.033) / STEPS
    gb = (cfg.hidden_size * (cfg.hidden_size + 2 * nkv * d + cfg.hidden_size
                             + 2 * 8192) + 8192 * cfg.hidden_size) * L / 1e9
    print(f"llama megastep 3B: {per*1e3:.3f} ms/step "
          f"({gb/per:.0f} GB/s codes, {0.012190/per:.2f}x RT)", flush=True)


if __name__ == "__main__" and "--flat" not in sys.argv:
    print("platform:", jax.devices()[0].platform, flush=True)
    check_small()
    check_batched()
    check_llama_small()
    perf_full()
    perf_batched()
    perf_llama()


def check_flat_kernels():
    """On-chip parity for the round-5 kernels: llama fullk flat (vs the
    phase megastep + LM head) and the batched llama/dia megasteps (vs
    their per-slot XLA references) at small-but-kernel-eligible shapes."""
    import bench as _b
    from tts_tpu.common import kv_cache_dtype
    from tts_tpu.models.orpheus.model import (_rms, maybe_prep_llama_flat,
                                              maybe_prep_llama_mega)
    from tts_tpu.ops.llama_flat import LlamaFlatMega, llama_flat_megastep
    from tts_tpu.ops.llama_megastep import (llama_megastep,
                                            llama_megastep_batched,
                                            llama_megastep_batched_reference)
    from tts_tpu.ops.quant_matmul import quant_matmul

    cfg, w = _b.build_q4_orpheus()
    w = w._replace(head=w.head.fast_lm_head())
    flat, fq = maybe_prep_llama_flat(cfg, w, ctx=cfg.max_context_length)
    assert isinstance(flat, LlamaFlatMega)
    mega, mq = maybe_prep_llama_mega(cfg, w)
    dt = kv_cache_dtype()
    rng = np.random.default_rng(1)
    shape = (cfg.n_layers, cfg.n_kv_heads, cfg.max_context_length,
             cfg.head_size)
    kv_k = jnp.asarray(rng.standard_normal(shape) * 0.3, dt)
    kv_v = jnp.asarray(rng.standard_normal(shape) * 0.3, dt)
    x = jnp.asarray(rng.standard_normal((1, cfg.hidden_size)) * 0.5,
                    jnp.float32)
    pos = jnp.int32(700)  # page 1: exercises the paged flash fold

    lg, kn, vn = jax.jit(lambda f, x, k, v: llama_flat_megastep(
        f, x, k, v, pos, qtype=fq, n_heads=cfg.n_attn_heads,
        n_kv=cfg.n_kv_heads, rope_base=cfg.rope_theta,
        rope_freq_factors=w.rope_freqs))(flat, x, kv_k, kv_v)
    xo, kr, vr = jax.jit(lambda m, x, k, v: llama_megastep(
        m, x, k, v, pos, qtype=mq, n_heads=cfg.n_attn_heads,
        n_kv=cfg.n_kv_heads, rope_base=cfg.rope_theta,
        rope_freq_factors=w.rope_freqs))(mega, x, kv_k, kv_v)
    lg_ref = quant_matmul(_rms(xo, w.out_norm), w.head.codes_t,
                          w.head.scales_t, w.head.qtype)
    a = np.asarray(lg)[0, : cfg.vocab_size]
    b = np.asarray(lg_ref)[0, : cfg.vocab_size]
    rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
    assert rel < 5e-3, rel
    assert int(a.argmax()) == int(b.argmax())
    print(f"llama fullk flat vs phase+head: rel {rel:.2e}, argmax agrees")

    # batched llama vs per-slot reference (positions straddle a page)
    B = 8
    bkv = jnp.asarray(rng.standard_normal(
        (cfg.n_layers, B, cfg.n_kv_heads, 512, cfg.head_size)) * 0.3, dt)
    bvv = jnp.asarray(rng.standard_normal(bkv.shape) * 0.3, dt)
    bx = jnp.asarray(rng.standard_normal((B, cfg.hidden_size)) * 0.5,
                     jnp.float32)
    bpos = jnp.asarray([5, 100, 255, 256, 300, 13, 400, 509], jnp.int32)
    xo_k, kn_k, vn_k = llama_megastep_batched(
        mega, bx, bkv, bvv, bpos, qtype=mq, n_heads=cfg.n_attn_heads,
        n_kv=cfg.n_kv_heads, rope_base=cfg.rope_theta,
        rope_freq_factors=w.rope_freqs)
    xo_r, kn_r, vn_r = llama_megastep_batched_reference(
        mega, bx, bkv, bvv, bpos, qtype=mq, n_heads=cfg.n_attn_heads,
        n_kv=cfg.n_kv_heads, rope_base=cfg.rope_theta,
        rope_freq_factors=w.rope_freqs)
    for nm, p, q in (("x", xo_k, xo_r), ("k", kn_k, kn_r), ("v", vn_k, vn_r)):
        r = np.abs(np.asarray(p) - np.asarray(q)).max() / \
            (np.abs(np.asarray(q)).max() + 1e-9)
        assert r < 2e-2, (nm, r)
    print("llama batched megastep vs per-slot reference: OK")

    # batched dia vs per-slot reference (CFG pairs, mixed positions, one
    # slot straddling a page boundary)
    from tts_tpu.models.dia.model import maybe_prep_dia_mega
    from tts_tpu.ops.dia_megastep import (dia_megastep_batched,
                                          dia_megastep_batched_reference,
                                          prep_dia_cross)
    from tts_tpu.models.dia.model import dia_encode
    dcfg, dw = _b.build_q4_dia()
    dmega, dq = maybe_prep_dia_mega(dcfg, dw)
    drng = np.random.default_rng(2)
    toks = np.zeros((2, dcfg.max_encoder_context_length), np.int32)
    toks[0, :80] = drng.integers(3, 250, 80)
    _, dck, dcv = dia_encode(dcfg, dw, jnp.asarray(toks), jnp.int32(80))
    sb = 256
    ckb, cvb, vt, ntl = prep_dia_cross(dck, dcv, 80, buckets=(sb,))
    L2, h2, d2 = (dcfg.n_decoder_layers, dcfg.decoder_attn_heads,
                  dcfg.head_size)
    Bd = 4
    ck4 = jnp.broadcast_to(ckb.reshape(L2, 1, 2, h2, sb, d2),
                           (L2, Bd, 2, h2, sb, d2))
    cv4 = jnp.broadcast_to(cvb.reshape(L2, 1, 2, h2, sb, d2),
                           (L2, Bd, 2, h2, sb, d2))
    vt4 = jnp.broadcast_to(vt.reshape(L2, 1, 2, h2, d2),
                           (L2, Bd, 2, h2, d2))
    dkv = jnp.asarray(drng.standard_normal(
        (L2, Bd, 2, dcfg.n_kv_heads, 512, d2)) * 0.3, dt)
    dvv = jnp.asarray(drng.standard_normal(dkv.shape) * 0.3, dt)
    dx = jnp.asarray(drng.standard_normal((2 * Bd, dcfg.decoder_hidden_size))
                     * 0.5, jnp.float32)
    dpos = jnp.asarray([7, 250, 256, 480], jnp.int32)
    ko_k = dia_megastep_batched(dmega, dx, dkv, dvv, dpos, ck4, cv4, vt4,
                                ntl, qtype=dq, n_heads=h2,
                                n_kv=dcfg.n_kv_heads)
    ko_r = dia_megastep_batched_reference(dmega, dx, dkv, dvv, dpos,
                                          ck4, cv4, vt4, ntl, qtype=dq,
                                          n_heads=h2, n_kv=dcfg.n_kv_heads)
    for nm, p, q in zip("xkv", ko_k, ko_r):
        r = np.abs(np.asarray(p) - np.asarray(q)).max() /             (np.abs(np.asarray(q)).max() + 1e-9)
        assert r < 2e-2, (nm, r)
    print("dia batched megastep vs per-slot reference: OK")

    # batched FLAT llama (B slots on the sublane rows, LM head in-stream)
    # vs the same per-slot reference + head matmul
    from tts_tpu.ops.llama_flat import llama_flat_megastep_batched
    bflat, bfq = maybe_prep_llama_flat(cfg, w, ctx=512, page=256)
    assert isinstance(bflat, LlamaFlatMega) and bflat.psz == 256
    lg_b, kn_b, vn_b = llama_flat_megastep_batched(
        bflat, bx, bkv, bvv, bpos, qtype=bfq, n_heads=cfg.n_attn_heads,
        n_kv=cfg.n_kv_heads, rope_base=cfg.rope_theta,
        rope_freq_factors=w.rope_freqs)
    lg_br = quant_matmul(_rms(xo_r, w.out_norm), w.head.codes_t,
                         w.head.scales_t, w.head.qtype)
    a = np.asarray(lg_b)[:, : cfg.vocab_size]
    b2 = np.asarray(lg_br)[:, : cfg.vocab_size]
    agree = sum(int(a[s].argmax()) == int(b2[s].argmax()) for s in range(B))
    for s in range(B):
        r = np.abs(a[s] - b2[s]).max() / (np.abs(b2[s]).max() + 1e-9)
        assert r < 2e-2, (s, r)
    for nm, p, q in (("k", kn_b, kn_r), ("v", vn_b, vn_r)):
        r = np.abs(np.asarray(p) - np.asarray(q)).max() / \
            (np.abs(np.asarray(q)).max() + 1e-9)
        assert r < 2e-2, (nm, r)
    print(f"llama batched FLAT vs per-slot reference: OK "
          f"(argmax agrees {agree}/{B})")


def perf_flat_batched(b=8, ctx=512, pos0=64, steps=64):
    """ms/step for the batched flat llama kernel at full Orpheus scale."""
    import bench as _b
    from tts_tpu.common import kv_cache_dtype
    from tts_tpu.models.orpheus.model import maybe_prep_llama_flat
    from tts_tpu.ops.llama_flat import LlamaFlatMega, \
        llama_flat_megastep_batched

    cfg, w = _b.build_q4_orpheus()
    w = w._replace(head=w.head.fast_lm_head())
    flat, fq = maybe_prep_llama_flat(cfg, w, ctx=ctx, page=256)
    assert isinstance(flat, LlamaFlatMega)
    dt = kv_cache_dtype()
    rng = np.random.default_rng(3)
    shape = (cfg.n_layers, b, cfg.n_kv_heads, ctx, cfg.head_size)
    kv_k = jnp.asarray(rng.standard_normal(shape) * 0.3, dt)
    kv_v = jnp.asarray(rng.standard_normal(shape) * 0.3, dt)
    x = jnp.asarray(rng.standard_normal((b, cfg.hidden_size)) * 0.5,
                    jnp.float32)
    pos = jnp.full((b,), pos0, jnp.int32)

    @jax.jit
    def run(x, flat, kv_k, kv_v):
        def step(carry, i):
            xc, p = carry
            lg, kn, vn = llama_flat_megastep_batched(
                flat, xc, kv_k, kv_v, p, qtype=fq,
                n_heads=cfg.n_attn_heads, n_kv=cfg.n_kv_heads,
                rope_base=cfg.rope_theta, rope_freq_factors=w.rope_freqs)
            return (jnp.tanh(lg[:, :cfg.hidden_size]) + xc * 0.1, p + 1), ()
        (xc, _), _ = jax.lax.scan(step, (x, pos), jnp.arange(steps))
        return xc

    run(x, flat, kv_k, kv_v).block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run(x, flat, kv_k, kv_v).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / steps)
    print(f"batched FLAT llama B={b} ctx={ctx} pos0={pos0}: "
          f"{best*1e3:.3f} ms/step", flush=True)
    return best


if __name__ == "__main__" and "--flat" in sys.argv:
    check_flat_kernels()
    if "--perf" in sys.argv:
        perf_flat_batched()
        perf_flat_batched(pos0=448)
