"""Experiment: variants of the decode attention + quant matmul hot kernels
at production scale (24-layer streamed scan), to pick the fastest design."""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tts_tpu.gguf import quants
from tts_tpu.ops import linear
from tts_tpu.ops.decode_attention import paged_decode_attention, _xla_fallback
from tts_tpu.ops.quant_matmul import QuantTensor, _expand_scales_t, _BIAS

STEPS = 64
L, H, F, HEADS, CTX, D = 24, 1024, 4096, 16, 1024, 64


def timed(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).sum()
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).sum()
    return (time.perf_counter() - t0) / STEPS


# ---------------- attention variants ----------------

def attention_bench(rng):
    kv_k = jnp.asarray(rng.standard_normal((L, HEADS, CTX, D)).astype(np.float32))
    kv_v = jnp.asarray(rng.standard_normal((L, HEADS, CTX, D)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((HEADS, D)).astype(np.float32))
    nbytes = L * HEADS * 768 * D * 2 * 4

    def mk(fn):
        @jax.jit
        def run(q, kv_k, kv_v):
            def step(c, _):
                def layer(cc, kv):
                    return cc + fn(cc, kv[0], kv[1]), ()
                cc, _ = jax.lax.scan(layer, c, (kv_k, kv_v))
                return cc * 1e-3, ()
            return jax.lax.scan(step, q, None, length=STEPS)[0]
        return run

    for name, fn in [
        ("paged p=256", lambda cc, kk, vv: paged_decode_attention(cc, kk, vv, jnp.int32(700), page=256)),
        ("xla full-ctx", lambda cc, kk, vv: _xla_fallback(cc, kk, vv, jnp.int32(700), 0.125)),
    ]:
        dt = timed(mk(fn), q, kv_k, kv_v)
        print(f"attn {name}: {dt*1e3:.3f} ms/step ({nbytes/dt/1e9:.0f} GB/s)", flush=True)

    kvb_k, kvb_v = kv_k.astype(jnp.bfloat16), kv_v.astype(jnp.bfloat16)
    dt = timed(mk(lambda cc, kk, vv: paged_decode_attention(cc, kk, vv, jnp.int32(700), page=256)), q, kvb_k, kvb_v)
    print(f"attn paged bf16 cache: {dt*1e3:.3f} ms/step ({nbytes/2/dt/1e9:.0f} GB/s eff)", flush=True)
    dt = timed(mk(lambda cc, kk, vv: _xla_fallback(cc, kk, vv, jnp.int32(700), 0.125)), q, kvb_k, kvb_v)
    print(f"attn xla bf16 cache:   {dt*1e3:.3f} ms/step ({nbytes/2/dt/1e9:.0f} GB/s eff)", flush=True)


# ---------------- qmm variants ----------------

def q4(rng, n, k):
    w = rng.standard_normal((n, k)).astype(np.float32) * 0.02
    raw = quants.quantize(w, quants.GGML_TYPE_Q4_0)
    codes, scales = quants.unpack_planar(raw, quants.GGML_TYPE_Q4_0, (n, k))
    return QuantTensor.from_planar(codes, scales, quants.GGML_TYPE_Q4_0)


def _qmm_kernel_v(x_ref, c_ref, s_ref, o_ref, *, bias, precision, mm_dtype):
    codes = c_ref[:].astype(jnp.int32).astype(jnp.float32) - bias
    k, tn = codes.shape
    sk = _expand_scales_t(s_ref[:].astype(jnp.float32), k)
    wt = (codes * sk).astype(mm_dtype)
    o_ref[:] = jax.lax.dot_general(
        x_ref[:].astype(mm_dtype), wt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision).astype(o_ref.dtype)


def qmm_variant(x, codes_t, scales_t, *, tile_n, precision, mm_dtype):
    m, k = x.shape
    n = codes_t.shape[1]
    tile_n = min(tile_n, n)
    m_pad = 8
    xp = jnp.zeros((m_pad, k), x.dtype).at[:m].set(x)
    out = pl.pallas_call(
        functools.partial(_qmm_kernel_v, bias=8.0, precision=precision,
                          mm_dtype=mm_dtype),
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((m_pad, k), lambda i: (0, 0)),
            pl.BlockSpec((k, tile_n), lambda i: (0, i)),
            pl.BlockSpec((k // 32, tile_n), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((m_pad, tile_n), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
    )(xp, codes_t, scales_t)
    return out[:m]


def qmm_bench(rng):
    ws = {nm: linear.stack_weights([q4(rng, n, k) for _ in range(L)])
          for nm, (n, k) in dict(q=(H, H), k=(H, H), v=(H, H), o=(H, H),
                                 cq=(H, H), co=(H, H), f1=(F, H), f2=(H, F)).items()}
    x = jnp.asarray(rng.standard_normal((1, H)).astype(np.float32))
    per_layer = 6 * H * H + 2 * H * F
    nbytes = L * (per_layer + per_layer // 32 * 4)

    def mk(mmfn):
        @jax.jit
        def run(x, ws):
            def step(c, _):
                def layer(cc, lw):
                    q, k, v, o, cq, co, f1, f2 = lw
                    y = mmfn(cc, q) + mmfn(cc, k) + mmfn(cc, v) + mmfn(cc, o)
                    y = y + mmfn(cc, cq) + mmfn(cc, co)
                    hh = mmfn(y, f1)
                    return mmfn(hh, f2) + cc, ()
                cc, _ = jax.lax.scan(
                    layer, c, (ws["q"], ws["k"], ws["v"], ws["o"],
                               ws["cq"], ws["co"], ws["f1"], ws["f2"]))
                return cc, ()
            return jax.lax.scan(step, x, None, length=STEPS)[0]
        return run

    P = jax.lax.Precision
    for name, tile_n, prec, mmd in [
        ("t256 HIGHEST f32", 256, P.HIGHEST, jnp.float32),
        ("t256 DEFAULT f32", 256, P.DEFAULT, jnp.float32),
        ("t512 HIGHEST f32", 512, P.HIGHEST, jnp.float32),
        ("t1024 HIGHEST f32", 1024, P.HIGHEST, jnp.float32),
        ("t512 bf16 mm", 512, P.DEFAULT, jnp.bfloat16),
    ]:
        fn = lambda xx, qt: qmm_variant(xx, qt.codes_t, qt.scales_t,
                                        tile_n=tile_n, precision=prec,
                                        mm_dtype=mmd)
        dt = timed(mk(fn), x, ws)
        print(f"qmm {name}: {dt*1e3:.3f} ms/step ({nbytes/dt/1e9:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    print("platform:", jax.devices()[0].platform, flush=True)
    attention_bench(rng)
    qmm_bench(rng)
