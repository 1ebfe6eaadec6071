"""Parler flat megastep on the real chip: one-step parity vs the phase
megastep, then chunked decode timing vs the round-4 number (0.968 ms/step,
decode RTF 11.99)."""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

STEPS = 64


def main():
    import bench
    from tts_tpu.common import kv_cache_dtype
    from tts_tpu.models.parler.model import (_parler_init_state,
                                             maybe_prep_mega,
                                             maybe_prep_parler_flat,
                                             parler_decode_chunk,
                                             parler_prefill)
    from tts_tpu.ops.parler_flat import ParlerFlatMega, parler_flat_megastep
    from tts_tpu.ops.parler_megastep import parler_megastep

    rng = np.random.default_rng(0)
    cfg, w = bench.build_q4_parler(rng)
    t0 = time.perf_counter()
    flat, qtype = maybe_prep_parler_flat(cfg, w)
    print(f"prep: {type(flat).__name__} in {time.perf_counter()-t0:.1f}s",
          flush=True)
    assert isinstance(flat, ParlerFlatMega)
    mega, _ = maybe_prep_mega(cfg, w)

    dt = kv_cache_dtype()
    L, heads, d = cfg.n_layers, cfg.n_attn_heads, cfg.head_size
    shape = (L, heads, cfg.max_ctx_length, d)
    kv_k = jnp.asarray(rng.standard_normal(shape) * 0.3, dt)
    kv_v = jnp.asarray(rng.standard_normal(shape) * 0.3, dt)
    x = jnp.asarray(rng.standard_normal((1, cfg.hidden_size)) * 0.5,
                    jnp.float32)
    pos = jnp.int32(100)

    @jax.jit
    def one_flat(flat, x, kv_k, kv_v):
        return parler_flat_megastep(flat, x, kv_k, kv_v, pos, qtype=qtype,
                                    n_heads=heads)

    @jax.jit
    def one_phase(mega, x, kv_k, kv_v):
        return parler_megastep(mega, x, kv_k, kv_v, pos, qtype=qtype,
                               use_cross=True, n_heads=heads)

    t0 = time.perf_counter()
    xo_f, kn_f, vn_f = one_flat(flat, x, kv_k, kv_v)
    np.asarray(xo_f)
    print(f"flat one-step compiled+ran in {time.perf_counter()-t0:.1f}s",
          flush=True)
    xo_p, kn_p, vn_p = one_phase(mega, x, kv_k, kv_v)
    for nm, a, b in (("x", xo_f, xo_p), ("k", kn_f, kn_p), ("v", vn_f, vn_p)):
        r = np.abs(np.asarray(a) - np.asarray(b)).max() / \
            (np.abs(np.asarray(b)).max() + 1e-9)
        print(f"{nm} rel-err {r:.4g}", flush=True)

    # --- chunked decode through the model path ---
    kv_dt = kv_cache_dtype()
    kv_k0 = jnp.zeros(shape, kv_dt)
    kv_v0 = jnp.zeros(shape, kv_dt)
    tokens = jnp.asarray(rng.integers(0, 900, 64).astype(np.int32))
    kv_k1, kv_v1 = parler_prefill(cfg, w, tokens, kv_k0, kv_v0)
    st = _parler_init_state(cfg, jnp.int32(64), kv_k1, kv_v1,
                            jax.random.PRNGKey(1))

    def run(st):
        st = parler_decode_chunk(cfg, w, st, n_steps=STEPS, mega=flat,
                                 mega_qtype=qtype, use_cross=True,
                                 do_sample=True, top_k=50)
        int(np.asarray(st.out_tokens).sum())
        return st

    t0 = time.perf_counter()
    st = run(st)
    print(f"chunk compiled+ran in {time.perf_counter()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        st = run(st)
        best = min(best, (time.perf_counter() - t0 - 0.033) / STEPS)
    gb = (flat.codes0.nbytes + flat.scales0.nbytes + flat.codes1.nbytes +
          flat.scales1.nbytes) / 1e9
    audio = 512 / 44100
    print(f"flat decode: {best*1e3:.3f} ms/step  stream {gb*1e3:.0f} MB "
          f"-> {gb/best:.0f} GB/s  RTF {audio/best:.2f} "
          f"(round-4: 0.968 ms, 11.99)", flush=True)


if __name__ == "__main__":
    main()
