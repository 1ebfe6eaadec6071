"""Performance benchmark — prints ONE JSON line for the driver.

Measures the flagship workload: Parler-Mini-shaped (24L/1024H/9-head) Q4_0
autoregressive decode as a single jitted on-device generation loop, on
whatever accelerator jax provides (the real TPU chip under the driver).

Metric: real-time factor in audio-seconds per wall-second (1 decode step =
512 samples @ 44.1 kHz = ~11.61 ms of audio). vs_baseline compares against
the reference's best published generation RTF on M1 Max Metal
(examples/perf_battery/README.md: 0.695635 gen-time/audio-time, i.e.
1.4375 audio-sec/wall-sec).
"""
from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_AUDIO_PER_WALL = 1.0 / 0.695635  # M1 Max Metal, Parler Mini Q5_0
SAMPLES_PER_STEP = 512
SAMPLE_RATE = 44100.0


def build_q4_parler(rng, n_layers=24, hidden=1024, heads=16, ffn=4096,
                    n_out_heads=9, vocab=1088, enc_len=64, max_ctx=1024):
    import jax.numpy as jnp
    from tts_tpu.gguf import quants
    from tts_tpu.models.parler.model import ParlerConfig, ParlerLayerWeights, ParlerWeights
    from tts_tpu.ops.quant_matmul import QuantTensor
    from tts_tpu.ops.linear import stack_weights

    cfg = ParlerConfig(
        n_output_heads=n_out_heads, n_encode_length=enc_len,
        hidden_size=hidden, max_ctx_length=max_ctx, n_attn_heads=heads,
        output_vocab_size=vocab, eos_token_id=10 ** 9,  # never stop early
        audio_vocab_size=1024, max_generation_size=max_ctx, n_layers=n_layers,
        bos_token_id=1025, use_cross_attn=True)

    def q4(n, k):
        w = rng.standard_normal((n, k)).astype(np.float32) * 0.02
        raw = quants.quantize(w, quants.GGML_TYPE_Q4_0)
        codes, scales = quants.unpack_planar(raw, quants.GGML_TYPE_Q4_0, (n, k))
        return QuantTensor.from_planar(codes, scales, quants.GGML_TYPE_Q4_0)

    def f32(*s, scale=0.02):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * scale)

    L, H = n_layers, hidden
    layers = ParlerLayerWeights(
        ln1_w=f32(L, H) + 1, ln1_b=f32(L, H),
        q_w=stack_weights([q4(H, H) for _ in range(L)]),
        k_w=stack_weights([q4(H, H) for _ in range(L)]),
        v_w=stack_weights([q4(H, H) for _ in range(L)]),
        o_w=stack_weights([q4(H, H) for _ in range(L)]),
        lnc_w=f32(L, H) + 1, lnc_b=f32(L, H),
        cq_w=stack_weights([q4(H, H) for _ in range(L)]),
        co_w=stack_weights([q4(H, H) for _ in range(L)]),
        cross_k=f32(L, heads, enc_len, H // heads),
        cross_v=f32(L, heads, enc_len, H // heads),
        ln2_w=f32(L, H) + 1, ln2_b=f32(L, H),
        fc1=stack_weights([q4(ffn, H) for _ in range(L)]),
        fc2=stack_weights([q4(H, ffn) for _ in range(L)]),
    )
    weights = ParlerWeights(
        layers=layers,
        embds=f32(n_out_heads, 1090, H),
        prompt_embd=f32(1000, H),
        pos_embd=f32(max_ctx, H),
        final_ln_w=f32(H) + 1, final_ln_b=f32(H),
        heads=q4(n_out_heads * vocab, H),
    )
    return cfg, weights


def main() -> None:
    import jax
    import jax.numpy as jnp
    from tts_tpu.models.parler.model import (parler_prefill,
                                             parler_generate_tokens_chunked)

    rng = np.random.default_rng(0)
    prompt_len = 64
    n_steps = 128
    cfg, weights = build_q4_parler(rng)
    cfg.max_generation_size = prompt_len + n_steps

    shape = (cfg.n_layers, cfg.n_attn_heads, cfg.max_ctx_length, cfg.head_size)
    kv_k0 = jnp.zeros(shape)
    kv_v0 = jnp.zeros(shape)
    tokens = jnp.asarray(rng.integers(0, 900, prompt_len).astype(np.int32))
    key = jax.random.PRNGKey(0)

    def run(k):
        kv_k, kv_v = parler_prefill(cfg, weights, tokens, kv_k0, kv_v0)
        out, steps = parler_generate_tokens_chunked(
            cfg, weights, prompt_len, kv_k, kv_v, k,
            do_sample=True, temperature=1.0, top_k=50)
        # force full materialization: block_until_ready is unreliable on the
        # axon remote platform, and identical re-runs can be served from a
        # relay cache — hence the distinct PRNG key per run and the D2H sum
        return int(np.asarray(out).sum()), int(steps)

    _, n = run(jax.random.PRNGKey(0))  # compile + warm
    t0 = time.perf_counter()
    _, n = run(jax.random.PRNGKey(1))
    wall = time.perf_counter() - t0

    audio_s = n * SAMPLES_PER_STEP / SAMPLE_RATE
    rtf = audio_s / wall

    # batched throughput: 8 concurrent streams through the continuous-
    # batching engine (one weight read serves all slots)
    from tts_tpu.runtime.batched_parler import (batched_decode_chunk,
                                                init_batched_state,
                                                insert_request)
    B = 8
    bst = init_batched_state(cfg, B, jax.random.PRNGKey(2))
    kv_k, kv_v = parler_prefill(cfg, weights, tokens, kv_k0, kv_v0)
    for slot in range(B):
        bst = insert_request(cfg, bst, slot, kv_k, kv_v, prompt_len,
                             True, 1.0, 50, 1.0, 1.0)
    bst = batched_decode_chunk(cfg, weights, bst, n_steps=64)  # compile+warm
    int(np.asarray(bst.out_tokens).sum())
    t0 = time.perf_counter()
    bst = batched_decode_chunk(cfg, weights, bst, n_steps=64)
    int(np.asarray(bst.out_tokens).sum())
    bwall = time.perf_counter() - t0
    batched_rtf = B * 64 * SAMPLES_PER_STEP / SAMPLE_RATE / bwall
    batched_tps = 9 * B * 64 / bwall
    print(json.dumps({
        "metric": "parler_mini_q4_decode_rtf",
        "value": round(rtf, 4),
        "unit": "audio_sec_per_wall_sec",
        "vs_baseline": round(rtf / REFERENCE_AUDIO_PER_WALL, 4),
        "detail": {
            "steps": n,
            "wall_s": round(wall, 4),
            "steps_per_s": round(n / wall, 2),
            "tokens_per_s": round(9 * n / wall, 2),
            "batched_rtf_8_streams": round(batched_rtf, 3),
            "batched_tokens_per_s": round(batched_tps, 1),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
