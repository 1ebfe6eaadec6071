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


def build_kokoro_82m(rng):
    """Kokoro-82M-shaped random weights (real dims: ALBERT 768/12, predictor
    512, style 128, decoder 1024-ch AdainResBlks, iSTFTNet 512->256->128 with
    kernels 3/7/11, n_fft 20 hop 5, x600 upsample)."""
    import jax.numpy as jnp
    from tts_tpu.models.kokoro.model import (
        AdaLayerNormW, AdaResBlockW, AlbertLayer, DecoderW,
        DurationPredictorW, GenResBlockW, GeneratorW, KokoroConfig,
        KokoroWeights, NoiseBlockW, TextEncoderW)
    from tts_tpu.ops.rnn import LSTMWeights

    cfg = KokoroConfig(
        res_block_dilations=((1, 3, 5),) * 6,
        res_block_paddings=((1, 3, 5), (3, 9, 15), (5, 15, 25)) * 2,
        noise_block_dilations=((1, 3, 5), (1, 3, 5)),
        noise_block_paddings=((3, 9, 15), (5, 15, 25)),  # kernels 7, 11
    )

    def r(*s, scale=0.1):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * scale)

    def lstm(inp, hid):
        return (LSTMWeights(r(4 * hid, inp), r(4 * hid, hid),
                            r(4 * hid), r(4 * hid)),
                LSTMWeights(r(4 * hid, inp), r(4 * hid, hid),
                            r(4 * hid), r(4 * hid)))

    def ada_ln(c, sty):
        return AdaLayerNormW(r(c, sty), r(c), r(c, sty), r(c))

    def ada_block(cin, cout, sty, pool=False):
        return AdaResBlockW(
            norm1=ada_ln(cin, sty),
            conv1_w=r(cout, cin, 3), conv1_b=r(cout),
            norm2=ada_ln(cout, sty),
            conv2_w=r(cout, cout, 3), conv2_b=r(cout),
            pool_w=r(cin, 1, 3) if pool else None,
            pool_b=r(cin) if pool else None,
            upsample_w=r(cout, cin) if (pool or cin != cout) else None,
            upsample_b=jnp.zeros(cout) if (pool or cin != cout) else None)

    def gen_block(c, sty, k):
        n = 3
        return GenResBlockW(
            adain1=[ada_ln(c, sty) for _ in range(n)],
            adain2=[ada_ln(c, sty) for _ in range(n)],
            alpha1=[jnp.abs(r(1, c, 1)) + 0.5 for _ in range(n)],
            alpha2=[jnp.abs(r(1, c, 1)) + 0.5 for _ in range(n)],
            convs1_w=[r(c, c, k) for _ in range(n)],
            convs1_b=[r(c) for _ in range(n)],
            convs2_w=[r(c, c, k) for _ in range(n)],
            convs2_b=[r(c) for _ in range(n)])

    H, dh, sty, emb = cfg.hidden_size, cfg.duration_hidden_size, 128, 128
    albert = AlbertLayer(
        q_w=r(H, H), q_b=r(H), k_w=r(H, H), k_b=r(H),
        v_w=r(H, H), v_b=r(H), o_w=r(H, H), o_b=r(H),
        attn_ln_w=r(H) * 0.1 + 1, attn_ln_b=r(H) * 0.1,
        ffn_w=r(2 * H, H), ffn_b=r(2 * H),
        ffn_out_w=r(H, 2 * H), ffn_out_b=r(H),
        out_ln_w=r(H) * 0.1 + 1, out_ln_b=r(H) * 0.1)
    din = dh + sty
    prosody = DurationPredictorW(
        encode_w=r(dh, H), encode_b=r(dh),
        layers_lstm=[lstm(din, dh // 2) for _ in range(3)],
        layers_ada=[ada_ln(dh, sty) for _ in range(3)],
        duration_lstm=lstm(din, dh // 2),
        # bias ~-2.5 => ~4 frames/token (realistic speech rate)
        duration_proj_w=r(50, dh), duration_proj_b=r(50) - 2.5,
        shared_lstm=lstm(din, dh // 2),
        f0_blocks=[ada_block(dh, dh, sty),
                   ada_block(dh, dh // 2, sty, pool=True),
                   ada_block(dh // 2, dh // 2, sty)],
        n_blocks=[ada_block(dh, dh, sty),
                  ada_block(dh, dh // 2, sty, pool=True),
                  ada_block(dh // 2, dh // 2, sty)],
        f0_proj_w=r(1, dh // 2), f0_proj_b=r(1),
        n_proj_w=r(1, dh // 2), n_proj_b=r(1))
    te_c = dh
    te = TextEncoderW(
        embd=r(cfg.vocab_size, te_c),
        convs=[(jnp.ones(te_c), jnp.zeros(te_c), r(te_c, te_c, 5), r(te_c))
               for _ in range(3)],
        lstm=lstm(te_c, dh // 2))
    pf2 = 2 * cfg.post_n_fft  # 22 STFT channels
    gen = GeneratorW(
        m_source_w=r(1, cfg.harmonic_num + 1), m_source_b=r(1),
        ups_w=[r(512, 256, 20), r(256, 128, 12)],  # convT (C_in, C_out, K)
        ups_b=[r(256), r(128)],
        noise_blocks=[
            NoiseBlockW(conv_w=r(256, pf2, 12), conv_b=r(256),
                        res=gen_block(256, sty, 7)),
            NoiseBlockW(conv_w=r(128, pf2, 1), conv_b=r(128),
                        res=gen_block(128, sty, 11))],
        res_blocks=[gen_block(256, sty, k) for k in (3, 7, 11)] +
                   [gen_block(128, sty, k) for k in (3, 7, 11)],
        out_conv_w=r(pf2, 128, 7, scale=0.001), out_conv_b=r(pf2))
    f0ch = 64
    dec_in = dh + 2 * f0ch
    dec = DecoderW(
        f0_conv_w=r(f0ch, 1, 3), f0_conv_b=r(f0ch),
        n_conv_w=r(f0ch, 1, 3), n_conv_b=r(f0ch),
        asr_conv_w=r(f0ch, dh), asr_conv_b=r(f0ch),
        encoder_block=ada_block(dec_in, 1024, sty),
        decoder_blocks=[ada_block(1024 + 3 * f0ch, 1024, sty),
                        ada_block(1024 + 3 * f0ch, 1024, sty),
                        ada_block(1024 + 3 * f0ch, 1024, sty),
                        ada_block(1024 + 3 * f0ch, 512, sty, pool=True)],
        generator=gen)
    w = KokoroWeights(
        token_embd=r(cfg.vocab_size, emb),
        position_embd=r(cfg.max_context_length, emb),
        token_type_row=r(emb),
        input_ln_w=r(emb) * 0.1 + 1, input_ln_b=r(emb) * 0.1,
        embd_hidden_w=r(H, emb), embd_hidden_b=r(H),
        albert_layers=[albert],
        prosody=prosody, text_encoder=te, decoder=dec)
    return cfg, w


def bench_kokoro(rng) -> dict:
    """Feed-forward Kokoro RTF: duration graph + generation graph on an
    82M-shaped model, ~380-token (one chunk) input. Times exclude compile;
    distinct inputs per run defeat the relay cache; D2H sums force
    materialization."""
    import functools
    import jax
    import jax.numpy as jnp
    from tts_tpu.models.kokoro.model import kokoro_duration, kokoro_generate

    cfg, w = build_kokoro_82m(rng)
    valid = 380
    tokens = np.zeros(512, np.int32)
    tokens[:valid] = rng.integers(1, cfg.vocab_size, valid)
    tokens = jnp.asarray(tokens)
    style = jnp.asarray(rng.standard_normal(128).astype(np.float32) * 0.3)
    style2 = jnp.asarray(rng.standard_normal(128).astype(np.float32) * 0.3)

    dur_fn = jax.jit(kokoro_duration, static_argnames=("cfg",))

    def run_dur(eps):
        d, h = dur_fn(cfg, w, tokens, jnp.int32(valid), style + eps)
        return d, h, float(np.asarray(d).sum())

    dur, hidden, total_f = run_dur(0.0)  # compile + warm
    total = int(total_f)
    n_frames = ((total // 256) + 2) * 256
    nharm = cfg.harmonic_num + 1
    uv = jnp.asarray(rng.random(
        (nharm, int(2 * n_frames * cfg.upsample_scale))).astype(np.float32))

    def run_gen(eps):
        wav, tot = kokoro_generate(cfg, w, tokens, jnp.int32(valid), dur,
                                   hidden, style, style2 + eps, uv,
                                   n_frames=n_frames)
        return float(np.asarray(wav).sum())

    run_gen(0.0)  # compile + warm
    t0 = time.perf_counter()
    _, _, _ = run_dur(1e-4)
    t_dur = time.perf_counter() - t0
    t0 = time.perf_counter()
    run_gen(1e-4)
    t_gen = time.perf_counter() - t0

    audio_s = total * cfg.up_sampling_factor / cfg.sample_rate
    return {
        "kokoro_rtf": round(audio_s / (t_dur + t_gen), 2),
        "kokoro_audio_s": round(audio_s, 2),
        "kokoro_wall_ms": round((t_dur + t_gen) * 1e3, 1),
        "kokoro_duration_ms": round(t_dur * 1e3, 1),
        "kokoro_generate_ms": round(t_gen * 1e3, 1),
    }


def main() -> None:
    import jax
    import jax.numpy as jnp
    from tts_tpu.models.parler.model import (parler_prefill,
                                             parler_generate_tokens_chunked)

    from tts_tpu.common import kv_cache_dtype

    rng = np.random.default_rng(0)
    prompt_len = 64
    n_steps = 448  # aligns with the 64+128+256 chunk schedule (no overshoot)
    cfg, weights = build_q4_parler(rng)
    cfg.max_generation_size = prompt_len + n_steps

    kv_dt = kv_cache_dtype()
    shape = (cfg.n_layers, cfg.n_attn_heads, cfg.max_ctx_length, cfg.head_size)
    kv_k0 = jnp.zeros(shape, kv_dt)
    kv_v0 = jnp.zeros(shape, kv_dt)
    tokens = jnp.asarray(rng.integers(0, 900, prompt_len).astype(np.int32))
    key = jax.random.PRNGKey(0)

    from tts_tpu.models.parler.model import maybe_prep_mega
    mega, mega_qtype = maybe_prep_mega(cfg, weights)

    def run(k):
        kv_k, kv_v = parler_prefill(cfg, weights, tokens, kv_k0, kv_v0)
        out, steps = parler_generate_tokens_chunked(
            cfg, weights, prompt_len, kv_k, kv_v, k,
            do_sample=True, temperature=1.0, top_k=50,
            mega=mega, mega_qtype=mega_qtype)
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
    bst = batched_decode_chunk(cfg, weights, bst, n_steps=64, mega=mega,
                               mega_qtype=mega_qtype)  # compile+warm
    int(np.asarray(bst.out_tokens).sum())
    t0 = time.perf_counter()
    bst = batched_decode_chunk(cfg, weights, bst, n_steps=64, mega=mega,
                               mega_qtype=mega_qtype)
    int(np.asarray(bst.out_tokens).sum())
    bwall = time.perf_counter() - t0
    batched_rtf = B * 64 * SAMPLES_PER_STEP / SAMPLE_RATE / bwall
    batched_tps = 9 * B * 64 / bwall

    try:
        kokoro = bench_kokoro(np.random.default_rng(7))
    except Exception as e:  # noqa: BLE001
        import traceback
        traceback.print_exc()
        kokoro = {"kokoro_rtf": None, "kokoro_error": str(e)[:200]}

    print(json.dumps({
        "metric": "parler_mini_q4_decode_rtf",
        "value": round(rtf, 4),
        "unit": "audio_sec_per_wall_sec",
        "vs_baseline": round(rtf / REFERENCE_AUDIO_PER_WALL, 4),
        "detail": {
            "megakernel": mega is not None,
            "steps": n,
            "wall_s": round(wall, 4),
            "steps_per_s": round(n / wall, 2),
            "tokens_per_s": round(9 * n / wall, 2),
            "batched_rtf_8_streams": round(batched_rtf, 3),
            "batched_tokens_per_s": round(batched_tps, 1),
            **kokoro,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
