"""Sampler semantics tests (reference src/sampler.cpp behavior)."""
import numpy as np

import jax
import jax.numpy as jnp

from tts_tpu.ops import sampling


def test_greedy():
    logits = jnp.asarray(np.array([[0.1, 5.0, -2.0], [3.0, 1.0, 2.0]], np.float32))
    toks = np.asarray(sampling.greedy(logits))
    np.testing.assert_array_equal(toks, [1, 0])


def test_temperature_sharpening(rng):
    # low temperature -> near-deterministic at argmax
    logits = jnp.asarray(rng.standard_normal((4, 50)).astype(np.float32))
    st = sampling.init_state(4)
    key = jax.random.PRNGKey(0)
    toks, _ = sampling.sample(key, logits, st, temperature=1e-4)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(jnp.argmax(logits, -1)))


def test_top_k_restricts_support(rng):
    logits = jnp.asarray(rng.standard_normal((2, 100)).astype(np.float32))
    st = sampling.init_state(2)
    top5 = np.asarray(jnp.argsort(-logits, axis=-1)[:, :5])
    for i in range(50):
        toks, _ = sampling.sample(jax.random.PRNGKey(i), logits, st, top_k=5)
        for h in range(2):
            assert toks[h] in top5[h]


def test_top_p_restricts_support():
    # one dominant token with p > top_p -> always chosen
    logits = np.full((1, 10), -10.0, np.float32)
    logits[0, 3] = 10.0
    st = sampling.init_state(1)
    for i in range(20):
        toks, _ = sampling.sample(jax.random.PRNGKey(i), jnp.asarray(logits), st,
                                  top_p=0.5)
        assert toks[0] == 3


def test_top_p_nucleus_boundary():
    # probs 0.5, 0.3, 0.2 with top_p=0.6: nucleus = {0, 1} (crossing entry kept)
    probs = np.array([0.5, 0.3, 0.2])
    logits = np.log(probs)[None].astype(np.float32)
    st = sampling.init_state(1)
    seen = set()
    for i in range(200):
        toks, _ = sampling.sample(jax.random.PRNGKey(i), jnp.asarray(logits), st,
                                  top_p=0.6)
        seen.add(int(toks[0]))
    assert seen == {0, 1}


def test_repetition_penalty_state():
    st = sampling.init_state(2)
    st = sampling.update_state(st, jnp.asarray([5, 7]))
    np.testing.assert_array_equal(np.asarray(st.last_token), [5, 7])
    np.testing.assert_array_equal(np.asarray(st.repeat_count), [1, 1])
    st = sampling.update_state(st, jnp.asarray([5, 8]))
    np.testing.assert_array_equal(np.asarray(st.repeat_count), [2, 1])
    st = sampling.update_state(st, jnp.asarray([5, 8]))
    np.testing.assert_array_equal(np.asarray(st.repeat_count), [3, 2])


def test_repetition_penalty_divides_logit():
    # after sampling token 0 repeatedly, its positive logit is divided by rp^n
    logits = np.array([[4.0, 3.9, -10.0]], np.float32)
    st = sampling.SamplerState(last_token=jnp.asarray([0]),
                               repeat_count=jnp.asarray([3]))
    pen = np.asarray(sampling._penalized(jnp.asarray(logits), st, 1.3))
    np.testing.assert_allclose(pen[0, 0], 4.0 / 1.3 ** 3, rtol=1e-6)
    np.testing.assert_allclose(pen[0, 1], 3.9)


def test_sampling_distribution_unbiased(rng):
    # with no restriction, empirical distribution ~ softmax
    probs = np.array([0.6, 0.25, 0.1, 0.05])
    logits = jnp.asarray(np.log(probs)[None].astype(np.float32))
    st = sampling.init_state(1)
    counts = np.zeros(4)
    n = 600
    keys = jax.random.split(jax.random.PRNGKey(42), n)
    sample_j = jax.jit(lambda k: sampling.sample(k, logits, st)[0])
    for k in keys:
        counts[int(sample_j(k)[0])] += 1
    np.testing.assert_allclose(counts / n, probs, atol=0.06)


def test_jittable_with_static_config():
    logits = jnp.zeros((9, 64))
    st = sampling.init_state(9)
    f = jax.jit(lambda k, lg, s: sampling.sample_or_greedy(
        k, lg, s, do_sample=True, temperature=0.8, top_k=10, top_p=0.9,
        repetition_penalty=1.1))
    toks, st2 = f(jax.random.PRNGKey(0), logits, st)
    assert toks.shape == (9,)


def test_top_k_tiled_matches_lax_top_k():
    """Hierarchical exact top-k == lax.top_k (values and, absent ties,
    indices) on large vocabs, incl. the padded tail and batched shapes."""
    from tts_tpu.ops.sampling import top_k_tiled
    rng = np.random.default_rng(0)
    for shape in ((3, 20000), (2, 1, 17000)):
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        for k in (1, 50, 64, 256):
            v_t, i_t = top_k_tiled(x, k)
            v_r, i_r = jax.lax.top_k(x, k)
            np.testing.assert_allclose(np.asarray(v_t), np.asarray(v_r))
            np.testing.assert_array_equal(np.asarray(i_t), np.asarray(i_r))
    # -inf pad never leaks in: top-k of the padded tail region
    x = jnp.full((1, 16500), -1e30)
    x = x.at[0, 16499].set(5.0).at[0, 16384].set(4.0)
    v_t, i_t = top_k_tiled(x, 2)
    assert np.asarray(i_t).tolist() == [[16499, 16384]]
    # small-v and k > tiles fall back to lax.top_k
    x = jnp.asarray(rng.standard_normal((2, 500)).astype(np.float32))
    v_t, i_t = top_k_tiled(x, 10)
    v_r, i_r = jax.lax.top_k(x, 10)
    np.testing.assert_array_equal(np.asarray(i_t), np.asarray(i_r))
