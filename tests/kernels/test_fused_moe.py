"""Fused-MoE paths: grouped (ragged_dot) vs dense vs numpy oracle
(reference strategy: tests/kernels/test_moe.py — fused_moe vs a naive
torch implementation)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_legacy_tpu.layers.fused_moe import _grouped_moe, fused_moe

T, H, I, E, K = 37, 32, 48, 8, 2


def _inputs(seed):
    rng = np.random.RandomState(seed)
    x = rng.randn(T, H).astype(np.float32)
    wr = rng.randn(H, E).astype(np.float32) * 0.1
    w1 = rng.randn(E, H, 2 * I).astype(np.float32) * 0.1
    w2 = rng.randn(E, I, H).astype(np.float32) * 0.1
    return x, wr, w1, w2


def _oracle(x, wr, w1, w2, renormalize=True):
    logits = x @ wr
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    out = np.zeros_like(x)
    for t in range(T):
        top = np.argsort(-probs[t])[:K]
        w = probs[t, top]
        if renormalize:
            w = w / w.sum()
        for e, wt in zip(top, w):
            h1 = x[t] @ w1[e]
            gate, up = h1[:I], h1[I:]
            act = gate / (1 + np.exp(-gate)) * up
            out[t] += wt * (act @ w2[e])
    return out


def test_grouped_matches_oracle():
    x, wr, w1, w2 = _inputs(0)
    got = np.asarray(
        fused_moe(jnp.asarray(x), jnp.asarray(wr), jnp.asarray(w1),
                  jnp.asarray(w2), top_k=K, num_experts=E))
    want = _oracle(x, wr, w1, w2)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_grouped_matches_dense_form():
    """The tp=1 grouped path and the EP dense form must agree."""
    x, wr, w1, w2 = _inputs(1)
    logits = jnp.asarray(x) @ jnp.asarray(wr)
    weights = jax.nn.softmax(logits, axis=-1)
    top_w, top_ids = jax.lax.top_k(weights, K)
    top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)

    grouped = np.asarray(
        _grouped_moe(jnp.asarray(x), jnp.asarray(w1), jnp.asarray(w2),
                     top_w, top_ids, E))

    # dense reference (the multi-chip form at E_local == E)
    match = top_ids[:, :, None] == jnp.arange(E)[None, None, :]
    expert_w = jnp.sum(jnp.where(match, top_w[:, :, None], 0.0), axis=1)
    h1 = jnp.einsum("th,ehi->eti", jnp.asarray(x), jnp.asarray(w1))
    gate, up = jnp.split(h1, 2, axis=-1)
    act = jax.nn.silu(gate) * up
    h2 = jnp.einsum("eti,eih->eth", act, jnp.asarray(w2))
    dense = np.asarray(jnp.einsum("eth,te->th", h2, expert_w))

    np.testing.assert_allclose(grouped, dense, atol=1e-4, rtol=1e-4)


def test_grouped_jits_static():
    """The grouped path must trace under jit with static shapes."""
    x, wr, w1, w2 = _inputs(2)
    f = jax.jit(lambda x: fused_moe(x, jnp.asarray(wr), jnp.asarray(w1),
                                    jnp.asarray(w2), top_k=K,
                                    num_experts=E))
    a = np.asarray(f(jnp.asarray(x)))
    b = np.asarray(f(jnp.asarray(x)))
    np.testing.assert_array_equal(a, b)
