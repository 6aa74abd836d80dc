"""Paged-attention kernel tests.

Mirrors the reference's kernel-vs-naive-torch strategy
(tests/kernels/test_attention.py): the Pallas kernel (interpret mode on
CPU) and the XLA fallback are both checked against a dense numpy oracle
over a grid of (GQA ratio, lengths, sliding window, soft cap).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_legacy_tpu.ops import xla_attention
from vllm_legacy_tpu.ops.kv_cache import write_to_kv_cache
from vllm_legacy_tpu.ops.pallas import paged_attention as pallas_attn

BLOCK_SIZE = 16
HEAD_SIZE = 128


def dense_oracle(q, k, v, q_lens, ctx_lens, scale, window=None, cap=None):
    """Numpy full-attention oracle. q: [B, L, Hq, D]; k/v: [B, C, Hkv, D]."""
    b, l_pad, hq, d = q.shape
    hkv = k.shape[2]
    group = hq // hkv
    out = np.zeros_like(q, dtype=np.float32)
    for i in range(b):
        for t in range(q_lens[i]):
            q_pos = ctx_lens[i] - q_lens[i] + t
            for h in range(hq):
                kv = k[i, :, h // group].astype(np.float32)
                vv = v[i, :, h // group].astype(np.float32)
                s = kv @ (q[i, t, h].astype(np.float32) * scale)
                if cap is not None:
                    s = cap * np.tanh(s / cap)
                pos = np.arange(kv.shape[0])
                mask = pos <= q_pos
                if window is not None:
                    mask &= pos > q_pos - window
                s = np.where(mask, s, -np.inf)
                p = np.exp(s - s.max())
                p /= p.sum()
                out[i, t, h] = p @ vv
    return out


def build_cache(key, batch, ctx_lens, hkv, num_blocks):
    """Random contiguous K/V per sequence scattered into a paged cache."""
    max_ctx = max(ctx_lens)
    max_blocks = -(-max_ctx // BLOCK_SIZE)
    k1, k2 = jax.random.split(key)
    k_full = jax.random.normal(k1, (batch, max_ctx, hkv, HEAD_SIZE),
                               jnp.float32)
    v_full = jax.random.normal(k2, (batch, max_ctx, hkv, HEAD_SIZE),
                               jnp.float32)
    k_cache = jnp.zeros((hkv, num_blocks, BLOCK_SIZE, HEAD_SIZE),
                        jnp.float32)
    v_cache = jnp.zeros_like(k_cache)
    # Disjoint random-ish block assignment (permuted so tables are
    # non-trivial), block 0 reserved as pad target.
    rng = np.random.RandomState(0)
    perm = rng.permutation(num_blocks - 1) + 1
    tables = np.zeros((batch, max_blocks), np.int32)
    next_free = 0
    for i in range(batch):
        nb = -(-ctx_lens[i] // BLOCK_SIZE)
        tables[i, :nb] = perm[next_free:next_free + nb]
        next_free += nb
        slots = tables[i, :nb, None] * BLOCK_SIZE + np.arange(BLOCK_SIZE)
        slots = slots.reshape(-1)[:ctx_lens[i]]
        k_cache, v_cache = write_to_kv_cache(
            k_full[i, :ctx_lens[i]], v_full[i, :ctx_lens[i]], k_cache,
            v_cache, jnp.asarray(slots, jnp.int32))
    return k_full, v_full, k_cache, v_cache, jnp.asarray(tables)


@pytest.mark.parametrize("hq,hkv", [(8, 8), (8, 1), (16, 2)])
@pytest.mark.parametrize("window,cap", [(None, None), (32, None),
                                        (None, 30.0)])
def test_decode_vs_oracle(hq, hkv, window, cap):
    batch = 4
    ctx_lens = [1, 17, 63, 128]
    scale = HEAD_SIZE**-0.5
    key = jax.random.PRNGKey(42)
    k_full, v_full, k_cache, v_cache, tables = build_cache(
        key, batch, ctx_lens, hkv, num_blocks=64)
    q = jax.random.normal(jax.random.PRNGKey(7), (batch, hq, HEAD_SIZE),
                          jnp.float32)

    ctx = jnp.asarray(ctx_lens, jnp.int32)
    got_xla = xla_attention.paged_attention_decode(
        q, k_cache, v_cache, tables, ctx, scale=scale,
        sliding_window=window, soft_cap=cap)
    got_pl = pallas_attn.paged_attention_decode(
        q, k_cache, v_cache, tables, ctx, scale=scale,
        sliding_window=window, soft_cap=cap, interpret=True)

    # oracle over padded dense KV
    max_ctx = max(ctx_lens)
    kd = np.zeros((batch, max_ctx, hkv, HEAD_SIZE), np.float32)
    vd = np.zeros_like(kd)
    for i in range(batch):
        kd[i, :ctx_lens[i]] = np.asarray(k_full[i, :ctx_lens[i]])
        vd[i, :ctx_lens[i]] = np.asarray(v_full[i, :ctx_lens[i]])
    want = dense_oracle(
        np.asarray(q)[:, None], kd, vd, [1] * batch, ctx_lens, scale,
        window, cap)[:, 0]

    np.testing.assert_allclose(np.asarray(got_xla), want, atol=2e-5,
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got_pl), want, atol=2e-5,
                               rtol=2e-5)


@pytest.mark.parametrize("hq,hkv", [(8, 8), (8, 2)])
@pytest.mark.parametrize(
    "q_lens,ctx_lens",
    [
        ([5, 12], [5, 12]),  # plain prefill
        ([4, 7], [20, 33]),  # chunked prefill / prefix-cache hit
        ([1, 1], [9, 40]),  # decode expressed through the prefill path
    ],
)
def test_prefill_vs_oracle(hq, hkv, q_lens, ctx_lens):
    batch = len(q_lens)
    l_pad = 16
    scale = HEAD_SIZE**-0.5
    key = jax.random.PRNGKey(3)
    k_full, v_full, k_cache, v_cache, tables = build_cache(
        key, batch, ctx_lens, hkv, num_blocks=32)

    q_pad = np.zeros((batch, l_pad, hq, HEAD_SIZE), np.float32)
    rng = np.random.RandomState(5)
    for i in range(batch):
        q_pad[i, :q_lens[i]] = rng.randn(q_lens[i], hq,
                                         HEAD_SIZE).astype(np.float32)
    q = jnp.asarray(q_pad)
    ql = jnp.asarray(q_lens, jnp.int32)
    cl = jnp.asarray(ctx_lens, jnp.int32)

    got_xla = xla_attention.paged_attention_prefill(
        q, k_cache, v_cache, tables, ql, cl, scale=scale)
    got_pl = pallas_attn.paged_attention_prefill(
        q, k_cache, v_cache, tables, ql, cl, scale=scale, interpret=True)

    max_ctx = max(ctx_lens)
    kd = np.zeros((batch, max_ctx, hkv, HEAD_SIZE), np.float32)
    vd = np.zeros_like(kd)
    for i in range(batch):
        kd[i, :ctx_lens[i]] = np.asarray(k_full[i, :ctx_lens[i]])
        vd[i, :ctx_lens[i]] = np.asarray(v_full[i, :ctx_lens[i]])
    want = dense_oracle(q_pad, kd, vd, q_lens, ctx_lens, scale)

    for i in range(batch):
        np.testing.assert_allclose(
            np.asarray(got_xla)[i, :q_lens[i]], want[i, :q_lens[i]],
            atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(
            np.asarray(got_pl)[i, :q_lens[i]], want[i, :q_lens[i]],
            atol=2e-5, rtol=2e-5)


def test_write_to_kv_cache_drops_pad_slots():
    hkv, nblocks = 2, 4
    k_cache = jnp.zeros((hkv, nblocks, BLOCK_SIZE, HEAD_SIZE), jnp.float32)
    v_cache = jnp.ones_like(k_cache)
    key = jnp.full((3, hkv, HEAD_SIZE), 2.0)
    val = jnp.full((3, hkv, HEAD_SIZE), 3.0)
    slots = jnp.asarray([0, 17, -1], jnp.int32)  # last is padding
    k2, v2 = write_to_kv_cache(key, val, k_cache, v_cache, slots)
    k2 = np.asarray(k2).reshape(hkv, -1, HEAD_SIZE)
    v2 = np.asarray(v2).reshape(hkv, -1, HEAD_SIZE)
    assert (k2[:, 0] == 2.0).all() and (k2[:, 17] == 2.0).all()
    assert (v2[:, 0] == 3.0).all() and (v2[:, 17] == 3.0).all()
    assert (k2[:, 1] == 0.0).all()  # untouched
    assert k2.sum() == 2.0 * 2 * 2 * HEAD_SIZE  # nothing else written
