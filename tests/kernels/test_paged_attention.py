"""Paged-attention kernel tests (fused cache-write + attention).

Mirrors the reference's kernel-vs-naive-torch strategy
(tests/kernels/test_attention.py): the Pallas kernel (interpret mode on
CPU) and the XLA fallback are both checked against a dense numpy oracle
over a grid of (GQA ratio, lengths, sliding window, soft cap), and the
cache contents after the fused write are verified.
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


def dense_oracle(q, k, v, q_lens, ctx_lens, scale, window=None, cap=None,
                 alibi=None):
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
                if alibi is not None:
                    s = s + alibi[h] * (pos - q_pos)
                mask = pos <= q_pos
                if window is not None:
                    mask &= pos > q_pos - window
                s = np.where(mask, s, -np.inf)
                p = np.exp(s - s.max())
                p /= p.sum()
                out[i, t, h] = p @ vv
    return out


def build_case(seed, batch, q_lens, ctx_lens, hkv, hq, num_blocks):
    """Random dense K/V per sequence; the first ctx-qlen positions are
    pre-written into a stacked cache, the last qlen are the "new" rows
    the kernel must write itself. Returns everything both impls need."""
    rng = np.random.RandomState(seed)
    max_ctx = max(ctx_lens)
    max_blocks = -(-max_ctx // BLOCK_SIZE)
    l_pad = max(BLOCK_SIZE, 1 << (max(q_lens) - 1).bit_length()) \
        if max(q_lens) > 1 else 1

    k_full = rng.randn(batch, max_ctx, hkv, HEAD_SIZE).astype(np.float32)
    v_full = rng.randn(batch, max_ctx, hkv, HEAD_SIZE).astype(np.float32)
    q_pad = np.zeros((batch, l_pad, hq, HEAD_SIZE), np.float32)
    k_new = np.zeros((batch, l_pad, hkv, HEAD_SIZE), np.float32)
    v_new = np.zeros((batch, l_pad, hkv, HEAD_SIZE), np.float32)

    # stacked cache with 1 layer
    k_cache = np.zeros((1, num_blocks, hkv, BLOCK_SIZE, HEAD_SIZE),
                       np.float32)
    v_cache = np.zeros_like(k_cache)
    perm = rng.permutation(num_blocks - 1) + 1
    tables = np.zeros((batch, max_blocks), np.int32)
    next_free = 0
    for i in range(batch):
        ql, ctx = q_lens[i], ctx_lens[i]
        q_start = ctx - ql
        assert q_start % BLOCK_SIZE == 0 or ql == 1, (q_start, ql)
        nb = -(-ctx // BLOCK_SIZE)
        tables[i, :nb] = perm[next_free:next_free + nb]
        next_free += nb
        # pre-write the context (positions < q_start)
        for p in range(q_start):
            blk = tables[i, p // BLOCK_SIZE]
            k_cache[0, blk, :, p % BLOCK_SIZE] = k_full[i, p]
            v_cache[0, blk, :, p % BLOCK_SIZE] = v_full[i, p]
        q_pad[i, :ql] = rng.randn(ql, hq, HEAD_SIZE)
        k_new[i, :ql] = k_full[i, q_start:ctx]
        v_new[i, :ql] = v_full[i, q_start:ctx]
    return (jnp.asarray(q_pad), jnp.asarray(k_new), jnp.asarray(v_new),
            jnp.asarray(k_cache), jnp.asarray(v_cache),
            jnp.asarray(tables), k_full, v_full)


def check_cache_contents(k_cache, tables, k_full, q_lens, ctx_lens):
    """Every position < ctx must hold the right K row after the call."""
    kc = np.asarray(k_cache)
    for i, ctx in enumerate(ctx_lens):
        for p in range(ctx):
            blk = tables[i, p // BLOCK_SIZE]
            np.testing.assert_allclose(
                kc[0, blk, :, p % BLOCK_SIZE], k_full[i, p], atol=1e-6,
                err_msg=f"seq {i} pos {p}")


@pytest.mark.parametrize("hq,hkv", [(8, 8), (8, 1), (16, 2)])
@pytest.mark.parametrize("window,cap", [(None, None), (32, None),
                                        (None, 30.0)])
def test_decode_vs_oracle(hq, hkv, window, cap):
    batch = 4
    ctx_lens = [1, 17, 63, 128]
    q_lens = [1] * batch
    scale = HEAD_SIZE**-0.5
    (q, k_new, v_new, k_cache, v_cache, tables, k_full,
     v_full) = build_case(42, batch, q_lens, ctx_lens, hkv, hq, 64)
    ql = jnp.ones((batch, ), jnp.int32)
    cl = jnp.asarray(ctx_lens, jnp.int32)
    lidx = jnp.zeros((1, ), jnp.int32)

    got_x, kcx, _ = xla_attention.paged_attention_decode(
        q[:, 0], k_new[:, 0], v_new[:, 0], k_cache, v_cache, lidx,
        tables, cl, scale=scale, sliding_window=window, soft_cap=cap)
    got_p, kcp, _ = pallas_attn.paged_attention_decode(
        q[:, 0], k_new[:, 0], v_new[:, 0], k_cache, v_cache, lidx,
        tables, cl, scale=scale, sliding_window=window, soft_cap=cap,
        interpret=True)

    max_ctx = max(ctx_lens)
    kd = np.zeros((batch, max_ctx, hkv, HEAD_SIZE), np.float32)
    vd = np.zeros_like(kd)
    for i in range(batch):
        kd[i, :ctx_lens[i]] = k_full[i, :ctx_lens[i]]
        vd[i, :ctx_lens[i]] = v_full[i, :ctx_lens[i]]
    want = dense_oracle(np.asarray(q), kd, vd, q_lens, ctx_lens, scale,
                        window, cap)[:, 0]

    np.testing.assert_allclose(np.asarray(got_x), want, atol=2e-5,
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got_p), want, atol=2e-5,
                               rtol=2e-5)
    check_cache_contents(kcx, np.asarray(tables), k_full, q_lens,
                         ctx_lens)
    check_cache_contents(kcp, np.asarray(tables), k_full, q_lens,
                         ctx_lens)


@pytest.mark.parametrize("hq,hkv", [(8, 8), (8, 2)])
@pytest.mark.parametrize(
    "q_lens,ctx_lens",
    [
        ([5, 12], [5, 12]),  # plain prefill (start = 0)
        ([4, 7], [20, 23]),  # chunked prefill from block-aligned starts
        ([16, 30], [32, 62]),  # multi-block new chunks
    ],
)
def test_prefill_vs_oracle(hq, hkv, q_lens, ctx_lens):
    batch = len(q_lens)
    scale = HEAD_SIZE**-0.5
    (q, k_new, v_new, k_cache, v_cache, tables, k_full,
     v_full) = build_case(3, batch, q_lens, ctx_lens, hkv, hq, 32)
    ql = jnp.asarray(q_lens, jnp.int32)
    cl = jnp.asarray(ctx_lens, jnp.int32)
    lidx = jnp.zeros((1, ), jnp.int32)

    got_x, kcx, _ = xla_attention.paged_attention(
        q, k_new, v_new, k_cache, v_cache, lidx, tables, ql, cl,
        scale=scale)
    got_p, kcp, _ = pallas_attn.paged_attention(
        q, k_new, v_new, k_cache, v_cache, lidx, tables, ql, cl,
        scale=scale, interpret=True)

    max_ctx = max(ctx_lens)
    kd = np.zeros((batch, max_ctx, hkv, HEAD_SIZE), np.float32)
    vd = np.zeros_like(kd)
    for i in range(batch):
        kd[i, :ctx_lens[i]] = k_full[i, :ctx_lens[i]]
        vd[i, :ctx_lens[i]] = v_full[i, :ctx_lens[i]]
    want = dense_oracle(np.asarray(q), kd, vd, q_lens, ctx_lens, scale)

    for i in range(batch):
        np.testing.assert_allclose(
            np.asarray(got_x)[i, :q_lens[i]], want[i, :q_lens[i]],
            atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(
            np.asarray(got_p)[i, :q_lens[i]], want[i, :q_lens[i]],
            atol=2e-5, rtol=2e-5)
    check_cache_contents(kcx, np.asarray(tables), k_full, q_lens,
                         ctx_lens)
    check_cache_contents(kcp, np.asarray(tables), k_full, q_lens,
                         ctx_lens)


def test_write_to_kv_cache_drops_pad_slots():
    hkv, nblocks = 2, 4
    k_cache = jnp.zeros((nblocks, hkv, BLOCK_SIZE, HEAD_SIZE), jnp.float32)
    v_cache = jnp.ones_like(k_cache)
    key = jnp.full((3, hkv, HEAD_SIZE), 2.0)
    val = jnp.full((3, hkv, HEAD_SIZE), 3.0)
    slots = jnp.asarray([0, 17, -1], jnp.int32)  # last is padding
    k2, v2 = write_to_kv_cache(key, val, k_cache, v_cache, slots)
    k2 = np.asarray(k2).transpose(1, 0, 2, 3).reshape(hkv, -1, HEAD_SIZE)
    v2 = np.asarray(v2).transpose(1, 0, 2, 3).reshape(hkv, -1, HEAD_SIZE)
    assert (k2[:, 0] == 2.0).all() and (k2[:, 17] == 2.0).all()
    assert (v2[:, 0] == 3.0).all() and (v2[:, 17] == 3.0).all()
    assert (k2[:, 1] == 0.0).all()  # untouched
    assert k2.sum() == 2.0 * 2 * 2 * HEAD_SIZE  # nothing else written


def test_write_to_kv_cache_stacked_layer():
    hkv, nblocks, layers = 2, 4, 3
    k_cache = jnp.zeros((layers, nblocks, hkv, BLOCK_SIZE, HEAD_SIZE),
                        jnp.float32)
    v_cache = jnp.zeros_like(k_cache)
    key = jnp.full((2, hkv, HEAD_SIZE), 5.0)
    val = jnp.full((2, hkv, HEAD_SIZE), 7.0)
    slots = jnp.asarray([3, 40], jnp.int32)
    k2, v2 = write_to_kv_cache(key, val, k_cache, v_cache, slots,
                               layer_idx=1)
    k2 = np.asarray(k2)
    assert (k2[1, 0, :, 3] == 5.0).all()
    assert (k2[1, 2, :, 8] == 5.0).all()  # slot 40 = block 2, off 8
    assert k2[0].sum() == 0 and k2[2].sum() == 0  # other layers untouched

@pytest.mark.parametrize("hq,hkv", [(8, 8), (8, 2)])
@pytest.mark.parametrize("phase", ["decode", "prefill"])
def test_alibi_vs_oracle(hq, hkv, phase):
    """ALiBi bias (reference: attention_kernels.cu alibi_slope path,
    used by MPT/Bloom/Baichuan-13B/Jais)."""
    scale = HEAD_SIZE**-0.5
    if phase == "decode":
        q_lens, ctx_lens = [1, 1, 1], [1, 33, 100]
    else:
        q_lens, ctx_lens = [7, 16], [7, 32]
    batch = len(q_lens)
    (q, k_new, v_new, k_cache, v_cache, tables, k_full,
     v_full) = build_case(11, batch, q_lens, ctx_lens, hkv, hq, 64)
    ql = jnp.asarray(q_lens, jnp.int32)
    cl = jnp.asarray(ctx_lens, jnp.int32)
    lidx = jnp.zeros((1, ), jnp.int32)
    slopes = np.geomspace(0.5, 1.0 / 256, hq).astype(np.float32)
    slopes_j = jnp.asarray(slopes)

    if phase == "decode":
        got_x, _, _ = xla_attention.paged_attention_decode(
            q[:, 0], k_new[:, 0], v_new[:, 0], k_cache, v_cache, lidx,
            tables, cl, scale=scale, alibi_slopes=slopes_j)
        got_p, _, _ = pallas_attn.paged_attention_decode(
            q[:, 0], k_new[:, 0], v_new[:, 0], k_cache, v_cache, lidx,
            tables, cl, scale=scale, interpret=True,
            alibi_slopes=slopes_j)
        got_x, got_p = got_x[:, None], got_p[:, None]
    else:
        got_x, _, _ = xla_attention.paged_attention(
            q, k_new, v_new, k_cache, v_cache, lidx, tables, ql, cl,
            scale=scale, alibi_slopes=slopes_j)
        got_p, _, _ = pallas_attn.paged_attention(
            q, k_new, v_new, k_cache, v_cache, lidx, tables, ql, cl,
            scale=scale, interpret=True, alibi_slopes=slopes_j)

    max_ctx = max(ctx_lens)
    kd = np.zeros((batch, max_ctx, hkv, HEAD_SIZE), np.float32)
    vd = np.zeros_like(kd)
    for i in range(batch):
        kd[i, :ctx_lens[i]] = k_full[i, :ctx_lens[i]]
        vd[i, :ctx_lens[i]] = v_full[i, :ctx_lens[i]]
    want = dense_oracle(np.asarray(q), kd, vd, q_lens, ctx_lens, scale,
                        alibi=slopes)
    for i in range(batch):
        np.testing.assert_allclose(
            np.asarray(got_x)[i, :q_lens[i]], want[i, :q_lens[i]],
            atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(
            np.asarray(got_p)[i, :q_lens[i]], want[i, :q_lens[i]],
            atol=2e-5, rtol=2e-5)
