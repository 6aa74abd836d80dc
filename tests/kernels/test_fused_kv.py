"""FUSED single-buffer KV cache ([L, N, Hkv*2*rows, rd]: per head K
rows then V rows) vs the dense oracle — the unified prefill kernel in
fused mode, the gang-batched decode kernel, and the XLA reference.
Covers pair rows (head 64) and plain rows (head 128), consecutive and
shuffled block tables, ragged contexts, GQA, and the fused cache
write."""
import jax.numpy as jnp
import numpy as np
import pytest

from tests.kernels.test_paged_attention import dense_oracle
from vllm_legacy_tpu.ops import xla_attention
from vllm_legacy_tpu.ops.pallas import paged_attention as pallas_attn
from vllm_legacy_tpu.ops.pallas.fused_decode import fused_decode_attention

BS = 16


def build_fused(seed, batch, q_lens, ctx_lens, hkv, hq, num_blocks, d,
                pair, shuffle=False):
    rng = np.random.RandomState(seed)
    rd = 2 * d if pair else max(d, 128)
    rows = BS // 2 if pair else BS
    max_ctx = max(ctx_lens)
    max_blocks = -(-max_ctx // BS)
    l_pad = max(BS, 1 << (max(q_lens) - 1).bit_length()) \
        if max(q_lens) > 1 else 1
    k_full = rng.randn(batch, max_ctx, hkv, d).astype(np.float32)
    v_full = rng.randn(batch, max_ctx, hkv, d).astype(np.float32)
    q_pad = np.zeros((batch, l_pad, hq, d), np.float32)
    k_new = np.zeros((batch, l_pad, hkv, d), np.float32)
    v_new = np.zeros((batch, l_pad, hkv, d), np.float32)
    # 5-D staging then carve into the fused row form
    k5 = np.zeros((1, num_blocks, hkv, BS, d), np.float32)
    v5 = np.zeros_like(k5)
    tables = np.zeros((batch, max_blocks), np.int32)
    order = np.arange(1, num_blocks)
    if shuffle:
        rng.shuffle(order)
    nxt = 0
    for i in range(batch):
        ql, ctx = q_lens[i], ctx_lens[i]
        q_start = ctx - ql
        nb = -(-ctx // BS)
        tables[i, :nb] = order[nxt:nxt + nb]
        nxt += nb
        for p in range(q_start):
            blk = tables[i, p // BS]
            k5[0, blk, :, p % BS] = k_full[i, p]
            v5[0, blk, :, p % BS] = v_full[i, p]
        q_pad[i, :ql] = rng.randn(ql, hq, d)
        k_new[i, :ql] = k_full[i, q_start:ctx]
        v_new[i, :ql] = v_full[i, q_start:ctx]
    kv = fuse(k5, v5, pair, rd)
    if not pair:
        # plain rows ride the 5-D form [1, N, Hkv*2, bs, dpad]
        kv = kv.reshape(1, num_blocks, hkv * 2, BS, rd)
    return (jnp.asarray(q_pad), jnp.asarray(k_new), jnp.asarray(v_new),
            jnp.asarray(kv), jnp.asarray(tables), k_full, v_full)


def fuse(k5, v5, pair, rd):
    """[1, N, H, BS, d] pair -> fused [1, N, H*2*rows, rd]."""
    _, n, h, bs, d = k5.shape
    if pair:
        kr = k5.reshape(1, n, h, bs // 2, 2 * d)
        vr = v5.reshape(1, n, h, bs // 2, 2 * d)
    else:
        kr = np.zeros((1, n, h, bs, rd), k5.dtype)
        vr = np.zeros_like(kr)
        kr[..., :d] = k5
        vr[..., :d] = v5
    kv = np.stack([kr, vr], axis=3)  # [1, N, H, 2, rows, rd]
    return kv.reshape(1, n, -1, rd)


def unfuse(kv, hkv, bs, d, pair):
    """fused [1, N, H*2*rows, rd] or [1, N, H*2, bs, rd] ->
    k5, v5 [1, N, H, BS, d]."""
    _, n = kv.shape[:2]
    rd = kv.shape[-1]
    rows = bs // 2 if pair else bs
    v6 = np.asarray(kv).reshape(1, n, hkv, 2, rows, rd)
    if pair:
        k5 = v6[:, :, :, 0].reshape(1, n, hkv, bs, d)
        v5 = v6[:, :, :, 1].reshape(1, n, hkv, bs, d)
    else:
        k5 = v6[:, :, :, 0][..., :d]
        v5 = v6[:, :, :, 1][..., :d]
    return k5, v5


@pytest.mark.parametrize("pair,d", [(True, 64), (False, 128)])
@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)])
@pytest.mark.parametrize(
    "q_lens,ctx_lens",
    [
        ([1, 1, 1], [1, 33, 128]),  # decode
        ([16, 64, 32], [16, 64, 128]),  # prefill (+ chunked start)
    ])
def test_fused_prefill_vs_oracle(pair, d, hq, hkv, q_lens, ctx_lens):
    batch = len(q_lens)
    scale = d**-0.5
    (q, k_new, v_new, kv, tables, k_full,
     v_full) = build_fused(3, batch, q_lens, ctx_lens, hkv, hq, 64, d,
                           pair)
    if not pair and d < kv.shape[-1]:
        padw = [(0, 0)] * 3 + [(0, kv.shape[-1] - d)]
        q, k_new, v_new = (jnp.pad(x, padw) for x in (q, k_new, v_new))
    ql = jnp.asarray(q_lens, jnp.int32)
    cl = jnp.asarray(ctx_lens, jnp.int32)
    lidx = jnp.zeros((1, ), jnp.int32)

    got_x, kvx, none_x = xla_attention.paged_attention(
        q, k_new, v_new, kv, None, lidx, tables, ql, cl, scale=scale)
    got_p, kvp, none_p = pallas_attn.paged_attention(
        q, k_new, v_new, kv, None, lidx, tables, ql, cl, scale=scale,
        interpret=True)
    assert none_x is None and none_p is None
    assert kvx.shape == kv.shape and kvp.shape == kv.shape

    max_ctx = max(ctx_lens)
    kd = np.zeros((batch, max_ctx, hkv, d), np.float32)
    vd = np.zeros_like(kd)
    for i in range(batch):
        kd[i, :ctx_lens[i]] = k_full[i, :ctx_lens[i]]
        vd[i, :ctx_lens[i]] = v_full[i, :ctx_lens[i]]
    want = dense_oracle(np.asarray(q)[..., :d], kd, vd, q_lens,
                        ctx_lens, scale)
    for i, qln in enumerate(q_lens):
        np.testing.assert_allclose(np.asarray(got_x)[i, :qln, :, :d],
                                   want[i, :qln], atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(got_p)[i, :qln, :, :d],
                                   want[i, :qln], atol=2e-5, rtol=2e-5)

    # the fused write must land the new rows
    for impl_kv in (kvx, kvp):
        k5, v5 = unfuse(impl_kv, hkv, BS, d, pair)
        for i, ctx in enumerate(ctx_lens):
            for p in range(ctx):
                blk = int(tables[i, p // BS])
                np.testing.assert_allclose(k5[0, blk, :, p % BS],
                                           k_full[i, p], atol=1e-6,
                                           err_msg=f"seq {i} pos {p}")
                np.testing.assert_allclose(v5[0, blk, :, p % BS],
                                           v_full[i, p], atol=1e-6)


@pytest.mark.parametrize("pair,d", [(True, 64), (False, 128)])
@pytest.mark.parametrize("shuffle", [False, True])
def test_fused_decode_vs_oracle(pair, d, shuffle):
    hq, hkv = 8, 2
    ctx_lens = [1, 7, 33, 128, 61, 96, 15, 40]
    q_lens = [1] * len(ctx_lens)
    batch = len(ctx_lens)
    scale = d**-0.5
    (q, k_new, v_new, kv, tables, k_full,
     v_full) = build_fused(5, batch, q_lens, ctx_lens, hkv, hq, 80, d,
                           pair, shuffle=shuffle)
    cl = jnp.asarray(ctx_lens, jnp.int32)
    lidx = jnp.zeros((1, ), jnp.int32)
    if not pair:
        padw = [(0, 0)] * 3 + [(0, kv.shape[-1] - d)]
        q, k_new, v_new = (jnp.pad(x, padw) for x in (q, k_new, v_new))
    out, kv2 = fused_decode_attention(
        q[:, 0], k_new[:, 0], v_new[:, 0], kv, lidx, tables, cl,
        scale=scale, num_kv_heads=hkv, gang=4, kblk=2, interpret=True)

    max_ctx = max(ctx_lens)
    kd = np.zeros((batch, max_ctx, hkv, d), np.float32)
    vd = np.zeros_like(kd)
    for i in range(batch):
        kd[i, :ctx_lens[i]] = k_full[i, :ctx_lens[i]]
        vd[i, :ctx_lens[i]] = v_full[i, :ctx_lens[i]]
    want = dense_oracle(np.asarray(q)[:, :1, :, :d], kd, vd, q_lens,
                        ctx_lens, scale)
    np.testing.assert_allclose(np.asarray(out)[:, :, :d], want[:, 0],
                               atol=2e-5, rtol=2e-5)

    k5, v5 = unfuse(kv2, hkv, BS, d, pair)
    for i, ctx in enumerate(ctx_lens):
        p = ctx - 1
        blk = int(tables[i, p // BS])
        np.testing.assert_allclose(k5[0, blk, :, p % BS],
                                   np.asarray(k_new)[i, 0, :, :d],
                                   atol=1e-6)
        np.testing.assert_allclose(v5[0, blk, :, p % BS],
                                   np.asarray(v_new)[i, 0, :, :d],
                                   atol=1e-6)
