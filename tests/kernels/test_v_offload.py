"""Dual-table V addressing (V-offload ring pool; fork offload_v
equivalent): K reads the physical table while V reads pool slots from
its own table, in both the Pallas kernel and the XLA fallback."""
import jax.numpy as jnp
import numpy as np
import pytest

from tests.kernels.test_paged_attention import (BLOCK_SIZE, HEAD_SIZE,
                                                dense_oracle)
from vllm_legacy_tpu.ops import xla_attention
from vllm_legacy_tpu.ops.pallas import paged_attention as pallas_attn


def build_case(seed, batch, q_lens, ctx_lens, hkv, hq, num_k_blocks,
               num_v_slots):
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
    k_cache = np.zeros((1, num_k_blocks, hkv, BLOCK_SIZE, HEAD_SIZE),
                       np.float32)
    v_pool = np.zeros((1, num_v_slots, hkv, BLOCK_SIZE, HEAD_SIZE),
                      np.float32)
    tables = np.zeros((batch, max_blocks), np.int32)
    v_tables = np.zeros((batch, max_blocks), np.int32)
    nxt_k, nxt_v = 1, 1
    for i in range(batch):
        ql, ctx = q_lens[i], ctx_lens[i]
        q_start = ctx - ql
        nb = -(-ctx // BLOCK_SIZE)
        tables[i, :nb] = np.arange(nxt_k, nxt_k + nb)
        # V pool slots deliberately DIFFERENT ids from K blocks
        v_tables[i, :nb] = np.arange(nxt_v, nxt_v + nb)
        nxt_k += nb
        nxt_v += nb
        for p in range(q_start):
            blk = tables[i, p // BLOCK_SIZE]
            vslot = v_tables[i, p // BLOCK_SIZE]
            k_cache[0, blk, :, p % BLOCK_SIZE] = k_full[i, p]
            v_pool[0, vslot, :, p % BLOCK_SIZE] = v_full[i, p]
        q_pad[i, :ql] = rng.randn(ql, hq, HEAD_SIZE)
        k_new[i, :ql] = k_full[i, q_start:ctx]
        v_new[i, :ql] = v_full[i, q_start:ctx]
    return (jnp.asarray(q_pad), jnp.asarray(k_new), jnp.asarray(v_new),
            jnp.asarray(k_cache), jnp.asarray(v_pool),
            jnp.asarray(tables), jnp.asarray(v_tables), k_full, v_full)


@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)])
@pytest.mark.parametrize(
    "q_lens,ctx_lens",
    [
        ([1, 1], [33, 128]),  # decode
        ([64, 16], [64, 48]),  # prefill + chunked
    ])
def test_v_tables_vs_oracle(hq, hkv, q_lens, ctx_lens):
    batch = len(q_lens)
    scale = HEAD_SIZE**-0.5
    (q, k_new, v_new, kc, vp, tables, v_tables, k_full,
     v_full) = build_case(5, batch, q_lens, ctx_lens, hkv, hq, 64, 32)
    ql = jnp.asarray(q_lens, jnp.int32)
    cl = jnp.asarray(ctx_lens, jnp.int32)
    lidx = jnp.zeros((1, ), jnp.int32)

    got_x, _, vpx = xla_attention.paged_attention(
        q, k_new, v_new, kc, vp, lidx, tables, ql, cl, scale=scale,
        v_block_tables=v_tables)
    got_p, _, vpp = pallas_attn.paged_attention(
        q, k_new, v_new, kc, vp, lidx, tables, ql, cl, scale=scale,
        v_block_tables=v_tables, interpret=True)

    max_ctx = max(ctx_lens)
    kd = np.zeros((batch, max_ctx, hkv, HEAD_SIZE), np.float32)
    vd = np.zeros_like(kd)
    for i in range(batch):
        kd[i, :ctx_lens[i]] = k_full[i, :ctx_lens[i]]
        vd[i, :ctx_lens[i]] = v_full[i, :ctx_lens[i]]
    want = dense_oracle(np.asarray(q), kd, vd, q_lens, ctx_lens, scale)
    for i, qln in enumerate(q_lens):
        np.testing.assert_allclose(np.asarray(got_x)[i, :qln],
                                   want[i, :qln], atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(got_p)[i, :qln],
                                   want[i, :qln], atol=2e-5, rtol=2e-5)

    # fused V writes landed in the POOL slots (both impls)
    for vpool in (vpx, vpp):
        vc = np.asarray(vpool)
        for i, ctx in enumerate(ctx_lens):
            for p in range(ctx):
                vslot = int(v_tables[i, p // BLOCK_SIZE])
                np.testing.assert_allclose(
                    vc[0, vslot, :, p % BLOCK_SIZE], v_full[i, p],
                    atol=1e-6, err_msg=f"seq {i} pos {p}")
