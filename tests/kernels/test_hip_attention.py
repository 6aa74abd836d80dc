"""Sparse top-k block attention (ops/hip_mask.py + per-head virtual
tables in the paged-attention kernels). Mirrors the reference fork's
HiP test intent (tests vs dense attention) with a numpy oracle."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_legacy_tpu.ops import attention as attn_ops
from vllm_legacy_tpu.ops import xla_attention
from vllm_legacy_tpu.ops.hip_mask import select_kv_blocks

BS = 16  # block size
D = 128
HKV = 2
G = 2  # q heads per kv head


def build_state(rng, batch, max_blocks, ctx_lens, num_layers=2,
                concentrate=None):
    """Random cache + block tables; optionally make `concentrate` block
    indices carry high-norm keys so attention mass is localized."""
    n_blocks = batch * max_blocks + 1
    k_cache = rng.randn(num_layers, n_blocks, HKV, BS, D) * 0.02
    v_cache = rng.randn(num_layers, n_blocks, HKV, BS, D) * 1.0
    # distinct physical blocks per sequence (shuffled to catch
    # virtual->physical mapping bugs)
    perm = rng.permutation(batch * max_blocks) + 1
    tables = perm.reshape(batch, max_blocks).astype(np.int32)
    q = rng.randn(batch, HKV * G, D) * 1.0
    if concentrate is not None:
        for b in range(batch):
            for blk in concentrate:
                phys = tables[b, blk]
                # keys aligned with the query -> dominant scores
                k_cache[:, phys] = (
                    q[b].reshape(HKV, G, D).mean(1)[:, None, :] * 2.0
                    + rng.randn(HKV, BS, D) * 0.001)
    return (jnp.asarray(k_cache, jnp.float32),
            jnp.asarray(v_cache, jnp.float32), jnp.asarray(tables),
            jnp.asarray(q, jnp.float32))


def run_decode(q, k_cache, v_cache, tables, ctx, impl):
    rng = np.random.RandomState(7)
    batch = q.shape[0]
    k_new = jnp.asarray(rng.randn(batch, HKV, D), jnp.float32) * 0.02
    v_new = jnp.asarray(rng.randn(batch, HKV, D), jnp.float32)
    lidx = jnp.asarray([1], jnp.int32)
    fn = (attn_ops.paged_attention_decode
          if impl == "pallas" else xla_attention.paged_attention_decode)
    return fn(q, k_new, v_new, k_cache, v_cache, lidx, tables,
              jnp.asarray(ctx, jnp.int32), scale=D**-0.5)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_sparse_exact_when_budget_covers_context(impl):
    """num_sel >= valid blocks -> identity selection -> bit-equal."""
    rng = np.random.RandomState(0)
    ctx = [40, 7, 64, 1]
    k_cache, v_cache, tables, q = build_state(rng, 4, 8, ctx)
    lidx = jnp.asarray([1], jnp.int32)

    vtab, vctx = select_kv_blocks(q, k_cache, lidx, tables,
                                  jnp.asarray(ctx, jnp.int32), num_sel=8)
    assert vtab.shape == (4, HKV, 8)
    np.testing.assert_array_equal(np.asarray(vctx), ctx)
    # identity prefix: valid entries match the real tables
    for b, c in enumerate(ctx):
        nb = -(-c // BS)
        np.testing.assert_array_equal(
            np.asarray(vtab)[b, :, :nb],
            np.broadcast_to(np.asarray(tables)[b, :nb], (HKV, nb)))

    dense_o, dense_k, dense_v = run_decode(q, k_cache, v_cache, tables,
                                           ctx, impl)
    sparse_o, sparse_k, sparse_v = run_decode(q, k_cache, v_cache, vtab,
                                              vctx, impl)
    np.testing.assert_allclose(np.asarray(sparse_o), np.asarray(dense_o),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(sparse_k),
                                  np.asarray(dense_k))
    np.testing.assert_array_equal(np.asarray(sparse_v),
                                  np.asarray(dense_v))


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_sparse_recovers_concentrated_attention(impl):
    """With attention mass in a few blocks, pruning 32->8 blocks must
    reproduce dense output closely and select the hot blocks."""
    rng = np.random.RandomState(1)
    ctx = [512, 480]
    hot = [5, 17, 23]
    k_cache, v_cache, tables, q = build_state(rng, 2, 32, ctx,
                                              concentrate=hot)
    lidx = jnp.asarray([1], jnp.int32)
    vtab, vctx = select_kv_blocks(q, k_cache, lidx, tables,
                                  jnp.asarray(ctx, jnp.int32), num_sel=8)
    # hot blocks must be selected for every sequence/head
    tab = np.asarray(tables)
    vt = np.asarray(vtab)
    for b in range(2):
        for h in range(HKV):
            for blk in hot:
                assert tab[b, blk] in vt[b, h], (b, h, blk)

    dense_o, _, _ = run_decode(q, k_cache, v_cache, tables, ctx, impl)
    sparse_o, _, _ = run_decode(q, k_cache, v_cache, vtab, vctx, impl)
    np.testing.assert_allclose(np.asarray(sparse_o), np.asarray(dense_o),
                               rtol=0.05, atol=0.05)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_sparse_write_lands_in_true_last_block(impl):
    """The fused decode write through a VIRTUAL table must store the new
    K/V at the same physical slot the dense path uses."""
    rng = np.random.RandomState(2)
    ctx = [517, 100]  # 33 blocks (partial last), 7 blocks
    k_cache, v_cache, tables, q = build_state(rng, 2, 40, ctx)
    lidx = jnp.asarray([1], jnp.int32)
    vtab, vctx = select_kv_blocks(q, k_cache, lidx, tables,
                                  jnp.asarray(ctx, jnp.int32), num_sel=8)
    _, dense_k, dense_v = run_decode(q, k_cache, v_cache, tables, ctx,
                                     impl)
    _, sparse_k, sparse_v = run_decode(q, k_cache, v_cache, vtab, vctx,
                                       impl)
    tab = np.asarray(tables)
    for b, c in enumerate(ctx):
        blk = tab[b, (c - 1) // BS]
        off = (c - 1) % BS
        np.testing.assert_array_equal(
            np.asarray(sparse_k)[1, blk, :, off],
            np.asarray(dense_k)[1, blk, :, off])
        np.testing.assert_array_equal(
            np.asarray(sparse_v)[1, blk, :, off],
            np.asarray(dense_v)[1, blk, :, off])


def test_per_head_selection_differs():
    """Heads with different queries must be able to pick different
    blocks (per-kv-head virtual tables, not a shared mask)."""
    rng = np.random.RandomState(3)
    ctx = [512]
    k_cache, v_cache, tables, q = build_state(rng, 1, 32, ctx)
    # head 0 keys aligned at block 4, head 1 at block 20
    tab = np.asarray(tables)
    kc = np.array(k_cache)
    qn = np.asarray(q).reshape(1, HKV, G, D)
    kc[:, tab[0, 4], 0] = qn[0, 0].mean(0) * 0.5
    kc[:, tab[0, 20], 1] = qn[0, 1].mean(0) * 0.5
    k_cache = jnp.asarray(kc)
    vtab, _ = select_kv_blocks(q, k_cache, jnp.asarray([1], jnp.int32),
                               tables, jnp.asarray(ctx, jnp.int32),
                               num_sel=6)
    vt = np.asarray(vtab)
    assert tab[0, 4] in vt[0, 0]
    assert tab[0, 20] in vt[0, 1]
    assert not np.array_equal(vt[0, 0], vt[0, 1])
