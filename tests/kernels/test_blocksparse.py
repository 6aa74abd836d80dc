"""Blocksparse (Phi-3-Small) attention mask kernel tests.

Both backends vs a numpy oracle applying the dense form of the pattern
(reference: attention/ops/blocksparse_attention/utils.py:180-192 —
causal AND (local OR per-head vertical stripe)), plus the degenerate
cases that must reduce to dense causal attention.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tests.kernels.test_paged_attention import (BLOCK_SIZE, HEAD_SIZE,
                                                build_case)
from vllm_legacy_tpu.ops import xla_attention
from vllm_legacy_tpu.ops.pallas import paged_attention as pallas_attn


def bs_oracle(q, k, v, q_lens, ctx_lens, scale, bs_blk, local, vs,
              phases):
    """Dense-mask oracle; q [B, L, Hq, D], k/v [B, C, Hkv, D]."""
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
                pos = np.arange(kv.shape[0])
                qb, kb = q_pos // bs_blk, pos // bs_blk
                mask = pos <= q_pos
                mask &= ((qb - kb) < local) | \
                    (((kb + phases[h] + 1) % vs) == 0)
                s = np.where(mask, s, -np.inf)
                p = np.exp(s - s.max())
                p /= p.sum()
                out[i, t, h] = p @ vv
    return out


def _run_both(q, k_new, v_new, k_cache, v_cache, tables, ctx_lens,
              q_lens, scale, bs, phases):
    lidx = jnp.zeros((1, ), jnp.int32)
    cl = jnp.asarray(ctx_lens, jnp.int32)
    ql = jnp.asarray(q_lens, jnp.int32)
    ph = jnp.asarray(phases, jnp.int32)
    got_x, _, _ = xla_attention.paged_attention(
        q, k_new, v_new, k_cache, v_cache, lidx, tables, ql, cl,
        scale=scale, blocksparse=bs, bs_phases=ph)
    got_p, _, _ = pallas_attn.paged_attention(
        q, k_new, v_new, k_cache, v_cache, lidx, tables, ql, cl,
        scale=scale, blocksparse=bs, bs_phases=ph, interpret=True)
    return np.asarray(got_x), np.asarray(got_p)


@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)])
@pytest.mark.parametrize("mode", ["decode", "prefill"])
def test_blocksparse_vs_oracle(hq, hkv, mode):
    batch = 3
    if mode == "decode":
        ctx_lens = [33, 96, 160]
        q_lens = [1, 1, 1]
    else:
        ctx_lens = [32, 96, 160]
        q_lens = [32, 96, 32]
    bs_blk, local, vs = 16, 2, 3
    step = max(1, vs // hq)
    phases = np.arange(hq, dtype=np.int32) * step
    scale = HEAD_SIZE**-0.5
    (q, k_new, v_new, k_cache, v_cache, tables, k_full,
     v_full) = build_case(7, batch, q_lens, ctx_lens, hkv, hq, 64)
    got_x, got_p = _run_both(q, k_new, v_new, k_cache, v_cache, tables,
                             ctx_lens, q_lens, scale,
                             (bs_blk, local, vs), phases)

    max_ctx = max(ctx_lens)
    kd = np.zeros((batch, max_ctx, hkv, HEAD_SIZE), np.float32)
    vd = np.zeros_like(kd)
    for i in range(batch):
        kd[i, :ctx_lens[i]] = k_full[i, :ctx_lens[i]]
        vd[i, :ctx_lens[i]] = v_full[i, :ctx_lens[i]]
    want = bs_oracle(np.asarray(q), kd, vd, q_lens, ctx_lens, scale,
                     bs_blk, local, vs, phases)
    for i, ql_ in enumerate(q_lens):
        np.testing.assert_allclose(got_x[i, :ql_], want[i, :ql_],
                                   atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(got_p[i, :ql_], want[i, :ql_],
                                   atol=2e-5, rtol=2e-5)


def test_vert_stride_one_is_dense():
    """vert_stride == 1 marks every block vertical -> plain causal."""
    batch, hq, hkv = 2, 4, 4
    ctx_lens, q_lens = [48, 96], [48, 96]
    scale = HEAD_SIZE**-0.5
    (q, k_new, v_new, k_cache, v_cache, tables, k_full,
     v_full) = build_case(11, batch, q_lens, ctx_lens, hkv, hq, 64)
    phases = np.zeros(hq, np.int32)
    got_x, got_p = _run_both(q, k_new, v_new, k_cache, v_cache, tables,
                             ctx_lens, q_lens, scale, (16, 1, 1),
                             phases)
    lidx = jnp.zeros((1, ), jnp.int32)
    dense, _, _ = xla_attention.paged_attention(
        q, k_new, v_new, k_cache, v_cache, lidx, tables,
        jnp.asarray(q_lens, jnp.int32), jnp.asarray(ctx_lens, jnp.int32),
        scale=scale)
    for i, ql_ in enumerate(q_lens):
        np.testing.assert_allclose(got_x[i, :ql_],
                                   np.asarray(dense)[i, :ql_],
                                   atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(got_p[i, :ql_],
                                   np.asarray(dense)[i, :ql_],
                                   atol=2e-5, rtol=2e-5)
