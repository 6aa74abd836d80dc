"""Pallas TPU paged-attention kernel (prefill + decode unified).

One flash-style kernel replaces the reference's four CUDA/Triton paths
(paged_attention_v1/v2 decode kernels, flash_attn_varlen prefill, Triton
context_attention_fwd chunked/prefix prefill — SURVEY.md §2.6, §2.11):

* Queries are the *new* tokens of each sequence, padded to ``L_pad``;
  their K/V have already been scattered into the paged cache, so the
  kernel reads **only** the cache — full prefill, chunked prefill,
  prefix-cache hits and single-token decode are all the same access
  pattern with different ``query_lens``/``context_lens``.
* Grid ``(batch, num_kv_heads, num_q_blocks)``; each cell computes all
  GQA query heads of one kv head for one q tile, so KV is streamed from
  HBM exactly once per q tile (MXU operands ``(G*BQ, D) x (D, SB)``).
* KV blocks are DMAd from HBM through a two-slot double buffer with
  per-sequence exact trip counts (no padded-block traffic), using the
  scalar-prefetched block table.

Cache layout: ``[num_kv_heads, num_blocks, block_size, head_size]``.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(-2.0**30)  # finite sentinel: avoids -inf - -inf = nan


def _attention_kernel(
    # scalar prefetch
    block_tables_ref,  # [B, max_blocks] SMEM
    context_lens_ref,  # [B] SMEM
    query_lens_ref,  # [B] SMEM
    # inputs
    q_ref,  # [G, BQ, D] VMEM tile
    k_hbm,  # [H, N, bs, D] HBM
    v_hbm,  # [H, N, bs, D] HBM
    # outputs
    o_ref,  # [G, BQ, D] VMEM tile
    # scratch
    k_buf,  # [2, KBLK, bs, D]
    v_buf,  # [2, KBLK, bs, D]
    sem,  # DMA sems [2, 2, KBLK]
    *,
    scale: float,
    block_size: int,
    kblk: int,
    bq: int,
    sliding_window: Optional[int],
    soft_cap: Optional[float],
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    qb = pl.program_id(2)

    g, _, d = q_ref.shape
    sb = kblk * block_size  # kv positions per super-block
    ctx = context_lens_ref[b]
    qlen = query_lens_ref[b]
    q_base = ctx - qlen + qb * bq  # absolute position of q row i=0

    # kv range this q tile can see: [lo, hi)
    hi = jnp.minimum(ctx, q_base + bq)
    lo = jnp.int32(0)
    if sliding_window is not None:
        lo = jnp.maximum(0, q_base - sliding_window + 1)
    first_sb = lo // sb
    nsb = pl.cdiv(hi, sb) - first_sb  # super-block trip count (may be <=0)

    nb = pl.cdiv(ctx, block_size)  # valid block-table entries

    def start_fetch(sb_idx, slot):
        """DMA super-block `sb_idx` (kblk table entries) into buffer."""
        for j in range(kblk):
            entry = sb_idx * kblk + j

            @pl.when(entry < nb)
            def _():
                blk = block_tables_ref[b, entry]
                pltpu.make_async_copy(
                    k_hbm.at[h, blk],
                    k_buf.at[slot, j],
                    sem.at[0, slot, j],
                ).start()
                pltpu.make_async_copy(
                    v_hbm.at[h, blk],
                    v_buf.at[slot, j],
                    sem.at[1, slot, j],
                ).start()

    def wait_fetch(sb_idx, slot):
        for j in range(kblk):
            entry = sb_idx * kblk + j

            @pl.when(entry < nb)
            def _():
                blk = block_tables_ref[b, entry]
                pltpu.make_async_copy(
                    k_hbm.at[h, blk], k_buf.at[slot, j],
                    sem.at[0, slot, j]).wait()
                pltpu.make_async_copy(
                    v_hbm.at[h, blk], v_buf.at[slot, j],
                    sem.at[1, slot, j]).wait()

    is_live = jnp.logical_and(qb * bq < qlen, nsb > 0)

    @pl.when(jnp.logical_not(is_live))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    @pl.when(is_live)
    def _():
        q = q_ref[...].reshape(g * bq, d).astype(jnp.float32) * scale
        # row r of the folded q tile is (head g = r // bq, position
        # q_base + r % bq); precompute per-row absolute positions.
        row = jax.lax.broadcasted_iota(jnp.int32, (g * bq, 1), 0)
        q_pos = q_base + row % bq  # [G*BQ, 1]

        start_fetch(first_sb, 0)

        def body(i, carry):
            m_prev, l_prev, acc = carry
            sb_idx = first_sb + i
            slot = i % 2

            @pl.when(i + 1 < nsb)
            def _():
                start_fetch(sb_idx + 1, (i + 1) % 2)

            wait_fetch(sb_idx, slot)
            k = k_buf[slot].reshape(sb, d).astype(jnp.float32)
            v = v_buf[slot].reshape(sb, d).astype(jnp.float32)
            # Rows past the last fetched block hold garbage (NaN under
            # interpret mode); zero them so 0-weight columns can't poison
            # the p @ v matmul.
            kv_pos_col = sb_idx * sb + jax.lax.broadcasted_iota(
                jnp.int32, (sb, 1), 0)
            valid = kv_pos_col < ctx
            k = jnp.where(valid, k, 0.0)
            v = jnp.where(valid, v, 0.0)

            s = jax.lax.dot_general(
                q, k, (((1, ), (1, )), ((), ())),
                preferred_element_type=jnp.float32)  # [G*BQ, SB]
            if soft_cap is not None:
                s = soft_cap * jnp.tanh(s / soft_cap)

            kv_pos = sb_idx * sb + jax.lax.broadcasted_iota(
                jnp.int32, (1, sb), 1)  # [1, SB]
            mask = (kv_pos <= q_pos) & (kv_pos < ctx)
            if sliding_window is not None:
                mask &= kv_pos > (q_pos - sliding_window)
            s = jnp.where(mask, s, _NEG_INF)

            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new)
            p = jnp.where(mask, p, 0.0)  # kill exp(masked - masked) = 1
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p, v, (((1, ), (0, )), ((), ())),
                preferred_element_type=jnp.float32)
            return m_new, l_new, acc

        m0 = jnp.full((g * bq, 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((g * bq, 1), jnp.float32)
        acc0 = jnp.zeros((g * bq, d), jnp.float32)
        _, l, acc = jax.lax.fori_loop(0, nsb, body, (m0, l0, acc0))

        out = acc / jnp.where(l == 0.0, 1.0, l)
        o_ref[...] = out.reshape(g, bq, d).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window", "soft_cap", "bq", "kblk",
                     "interpret"),
)
def paged_attention(
    q: jax.Array,  # [B, L_pad, num_q_heads, head_size]
    k_cache: jax.Array,  # [H, N, bs, D]
    v_cache: jax.Array,  # [H, N, bs, D]
    block_tables: jax.Array,  # [B, max_blocks] int32
    query_lens: jax.Array,  # [B] int32
    context_lens: jax.Array,  # [B] int32
    *,
    scale: float,
    sliding_window: Optional[int] = None,
    soft_cap: Optional[float] = None,
    bq: int = 128,
    kblk: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Unified paged attention; returns ``[B, L_pad, num_q_heads, D]``."""
    batch, l_pad, num_q_heads, head = q.shape
    num_kv_heads, _, block_size, _ = k_cache.shape
    assert num_q_heads % num_kv_heads == 0
    group = num_q_heads // num_kv_heads
    bq = min(bq, l_pad)

    # [B, L, Hq, D] -> [B, Hkv, G, L, D]
    qr = q.reshape(batch, l_pad, num_kv_heads, group, head)
    qr = qr.transpose(0, 2, 3, 1, 4)

    num_q_blocks = pl.cdiv(l_pad, bq)
    grid = (batch, num_kv_heads, num_q_blocks)

    kernel = functools.partial(
        _attention_kernel,
        scale=scale,
        block_size=block_size,
        kblk=kblk,
        bq=bq,
        sliding_window=sliding_window,
        soft_cap=soft_cap,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, group, bq, head),
                         lambda b, h, qb, *refs: (b, h, 0, qb, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, group, bq, head),
                               lambda b, h, qb, *refs: (b, h, 0, qb, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, kblk, block_size, head), k_cache.dtype),
            pltpu.VMEM((2, kblk, block_size, head), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2, kblk)),
        ],
    )

    def kernel_5d(bt, cl, ql, q5, kc, vc, o5, kb, vb, sm):
        # squeeze the leading (1, 1) block dims for the kernel body
        _attn = functools.partial(kernel, bt, cl, ql)
        _attn(q5.at[0, 0], kc, vc, o5.at[0, 0], kb, vb, sm)

    out = pl.pallas_call(
        kernel_5d,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(qr.shape, q.dtype),
        interpret=interpret,
    )(block_tables, context_lens.astype(jnp.int32),
      query_lens.astype(jnp.int32), qr, k_cache, v_cache)

    # [B, Hkv, G, L, D] -> [B, L, Hq, D]
    out = out.transpose(0, 3, 1, 2, 4)
    return out.reshape(batch, l_pad, num_q_heads, head)


def paged_attention_decode(
    q: jax.Array,  # [B, num_q_heads, head_size]
    k_cache: jax.Array,
    v_cache: jax.Array,
    block_tables: jax.Array,
    context_lens: jax.Array,
    *,
    scale: float,
    sliding_window: Optional[int] = None,
    soft_cap: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    """Decode = the unified kernel with one new token per sequence."""
    batch = q.shape[0]
    out = paged_attention(
        q[:, None],
        k_cache,
        v_cache,
        block_tables,
        jnp.ones((batch, ), jnp.int32),
        context_lens,
        scale=scale,
        sliding_window=sliding_window,
        soft_cap=soft_cap,
        bq=1,
        interpret=interpret,
    )
    return out[:, 0]


def paged_attention_prefill(
    q: jax.Array,  # [B, L_pad, num_q_heads, head_size]
    k_cache: jax.Array,
    v_cache: jax.Array,
    block_tables: jax.Array,
    query_lens: jax.Array,
    context_lens: jax.Array,
    *,
    scale: float,
    sliding_window: Optional[int] = None,
    soft_cap: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    return paged_attention(
        q,
        k_cache,
        v_cache,
        block_tables,
        query_lens,
        context_lens,
        scale=scale,
        sliding_window=sliding_window,
        soft_cap=soft_cap,
        interpret=interpret,
    )
