"""KV-cache block ops: scatter-write, block copy, host swap.

TPU-native equivalents of the reference's ``csrc/cache_kernels.cu``
(``reshape_and_cache``, ``copy_blocks``, ``swap_blocks``). On TPU these
are XLA scatters/gathers over functionally-updated arrays — the engine
donates the cache buffers into the jitted step so XLA performs them in
place.

Cache layout — ONE stacked array pair for the whole model, block-major:

    k_cache, v_cache: [num_layers, num_blocks, num_kv_heads,
                       block_size, head_size]

Stacking matters: per-layer cache arrays would mean 2*L donated HBM
buffers feeding 2*L Pallas attention reads per step, which degrades
XLA/runtime buffer aliasing catastrophically (measured seconds per step
on v5e); two big buffers alias cleanly. Block-major with heads INSIDE
the block so a Pallas grid cell streams one contiguous
``[Hkv, block_size, head_size]`` slab per block-table entry — all kv
heads in one DMA (4-32x fewer, larger DMAs than a head-major layout;
DMA-issue overhead dominated decode otherwise).

The 4D per-layer view ``k_cache[layer]`` is what the attention kernel
consumes (a static-index slice — no copy).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def write_to_kv_cache(
    key: jax.Array,  # [T, num_kv_heads, head_size]
    value: jax.Array,  # [T, num_kv_heads, head_size]
    k_cache: jax.Array,  # [L, N, H, bs, D] stacked or [N, H, bs, D]
    v_cache: jax.Array,
    slot_mapping: jax.Array,  # [T] int32; flat slot = block*bs + off; <0 pad
    layer_idx: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Scatter new K/V rows into the paged cache (one layer).

    Padding tokens carry a negative slot and are dropped by the scatter
    (``mode="drop"``), replacing the reference's trash-slot convention
    (vllm's slot_mapping pad, worker/model_runner.py:380).
    """
    stacked = k_cache.ndim == 5
    if stacked:
        assert layer_idx is not None
        _, num_blocks, _, block_size, _ = k_cache.shape
    else:
        num_blocks, _, block_size, _ = k_cache.shape

    # Clamp negatives to an out-of-range block so "drop" removes them.
    blk = jnp.where(slot_mapping < 0, num_blocks,
                    slot_mapping // block_size)
    off = jnp.where(slot_mapping < 0, 0, slot_mapping % block_size)
    kt = key.astype(k_cache.dtype)  # [T, H, D]
    vt = value.astype(v_cache.dtype)
    if stacked:
        k_cache = k_cache.at[layer_idx, blk, :, off, :].set(kt,
                                                            mode="drop")
        v_cache = v_cache.at[layer_idx, blk, :, off, :].set(vt,
                                                            mode="drop")
    else:
        k_cache = k_cache.at[blk, :, off, :].set(kt, mode="drop")
        v_cache = v_cache.at[blk, :, off, :].set(vt, mode="drop")
    return k_cache, v_cache


def copy_one(cache: jax.Array, src_blocks: jax.Array,
             dst_blocks: jax.Array) -> jax.Array:
    """Copy-on-write block duplication for one cache array (fused
    single-buffer or either half of a split pair); layout-agnostic —
    blocks live on dim 1."""
    return cache.at[:, dst_blocks].set(cache[:, src_blocks])


def copy_blocks(
    k_cache: jax.Array,  # [L, N, H, bs, D]
    v_cache: jax.Array,
    src_blocks: jax.Array,  # [P] int32
    dst_blocks: jax.Array,  # [P] int32
) -> Tuple[jax.Array, jax.Array]:
    """Copy-on-write block duplication across all layers (reference:
    cache_kernels.cu copy_blocks)."""
    return (copy_one(k_cache, src_blocks, dst_blocks),
            copy_one(v_cache, src_blocks, dst_blocks))


def gather_blocks(cache: jax.Array, blocks: jax.Array) -> jax.Array:
    """[L, N, H, bs, D] + [P] -> [L, P, H, bs, D] (for swap-out)."""
    return cache[:, blocks]


def scatter_blocks(cache: jax.Array, blocks_data: jax.Array,
                   dst_blocks: jax.Array) -> jax.Array:
    """Insert [L, P, H, bs, D] at block ids (for swap-in)."""
    return cache.at[:, dst_blocks].set(blocks_data.astype(cache.dtype))
