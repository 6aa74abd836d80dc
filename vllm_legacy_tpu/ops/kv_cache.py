"""KV-cache block ops: scatter-write, block copy, host swap.

TPU-native equivalents of the reference's ``csrc/cache_kernels.cu``
(``reshape_and_cache``, ``copy_blocks``, ``swap_blocks``). On TPU these
are XLA scatters/gathers over functionally-updated arrays — the engine
donates the cache buffers into the jitted step so XLA performs them in
place.

Cache layout — ONE stacked array pair for the whole model:

    k_cache, v_cache: [num_layers, num_kv_heads, num_blocks,
                       block_size, head_size]

Stacking matters: per-layer cache arrays would mean 2*L donated HBM
buffers feeding 2*L Pallas attention reads per step, which degrades
XLA/runtime buffer aliasing catastrophically (measured seconds per step
on v5e); two big buffers alias cleanly. kv-head-major within a layer so
a Pallas grid cell working on one kv head DMAs a contiguous
``(block_size, head_size)`` tile per block-table entry.

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
    k_cache: jax.Array,  # [L, H, N, bs, D] stacked or [H, N, bs, D]
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
        layers, num_heads, num_blocks, block_size, head_size = \
            k_cache.shape
    else:
        num_heads, num_blocks, block_size, head_size = k_cache.shape

    kt = key.swapaxes(0, 1).astype(k_cache.dtype)  # [H, T, D]
    vt = value.swapaxes(0, 1).astype(v_cache.dtype)
    # Clamp negatives to an out-of-range index so "drop" removes them.
    slots = jnp.where(slot_mapping < 0, num_blocks * block_size,
                      slot_mapping)
    if stacked:
        k_flat = k_cache.reshape(layers, num_heads,
                                 num_blocks * block_size, head_size)
        v_flat = v_cache.reshape(layers, num_heads,
                                 num_blocks * block_size, head_size)
        # advanced-index slots between slices -> update shape [T, H, D]
        k_flat = k_flat.at[layer_idx, :, slots, :].set(
            key.astype(k_cache.dtype), mode="drop")
        v_flat = v_flat.at[layer_idx, :, slots, :].set(
            value.astype(v_cache.dtype), mode="drop")
    else:
        k_flat = k_cache.reshape(num_heads, num_blocks * block_size,
                                 head_size)
        v_flat = v_cache.reshape(num_heads, num_blocks * block_size,
                                 head_size)
        k_flat = k_flat.at[:, slots, :].set(kt, mode="drop")
        v_flat = v_flat.at[:, slots, :].set(vt, mode="drop")
    return (k_flat.reshape(k_cache.shape), v_flat.reshape(v_cache.shape))


def copy_blocks(
    k_cache: jax.Array,  # [L, H, N, bs, D]
    v_cache: jax.Array,
    src_blocks: jax.Array,  # [P] int32
    dst_blocks: jax.Array,  # [P] int32
) -> Tuple[jax.Array, jax.Array]:
    """Copy-on-write block duplication across all layers (reference:
    cache_kernels.cu copy_blocks)."""
    k_cache = k_cache.at[:, :, dst_blocks].set(k_cache[:, :, src_blocks])
    v_cache = v_cache.at[:, :, dst_blocks].set(v_cache[:, :, src_blocks])
    return k_cache, v_cache


def gather_blocks(cache: jax.Array, blocks: jax.Array) -> jax.Array:
    """[L, H, N, bs, D] + [P] -> [L, H, P, bs, D] (for swap-out)."""
    return cache[:, :, blocks]


def scatter_blocks(cache: jax.Array, blocks_data: jax.Array,
                   dst_blocks: jax.Array) -> jax.Array:
    """Insert [L, H, P, bs, D] at block ids (for swap-in)."""
    return cache.at[:, :, dst_blocks].set(
        blocks_data.astype(cache.dtype))
