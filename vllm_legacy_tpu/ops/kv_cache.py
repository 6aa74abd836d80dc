"""KV-cache block ops: scatter-write, block copy, host swap.

TPU-native equivalents of the reference's ``csrc/cache_kernels.cu``
(``reshape_and_cache``, ``copy_blocks``, ``swap_blocks``). On TPU these are
XLA scatters/gathers over functionally-updated arrays — the engine donates
the cache buffers into the jitted step so XLA performs them in place.

Cache layout (one pair of arrays per decoder layer):

    k_cache, v_cache: [num_kv_heads, num_blocks, block_size, head_size]

kv-head-major so a Pallas grid cell working on one kv head DMAs a
contiguous ``(block_size, head_size)`` tile per block-table entry.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp


def write_to_kv_cache(
    key: jax.Array,  # [T, num_kv_heads, head_size]
    value: jax.Array,  # [T, num_kv_heads, head_size]
    k_cache: jax.Array,  # [H, N, bs, D]
    v_cache: jax.Array,  # [H, N, bs, D]
    slot_mapping: jax.Array,  # [T] int32; flat slot = block*bs + off; <0 pad
) -> Tuple[jax.Array, jax.Array]:
    """Scatter new K/V rows into the paged cache.

    Padding tokens carry a negative slot and are dropped by the scatter
    (``mode="drop"``), replacing the reference's trash-slot convention
    (vllm's slot_mapping pad, worker/model_runner.py:380).
    """
    num_heads, num_blocks, block_size, head_size = k_cache.shape
    kt = key.swapaxes(0, 1).astype(k_cache.dtype)  # [H, T, D]
    vt = value.swapaxes(0, 1).astype(v_cache.dtype)
    k_flat = k_cache.reshape(num_heads, num_blocks * block_size, head_size)
    v_flat = v_cache.reshape(num_heads, num_blocks * block_size, head_size)
    # Clamp negatives to an out-of-range index so "drop" removes them.
    slots = jnp.where(slot_mapping < 0, num_blocks * block_size,
                      slot_mapping)
    k_flat = k_flat.at[:, slots, :].set(kt, mode="drop")
    v_flat = v_flat.at[:, slots, :].set(vt, mode="drop")
    return (k_flat.reshape(k_cache.shape), v_flat.reshape(v_cache.shape))


def copy_blocks(
    kv_caches: List[Tuple[jax.Array, jax.Array]],
    src_blocks: jax.Array,  # [P] int32
    dst_blocks: jax.Array,  # [P] int32
) -> List[Tuple[jax.Array, jax.Array]]:
    """Copy-on-write block duplication across all layers (reference:
    cache_kernels.cu copy_blocks). ``src/dst`` may be empty."""
    out = []
    for k_cache, v_cache in kv_caches:
        k_cache = k_cache.at[:, dst_blocks].set(k_cache[:, src_blocks])
        v_cache = v_cache.at[:, dst_blocks].set(v_cache[:, src_blocks])
        out.append((k_cache, v_cache))
    return out


def swap_blocks(
    src_cache: jax.Array,
    dst_cache: jax.Array,
    src_blocks: jax.Array,
    dst_blocks: jax.Array,
) -> jax.Array:
    """Move blocks between cache tiers (HBM <-> host). The caller places
    src/dst on their devices; XLA emits the transfer (reference:
    cache_kernels.cu swap_blocks)."""
    gathered = src_cache[:, src_blocks]
    return dst_cache.at[:, dst_blocks].set(gathered.astype(dst_cache.dtype))
