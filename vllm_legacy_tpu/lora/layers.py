"""Batched LoRA application (reference: vllm/lora/layers.py +
punica.py dispatch_bgmv — here a dense masked loop over slots, see
package docstring)."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def apply_lora(
    x: jax.Array,  # [T, in((local for row layers))]
    base_out: jax.Array,  # [T, out]
    lora_a: jax.Array,  # [S, in, r] (in sharded for row layers)
    lora_b: jax.Array,  # [S, r, out] (out sharded for column layers)
    scaling: jax.Array,  # [S] f32 (alpha / r per slot; 0 = empty slot)
    indices: jax.Array,  # [T] int32 slot per token; -1 = no adapter
    *,
    mode: str = "column",
    tp_size: int = 1,
    axis: str = "model",
) -> jax.Array:
    """base_out + scaling[i] * (x @ A_i) @ B_i per token row.

    Under tensor parallelism the adapter shards like the base weight
    (reference: lora/fully_sharded_layers.py): column layers shard B on
    the output dim (delta lands shard-local), row layers shard A on the
    contraction dim — the rank-space activations psum before B.
    """
    num_slots = lora_a.shape[0]
    out = base_out
    for s in range(num_slots):
        mask = (indices == s)[:, None]
        rank_act = jnp.dot(x, lora_a[s],
                           preferred_element_type=jnp.float32)
        if mode == "row" and tp_size > 1:
            rank_act = jax.lax.psum(rank_act, axis)
        delta = jnp.dot(rank_act, lora_b[s],
                        preferred_element_type=jnp.float32)
        out = out + (jnp.where(mask, delta, 0.0) *
                     scaling[s]).astype(out.dtype)
    return out
