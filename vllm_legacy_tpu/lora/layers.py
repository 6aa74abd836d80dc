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
    # batched over slots: [S, T, r] rank activations need only ONE
    # psum for row layers (not one per slot on the decode critical
    # path); the per-token slot select is a masked sum at the end.
    rank_act = jnp.einsum("ti,sir->str", x, lora_a,
                          preferred_element_type=jnp.float32)
    if mode == "row" and tp_size > 1:
        rank_act = jax.lax.psum(rank_act, axis)
    deltas = jnp.einsum("str,sro->sto", rank_act, lora_b,
                        preferred_element_type=jnp.float32)
    deltas = deltas * scaling[:, None, None]
    num_slots = lora_a.shape[0]
    onehot = (indices[None, :] == jnp.arange(num_slots)[:, None]
              ).astype(jnp.float32)  # [S, T]
    delta = jnp.einsum("st,sto->to", onehot, deltas)
    return base_out + delta.astype(base_out.dtype)
