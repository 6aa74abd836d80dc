"""Batched LoRA application (reference: vllm/lora/layers.py +
punica.py dispatch_bgmv — here a dense masked loop over slots, see
package docstring)."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def apply_lora(
    x: jax.Array,  # [T, in]
    base_out: jax.Array,  # [T, out]
    lora_a: jax.Array,  # [S, in, r]
    lora_b: jax.Array,  # [S, r, out]
    scaling: jax.Array,  # [S] f32 (alpha / r per slot; 0 = empty slot)
    indices: jax.Array,  # [T] int32 slot per token; -1 = no adapter
) -> jax.Array:
    """base_out + scaling[i] * (x @ A_i) @ B_i per token row."""
    num_slots = lora_a.shape[0]
    out = base_out
    for s in range(num_slots):
        mask = (indices == s)[:, None]
        delta = jnp.dot(
            jnp.dot(x, lora_a[s], preferred_element_type=jnp.float32),
            lora_b[s], preferred_element_type=jnp.float32)
        out = out + (jnp.where(mask, delta, 0.0) *
                     scaling[s]).astype(out.dtype)
    return out
