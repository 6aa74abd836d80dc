"""Vocab embedding + LM head, SPMD over the "model" mesh axis.

Reference: ``vllm/model_executor/layers/vocab_parallel_embedding.py``
(masked lookup + all-reduce :89-107, ParallelLMHead :117) and
``layers/logits_processor.py`` (TP gather :81). Model code runs inside
``shard_map``, so these are the per-shard formulations: the weight is
vocab-sharded, lookups mask out-of-shard ids and psum, logits all-gather
over the vocab axis.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

# Vocab padded to a multiple of this so shards divide evenly (reference
# pads to 64; 128 matches the TPU lane width).
VOCAB_PAD_TO = 128

MODEL_AXIS = "model"


def embed(params, token_ids: jax.Array, tp_size: int = 1) -> jax.Array:
    """Sharded-vocab lookup: ids [T] -> [T, hidden] (psum over shards).
    tp_size == 1 statically elides the masked-lookup + collective."""
    weight = params["weight"]  # [V_local, H]
    if tp_size == 1:
        return jnp.take(weight, token_ids, axis=0)
    v_local = weight.shape[0]
    rank = jax.lax.axis_index(MODEL_AXIS)
    local = token_ids - rank * v_local
    valid = (local >= 0) & (local < v_local)
    gathered = jnp.take(weight, jnp.clip(local, 0, v_local - 1), axis=0)
    gathered = jnp.where(valid[:, None], gathered, 0)
    return jax.lax.psum(gathered, MODEL_AXIS)


def compute_logits(params,
                   hidden: jax.Array,
                   *,
                   logit_scale: float = 1.0,
                   soft_cap: Optional[float] = None,
                   tp_size: int = 1) -> jax.Array:
    """[T, hidden] -> [T, vocab_padded] f32 via all-gather over vocab
    shards (the reference gathers to the driver rank instead)."""
    logits_local = jnp.dot(hidden, params["weight"].T,
                           preferred_element_type=jnp.float32)
    if tp_size > 1:
        logits = jax.lax.all_gather(logits_local, MODEL_AXIS, axis=1,
                                    tiled=True)
    else:
        logits = logits_local
    if "bias" in params:  # GPT-J / Phi lm_head carries a bias
        logits = logits + params["bias"].astype(jnp.float32)
    if logit_scale != 1.0:
        logits = logits * logit_scale
    if soft_cap is not None:
        logits = soft_cap * jnp.tanh(logits / soft_cap)
    return logits


def partition_specs() -> dict:
    return {"weight": P("model", None)}
