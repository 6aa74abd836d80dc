"""Hidden-state pooling for embedding models (reference:
vllm/model_executor/layers/pooler.py Pooler :19 — LAST/ALL/CLS pooling
+ optional L2 normalize). Batched over the padded [B, L, H] prefill
layout with per-row query lengths instead of the reference's flat
prompt-lens split."""
from __future__ import annotations

import enum

import jax
import jax.numpy as jnp


class PoolingType(enum.IntEnum):
    LAST = 0
    MEAN = 1
    CLS = 2


def pool(
    hidden: jax.Array,  # [B, L, H] prefill hidden states
    query_lens: jax.Array,  # [B] valid tokens per row
    pooling_type: PoolingType = PoolingType.LAST,
    normalize: bool = True,
) -> jax.Array:
    """Returns [B, H] pooled (optionally unit-norm) embeddings."""
    b, l, h = hidden.shape
    if pooling_type == PoolingType.LAST:
        idx = jnp.clip(query_lens - 1, 0, l - 1)
        out = jnp.take_along_axis(hidden, idx[:, None, None], axis=1)
        out = out[:, 0]
    elif pooling_type == PoolingType.CLS:
        out = hidden[:, 0]
    else:  # MEAN
        mask = (jnp.arange(l)[None, :] < query_lens[:, None])[..., None]
        s = jnp.sum(jnp.where(mask, hidden, 0.0), axis=1)
        out = s / jnp.maximum(query_lens[:, None], 1).astype(s.dtype)
    out = out.astype(jnp.float32)
    if normalize:
        out = out / jnp.maximum(
            jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
    return out
