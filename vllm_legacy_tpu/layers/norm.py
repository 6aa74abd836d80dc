"""Normalization layers (reference: vllm/model_executor/layers/
layernorm.py RMSNorm :10, fused residual add — here plain jnp that XLA
fuses into neighbouring ops; no hand kernel needed on TPU)."""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array,
             weight: jax.Array,
             *,
             eps: float = 1e-6,
             residual: Optional[jax.Array] = None):
    """RMSNorm; with ``residual`` returns (normed, x+residual) like the
    reference's fused_add_rms_norm."""
    orig_dtype = x.dtype
    if residual is not None:
        x = x + residual
        residual = x
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    out = (normed * weight.astype(jnp.float32)).astype(orig_dtype)
    if residual is not None:
        return out, residual
    return out


def layer_norm(x: jax.Array,
               weight: Optional[jax.Array],
               bias: Optional[jax.Array] = None,
               *,
               eps: float = 1e-5) -> jax.Array:
    """weight=None -> non-parametric LayerNorm (OLMo)."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(orig_dtype)
