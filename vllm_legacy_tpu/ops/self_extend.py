"""Self-extend RoPE: grouped relative positions for long context.

Capability of the reference fork's ``rope_method='self_extend'``
(models/llama.py:172-182, attention/backends/hip.py:109-113 SE_SCALE /
SE_WINDOW; the "LongLM" self-extend scheme): pairs closer than
``window`` attend with ordinary RoPE distances, farther pairs with
group-quantized distances, letting a model trained to L positions serve
G*L context with no tuning.

TPU-first design: the cache stores UNROTATED keys and rotation happens
inside the attention op from *relative* positions (RoPE's shift
equivariance: score depends only on i - j). Each pass is still one MXU
matmul — normal-distance scores and grouped-distance scores are computed
from two rotated copies and merged by the window predicate; cos/sin come
from on-the-fly ``pos * inv_freq`` (no [max_pos, D] table in VMEM).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class SelfExtendSpec(NamedTuple):
    window: int  # neighbor width using exact distances (SE_WINDOW)
    group: int  # distance quantization for far pairs (SE_SCALE)
    rotary_dim: int
    rope_base: float = 10000.0
    neox: bool = True


def inv_freq_array(spec: SelfExtendSpec) -> np.ndarray:
    rd = spec.rotary_dim
    return (1.0 / (spec.rope_base
                   **(np.arange(0, rd, 2, dtype=np.float64) /
                      rd))).astype(np.float32)


def rope_rows(x: jax.Array, pos: jax.Array, inv_freq: jax.Array,
              rotary_dim: int, neox: bool = True) -> jax.Array:
    """Rotate rows of ``x [..., R, D]`` by positions ``pos [..., R]``.

    D may exceed rotary_dim (lane-padded caches); the tail passes
    through. Head dims broadcast: x [..., R, D] with shared pos.
    """
    angles = pos[..., None].astype(jnp.float32) * inv_freq  # [..., R, rd/2]
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    rot = x[..., :rotary_dim].astype(jnp.float32)
    pas = x[..., rotary_dim:]
    half = rotary_dim // 2
    if neox:
        x1, x2 = rot[..., :half], rot[..., half:]
        out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                              axis=-1)
    else:
        x1, x2 = rot[..., 0::2], rot[..., 1::2]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.stack([o1, o2], axis=-1).reshape(rot.shape)
    out = out.astype(x.dtype)
    if pas.shape[-1]:
        out = jnp.concatenate([out, pas.astype(x.dtype)], axis=-1)
    return out


def grouped_q_pos(q_pos: jax.Array, spec: SelfExtendSpec) -> jax.Array:
    """Query positions for the grouped pass: aligned so that at the
    window boundary the grouped distance continues the normal one."""
    w, g = spec.window, spec.group
    return q_pos // g + (w - w // g)


def grouped_k_pos(kv_pos: jax.Array, spec: SelfExtendSpec) -> jax.Array:
    return kv_pos // spec.group
