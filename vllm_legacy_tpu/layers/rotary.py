"""Rotary position embeddings.

Capability parity with the reference's ``vllm/model_executor/layers/
rotary_embedding.py`` (base :47, linear scaling :192, dynamic NTK :278,
YaRN :359) — computed as a jittable gather of a precomputed cos/sin cache
fused by XLA into the surrounding matmuls (replaces the fused CUDA rope,
csrc/pos_encoding_kernels.cu).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def compute_inv_freq(rotary_dim: int, base: float) -> np.ndarray:
    return 1.0 / (base**(np.arange(0, rotary_dim, 2, dtype=np.float64) /
                         rotary_dim))


def _yarn_find_dim(num_rot: float, rotary_dim: int, base: float,
                   max_pos: int) -> float:
    return (rotary_dim * math.log(max_pos / (num_rot * 2 * math.pi)) /
            (2 * math.log(base)))


def build_cos_sin_cache(
    head_size: int,
    rotary_dim: int,
    max_position: int,
    base: float,
    rope_scaling: Optional[Dict[str, Any]] = None,
) -> np.ndarray:
    """Precompute [max_position, rotary_dim] cos||sin table (float32).

    Scaling styles supported: linear, dynamic (NTK), yarn, llama3 —
    covering the reference's rotary_embedding.py styles that apply to the
    model families served here.
    """
    scaling_type = (rope_scaling or {}).get("rope_type",
                                            (rope_scaling
                                             or {}).get("type", None))
    factor = float((rope_scaling or {}).get("factor", 1.0))
    t_max = max_position
    mscale = 1.0

    if scaling_type == "linear":
        t_max = int(max_position * factor)
        t = np.arange(t_max, dtype=np.float64) / factor
        inv_freq = compute_inv_freq(rotary_dim, base)
    elif scaling_type == "dynamic":
        t_max = int(max_position * factor)
        adj_base = base * ((factor * t_max / max_position) -
                           (factor - 1))**(rotary_dim / (rotary_dim - 2))
        t = np.arange(t_max, dtype=np.float64)
        inv_freq = compute_inv_freq(rotary_dim, adj_base)
    elif scaling_type == "yarn":
        orig_max = int((rope_scaling or {}).get(
            "original_max_position_embeddings", max_position))
        t_max = int(orig_max * factor)
        beta_fast = float((rope_scaling or {}).get("beta_fast", 32))
        beta_slow = float((rope_scaling or {}).get("beta_slow", 1))
        lo = max(
            math.floor(_yarn_find_dim(beta_fast, rotary_dim, base,
                                      orig_max)), 0)
        hi = min(
            math.ceil(_yarn_find_dim(beta_slow, rotary_dim, base,
                                     orig_max)), rotary_dim - 1)
        inv_freq = compute_inv_freq(rotary_dim, base)
        inv_freq_inter = inv_freq / factor
        ramp = (np.arange(rotary_dim // 2, dtype=np.float64) - lo) / max(
            hi - lo, 0.001)
        mask = 1.0 - np.clip(ramp, 0, 1)
        inv_freq = inv_freq_inter * (1 - mask) + inv_freq * mask
        t = np.arange(t_max, dtype=np.float64)
        attn_factor = float((rope_scaling or {}).get("attn_factor", 1.0))
        mscale = (0.1 * math.log(factor) + 1.0) * attn_factor \
            if factor > 1.0 else attn_factor
    elif scaling_type == "llama3":
        low_factor = float((rope_scaling or {}).get("low_freq_factor", 1.0))
        high_factor = float((rope_scaling or {}).get(
            "high_freq_factor", 4.0))
        orig_max = int((rope_scaling or {}).get(
            "original_max_position_embeddings", 8192))
        inv_freq = compute_inv_freq(rotary_dim, base)
        wavelen = 2 * math.pi / inv_freq
        low_wl = orig_max / low_factor
        high_wl = orig_max / high_factor
        new_freq = np.where(wavelen > low_wl, inv_freq / factor, inv_freq)
        smooth = (orig_max / wavelen - low_factor) / (high_factor -
                                                      low_factor)
        mid = (1 - smooth) * new_freq / factor + smooth * new_freq
        inv_freq = np.where((wavelen >= high_wl) & (wavelen <= low_wl), mid,
                            new_freq)
        t = np.arange(t_max, dtype=np.float64)
    elif scaling_type in ("su", "longrope"):
        # Phi-3 su-scaled rope (reference: rotary_embedding.py
        # Phi3SuScaledRotaryEmbedding :422): per-dim long/short factors;
        # positions < original_max use the short factors.
        orig_max = int((rope_scaling or {}).get(
            "original_max_position_embeddings", max_position))
        short = np.asarray((rope_scaling or {}).get(
            "short_factor", [1.0] * (rotary_dim // 2)), np.float64)
        long = np.asarray((rope_scaling or {}).get(
            "long_factor", [1.0] * (rotary_dim // 2)), np.float64)
        scale = max_position / orig_max
        if scale <= 1.0:
            mscale = 1.0
        else:
            mscale = math.sqrt(1 + math.log(scale) / math.log(orig_max))
        inv_short = compute_inv_freq(rotary_dim, base) / short
        inv_long = compute_inv_freq(rotary_dim, base) / long
        t = np.arange(t_max, dtype=np.float64)
        freqs_s = np.einsum("i,j->ij", t, inv_short)
        freqs_l = np.einsum("i,j->ij", t, inv_long)
        freqs = np.where(t[:, None] < orig_max, freqs_s, freqs_l)
        cos = np.cos(freqs) * mscale
        sin = np.sin(freqs) * mscale
        return np.concatenate([cos, sin], axis=-1).astype(np.float32)
    else:
        t = np.arange(t_max, dtype=np.float64)
        inv_freq = compute_inv_freq(rotary_dim, base)

    freqs = np.einsum("i,j->ij", t, inv_freq)
    cos = np.cos(freqs) * mscale
    sin = np.sin(freqs) * mscale
    return np.concatenate([cos, sin], axis=-1).astype(np.float32)


def apply_rope(
    q: jax.Array,  # [T, num_q_heads, head]
    k: jax.Array,  # [T, num_kv_heads, head]
    positions: jax.Array,  # [T] int32
    cos_sin_cache: jax.Array,  # [max_pos, rotary_dim]
    *,
    rotary_dim: int,
    is_neox_style: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Apply rotary embedding at gathered positions (NeoX or GPT-J
    interleave, matching csrc/pos_encoding_kernels.cu semantics)."""
    cs = cos_sin_cache[positions]  # [T, rotary_dim]
    cos, sin = jnp.split(cs, 2, axis=-1)  # [T, rd/2] each
    cos = cos[:, None, :]
    sin = sin[:, None, :]

    def rotate(x: jax.Array) -> jax.Array:
        rot, pas = x[..., :rotary_dim], x[..., rotary_dim:]
        if is_neox_style:
            x1, x2 = jnp.split(rot, 2, axis=-1)
            o1 = x1 * cos - x2 * sin
            o2 = x2 * cos + x1 * sin
            out = jnp.concatenate([o1, o2], axis=-1)
        else:
            x1 = rot[..., 0::2]
            x2 = rot[..., 1::2]
            o1 = x1 * cos - x2 * sin
            o2 = x2 * cos + x1 * sin
            out = jnp.stack([o1, o2], axis=-1).reshape(rot.shape)
        if pas.shape[-1]:
            out = jnp.concatenate([out, pas], axis=-1)
        return out.astype(x.dtype)

    return rotate(q), rotate(k)
