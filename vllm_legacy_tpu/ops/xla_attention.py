"""Pure-XLA paged attention — reference implementation & CPU fallback.

Numerically-transparent equivalents of the Pallas kernels in
``ops/pallas/``; the kernel tests assert the Pallas outputs match these
(mirroring how the reference tests CUDA kernels against naive torch,
e.g. tests/kernels/test_attention.py ref_single_query_cached_kv_attention).

Shared conventions:

* q/k/v head layout ``[..., num_heads, head_size]``; GQA ratio
  ``num_q_heads // num_kv_heads`` handled inside.
* KV cache per layer: ``[num_kv_heads, num_blocks, block_size, head_size]``.
* ``context_lens[b]`` = total KV length of sequence b INCLUDING any new
  tokens already written this step.
* padded block-table entries may hold any valid block id (masked out).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = float("-inf")


def _apply_soft_cap(s: jax.Array, soft_cap: Optional[float]) -> jax.Array:
    if soft_cap is None:
        return s
    return soft_cap * jnp.tanh(s / soft_cap)


def _gather_kv(cache: jax.Array, block_table: jax.Array) -> jax.Array:
    """[H, N, bs, D] + [max_blocks] -> [H, max_blocks*bs, D]."""
    num_heads, _, block_size, head_size = cache.shape
    g = cache[:, block_table]  # [H, max_blocks, bs, D]
    return g.reshape(num_heads, -1, head_size)


def paged_attention_decode(
    q: jax.Array,  # [B, num_q_heads, head_size]
    k_cache: jax.Array,  # [H, N, bs, D]
    v_cache: jax.Array,  # [H, N, bs, D]
    block_tables: jax.Array,  # [B, max_blocks] int32
    context_lens: jax.Array,  # [B] int32
    *,
    scale: float,
    sliding_window: Optional[int] = None,
    soft_cap: Optional[float] = None,
) -> jax.Array:
    """Single-token-per-sequence attention over the paged KV cache
    (capability of the reference's paged_attention_v1/v2,
    csrc/attention/attention_kernels.cu)."""
    num_q_heads = q.shape[1]
    num_kv_heads = k_cache.shape[0]
    group = num_q_heads // num_kv_heads
    max_len = block_tables.shape[1] * k_cache.shape[2]

    def one_seq(q_b, table_b, ctx_b):
        k = _gather_kv(k_cache, table_b).astype(jnp.float32)
        v = _gather_kv(v_cache, table_b).astype(jnp.float32)
        # [Hq, D] x [Hkv, L, D]: fold GQA by reshaping q to [Hkv, G, D].
        qg = q_b.reshape(num_kv_heads, group, -1).astype(jnp.float32)
        s = jnp.einsum("hgd,hld->hgl", qg * scale, k)
        s = _apply_soft_cap(s, soft_cap)
        pos = jnp.arange(max_len)
        mask = pos < ctx_b
        if sliding_window is not None:
            mask &= pos >= (ctx_b - sliding_window)
        s = jnp.where(mask[None, None, :], s, _NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("hgl,hld->hgd", p, v)
        return o.reshape(num_q_heads, -1)

    out = jax.vmap(one_seq)(q, block_tables, context_lens)
    return out.astype(q.dtype)


def paged_attention_prefill(
    q: jax.Array,  # [B, L_pad, num_q_heads, head_size]
    k_cache: jax.Array,  # [H, N, bs, D]
    v_cache: jax.Array,  # [H, N, bs, D]
    block_tables: jax.Array,  # [B, max_blocks] int32
    query_lens: jax.Array,  # [B] int32 — new tokens this step
    context_lens: jax.Array,  # [B] int32 — total KV len incl. new tokens
    *,
    scale: float,
    sliding_window: Optional[int] = None,
    soft_cap: Optional[float] = None,
) -> jax.Array:
    """Causal prefill attention reading KV from the paged cache.

    Because new K/V are written to the cache *before* attention, one op
    covers full prefill, chunked prefill and prefix-cache hits — the
    capability of the reference's flash_attn_varlen + Triton
    context_attention_fwd (vllm/attention/ops/prefix_prefill.py) in a
    single code path. Query i of sequence b sits at absolute position
    ``context_lens[b] - query_lens[b] + i`` and attends to all positions
    <= its own.
    """
    _, l_pad, num_q_heads, _ = q.shape
    num_kv_heads = k_cache.shape[0]
    group = num_q_heads // num_kv_heads
    max_len = block_tables.shape[1] * k_cache.shape[2]

    def one_seq(q_b, table_b, qlen_b, ctx_b):
        k = _gather_kv(k_cache, table_b).astype(jnp.float32)
        v = _gather_kv(v_cache, table_b).astype(jnp.float32)
        qg = q_b.reshape(l_pad, num_kv_heads, group, -1).astype(jnp.float32)
        s = jnp.einsum("ihgd,hld->hgil", qg * scale, k)
        s = _apply_soft_cap(s, soft_cap)
        q_pos = ctx_b - qlen_b + jnp.arange(l_pad)  # absolute positions
        kv_pos = jnp.arange(max_len)
        mask = kv_pos[None, :] <= q_pos[:, None]
        mask &= kv_pos[None, :] < ctx_b
        if sliding_window is not None:
            mask &= kv_pos[None, :] >= (q_pos[:, None] - sliding_window + 1)
        s = jnp.where(mask[None, None, :, :], s, _NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        # Padded query rows (i >= qlen_b) have all-(-inf) rows only when
        # ctx_b < their position — softmax of all -inf is nan; zero them.
        o = jnp.einsum("hgil,hld->ihgd", p, v)
        valid_q = (jnp.arange(l_pad) < qlen_b)[:, None, None, None]
        o = jnp.where(valid_q, o, 0.0)
        return o.reshape(l_pad, num_q_heads, -1)

    out = jax.vmap(one_seq)(q, block_tables, query_lens, context_lens)
    return jnp.nan_to_num(out).astype(q.dtype)
