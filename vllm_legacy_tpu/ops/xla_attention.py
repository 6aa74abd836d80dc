"""Pure-XLA paged attention — reference implementation & CPU fallback.

Numerically-transparent equivalent of the fused Pallas kernel in
``ops/pallas/paged_attention.py`` (same API: cache write + attention in
one call over the stacked cache); kernel tests assert the Pallas outputs
match these (mirroring the reference's CUDA-vs-naive-torch pattern,
tests/kernels/test_attention.py).

Conventions shared with the kernel:

* q/k/v head layout ``[..., num_heads, head_size]``.
* Stacked block-major cache ``[num_layers, num_blocks, num_kv_heads,
  block_size, head_size]``; ``layer_idx`` selects the layer.
* ``context_lens[b]`` = total KV length of sequence b INCLUDING the new
  tokens written this call.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_NEG_INF = float("-inf")


def _apply_soft_cap(s: jax.Array, soft_cap: Optional[float]) -> jax.Array:
    if soft_cap is None:
        return s
    return soft_cap * jnp.tanh(s / soft_cap)


def _split_fused(kv: jax.Array, num_kv_heads: int):
    """FUSED cache -> per-token 5-D (k, v) views.

    [L, N, Hkv*2*(bs/2), 2d] pair rows or [L, N, Hkv*2, bs, dpad]
    plain rows; per head K rows then V rows, tokens consecutive, so a
    plain reshape to [L, N, Hkv, 2, bs, d] separates them."""
    lnum, nblk = kv.shape[:2]
    if kv.ndim == 4:
        bs = kv.shape[2] // num_kv_heads
        d_eff = kv.shape[3] // 2
    else:
        bs, d_eff = kv.shape[3], kv.shape[4]
    v6 = kv.reshape(lnum, nblk, num_kv_heads, 2, bs, d_eff)
    return v6[:, :, :, 0], v6[:, :, :, 1]


def _join_fused(k5: jax.Array, v5: jax.Array, shape) -> jax.Array:
    return jnp.stack([k5, v5], axis=3).reshape(shape)


def fused_decode(q, k_new, v_new, kv_cache, layer_idx, block_tables,
                 context_lens, *, scale, num_kv_heads,
                 sliding_window=None, soft_cap=None, alibi_slopes=None,
                 blocksparse=None, bs_phases=None):
    """Reference path for the fused-cache decode kernel
    (ops/pallas/fused_decode.py)."""
    k_cache, v_cache = _split_fused(kv_cache, num_kv_heads)
    out, k_cache, v_cache = paged_attention_decode(
        q, k_new, v_new, k_cache, v_cache, layer_idx, block_tables,
        context_lens, scale=scale, sliding_window=sliding_window,
        soft_cap=soft_cap, alibi_slopes=alibi_slopes,
        blocksparse=blocksparse, bs_phases=bs_phases)
    return out, _join_fused(k_cache, v_cache, kv_cache.shape)


def _write_new_kv(k_new, v_new, k_cache, v_cache, layer_idx,
                  block_tables, query_lens, context_lens,
                  v_block_tables=None):
    """Scatter [B, L, Hkv, D] new rows into the stacked cache. V may
    ride its own table (V-offload ring slots)."""
    batch, l_pad = k_new.shape[:2]
    layers, num_blocks, num_heads, block_size, head = k_cache.shape
    pos = (context_lens - query_lens)[:, None] + jnp.arange(l_pad)[None]
    valid = jnp.arange(l_pad)[None] < query_lens[:, None]
    entry = jnp.clip(pos // block_size, 0, block_tables.shape[1] - 1)

    def slots(tables, nblocks):
        blk = jnp.take_along_axis(tables, entry, axis=1)
        return jnp.where(valid, blk, nblocks)  # drop pads

    blk = slots(block_tables, num_blocks)
    vblk = (blk if v_block_tables is None
            else slots(v_block_tables, v_cache.shape[1]))
    off = pos % block_size
    # advanced indices at axes 1 and 3 -> update shape [T, H, D]
    kt = k_new.reshape(batch * l_pad, num_heads, head).astype(
        k_cache.dtype)
    vt = v_new.reshape(batch * l_pad, num_heads, head).astype(
        v_cache.dtype)
    o_flat = off.reshape(-1)
    lyr = layer_idx[0]
    k_cache = k_cache.at[lyr, blk.reshape(-1), :, o_flat, :].set(
        kt, mode="drop")
    v_cache = v_cache.at[lyr, vblk.reshape(-1), :, o_flat, :].set(
        vt, mode="drop")
    return k_cache, v_cache


def _gather_kv(cache4: jax.Array, block_table: jax.Array) -> jax.Array:
    """[N, H, bs, D] + [max_blocks] (shared) or [H, S] (per-head
    virtual tables, ops/hip_mask.py) -> [H, len*bs, D]."""
    _, num_heads, block_size, head_size = cache4.shape
    if block_table.ndim == 2:
        # per-head tables: head h gathers its own block list
        g = cache4[block_table, jnp.arange(num_heads)[:, None]]
    else:
        g = cache4[block_table].transpose(1, 0, 2, 3)
    return g.reshape(num_heads, -1, head_size)


def paged_attention(
    q: jax.Array,  # [B, L_pad, num_q_heads, head_size]
    k_new: jax.Array,  # [B, L_pad, num_kv_heads, head_size]
    v_new: jax.Array,
    k_cache: jax.Array,  # [Lnum, N, H, bs, D]
    v_cache: jax.Array,
    layer_idx: jax.Array,  # [1]
    block_tables: jax.Array,  # [B, max_blocks] int32
    query_lens: jax.Array,  # [B] int32
    context_lens: jax.Array,  # [B] int32
    *,
    scale: float,
    sliding_window: Optional[int] = None,
    soft_cap: Optional[float] = None,
    self_extend=None,  # Optional[SelfExtendSpec]; q/k arrive UNROTATED
    alibi_slopes: Optional[jax.Array] = None,  # [num_q_heads] f32
    blocksparse: Optional[Tuple[int, int, int]] = None,
    bs_phases: Optional[jax.Array] = None,  # [num_q_heads] int32
    v_block_tables: Optional[jax.Array] = None,  # [B, max_blocks]
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Causal prefill/decode attention reading KV from the paged cache
    after writing the new rows (capability of paged_attention_v1/v2 +
    flash prefill + reshape_and_cache in the reference).

    ``block_tables`` may be [B, max_blocks] (dense) or [B, Hkv, S]
    per-head virtual tables (sparse decode) — every head's virtual
    table ends with the true last block at the same offset, so the new
    row's slot is head-independent and head 0's table can do the write.
    """
    fused_shape = None
    if v_cache is None:
        # FUSED cache (models/attention.kv_cache_shape): per head K
        # rows then V rows; memory order is head-major then token-major
        # so plain reshapes recover per-token 5-D views — this
        # debug/reference path tolerates the reshape copies
        fused_shape = k_cache.shape
        k_cache, v_cache = _split_fused(k_cache, k_new.shape[2])
    write_tables = (block_tables[:, 0]
                    if block_tables.ndim == 3 else block_tables)
    k_cache, v_cache = _write_new_kv(k_new, v_new, k_cache, v_cache,
                                     layer_idx, write_tables, query_lens,
                                     context_lens,
                                     v_block_tables=v_block_tables)
    _, l_pad, num_q_heads, _ = q.shape
    num_kv_heads = k_cache.shape[2]
    group = num_q_heads // num_kv_heads
    max_len = block_tables.shape[-1] * k_cache.shape[3]
    k4 = k_cache[layer_idx[0]]
    v4 = v_cache[layer_idx[0]]

    def one_seq(q_b, table_b, vtable_b, qlen_b, ctx_b):
        k = _gather_kv(k4, table_b).astype(jnp.float32)
        v = _gather_kv(v4, vtable_b).astype(jnp.float32)
        qh = q_b.reshape(l_pad, num_kv_heads, group, -1).astype(
            jnp.float32)
        q_pos = ctx_b - qlen_b + jnp.arange(l_pad)
        kv_pos = jnp.arange(max_len)
        if self_extend is None:
            s = jnp.einsum("ihgd,hld->hgil", qh * scale, k)
        else:
            from vllm_legacy_tpu.ops.self_extend import (
                grouped_k_pos, grouped_q_pos, inv_freq_array, rope_rows)
            se = self_extend
            inv = jnp.asarray(inv_freq_array(se))
            qt = qh.transpose(1, 2, 0, 3)  # [h, g, L, d]
            qn = rope_rows(qt, q_pos, inv, se.rotary_dim, se.neox)
            qg_ = rope_rows(qt, grouped_q_pos(q_pos, se), inv,
                            se.rotary_dim, se.neox)
            kn = rope_rows(k, kv_pos, inv, se.rotary_dim, se.neox)
            kg = rope_rows(k, grouped_k_pos(kv_pos, se), inv,
                           se.rotary_dim, se.neox)
            sa = jnp.einsum("hgid,hld->hgil", qn * scale, kn)
            sb = jnp.einsum("hgid,hld->hgil", qg_ * scale, kg)
            rel = q_pos[:, None] - kv_pos[None, :]  # [L, max_len]
            s = jnp.where(rel[None, None] <= se.window, sa, sb)
        s = _apply_soft_cap(s, soft_cap)
        if alibi_slopes is not None:
            # [Hkv, G] slopes x [L, max_len] relative distances
            slopes = alibi_slopes.astype(jnp.float32).reshape(
                num_kv_heads, group)
            rel_pos = (kv_pos[None, :] - q_pos[:, None]).astype(
                jnp.float32)
            s = s + slopes[:, :, None, None] * rel_pos[None, None]
        mask = kv_pos[None, :] <= q_pos[:, None]
        mask &= kv_pos[None, :] < ctx_b
        if sliding_window is not None:
            mask &= kv_pos[None, :] >= (q_pos[:, None] - sliding_window +
                                        1)
        if blocksparse is not None:
            # Phi-3-Small local + per-head vertically-strided block
            # pattern (reference: attention/ops/blocksparse_attention/
            # utils.py:180-192)
            bs_blk, lblk, vs = blocksparse
            qb_ = q_pos[:, None] // bs_blk  # [L, max_len]
            kb_ = kv_pos[None, :] // bs_blk
            local_ok = (qb_ - kb_) < lblk
            ph = bs_phases.reshape(num_kv_heads, group)
            vert_ok = ((kb_[None, None] + ph[:, :, None, None] + 1)
                       % vs) == 0
            mask4 = mask[None, None] & (local_ok[None, None] | vert_ok)
        else:
            mask4 = mask[None, None, :, :]
        s = jnp.where(mask4, s, _NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("hgil,hld->ihgd", p, v)
        valid_q = (jnp.arange(l_pad) < qlen_b)[:, None, None, None]
        o = jnp.where(valid_q, o, 0.0)
        return o.reshape(l_pad, num_q_heads, -1)

    vtabs = (block_tables if v_block_tables is None else
             v_block_tables)
    out = jax.vmap(one_seq)(q, block_tables, vtabs, query_lens,
                            context_lens)
    if fused_shape is not None:
        return (jnp.nan_to_num(out).astype(q.dtype),
                _join_fused(k_cache, v_cache, fused_shape), None)
    return jnp.nan_to_num(out).astype(q.dtype), k_cache, v_cache


def paged_attention_decode(q, k_new, v_new, k_cache, v_cache, layer_idx,
                           block_tables, context_lens, *, scale,
                           sliding_window=None, soft_cap=None,
                           self_extend=None, alibi_slopes=None,
                           blocksparse=None, bs_phases=None,
                           v_block_tables=None):
    batch = q.shape[0]
    out, k_cache, v_cache = paged_attention(
        q[:, None], k_new[:, None], v_new[:, None], k_cache, v_cache,
        layer_idx, block_tables, jnp.ones((batch, ), jnp.int32),
        context_lens, scale=scale, sliding_window=sliding_window,
        soft_cap=soft_cap, self_extend=self_extend,
        alibi_slopes=alibi_slopes, blocksparse=blocksparse,
        bs_phases=bs_phases, v_block_tables=v_block_tables)
    return out[:, 0], k_cache, v_cache


paged_attention_prefill = paged_attention
