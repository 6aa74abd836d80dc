"""Attention op dispatch: Pallas TPU kernels vs pure-XLA reference.

The role of the reference's ``vllm/attention/selector.py`` — but there is
only one hardware target, so selection is just production kernel vs
debugging fallback, controlled by ``VLT_USE_XLA_OPS`` /
``VLT_PALLAS_INTERPRET`` (the latter runs the same Pallas kernels in
interpreter mode so CPU tests cover the real code path).

Both implementations share one fused API: cache write + paged attention
over the stacked ``[num_layers, H, N, bs, D]`` cache, returning
``(out, k_cache, v_cache)``.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax

from vllm_legacy_tpu import envs
from vllm_legacy_tpu.ops import xla_attention
from vllm_legacy_tpu.ops.pallas import paged_attention as pallas_attn


def _use_xla() -> bool:
    return bool(envs.VLT_USE_XLA_OPS)


def _interpret() -> bool:
    return bool(envs.VLT_PALLAS_INTERPRET)


def paged_attention_decode(q, k_new, v_new, k_cache, v_cache, layer_idx,
                           block_tables, context_lens, *, scale: float,
                           sliding_window: Optional[int] = None,
                           soft_cap: Optional[float] = None,
                           self_extend=None, alibi_slopes=None,
                           blocksparse=None, bs_phases=None,
                           v_block_tables=None):
    if _use_xla():
        return xla_attention.paged_attention_decode(
            q, k_new, v_new, k_cache, v_cache, layer_idx, block_tables,
            context_lens, scale=scale, sliding_window=sliding_window,
            soft_cap=soft_cap, self_extend=self_extend,
            alibi_slopes=alibi_slopes, blocksparse=blocksparse,
            bs_phases=bs_phases, v_block_tables=v_block_tables)
    return pallas_attn.paged_attention_decode(
        q, k_new, v_new, k_cache, v_cache, layer_idx, block_tables,
        context_lens, scale=scale, sliding_window=sliding_window,
        soft_cap=soft_cap, interpret=_interpret(),
        self_extend=self_extend, alibi_slopes=alibi_slopes,
        blocksparse=blocksparse, bs_phases=bs_phases,
        v_block_tables=v_block_tables)


def fused_decode(q, k_new, v_new, kv_cache, layer_idx, block_tables,
                 context_lens, *, scale: float, num_kv_heads: int,
                 sliding_window=None, soft_cap=None, alibi_slopes=None,
                 blocksparse=None, bs_phases=None):
    """Decode over the FUSED single-buffer cache: the gang-batched
    pipelined kernel (ops/pallas/fused_decode.py), or the XLA
    reference which views the fused buffer as split 5-D arrays."""
    if _use_xla():
        return xla_attention.fused_decode(
            q, k_new, v_new, kv_cache, layer_idx, block_tables,
            context_lens, scale=scale, num_kv_heads=num_kv_heads,
            sliding_window=sliding_window, soft_cap=soft_cap,
            alibi_slopes=alibi_slopes, blocksparse=blocksparse,
            bs_phases=bs_phases)
    from vllm_legacy_tpu import envs
    from vllm_legacy_tpu.ops.pallas.fused_decode import \
        fused_decode_attention
    return fused_decode_attention(
        q, k_new, v_new, kv_cache, layer_idx, block_tables,
        context_lens, scale=scale, num_kv_heads=num_kv_heads,
        sliding_window=sliding_window, soft_cap=soft_cap,
        alibi_slopes=alibi_slopes, blocksparse=blocksparse,
        bs_phases=bs_phases, kblk=envs.VLT_DECODE_KBLK,
        gang=envs.VLT_DECODE_GANG, interpret=_interpret())


def paged_attention_prefill(q, k_new, v_new, k_cache, v_cache, layer_idx,
                            block_tables, query_lens, context_lens, *,
                            scale: float,
                            sliding_window: Optional[int] = None,
                            soft_cap: Optional[float] = None,
                            self_extend=None, alibi_slopes=None,
                            blocksparse=None, bs_phases=None,
                            v_block_tables=None):
    if _use_xla():
        return xla_attention.paged_attention(
            q, k_new, v_new, k_cache, v_cache, layer_idx, block_tables,
            query_lens, context_lens, scale=scale,
            sliding_window=sliding_window, soft_cap=soft_cap,
            self_extend=self_extend, alibi_slopes=alibi_slopes,
            blocksparse=blocksparse, bs_phases=bs_phases,
            v_block_tables=v_block_tables)
    return pallas_attn.paged_attention(
        q, k_new, v_new, k_cache, v_cache, layer_idx, block_tables,
        query_lens, context_lens, scale=scale,
        sliding_window=sliding_window, soft_cap=soft_cap,
        interpret=_interpret(), self_extend=self_extend,
        alibi_slopes=alibi_slopes, blocksparse=blocksparse,
        bs_phases=bs_phases, v_block_tables=v_block_tables)
