"""Mixture-of-experts MLP (reference: vllm/model_executor/layers/
fused_moe/fused_moe.py — Triton grouped GEMM :18, fused_topk :311).

TPU-first design: experts are EXPERT-PARALLEL over the "model" mesh axis
(a capability the reference lacks — it TP-shards each expert instead,
SURVEY.md §2.10). Each shard computes its local experts densely for all
tokens and the routed combine is a masked weighted sum + psum:

* at tp_size == num_experts this does exactly one expert's FLOPs per
  token position on each shard (optimal);
* at tp_size == 1 it computes all experts densely — top_k/E of that is
  useful work. A Pallas grouped-GEMM kernel that sorts tokens by expert
  is the planned replacement for the single-chip path; the dense form
  is exact (no capacity-factor token dropping) and MXU-friendly.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

MODEL_AXIS = "model"


def fused_moe(
    x: jax.Array,  # [T, hidden]
    w_router: jax.Array,  # [hidden, num_experts] (replicated)
    w1: jax.Array,  # [E_local, hidden, 2*inter] gate||up, expert-sharded
    w2: jax.Array,  # [E_local, inter, hidden]
    *,
    top_k: int,
    num_experts: int,
    tp_size: int = 1,
    renormalize: bool = True,
) -> jax.Array:
    """Routed expert MLP; returns [T, hidden] (psum'd over shards)."""
    t, hidden = x.shape
    e_local = w1.shape[0]

    router_logits = jnp.dot(x, w_router,
                            preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(router_logits, axis=-1)  # [T, E]
    top_w, top_ids = jax.lax.top_k(weights, top_k)  # [T, k]
    if renormalize:
        top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)

    # per-token weight for each LOCAL expert: [T, E_local]
    if tp_size > 1:
        shard = jax.lax.axis_index(MODEL_AXIS)
        e_offset = shard * e_local
    else:
        e_offset = 0
    local_ids = jnp.arange(e_local) + e_offset  # [E_local]
    match = top_ids[:, :, None] == local_ids[None, None, :]  # [T,k,El]
    expert_w = jnp.sum(jnp.where(match, top_w[:, :, None], 0.0),
                       axis=1)  # [T, E_local]

    if tp_size == 1:
        # single chip: grouped GEMM over expert-sorted tokens
        # (jax.lax.ragged_dot == the Triton grouped kernel's role,
        # fused_moe.py:18) — computes exactly top_k experts per token
        # instead of all E (the dense form's E/top_k-fold waste).
        return _grouped_moe(x, w1, w2, top_w, top_ids,
                            num_experts).astype(x.dtype)

    # FLOPs per shard (T tokens, k = top_k, E_local local experts):
    #   dense:   E_local * T row-GEMMs (every local expert, every token)
    #   sorted:  T * k row-GEMMs (all routed pairs; non-local pairs hit
    #            a zeroed dummy expert — XLA's static shapes preclude a
    #            data-dependent row count)
    # The sorted form wins by E_local / k; at E_local <= k (high TP,
    # e.g. Mixtral-8 on tp=4 with k=2) it is a wash and dense keeps the
    # simpler schedule. Reference capability: fused_moe.py:465 computes
    # exactly the routed tokens (dynamic shapes are native on GPU).
    if e_local > top_k:
        out = _grouped_moe_sharded(x, w1, w2, top_w, top_ids,
                                   num_experts, e_offset, e_local)
        return jax.lax.psum(out, MODEL_AXIS).astype(x.dtype)

    # dense expert compute: [E_local, T, 2I] -> act -> [E_local, T, H]
    h1 = jnp.einsum("th,ehi->eti", x, w1,
                    preferred_element_type=jnp.float32).astype(x.dtype)
    gate, up = jnp.split(h1, 2, axis=-1)
    act = jax.nn.silu(gate) * up
    h2 = jnp.einsum("eti,eih->eth", act, w2,
                    preferred_element_type=jnp.float32)
    out = jnp.einsum("eth,te->th", h2,
                     expert_w.astype(jnp.float32))
    if tp_size > 1:
        out = jax.lax.psum(out, MODEL_AXIS)
    return out.astype(x.dtype)


def _grouped_moe(x, w1, w2, top_w, top_ids, num_experts):
    """Expert-sorted grouped GEMM: [T, H] -> [T, H].

    Stable-sorts the (token, expert) pairs by expert id, runs both
    expert matmuls as ragged group GEMMs, and scatter-adds the weighted
    results back per token.
    """
    t, h = x.shape
    k = top_ids.shape[1]
    flat_e = top_ids.reshape(-1)  # [T*k]
    order = jnp.argsort(flat_e, stable=True)
    tok_idx = order // k
    xs = x[tok_idx]  # [T*k, H] gathered per pair
    group_sizes = jnp.bincount(flat_e, length=num_experts)

    h1 = jax.lax.ragged_dot(xs, w1, group_sizes,
                            preferred_element_type=jnp.float32)
    gate, up = jnp.split(h1.astype(x.dtype), 2, axis=-1)
    act = jax.nn.silu(gate) * up
    h2 = jax.lax.ragged_dot(act, w2, group_sizes,
                            preferred_element_type=jnp.float32)
    w_flat = top_w.reshape(-1)[order].astype(jnp.float32)
    out = jnp.zeros((t, h), jnp.float32)
    return out.at[tok_idx].add(h2 * w_flat[:, None])


def _grouped_moe_sharded(x, w1, w2, top_w, top_ids, num_experts,
                         e_offset, e_local):
    """Expert-sorted grouped GEMM per shard: each shard runs its LOCAL
    experts over exactly the pairs routed to them.

    All T*k (token, expert) pairs are sorted by expert id, then rolled
    so this shard's segment starts at row 0; ragged groups cover the
    local experts plus one ZEROED dummy expert absorbing every non-local
    row (static shape, defined output — never uninitialized memory).
    Non-local rows also get weight 0, so only the psum'd local
    contributions survive. e_offset may be a traced axis_index.
    """
    t, h = x.shape
    k = top_ids.shape[1]
    flat_e = top_ids.reshape(-1)  # [T*k]
    order = jnp.argsort(flat_e, stable=True)
    tok_idx = order // k
    sizes_all = jnp.bincount(flat_e, length=num_experts)  # [E]
    # first sorted row belonging to expert e_offset
    csum = jnp.concatenate([jnp.zeros((1, ), sizes_all.dtype),
                            jnp.cumsum(sizes_all)])
    start = jax.lax.dynamic_index_in_dim(csum, e_offset, keepdims=False)
    local_sizes = jax.lax.dynamic_slice(sizes_all, (e_offset, ),
                                        (e_local, ))
    local_count = jnp.sum(local_sizes)

    xs = jnp.roll(x[tok_idx], -start, axis=0)  # local pairs first
    rolled_tok = jnp.roll(tok_idx, -start)
    rolled_w = jnp.roll(top_w.reshape(-1)[order], -start)

    group_sizes = jnp.concatenate(
        [local_sizes, (t * k - local_count)[None]]).astype(jnp.int32)
    zero1 = jnp.zeros((1, ) + w1.shape[1:], w1.dtype)
    zero2 = jnp.zeros((1, ) + w2.shape[1:], w2.dtype)
    h1 = jax.lax.ragged_dot(xs, jnp.concatenate([w1, zero1]),
                            group_sizes,
                            preferred_element_type=jnp.float32)
    gate, up = jnp.split(h1.astype(x.dtype), 2, axis=-1)
    act = jax.nn.silu(gate) * up
    h2 = jax.lax.ragged_dot(act, jnp.concatenate([w2, zero2]),
                            group_sizes,
                            preferred_element_type=jnp.float32)
    is_local = jnp.arange(t * k) < local_count
    w_masked = jnp.where(is_local, rolled_w.astype(jnp.float32), 0.0)
    out = jnp.zeros((t, h), jnp.float32)
    return out.at[rolled_tok].add(h2 * w_masked[:, None])
