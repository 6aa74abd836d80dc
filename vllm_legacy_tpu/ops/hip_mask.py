"""Top-k KV-block selection for sparse long-context decode.

Capability of the reference fork's HiP attention
(``vllm/attention/backends/hip.py:32`` — hierarchical per-query top-K
key pruning, O(T*K) decode) rebuilt TPU-first: instead of the
reference's iterative hierarchical mask (log T rounds of data-dependent
gathers, hostile to XLA), each logical KV block is scored against the
query via a few *representative keys* in ONE gather + ONE batched
matmul (MXU-friendly), and the top ``num_sel`` blocks per kv head are
kept.  Memory traffic is ``R/bs`` of the cache for scoring plus
``num_sel/num_blocks`` for the attention itself.

The selection is returned as a *virtual block table*: a per-(seq, head)
list of physical block ids, sorted by logical position, plus a virtual
context length.  The unified paged-attention kernel then runs UNCHANGED
over the virtual table — streaming, masking, and even the fused decode
KV write stay correct because:

* sorted selection preserves position monotonicity (softmax masking
  only needs ``kv_pos < ctx``; RoPE is baked into cached keys),
* the true last block is force-selected, so the virtual position
  ``vctx - 1`` maps to exactly the physical slot the dense path writes
  (same block, same offset — see ``_virtual_ctx``),
* when a sequence has fewer than ``num_sel`` valid blocks the selection
  degenerates to the identity prefix and the result is bit-exact dense
  attention (the reference's ``ctx < 3K -> dense`` fallback,
  backends/hip.py:306-319, with no batch-level branch).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_FORCE = float(2.0**30)
_NEG = float(-2.0**30)


def select_kv_blocks(
    q: jax.Array,  # [B, num_q_heads, D] decode queries (cache-padded D)
    k_cache: jax.Array,  # [Lnum, N, Hkv, bs, D] stacked block-major
    layer_idx: jax.Array,  # [1] int32
    block_tables: jax.Array,  # [B, max_blocks] int32 physical ids
    context_lens: jax.Array,  # [B] int32 (incl. the new token)
    *,
    num_sel: int,
    num_sink: int = 1,
    num_recent: int = 2,
    reps_per_block: int = 3,
    window_blocks: int = 0,
    v_block_tables: jax.Array = None,
    avail_entries: jax.Array = None,  # [B, M] bool, exact-offload mode
    want_scores: bool = False,
) -> Tuple[jax.Array, ...]:
    """Returns (virtual_tables [B, Hkv, num_sel] physical ids,
    virtual_ctx [B] int32) — or with ``v_block_tables`` given,
    (k_tables, v_tables, virtual_ctx) where v_tables carries the
    V-offload ring slots of the SAME selected entries.

    ``window_blocks > 0`` restricts candidates to the resident set
    (sink + last ``window_blocks`` entries): V-offload rings only keep
    those, so non-resident blocks must never be selected."""
    batch, num_q_heads, d = q.shape
    _, num_blocks, num_kv_heads, bs, _ = k_cache.shape
    group = num_q_heads // num_kv_heads
    max_entries = block_tables.shape[1]

    nb = (context_lens + bs - 1) // bs  # valid entries per seq [B]

    # --- representative-key scores:  [B, Hkv, max_entries] -------------
    offsets = jnp.linspace(0, bs - 1, reps_per_block).astype(jnp.int32)
    k4 = k_cache[layer_idx[0]]  # [N, Hkv, bs, D] block-major
    # rep rows: block id [B, M, R] x in-block offset [R]
    blk = jnp.broadcast_to(block_tables[:, :, None],
                           (batch, max_entries, reps_per_block))
    off = jnp.broadcast_to(offsets[None, None, :], blk.shape)
    # advanced indices at axes 0 and 2 -> [B, M, R, Hkv, D]
    reps = k4[blk.reshape(batch, -1), :, off.reshape(batch, -1), :]
    reps = reps.reshape(batch, max_entries * reps_per_block,
                        num_kv_heads, d)
    reps = reps.transpose(0, 2, 1, 3).astype(jnp.float32)  # [B,H,M*R,D]

    qg = q.reshape(batch, num_kv_heads, group, d).astype(jnp.float32)
    s = jnp.einsum("bhgd,bhrd->bhgr", qg, reps)
    s = s.reshape(batch, num_kv_heads, group, max_entries,
                  reps_per_block)
    s = s.max(axis=(2, 4))  # union over group heads and reps

    entry = jnp.arange(max_entries)[None, :]  # [1, M]
    valid = entry < nb[:, None]  # [B, M]
    force = entry < num_sink  # sink blocks
    force |= entry >= (nb[:, None] - num_recent)  # recent + last block
    s = jnp.where(valid[:, None, :], s, _NEG)
    s_unrestricted = s  # exact-offload: pre-residency scores
    if avail_entries is not None:
        # exact-offload: candidates = sink/recent + whatever V is
        # resident (in-window ring or staged slot) — availability is
        # data, not a window rule
        resident = force | avail_entries
        s = jnp.where(resident[:, None, :], s, _NEG)
    elif window_blocks > 0:
        resident = force | (entry >= (nb[:, None] - window_blocks))
        s = jnp.where(resident[:, None, :], s, _NEG)
    s = jnp.where((force & valid)[:, None, :], _FORCE, s)

    # --- top-k + ascending position sort -------------------------------
    _, idx = jax.lax.top_k(s, num_sel)  # [B, Hkv, S] logical entries
    idx = jnp.sort(idx, axis=-1)

    def gather_tables(tables):
        return jnp.take_along_axis(
            jnp.broadcast_to(tables[:, None, :],
                             (batch, num_kv_heads, max_entries)), idx,
            axis=2).astype(jnp.int32)

    vtables = gather_tables(block_tables)

    # --- virtual context length ----------------------------------------
    # last-block fill r_last = ctx - (nb-1)*bs  (in 1..bs for ctx >= 1)
    r_last = context_lens - (nb - 1) * bs
    vctx = jnp.where(nb <= num_sel, context_lens,
                     (num_sel - 1) * bs + r_last)
    outs: Tuple[jax.Array, ...]
    if v_block_tables is not None:
        outs = (vtables.astype(jnp.int32),
                gather_tables(v_block_tables), vctx.astype(jnp.int32))
    else:
        outs = (vtables.astype(jnp.int32), vctx.astype(jnp.int32))
    if want_scores:
        # per-entry desire, max over heads, for the staging planner:
        # what the UNRESTRICTED selection would want (K is full under
        # v_offload, so these scores see the whole history)
        outs = outs + (s_unrestricted.max(axis=1), )
    return outs
