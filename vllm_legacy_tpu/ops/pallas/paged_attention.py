"""Pallas TPU paged-attention kernel (prefill + decode unified,
KV-cache write fused).

One flash-style kernel replaces the reference's CUDA/Triton attention
paths AND ``reshape_and_cache`` (paged_attention_v1/v2, flash_attn_varlen,
Triton context_attention_fwd, csrc/cache_kernels.cu — SURVEY.md §2.6,
§2.11):

* The kernel WRITES the new tokens' K/V into the paged cache itself
  (grid cell (b, 0) DMAs them in before any read) and the cache arrays
  are input/output-aliased. This keeps the cache buffer chain
  pallas→pallas across layers with no XLA scatter or slice in between —
  load-bearing for in-place donation: XLA cannot alias a buffer that is
  scattered outside and read inside a custom call, and the resulting
  per-layer copies of a multi-GB cache destroy decode throughput.
* Queries are the *new* tokens of each sequence, padded to ``L_pad``;
  full prefill, chunked prefill, prefix-cache hits and single-token
  decode are all the same access pattern with different
  ``query_lens``/``context_lens``.
* Grid ``(batch, num_q_blocks)``; ALL kv heads of a sequence are
  processed in one cell from ONE DMA per block-table entry: the cache
  layout is block-major ``[num_layers, num_blocks, num_kv_heads,
  block_size, head_size]`` so ``cache[layer, block]`` is a contiguous
  ``[H, bs, D]`` slab, landed head-major in VMEM
  (``[H, kblk, bs, D]``) so per-head tiles reshape with zero data
  movement and the score/attend matmuls batch over heads on the MXU.
  (The previous head-minor layout needed B*H grid cells with per-head
  4KB DMAs — DMA-issue overhead dominated decode ~15x over roofline.)

Alignment invariants (validated by the caller):
* prefill start positions (ctx - qlen) are multiples of block_size, so
  new-token chunks map to whole physical blocks (static-size DMAs);
  trailing in-block rows past qlen hold garbage but sit beyond ctx and
  are overwritten before ever becoming readable.
* decode writes exactly one row at ctx-1.
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_legacy_tpu.ops.self_extend import rope_rows

_NEG_INF = float(-2.0**30)  # finite sentinel: avoids -inf - -inf = nan

# Chunks up to this many new tokens use the merge-into-stream write path
# (works at any alignment — needed by decode and spec-decode scoring);
# larger prefill chunks use block-aligned whole-block DMAs.
_MERGE_WRITE_MAX = 32


def _attention_kernel(
    # scalar prefetch
    layer_ref,  # [1] SMEM: layer index into the stacked cache
    block_tables_ref,  # [B, max_blocks] SMEM ([B, Hkv, S] = per-head)
    context_lens_ref,  # [B] SMEM
    query_lens_ref,  # [B] SMEM
    alibi_ref,  # [num_q_heads] SMEM f32 (zeros when has_alibi=False)
    bs_phase_ref,  # [num_q_heads] SMEM int32 (zeros unless blocksparse)
    v_tables_ref,  # [B, max_blocks] SMEM (V-offload ring slots; [1] unused)
    # inputs
    q_ref,  # [Hkv, G, BQ, D] VMEM tile
    k_new_ref,  # [Hkv, L_pad, D] VMEM tile (new K rows for b)
    v_new_ref,  # [Hkv, L_pad, D] VMEM tile
    k_in,  # [Lnum, N, Hkv, bs, D] HBM (aliased to k_hbm output)
    v_in,  # [Lnum, N, Hkv, bs, D] HBM (aliased to v_hbm output)
    # outputs
    o_ref,  # [Hkv, G, BQ, D] VMEM tile
    k_hbm,  # aliased HBM ref — ALL reads+writes go through this
    v_hbm,  # aliased HBM ref
    # scratch
    k_buf,  # [2, Hkv, KBLK, bs, D]
    v_buf,  # [2, Hkv, KBLK, bs, D]
    sem,  # DMA sems [2, 2, KBLK]
    wsem,  # write sems [2, WCH]
    *,
    scale: float,
    block_size: int,
    kblk: int,
    bq: int,
    l_pad: int,
    sliding_window: Optional[int],
    soft_cap: Optional[float],
    self_extend: Optional[Tuple[int, int]] = None,
    rope_base: float = 10000.0,
    rotary_dim: int = 0,
    rope_neox: bool = True,
    has_alibi: bool = False,
    blocksparse: Optional[Tuple[int, int, int]] = None,
    has_v_tables: bool = False,
    packed: bool = False,
    fused: bool = False,
    interpret: bool = False,
):
    b = pl.program_id(0)
    qb = pl.program_id(1)

    # pair-packed layout: the HBM cache is [L, N, Hkv*(bs/2), 2*d] —
    # two consecutive tokens share one 2*d lane row, so head_size-64
    # models get a 128-lane row with ZERO padding (the 5-D layout pads
    # d -> 128 and doubles KV HBM bytes + decode DMA traffic).
    # Mosaic cannot lane-split a [.., bs*d] register back into
    # [.., bs, d], so compute keeps the halves separate: scores and the
    # online softmax run per (even, odd) half with per-half kv
    # positions — softmax is order-independent, only the position
    # arithmetic must match. DMAs reshape the HBM ref (a sublane split
    # on a tile boundary: metadata-only) into [Hkv, bs/2, 2d] scratch.

    per_head_tables = len(block_tables_ref.shape) == 3

    def bt(entry, h=0):
        # [B, max_blocks] dense tables or [B, Hkv, S] per-head virtual
        # tables (sparse top-k decode, ops/hip_mask.py)
        if per_head_tables:
            return block_tables_ref[b, h, entry]
        return block_tables_ref[b, entry]

    def vbt(entry, h=0):
        # V-offload (fork offload_v equivalent): V rides its own table
        # of ring-pool slots while K uses the physical table; per-head
        # when the sparse selection emitted per-head tables
        if not has_v_tables:
            return bt(entry, h)
        if len(v_tables_ref.shape) == 3:
            return v_tables_ref[b, h, entry]
        return v_tables_ref[b, entry]

    hkv, g, _, d = q_ref.shape
    sb = kblk * block_size  # kv positions per super-block
    bs2 = block_size // 2  # pair rows per block (packed layout)
    d2 = 2 * d
    lyr = layer_ref[0]
    ctx = context_lens_ref[b]
    qlen = query_lens_ref[b]
    q_start = ctx - qlen

    def block_copies(hbm, blk, tile, sem_handle, *, to_hbm=False,
                     kind=0):
        """DMA descriptors between cache block ``blk`` and a VMEM tile
        shaped [Hkv, bs(/2), d(2d)]. Fused caches hold per head its K
        rows then V rows (``kind`` 0/1 selects), so the K and V sides
        address row ranges of ONE buffer (per-head slices: plain
        sublane ``pl.ds``, no ref reshapes — works in interpret mode
        too). Split 5-D caches copy the whole [Hkv, bs, d] slab in one
        DMA. This kernel serves the fused PREFILL path (plus
        self-extend decode and spec-decode scoring chunks), which is
        compute-bound — per-head DMAs are fine here; the decode hot
        path lives in ops/pallas/fused_decode.py."""
        if fused and packed:
            # pair rows: [L, N, Hkv*2*(bs/2), 2d]
            pairs = [(hbm.at[lyr, blk,
                             pl.ds(h * 2 * bs2 + kind * bs2, bs2)],
                      tile.at[h]) for h in range(hkv)]
        elif fused:
            # plain rows: [L, N, Hkv*2, bs, dpad]
            pairs = [(hbm.at[lyr, blk, h * 2 + kind], tile.at[h])
                     for h in range(hkv)]
        else:
            pairs = [(hbm.at[lyr, blk], tile)]
        if to_hbm:
            pairs = [(dst, src) for src, dst in pairs]
        return [pltpu.make_async_copy(src, dst, sem_handle)
                for src, dst in pairs]

    # ---------------- fused KV write (first q-tile only) ----------------
    # Decode (l_pad == 1) writes its single new row differently: the
    # last block is streamed into VMEM by the attention loop anyway, so
    # the new row is merged into the streamed tile (correct attention
    # without any HBM read-after-write) and the updated block is DMA'd
    # back once from the scratch slot — see `body` below.
    if l_pad > _MERGE_WRITE_MAX:
        # packed large-chunk prefill: k_new/v_new arrive PAIRED
        # [Hkv, l_pad/2, 2d] (the per-token 3-D form is only read by
        # the merge path, which large chunks never take), so block
        # slices match the pair cache rows.
        def new_slice(ref, c):
            if packed:
                return ref.at[:, pl.ds(c * bs2, bs2), :]
            return ref.at[:, pl.ds(c * block_size, block_size), :]

        # Mixed chunked-prefill batches carry decode rows (qlen == 1,
        # q_start unaligned) in the prefill grid; those write through
        # the merge path in `body` below — whole-block DMAs would
        # clobber the earlier rows of their partially-filled block.
        aligned = q_start % block_size == 0

        @pl.when(jnp.logical_and(jnp.logical_and(qb == 0, qlen > 0),
                                 aligned))
        def _write():
            # prefill: q_start is block-aligned; write whole blocks.
            # Source (strided over k_new's L dim) -> dest
            # cache[lyr, blk] contiguous.
            first_entry = q_start // block_size
            for c in range(l_pad // block_size):
                @pl.when(c * block_size < qlen)
                def _(c=c):
                    blk = bt(first_entry + c)
                    vblk = vbt(first_entry + c)
                    for cp in block_copies(k_hbm, blk,
                                           new_slice(k_new_ref, c),
                                           wsem.at[0, c], to_hbm=True,
                                           kind=0):
                        cp.start()
                    for cp in block_copies(v_hbm, vblk,
                                           new_slice(v_new_ref, c),
                                           wsem.at[1, c], to_hbm=True,
                                           kind=1):
                        cp.start()
            for c in range(l_pad // block_size):
                @pl.when(c * block_size < qlen)
                def _(c=c):
                    blk = bt(first_entry + c)
                    vblk = vbt(first_entry + c)
                    for cp in block_copies(k_hbm, blk,
                                           new_slice(k_new_ref, c),
                                           wsem.at[0, c], to_hbm=True,
                                           kind=0):
                        cp.wait()
                    for cp in block_copies(v_hbm, vblk,
                                           new_slice(v_new_ref, c),
                                           wsem.at[1, c], to_hbm=True,
                                           kind=1):
                        cp.wait()

    # ---------------- attention over the paged cache --------------------
    q_base = ctx - qlen + qb * bq  # absolute position of q row i=0

    hi = jnp.minimum(ctx, q_base + bq)
    lo = jnp.int32(0)
    if sliding_window is not None:
        lo = jnp.maximum(0, q_base - sliding_window + 1)
    first_sb = lo // sb
    nsb = pl.cdiv(hi, sb) - first_sb

    nb = pl.cdiv(ctx, block_size)  # valid block-table entries

    def start_fetch(sb_idx, slot):
        for j in range(kblk):
            entry = sb_idx * kblk + j

            @pl.when(entry < nb)
            def _():
                if per_head_tables:
                    for h in range(hkv):
                        blk = bt(entry, h)
                        vblk = vbt(entry, h)
                        pltpu.make_async_copy(
                            k_hbm.at[lyr, blk, h], k_buf.at[slot, h, j],
                            sem.at[0, slot, j]).start()
                        pltpu.make_async_copy(
                            v_hbm.at[lyr, vblk, h], v_buf.at[slot, h, j],
                            sem.at[1, slot, j]).start()
                else:
                    blk = bt(entry)
                    vblk = vbt(entry)
                    for cp in block_copies(k_hbm, blk,
                                           k_buf.at[slot, :, j],
                                           sem.at[0, slot, j], kind=0):
                        cp.start()
                    for cp in block_copies(v_hbm, vblk,
                                           v_buf.at[slot, :, j],
                                           sem.at[1, slot, j], kind=1):
                        cp.start()

    def wait_fetch(sb_idx, slot):
        for j in range(kblk):
            entry = sb_idx * kblk + j

            @pl.when(entry < nb)
            def _():
                if per_head_tables:
                    for h in range(hkv):
                        blk = bt(entry, h)
                        vblk = vbt(entry, h)
                        pltpu.make_async_copy(
                            k_hbm.at[lyr, blk, h], k_buf.at[slot, h, j],
                            sem.at[0, slot, j]).wait()
                        pltpu.make_async_copy(
                            v_hbm.at[lyr, vblk, h], v_buf.at[slot, h, j],
                            sem.at[1, slot, j]).wait()
                else:
                    blk = bt(entry)
                    vblk = vbt(entry)
                    for cp in block_copies(k_hbm, blk,
                                           k_buf.at[slot, :, j],
                                           sem.at[0, slot, j], kind=0):
                        cp.wait()
                    for cp in block_copies(v_hbm, vblk,
                                           v_buf.at[slot, :, j],
                                           sem.at[1, slot, j], kind=1):
                        cp.wait()

    is_live = jnp.logical_and(qb * bq < qlen, nsb > 0)

    @pl.when(jnp.logical_not(is_live))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    @pl.when(is_live)
    def _():
        q = q_ref[...].reshape(hkv, g * bq, d).astype(jnp.float32) * scale
        row = jax.lax.broadcasted_iota(jnp.int32, (g * bq, 1), 0)
        q_pos = q_base + row % bq  # [G*BQ, 1]
        if self_extend is not None:
            # self-extend: q/k arrive UNROTATED; rotate copies at
            # normal and group-quantized positions (ops/self_extend.py).
            # inv_freq is built from an iota — pallas kernels cannot
            # capture array constants.
            w_se, g_se = self_extend
            import math as _math
            # int iota then cast: Mosaic has no float iota lowering
            exps = jax.lax.broadcasted_iota(
                jnp.int32, (1, rotary_dim // 2), 1).astype(
                    jnp.float32) * (2.0 / rotary_dim)
            inv = jnp.exp(exps * (-_math.log(rope_base)))  # [1, rd/2]
            q_n = rope_rows(q, q_pos[:, 0], inv, rotary_dim, rope_neox)
            q_g = rope_rows(q, q_pos[:, 0] // g_se + (w_se - w_se // g_se),
                            inv, rotary_dim, rope_neox)

        start_fetch(first_sb, 0)

        def body(i, carry):
            m_prev, l_prev, acc = carry
            sb_idx = first_sb + i
            slot = i % 2

            @pl.when(i + 1 < nsb)
            def _():
                start_fetch(sb_idx + 1, (i + 1) % 2)

            wait_fetch(sb_idx, slot)
            sb2t = kblk * bs2  # pair rows per superblock (packed)
            if l_pad <= _MERGE_WRITE_MAX:
                merge_rows = l_pad
                merge_gate = qlen > 0
            else:
                # mixed chunked-prefill batches: decode rows (single
                # new token, unaligned start) write through the stream
                # — the whole-block path skipped them
                merge_rows = 1
                merge_gate = jnp.logical_and(
                    qlen == 1, q_start % block_size != 0)

            @pl.when(merge_gate)
            def _merge():
                # Fused decode / small-chunk write (spec-decode scoring):
                # merge the new row(s) into the streamed tile, store it
                # back to scratch and DMA the spanned block(s) out
                # (replaces reshape_and_cache with zero extra HBM
                # reads). Works at ANY q_start alignment because the
                # pre-existing rows of partially-filled blocks come from
                # the stream itself.
                # whole-tile register load: sublane slices of width 1
                # (k_new_ref[:, r, :]) violate bf16 (2, 128) tiling
                kn_all = k_new_ref[...]  # [Hkv, l_pad, D] (or paired)
                vn_all = v_new_ref[...]

                def row(arr, r):
                    if packed and arr.shape[-1] == d2:
                        # paired [Hkv, l_pad/2, 2d] (large-chunk grid)
                        return arr[:, r // 2, (r % 2) * d:
                                   (r % 2) * d + d]
                    return arr[:, r, :]

                if packed:
                    # pair rows: token p lives in pair row p//2, lane
                    # half p%2 — select via row index x lane-half masks
                    # and a duplicated-halves value so either half can
                    # take the new token.
                    k_m = k_buf[slot].reshape(hkv, sb2t, d2)
                    v_m = v_buf[slot].reshape(hkv, sb2t, d2)
                    row_idx = sb_idx * sb2t + jax.lax.broadcasted_iota(
                        jnp.int32, (sb2t, 1), 0)  # [SB2, 1]
                    lane_half = jax.lax.broadcasted_iota(
                        jnp.int32, (1, d2), 1) // d  # [1, 2d]
                    for r in range(merge_rows):
                        p_tok = q_start + r
                        sel_r = jnp.logical_and(
                            jnp.logical_and(row_idx == p_tok // 2,
                                            lane_half == p_tok % 2),
                            r < qlen)[None]  # [1, SB2, 2d]
                        kr = row(kn_all, r)
                        vr = row(vn_all, r)
                        k_m = jnp.where(
                            sel_r,
                            jnp.concatenate([kr, kr], -1)[:, None, :],
                            k_m)
                        v_m = jnp.where(
                            sel_r,
                            jnp.concatenate([vr, vr], -1)[:, None, :],
                            v_m)
                else:
                    k_m = k_buf[slot].reshape(hkv, sb, d)
                    v_m = v_buf[slot].reshape(hkv, sb, d)
                    sel_col = sb_idx * sb + jax.lax.broadcasted_iota(
                        jnp.int32, (sb, 1), 0)[None]  # [1, SB, 1]
                    for r in range(merge_rows):
                        sel_r = jnp.logical_and(
                            sel_col == (q_start + r), r < qlen)
                        k_m = jnp.where(sel_r,
                                        row(kn_all, r)[:, None, :], k_m)
                        v_m = jnp.where(sel_r,
                                        row(vn_all, r)[:, None, :], v_m)
                k_buf[slot] = k_m.reshape(k_buf.shape[1:])
                v_buf[slot] = v_m.reshape(v_buf.shape[1:])

                # Write back every block this superblock spans that
                # contains at least one new row.
                first_new_blk = q_start // block_size
                last_new_blk = (ctx - 1) // block_size
                for j in range(kblk):
                    entry = sb_idx * kblk + j

                    @pl.when(jnp.logical_and(
                            jnp.logical_and(entry >= first_new_blk,
                                            entry <= last_new_blk),
                            entry < nb))
                    def _writeback(j=j):
                        if per_head_tables:
                            for h in range(hkv):
                                blk = bt(entry, h)
                                vblk = vbt(entry, h)
                                kw = pltpu.make_async_copy(
                                    k_buf.at[slot, h, j],
                                    k_hbm.at[lyr, blk, h], wsem.at[0, 0])
                                vw = pltpu.make_async_copy(
                                    v_buf.at[slot, h, j],
                                    v_hbm.at[lyr, vblk, h], wsem.at[1, 0])
                                kw.start()
                                vw.start()
                                kw.wait()
                                vw.wait()
                        else:
                            blk = bt(entry)
                            vblk = vbt(entry)
                            kws = block_copies(k_hbm, blk,
                                               k_buf.at[slot, :, j],
                                               wsem.at[0, 0],
                                               to_hbm=True, kind=0)
                            vws = block_copies(v_hbm, vblk,
                                               v_buf.at[slot, :, j],
                                               wsem.at[1, 0],
                                               to_hbm=True, kind=1)
                            for cp in kws + vws:
                                cp.start()
                            for cp in kws + vws:
                                cp.wait()

            # One superblock = one segment unpacked, or the (even, odd)
            # lane halves of the pair rows as two segments: the online
            # softmax is order-independent, so per-segment kv positions
            # keep masks/ALiBi/blocksparse exact with zero lane
            # shuffles (Mosaic cannot lane-split [.., 2d] -> [.., 2, d]
            # in registers).
            if packed:
                kp = k_buf[slot].reshape(hkv, sb2t, d2).astype(
                    jnp.float32)
                vp = v_buf[slot].reshape(hkv, sb2t, d2).astype(
                    jnp.float32)
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (1, sb2t), 1)
                rows_col = jax.lax.broadcasted_iota(
                    jnp.int32, (sb2t, 1), 0)
                base = sb_idx * sb
                segs = [(kp[:, :, :d], vp[:, :, :d], base + 2 * rows,
                         base + 2 * rows_col),
                        (kp[:, :, d:], vp[:, :, d:],
                         base + 2 * rows + 1, base + 2 * rows_col + 1)]
            else:
                kf = k_buf[slot].reshape(hkv, sb, d).astype(jnp.float32)
                vf = v_buf[slot].reshape(hkv, sb, d).astype(jnp.float32)
                kv_pos = sb_idx * sb + jax.lax.broadcasted_iota(
                    jnp.int32, (1, sb), 1)  # [1, SB]
                kv_pos_col = sb_idx * sb + jax.lax.broadcasted_iota(
                    jnp.int32, (sb, 1), 0)  # [SB, 1]
                segs = [(kf, vf, kv_pos, kv_pos_col)]

            sm = []  # per-segment (s, fmask, v)
            for k, v, pos, pos_col in segs:
                # Rows past the last fetched block hold garbage; zero
                # them so 0-weight columns can't poison the p @ v
                # matmul.
                valid = (pos_col < ctx)[None]  # [1, S, 1]
                k = jnp.where(valid, k, 0.0)
                v = jnp.where(valid, v, 0.0)
                if self_extend is None:
                    s = jax.lax.dot_general(
                        q, k, (((2, ), (2, )), ((0, ), (0, ))),
                        preferred_element_type=jnp.float32)  # [H,GB,S]
                else:
                    k_n = rope_rows(k, pos[0], inv, rotary_dim,
                                    rope_neox)
                    k_g = rope_rows(k, pos[0] // g_se, inv, rotary_dim,
                                    rope_neox)
                    s_n = jax.lax.dot_general(
                        q_n, k_n, (((2, ), (2, )), ((0, ), (0, ))),
                        preferred_element_type=jnp.float32)
                    s_g = jax.lax.dot_general(
                        q_g, k_g, (((2, ), (2, )), ((0, ), (0, ))),
                        preferred_element_type=jnp.float32)
                    s = jnp.where((q_pos - pos)[None] <= w_se, s_n, s_g)
                if soft_cap is not None:
                    s = soft_cap * jnp.tanh(s / soft_cap)
                if has_alibi:
                    # ALiBi bias slope_head * (kv_pos - q_pos)
                    # (reference: csrc/attention/attention_kernels.cu
                    # alibi_slope arg; q heads are contiguous per kv
                    # head: q_head = h*G + g).
                    slope = jnp.concatenate([
                        jnp.full((1, bq, 1), alibi_ref[h * g + gi],
                                 jnp.float32) for h in range(hkv)
                        for gi in range(g)
                    ], axis=1).reshape(hkv, g * bq, 1)
                    s = s + slope * (pos - q_pos)[None].astype(
                        jnp.float32)

                mask = (pos <= q_pos) & (pos < ctx)  # [G*BQ, S]
                if sliding_window is not None:
                    mask &= pos > (q_pos - sliding_window)
                if blocksparse is None:
                    fmask = mask[None]  # [1, G*BQ, S]
                else:
                    # Phi-3-Small blocksparse: local blocks + per-head
                    # vertically-strided blocks (reference:
                    # attention/ops/blocksparse_attention/
                    # utils.py:180-192); the per-head stripe phase
                    # (global_head * sliding_step) arrives via scalar
                    # prefetch so TP shards mask their own heads.
                    bs_blk, lblk, vs = blocksparse
                    q_blk = q_pos // bs_blk  # [G*BQ, 1]
                    k_blk = pos // bs_blk  # [1, S]
                    local_ok = (q_blk - k_blk) < lblk  # [G*BQ, S]
                    phase = jnp.concatenate([
                        jnp.full((1, bq, 1), bs_phase_ref[h * g + gi],
                                 jnp.int32) for h in range(hkv)
                        for gi in range(g)
                    ], axis=1).reshape(hkv, g * bq, 1)
                    vert_ok = ((k_blk[None] + phase + 1) % vs) == 0
                    fmask = mask[None] & (local_ok[None] | vert_ok)
                sm.append((jnp.where(fmask, s, _NEG_INF), fmask, v))

            m_new = m_prev
            for s, _, _ in sm:
                m_new = jnp.maximum(m_new,
                                    jnp.max(s, axis=2, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha
            acc = acc * alpha
            for s, fmask, v in sm:
                p = jnp.exp(s - m_new)
                p = jnp.where(fmask, p, 0.0)
                l_new = l_new + jnp.sum(p, axis=2, keepdims=True)
                acc = acc + jax.lax.dot_general(
                    p, v, (((2, ), (1, )), ((0, ), (0, ))),
                    preferred_element_type=jnp.float32)
            return m_new, l_new, acc

        m0 = jnp.full((hkv, g * bq, 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((hkv, g * bq, 1), jnp.float32)
        acc0 = jnp.zeros((hkv, g * bq, d), jnp.float32)
        _, l, acc = jax.lax.fori_loop(0, nsb, body, (m0, l0, acc0))

        out = acc / jnp.where(l == 0.0, 1.0, l)
        o_ref[...] = out.reshape(hkv, g, bq, d).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window", "soft_cap", "bq", "kblk",
                     "interpret", "self_extend", "blocksparse"),
)
def paged_attention(  # noqa: C901
    q: jax.Array,  # [B, L_pad, num_q_heads, head_size]
    k_new: jax.Array,  # [B, L_pad, num_kv_heads, head_size]
    v_new: jax.Array,
    k_cache: jax.Array,  # [Lnum, N, Hkv, bs, D] stacked block-major
    v_cache: jax.Array,
    layer_idx: jax.Array,  # [1] int32
    block_tables: jax.Array,  # [B, max_blocks] int32
    query_lens: jax.Array,  # [B] int32
    context_lens: jax.Array,  # [B] int32
    *,
    scale: float,
    sliding_window: Optional[int] = None,
    soft_cap: Optional[float] = None,
    bq: int = 128,
    kblk: int = 8,
    interpret: bool = False,
    self_extend=None,  # Optional[SelfExtendSpec]; q/k_new UNROTATED
    alibi_slopes: Optional[jax.Array] = None,  # [num_q_heads] f32
    blocksparse: Optional[Tuple[int, int, int]] = None,
    bs_phases: Optional[jax.Array] = None,  # [num_q_heads] int32
    v_block_tables: Optional[jax.Array] = None,  # [B, max_blocks] int32
):
    """Fused cache-write + attention.

    Returns (out [B, L_pad, num_q_heads, D], k_cache, v_cache) with the
    caches updated in place (input/output aliased).
    """
    batch, l_pad, num_q_heads, head = q.shape
    num_kv_heads = k_new.shape[2]
    # Cache layouts (models/attention.kv_cache_shape):
    #   fused-pair  4-D [L, N, Hkv*2*(bs/2), 2d]   (v_cache is None)
    #   fused-plain 5-D [L, N, Hkv*2, bs, dpad]    (v_cache is None)
    #   split       5-D [L, N, Hkv, bs, dpad]
    fused = v_cache is None
    packed = k_cache.ndim == 4
    if packed:
        assert fused, "pair rows only exist in the fused layout"
        assert k_cache.shape[3] == 2 * head, (
            "pair-packed cache rows must hold exactly two tokens")
        block_size = k_cache.shape[2] // num_kv_heads
        assert k_cache.shape[2] == num_kv_heads * block_size
        assert self_extend is None, (
            "self-extend requires per-token cache rows (in-kernel "
            "rope); the layout chooser disables pairing for it")
    elif fused:
        assert k_cache.shape[2] == 2 * num_kv_heads, (k_cache.shape,
                                                      num_kv_heads)
        block_size = k_cache.shape[3]
    else:
        _, _, _, block_size, _ = k_cache.shape
    assert num_q_heads % num_kv_heads == 0
    assert l_pad <= 32 or l_pad % block_size == 0, (
        f"prefill L_pad ({l_pad}) must be a multiple of block_size "
        f"({block_size}) for whole-block cache writes (chunks <= 32 "
        "use the any-alignment merge path)")
    group = num_q_heads // num_kv_heads
    bq = min(bq, l_pad)

    # ---- VMEM budget: size kblk (superblock width) and bq so tiles +
    # double-buffered KV stream + f32 flash intermediates fit. ----
    itm = jnp.dtype(k_cache.dtype).itemsize
    qitm = jnp.dtype(q.dtype).itemsize
    # Leave the compiler slack for semaphores/masks/grid machinery.
    budget = 9 * 1024 * 1024

    def _vmem_est(bq_, kblk_):
        gb = num_kv_heads * group * bq_ * head
        # pallas double-buffers every windowed io tile (q, out, kn, vn)
        tiles = 2 * 2 * gb * qitm
        tiles += 2 * 2 * num_kv_heads * l_pad * head * itm
        f32c = 2 * gb * 4  # q*scale and out f32 copies
        acc = gb * 4
        sb_ = kblk_ * block_size
        # s + p (+ the per-head blocksparse masks when enabled)
        smat = ((4 if blocksparse is not None else 2) *
                num_kv_heads * group * bq_ * sb_ * 4)
        kv = 2 * 2 * num_kv_heads * kblk_ * block_size * head * itm
        kv += 2 * num_kv_heads * sb_ * head * 4  # f32 casts of k, v
        if packed:
            # both lane halves' (s, fmask, p) stay alive across the
            # two-segment online-softmax pass, and the half slices of
            # the f32 kv copies materialize as separate registers
            smat *= 2
            kv += 2 * num_kv_heads * sb_ * head * 4
        return tiles + f32c + acc + smat + kv

    kblk = max(1, min(kblk, 64 // max(1, num_kv_heads)))
    while kblk > 1 and _vmem_est(bq, kblk) > budget:
        kblk //= 2
    while bq > block_size and _vmem_est(bq, kblk) > budget:
        bq //= 2

    # [B, L, Hq, D] -> [B, Hkv, G, L, D]
    qr = q.reshape(batch, l_pad, num_kv_heads, group, head)
    qr = qr.transpose(0, 2, 3, 1, 4)
    # [B, L, Hkv, D] -> [B, Hkv, L, D]
    kn = k_new.transpose(0, 2, 1, 3).astype(k_cache.dtype)
    vn = v_new.transpose(0, 2, 1, 3).astype(k_cache.dtype)
    if packed and l_pad > _MERGE_WRITE_MAX:
        # paired form feeds the whole-block writes (see kernel); the
        # per-token 3-D form is only read by the merge path, which at
        # this l_pad only handles single decode rows (r=0) via a lane
        # half-slice
        kn = kn.reshape(batch, num_kv_heads, l_pad // 2, 2 * head)
        vn = vn.reshape(batch, num_kv_heads, l_pad // 2, 2 * head)

    num_q_blocks = pl.cdiv(l_pad, bq)
    grid = (batch, num_q_blocks)
    wch = max(l_pad // block_size, 1)

    se_kwargs = {}
    if self_extend is not None:
        se_kwargs = dict(
            self_extend=(self_extend.window, self_extend.group),
            rope_base=float(self_extend.rope_base),
            rotary_dim=self_extend.rotary_dim,
            rope_neox=self_extend.neox,
        )
    has_alibi = alibi_slopes is not None
    if alibi_slopes is None:
        alibi_arr = jnp.zeros((1, ), jnp.float32)
    else:
        alibi_arr = alibi_slopes.astype(jnp.float32)
    if bs_phases is None:
        phase_arr = jnp.zeros((1, ), jnp.int32)
    else:
        phase_arr = bs_phases.astype(jnp.int32)
    has_v_tables = v_block_tables is not None
    vt_arr = (v_block_tables.astype(jnp.int32) if has_v_tables
              else jnp.zeros((1, ), jnp.int32))
    kernel = functools.partial(
        _attention_kernel,
        scale=scale,
        block_size=block_size,
        kblk=kblk,
        bq=bq,
        l_pad=l_pad,
        sliding_window=sliding_window,
        soft_cap=soft_cap,
        has_alibi=has_alibi,
        blocksparse=blocksparse,
        has_v_tables=has_v_tables,
        packed=packed,
        fused=fused,
        interpret=interpret,
        **se_kwargs,
    )

    def kernel_5d(lr, bt, cl, ql, al, ph, vt, q5, kn4, vn4, kc, vc, o5,
                  ko, vo, kb, vb, sm, wsm):
        kernel(lr, bt, cl, ql, al, ph, vt, q5.at[0], kn4.at[0],
               vn4.at[0], kc, vc, o5.at[0], ko, vo, kb, vb, sm, wsm)

    def kernel_fused(lr, bt, cl, ql, al, ph, vt, q5, kn4, vn4, kvc, o5,
                     kvo, kb, vb, sm, wsm):
        # ONE cache operand; the kernel addresses K and V as row
        # ranges of the same ref (block_copies kind=0/1)
        kernel(lr, bt, cl, ql, al, ph, vt, q5.at[0], kn4.at[0],
               vn4.at[0], kvc, kvc, o5.at[0], kvo, kvo, kb, vb, sm,
               wsm)

    if packed and l_pad > _MERGE_WRITE_MAX:
        new_spec = pl.BlockSpec((1, num_kv_heads, l_pad // 2, 2 * head),
                                lambda b, qb, *refs: (b, 0, 0, 0))
    else:
        new_spec = pl.BlockSpec((1, num_kv_heads, l_pad, head),
                                lambda b, qb, *refs: (b, 0, 0, 0))
    if packed:
        buf_shape = (2, num_kv_heads, kblk, block_size // 2, 2 * head)
    else:
        buf_shape = (2, num_kv_heads, kblk, block_size, head)
    cache_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if not fused:
        cache_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, num_kv_heads, group, bq, head),
                         lambda b, qb, *refs: (b, 0, 0, qb, 0)),
            new_spec,
            new_spec,
        ] + cache_specs,
        out_specs=[
            pl.BlockSpec((1, num_kv_heads, group, bq, head),
                         lambda b, qb, *refs: (b, 0, 0, qb, 0)),
        ] + cache_specs,
        scratch_shapes=[
            pltpu.VMEM(buf_shape, k_cache.dtype),
            pltpu.VMEM(buf_shape, k_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2, kblk)),
            pltpu.SemaphoreType.DMA((2, wch)),
        ],
    )

    out_shape = [jax.ShapeDtypeStruct(qr.shape, q.dtype),
                 jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype)]
    cache_args = (k_cache, )
    if not fused:
        out_shape.append(
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype))
        cache_args = (k_cache, v_cache)
    results = pl.pallas_call(
        kernel_fused if fused else kernel_5d,
        grid_spec=grid_spec,
        out_shape=out_shape,
        # scalar-prefetch args count toward input positions: inputs are
        # (layer, tables, ctx, qlens, alibi, phases, v_tables, q, k_new,
        # v_new, k_cache[, v_cache])
        input_output_aliases={10: 1} if fused else {10: 1, 11: 2},
        # batch cells touch disjoint cache regions, so megacore may
        # split them; the q-tile dim accumulates and stays ordered.
        # vmem_limit: the default 16M scoped limit undercounts what the
        # sized tiles actually fit in (the _vmem_est budget governs);
        # v5e cores have 128M VMEM.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(layer_idx.astype(jnp.int32), block_tables,
      context_lens.astype(jnp.int32), query_lens.astype(jnp.int32),
      alibi_arr, phase_arr, vt_arr, qr, kn, vn, *cache_args)
    if fused:
        out, k_cache = results
        v_cache = None
    else:
        out, k_cache, v_cache = results

    # [B, Hkv, G, L, D] -> [B, L, Hq, D]
    out = out.transpose(0, 3, 1, 2, 4)
    return (out.reshape(batch, l_pad, num_q_heads, head), k_cache,
            v_cache)


def paged_attention_decode(
    q: jax.Array,  # [B, num_q_heads, head_size]
    k_new: jax.Array,  # [B, num_kv_heads, head_size]
    v_new: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    layer_idx: jax.Array,
    block_tables: jax.Array,
    context_lens: jax.Array,
    *,
    scale: float,
    sliding_window: Optional[int] = None,
    soft_cap: Optional[float] = None,
    interpret: bool = False,
    self_extend=None,
    alibi_slopes: Optional[jax.Array] = None,
    blocksparse: Optional[Tuple[int, int, int]] = None,
    bs_phases: Optional[jax.Array] = None,
    v_block_tables: Optional[jax.Array] = None,
):
    """Decode = the unified kernel with one new token per sequence."""
    batch = q.shape[0]
    out, k_cache, v_cache = paged_attention(
        q[:, None],
        k_new[:, None],
        v_new[:, None],
        k_cache,
        v_cache,
        layer_idx,
        block_tables,
        jnp.ones((batch, ), jnp.int32),
        context_lens,
        scale=scale,
        sliding_window=sliding_window,
        soft_cap=soft_cap,
        bq=1,
        interpret=interpret,
        self_extend=self_extend,
        alibi_slopes=alibi_slopes,
        blocksparse=blocksparse,
        bs_phases=bs_phases,
        v_block_tables=v_block_tables,
    )
    return out[:, 0], k_cache, v_cache


paged_attention_prefill = paged_attention
