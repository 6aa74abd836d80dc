"""Gang-batched, software-pipelined decode attention over the FUSED
paged KV cache.

Replaces the unified kernel's decode path (ops/pallas/
paged_attention.py) for the dense layout. Measurements on v5e
(benchmarks/micro/attn_decode_bench.py, fused_decode_bench.py) show
decode attention is bound by PER-GRID-CELL overhead, not bandwidth:
one sequence per cell costs ~3.1us regardless of context length
(ctx=64 and ctx=384 time identically), so 256 seqs x 22 layers ran at
~130 GB/s effective vs ~820 GB/s peak. Three structural fixes, all
needing kernel-level control the reference's CUDA paged_attention
v1/v2 (csrc/attention/attention_kernels.cu) gets from hardware caches
and SM oversubscription:

* **Fused KV blocks**: the cache is ONE array ``[L, N, 2R, rd]`` —
  block ``n`` holds, PER HEAD, that head's K rows then V rows
  (head-major, so tensor-parallel sharding of dim 2 hands each shard
  whole heads with their K AND V), and a block's K AND V arrive in
  ONE DMA.
  ``rd`` is the lane width: ``2*d`` with two tokens per row when that
  fills whole vregs (pair mode, head 64 -> zero padding), else the
  padded head size with one token per row (plain mode, head 128).

* **Gang batching**: each grid cell processes GANG sequences — the
  per-cell overhead (tile pipeline, grid bookkeeping, scalar setup)
  amortizes GANG-fold, and the score/attend matmuls batch over
  ``(gang, kv_head)`` so the MXU sees one big batched GEMM instead of
  GANG tiny ones.

* **Cross-unit software pipelining**: each core walks its cells'
  superblock units with a two-slot pipeline — while unit ``u``
  computes, unit ``u+1``'s DMAs (possibly the next gang's first) are
  in flight. A per-core SMEM unit counter carries slot parity across
  cells.

The new tokens' K/V rows are merged into the streamed tiles before
compute (keeping the unified kernel's fused-write property: no
separate reshape_and_cache pass, no cache scatter outside the kernel)
with pure-arithmetic selects (boolean broadcasts of mixed sublane/lane
layouts hit unimplemented Mosaic relayouts), and each spanned block is
written back as ONE fused DMA from a staging buffer, drained at the
next unit so the writeback rides under compute.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(-2.0**30)
_HI = jax.lax.Precision.HIGHEST


def _eq(a, b):
    """{0.,1.} equality indicator via arithmetic (no i1 relayouts)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return 1.0 - jnp.minimum(jnp.abs(a - b), 1.0)


def _fast_e4m3_to_bf16(x: jax.Array) -> jax.Array:
    """Exact e4m3fn -> bf16 upcast from fast integer primitives.

    Mosaic's native f8e4m3->bf16 convert_element_type lowers ~10x
    slower than int8 converts on v5e (the whole fused-decode kernel ran
    4x slower than its bf16 twin through it: 66 ms vs 16 ms at 13B
    decode shapes; swapping in an int8 convert alone gave 22 ms). This
    builds the bf16 bit pattern directly: for normals the bf16 bits are
    ((bits & 0x7f) << 4) + (120 << 7) — e4m3 bias 7 vs bf16 bias 127 —
    plus the sign in bit 15; subnormals (exp==0) decode as m * 2^-9.
    e4m3fn NaN (0x7f/0xff) is NOT mapped to NaN (it becomes +-480);
    quantized KV caches never store NaN, matching the reference
    kernels' finite-cache assumption
    (csrc/quantization/fp8/quant_utils.cuh upconverts finite values
    only).
    """
    # ONE int8->bf16 convert (the fast 8->16 widening primitive on
    # this target) reads the byte as its two's-complement value;
    # everything after is ordinary f32 arithmetic + one int16 bitcast.
    # Mosaic here lowers neither sub-32-bit vector compares nor int16
    # shifts, so: magnitude = value + 128 for negative bytes (f32
    # select), bf16 bit pattern = magnitude * 16 + 0x3C00 built in f32
    # (exact: <= 17392 < 2^24) and converted to int16 for the bitcast.
    v = jax.lax.bitcast_convert_type(x, jnp.int8).astype(
        jnp.bfloat16).astype(jnp.float32)  # [-128, 127] exact
    neg = v < 0.0
    mag = jnp.where(neg, v + 128.0, v)  # sign-magnitude bits, [0, 127]
    bits = (mag * 16.0 + 15360.0).astype(jnp.int16)
    val = jax.lax.bitcast_convert_type(bits, jnp.bfloat16).astype(
        jnp.float32)
    # subnormals (mag < 8): value = mantissa * 2^-9
    val = jnp.where(mag < 8.0, mag * (2.0**-9), val)
    return jnp.where(neg, -val, val).astype(jnp.bfloat16)


def _decode_kernel(
    # scalar prefetch
    layer_ref,  # [1] SMEM
    block_tables_ref,  # [B, maxb] SMEM
    context_lens_ref,  # [B] SMEM
    alibi_ref,  # [num_q_heads] SMEM f32
    bs_phase_ref,  # [num_q_heads] SMEM int32
    # inputs
    q_ref,  # [GANG, Hkv, G, D] VMEM tile
    kn_ref,  # [GANG, Hkv, D] VMEM tile
    vn_ref,  # [GANG, Hkv, D] VMEM tile
    kv_in,  # [L, N, 2R, rd] HBM (aliased)
    # outputs
    o_ref,  # [GANG, Hkv, G, D] VMEM tile
    kv_hbm,  # aliased HBM ref
    # scratch
    kv_buf,  # [2, GANG, KBLK, 2R, rd] VMEM
    m_ref,  # [GANG, Hkv, G, 1] f32 running max
    l_ref,  # [GANG, Hkv, G, 1] f32 running denom
    acc_ref,  # [GANG, Hkv, G, D] f32 running numerator
    cnt,  # [2] SMEM: unit counter, writeback-pending flag
    sem,  # DMA sems [2, GANG, KBLK]
    wsem,  # writeback sems [GANG]
    *,
    scale: float,
    block_size: int,
    kblk: int,
    gang: int,
    pair: bool,
    cells: int,  # grid cells per core
    sliding_window: Optional[int],
    soft_cap: Optional[float],
    has_alibi: bool,
    blocksparse: Optional[Tuple[int, int, int]],
    exact: bool,
    prewrite: bool = False,
):
    # exact=False (bf16 caches): operands stay/cast to bf16 and the
    # MXU runs single-pass — HIGHEST on f32 operands costs 6 passes,
    # which dominates decode at these tiny matmul shapes. bf16-sourced
    # data loses nothing. exact=True (f32 caches, unit tests): full
    # f32 passes for bit-level comparison against f64 oracles.
    mm_dt = jnp.float32 if exact else jnp.bfloat16
    mm_prec = _HI if exact else jax.lax.Precision.DEFAULT
    core = pl.program_id(0)
    cell = pl.program_id(1)
    b0 = (core * cells + cell) * gang  # first sequence of this gang

    _, hkv, g, d = q_ref.shape
    two_r, rd = kv_buf.shape[3], kv_buf.shape[4]
    r = two_r // 2
    rows = r // hkv  # rows per head per block
    sb = kblk * block_size  # tokens per superblock unit
    lyr = layer_ref[0]

    ctx_g = [context_lens_ref[b0 + s] for s in range(gang)]
    nb_g = [pl.cdiv(c, block_size) for c in ctx_g]
    ctx_max = ctx_g[0]
    for c in ctx_g[1:]:
        ctx_max = jnp.maximum(ctx_max, c)

    # sliding window trims the unit loop only where the WHOLE gang
    # agrees (per-seq masks stay exact regardless)
    first_sb = jnp.int32(0)
    if sliding_window is not None:
        lo = ctx_g[0] - sliding_window
        for c in ctx_g[1:]:
            lo = jnp.minimum(lo, c - sliding_window)
        first_sb = jnp.maximum(lo, 0) // sb
    nsb_gang = pl.cdiv(ctx_max, sb) - first_sb
    nsb_eff = jnp.maximum(nsb_gang, 1)  # dead gangs push a dummy unit

    def issue_or_wait_fetch(gang_b0, sb_off, slot, wait):
        """ONE fused DMA per (gang member, block), with ZERO per-DMA
        guard arithmetic: the wrapper pads block tables to a multiple
        of kblk columns with entry 0, so every superblock fetch is
        unconditional (pad fetches re-read block 0; their rows are
        position-masked in compute). Scalar guard chains — cdiv/min/
        compare per DMA — were costing more than the DMAs; the jax
        reference paged-attention kernel hits ~935 GB/s with MORE DMAs
        and leaner scalar code."""
        base = sb_off * kblk
        for s in range(gang):
            for j in range(kblk):
                blk = block_tables_ref[gang_b0 + s, base + j]
                cp = pltpu.make_async_copy(
                    kv_hbm.at[lyr, blk], kv_buf.at[slot, s, j],
                    sem.at[slot, s, j])
                if wait:
                    cp.wait()
                else:
                    cp.start()

    def first_sb_of_next():
        if sliding_window is None:
            return jnp.int32(0)
        nb0 = b0 + gang
        lo = context_lens_ref[nb0] - sliding_window
        for s in range(1, gang):
            lo = jnp.minimum(lo, context_lens_ref[nb0 + s] -
                             sliding_window)
        return jnp.maximum(lo, 0) // sb

    @pl.when(cell == 0)
    def _prologue():
        cnt[0] = 0
        cnt[1] = 0
        issue_or_wait_fetch(b0, first_sb, 0, wait=False)

    base_cnt = cnt[0]

    def wait_writebacks():
        # size-only waits: shape matches every pending writeback
        for s in range(gang):
            @pl.when((cnt[1] & (1 << s)) != 0)
            def _(s=s):
                pltpu.make_async_copy(kv_buf.at[0, 0, 0],
                                      kv_hbm.at[lyr, 0],
                                      wsem.at[s]).wait()
        cnt[1] = 0

    q = q_ref[...].astype(jnp.float32) * scale  # [GANG, Hkv, G, D]

    def unit(i, _):
        # running softmax state lives in VMEM refs, NOT loop carries:
        # fori carries materialize every iteration and serialize the
        # scalar core against the vector core (the jax reference
        # kernel's m/l/o-as-refs structure is what lets its scalar
        # unit run ahead and hide all DMA issue cost)
        m_prev = m_ref[...]
        l_prev = l_ref[...]
        acc = acc_ref[...]
        sb_idx = first_sb + i
        slot = (base_cnt + i) % 2

        # ---- keep the pipeline primed ----
        @pl.when(i + 1 < nsb_eff)
        def _():
            issue_or_wait_fetch(b0, sb_idx + 1, (base_cnt + i + 1) % 2,
                                wait=False)

        @pl.when(jnp.logical_and(i + 1 >= nsb_eff, cell + 1 < cells))
        def _():
            issue_or_wait_fetch(b0 + gang, first_sb_of_next(),
                                (base_cnt + nsb_eff) % 2, wait=False)

        issue_or_wait_fetch(b0, sb_idx, slot, wait=True)

        # previous unit's writebacks have had a full unit to land;
        # drain them before this unit possibly stages new ones (also
        # guards the buf slots: a block is never refetched this step)
        @pl.when(cnt[1] != 0)
        def _():
            wait_writebacks()

        # ---- fused new-token write: ONE batched RMW over the whole
        # unit buffer. Per-member merge graphs (16x onehot matmul +
        # selects + branches) were the dominant FIXED cost per cell —
        # ~250us/layer-call regardless of context length. Under
        # prewrite the rows were scattered into HBM by XLA before the
        # kernel, so the streamed blocks already carry them and the
        # whole merge/writeback stage vanishes (the tile blend cost
        # ~2.7 ms of an 11.3 ms decode call at batch 256).
        merge_g = []
        for s in range(gang):
            merge_g.append(jnp.logical_and(
                ctx_g[s] > 0,
                jnp.logical_and(nb_g[s] - 1 >= sb_idx * kblk,
                                nb_g[s] - 1 < (sb_idx + 1) * kblk)))
        any_merge = merge_g[0]
        for mgs in merge_g[1:]:
            any_merge = jnp.logical_or(any_merge, mgs)

        @pl.when(jnp.logical_and(any_merge, not prewrite))
        def _merge():
            def stack(vals, dt):
                return jnp.concatenate([
                    jnp.full((1, 1, 1, 1), v, dt) for v in vals
                ], axis=0)

            kn_all = kn_ref[...]  # [GANG, Hkv, D]
            vn_all = vn_ref[...]
            if pair:
                kn_all = jnp.concatenate([kn_all, kn_all], -1)
                vn_all = jnp.concatenate([vn_all, vn_all], -1)
            newr = jnp.concatenate([kn_all, vn_all], 1).astype(
                mm_dt)  # [GANG, 2*Hkv, rd]
            # dim-2 order: head h's K rows at [h*2*rows, +rows), its
            # V rows next; newr rows are [k_0..k_H-1, v_0..v_H-1]
            sub = jax.lax.broadcasted_iota(jnp.int32, (two_r, 1), 0)
            head_of = sub // (2 * rows)
            is_v = (sub // rows) % 2
            rowid = is_v * hkv + head_of  # [2R, 1]
            idx = jax.lax.broadcasted_iota(
                jnp.int32, (two_r, 2 * hkv), 1)
            onehot = jnp.broadcast_to(
                _eq(idx, rowid).astype(mm_dt),
                (gang, two_r, 2 * hkv))
            # batched one-hot row gather (exact: one-hot rows select
            # cache-dtype-representable values)
            src = jax.lax.dot_general(
                onehot, newr, (((2, ), (1, )), ((0, ), (0, ))),
                preferred_element_type=jnp.float32,
                precision=mm_prec)[:, None]  # [GANG, 1, 2R, rd]

            qpos_l = [c - 1 for c in ctx_g]
            row_v = stack([(p % block_size) // (2 if pair else 1)
                           for p in qpos_l], jnp.int32)
            jl_v = stack([nb_g[s] - 1 - sb_idx * kblk
                          for s in range(gang)], jnp.int32)
            gate_v = stack([m.astype(jnp.int32) for m in merge_g],
                           jnp.int32)
            r_of = ((sub % r) % rows)[None]  # [1, 2R, 1]
            base_sel = (_eq(r_of, row_v[:, 0]) *
                        gate_v[:, 0].astype(jnp.float32))  # [GANG,2R,1]
            if pair:
                half_v = stack([p % 2 for p in qpos_l], jnp.int32)
                lane_half = jax.lax.broadcasted_iota(
                    jnp.int32, (1, 1, rd), 2) // d
                base_sel = base_sel * _eq(lane_half, half_v[:, 0])
            # Blend in a Mosaic-arithmetic dtype: fp8 vectors have no
            # VPU mul/sub lowering, and e4m3/e5m2 values round-trip
            # bf16 exactly (wider mantissa + exponent range), so the
            # cast-blend-cast is exact for {0,1} selects either way.
            blend_dt = (jnp.bfloat16 if kv_buf.dtype.itemsize == 1
                        else kv_buf.dtype)
            src3 = src[:, 0].astype(blend_dt)  # [GANG, 2R, rd]
            # Per-COLUMN blend: a decode step lands each member's new
            # row in ONE block column, and gang members usually share
            # it (equal-phase contexts), so blending only the affected
            # [GANG, 2R, rd] column(s) cuts the RMW traffic kblk-fold
            # vs the previous whole-tile blend (~2.7 ms of an 11.3 ms
            # batch-256 decode call).
            for jcol in range(kblk):
                in_col = [jnp.logical_and(merge_g[s],
                                          jl_v[s, 0, 0, 0] == jcol)
                          for s in range(gang)]
                any_col = in_col[0]
                for ic in in_col[1:]:
                    any_col = jnp.logical_or(any_col, ic)

                @pl.when(any_col)
                def _(jcol=jcol, in_col=in_col):
                    # full-sublane per-member gates: a [G,1,1]->[G,2R,rd]
                    # scalar broadcast is an unimplemented Mosaic
                    # relayout; materializing the sublane dim up front
                    # keeps every broadcast single-axis
                    colgate = jnp.concatenate([
                        jnp.full((1, two_r, 1), ic, jnp.float32)
                        for ic in in_col
                    ], axis=0)  # [GANG, 2R, 1]
                    # NOTE: the blend keeps the NATIVE up/downcast pair
                    # — swapping the upcast for _fast_e4m3_to_bf16 here
                    # measured SLOWER end-to-end (42 ms vs 34 ms at 13B
                    # shapes): Mosaic appears to fuse the matched
                    # convert pair, while the arithmetic decode forces
                    # a standalone downcast on the write
                    sel = (base_sel * colgate).astype(blend_dt)
                    tile = kv_buf[slot, :, jcol].astype(blend_dt)
                    kv_buf[slot, :, jcol] = (
                        tile * (1.0 - sel) + src3 * sel
                    ).astype(kv_buf.dtype)
            # async writebacks straight from the unit buffer: the slot
            # is reused two units later and writebacks drain at the
            # NEXT unit, so the buffer is stable for the DMA's life
            for s in range(gang):
                @pl.when(merge_g[s])
                def _(s=s):
                    jls = nb_g[s] - 1 - sb_idx * kblk
                    for j in range(kblk):
                        @pl.when(jls == j)
                        def _(s=s, j=j):
                            blk = block_tables_ref[b0 + s, nb_g[s] - 1]
                            pltpu.make_async_copy(
                                kv_buf.at[slot, s, j],
                                kv_hbm.at[lyr, blk],
                                wsem.at[s]).start()
                    cnt[1] = cnt[1] | (1 << s)

        # ---- attention over the unit, one block COLUMN at a time ----
        # Per-column online softmax replaces the old whole-unit
        # reshape/transpose path: the [GANG, KBLK, 2R, rd] ->
        # [GANG, Hkv, KBLK*rows, rd] transposes and the valid-masked
        # K/V copies were the largest VMEM intermediates at MHA shapes
        # and the dominant vector work per unit — per-column slices
        # come straight out of the DMA buffer with no relayout, which
        # frees the VMEM budget to deepen the gang/kblk DMA pipeline.
        # Streamed-garbage safety: the KV pool is ZERO-INITIALIZED at
        # allocation (worker/cache_engine.py) and every later write is
        # a finite model activation, so masked (keep==0) columns
        # contribute exactly 0 via p = keep * exp(...) — no jnp.where
        # copies needed (same finite-cache assumption as the
        # reference's CUDA kernels, csrc/attention/attention_kernels.cu
        # — reads past a sequence's length never see NaN/inf). The f32
        # exact path (unit tests) keeps the explicit zeroing so its
        # oracle comparisons stay independent of pool contents.

        # per-member scalars broadcast to [GANG, 1, 1, 1]
        ctx_v = jnp.concatenate([
            jnp.full((1, 1, 1, 1), c, jnp.int32) for c in ctx_g
        ], axis=0)
        qpos_v = ctx_v - 1

        row_lane = jax.lax.broadcasted_iota(jnp.int32, (1, rows), 1)
        row_col = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        if has_alibi:
            alibi_slope = jnp.concatenate([
                jnp.full((1, 1, 1, 1), alibi_ref[h * g + gi],
                         jnp.float32) for h in range(hkv)
                for gi in range(g)
            ], axis=1).reshape(1, hkv, g, 1)
        if blocksparse is not None:
            bs_phase = jnp.concatenate([
                jnp.full((1, 1, 1, 1), bs_phase_ref[h * g + gi],
                         jnp.int32) for h in range(hkv)
                for gi in range(g)
            ], axis=1).reshape(1, hkv, g, 1)

        q_mm = q.astype(mm_dt).reshape(gang * hkv, g, d)

        state = [m_prev, l_prev, acc]

        def seg_update(k, v, pos, pos_col):
            """Online-softmax update with one K/V segment."""
            m_p, l_p, a_p = state
            if exact:
                # unit tests compare against oracles on arbitrary pool
                # contents: zero out-of-context rows
                valid = (ctx_v - pos_col[None, None]) > 0
                k = jnp.where(valid, k, 0.0)
                v = jnp.where(valid, v, 0.0)
            # fuse (gang, hkv) into ONE batch dim: Mosaic matmul
            # supports at most one
            nr = k.shape[2]
            s_ = jax.lax.dot_general(
                q_mm,
                k.reshape(gang * hkv, nr, d),
                (((2, ), (2, )), ((0, ), (0, ))),
                preferred_element_type=jnp.float32,
                precision=mm_prec).reshape(gang, hkv, g, nr)
            if soft_cap is not None:
                s_ = soft_cap * jnp.tanh(s_ / soft_cap)
            if has_alibi:
                s_ = s_ + alibi_slope * (pos[None] - qpos_v).astype(
                    jnp.float32)
            # mask: pos <= q_pos (=> also < ctx)
            keep = 1.0 - jnp.minimum(
                jnp.maximum(pos[None] - qpos_v, 0), 1).astype(
                    jnp.float32)  # [GANG, 1, 1, S]
            if sliding_window is not None:
                keep = keep * (1.0 - jnp.minimum(
                    jnp.maximum(
                        qpos_v - sliding_window + 1 - pos[None],
                        0), 1).astype(jnp.float32))
            if blocksparse is not None:
                bs_blk, lblk, vs = blocksparse
                k_blk = pos[None] // bs_blk
                local_ok = 1.0 - jnp.minimum(jnp.maximum(
                    qpos_v // bs_blk - k_blk - (lblk - 1), 0),
                    1).astype(jnp.float32)
                vert_ok = _eq((k_blk + bs_phase + 1) % vs, 0)
                keep = keep * jnp.minimum(local_ok + vert_ok, 1.0)
            s_ = s_ + (keep - 1.0) * (-_NEG_INF)  # keep==0 -> -inf
            m_new = jnp.maximum(m_p,
                                jnp.max(s_, axis=3, keepdims=True))
            alpha = jnp.exp(m_p - m_new)
            p = jnp.exp(s_ - m_new) * keep
            l_new = l_p * alpha + jnp.sum(p, axis=3, keepdims=True)
            a_new = a_p * alpha + jax.lax.dot_general(
                p.astype(mm_dt).reshape(gang * hkv, g, nr),
                v.reshape(gang * hkv, nr, d),
                (((2, ), (1, )), ((0, ), (0, ))),
                preferred_element_type=jnp.float32,
                precision=mm_prec).reshape(gang, hkv, g, d)
            state[0], state[1], state[2] = m_new, l_new, a_new

        # 1-byte caches upcast the WHOLE unit ONCE, on the buffer's
        # natural contiguous layout — 8-bit strided column slices force
        # Mosaic 8-bit relayouts (measured: per-column e4m3 decode ran
        # the 7B sweep 13.2 ms vs 8.4 bf16; whole-unit-first restores
        # the round-4 behavior). 16-bit caches slice the ref per
        # column instead (no whole-unit materialization at all).
        kv_up = None
        if jnp.dtype(kv_buf.dtype).itemsize == 1 or pair:
            kv_up = kv_buf[slot]  # [GANG, KBLK, 2R, rd]
            if jnp.dtype(kv_up.dtype) == jnp.float8_e4m3fn:
                kv_up = _fast_e4m3_to_bf16(kv_up)
            elif kv_up.dtype != mm_dt:
                kv_up = kv_up.astype(mm_dt)

        if pair:
            # pair mode (small heads, GQA): per-column rows are too
            # short for efficient matmuls (TinyLlama: rows=32, halved
            # again into even/odd segs -> 8 tiny GEMMs/unit regressed
            # the engine 13%); keep the whole-unit transpose so each
            # seg spans kblk*rows
            kv_u = kv_up.reshape(gang, kblk, hkv, 2, rows, rd)
            k_t = kv_u[:, :, :, 0].transpose(0, 2, 1, 3, 4).reshape(
                gang, hkv, kblk * rows, rd)
            v_t = kv_u[:, :, :, 1].transpose(0, 2, 1, 3, 4).reshape(
                gang, hkv, kblk * rows, rd)
            nrows = kblk * rows
            lane_u = jax.lax.broadcasted_iota(jnp.int32, (1, nrows), 1)
            col_u = jax.lax.broadcasted_iota(jnp.int32, (nrows, 1), 0)
            base_tok = sb_idx * sb
            seg_update(k_t[..., :d], v_t[..., :d],
                       base_tok + 2 * lane_u, base_tok + 2 * col_u)
            seg_update(k_t[..., d:], v_t[..., d:],
                       base_tok + 2 * lane_u + 1,
                       base_tok + 2 * col_u + 1)
        else:
            for jcol in range(kblk):
                if kv_up is not None:
                    col = kv_up[:, jcol]  # [GANG, 2R, rd] bf16 slice
                else:
                    col = kv_buf[slot, :, jcol]  # [GANG, 2R, rd]
                    if col.dtype != mm_dt:
                        col = col.astype(mm_dt)
                kv_col = col.reshape(gang, hkv, 2, rows, rd)
                base_tok = (sb_idx * kblk + jcol) * block_size
                seg_update(kv_col[:, :, 0], kv_col[:, :, 1],
                           base_tok + row_lane, base_tok + row_col)
        m_ref[...] = state[0]
        l_ref[...] = state[1]
        acc_ref[...] = state[2]
        return 0

    m_ref[...] = jnp.full((gang, hkv, g, 1), _NEG_INF, jnp.float32)
    l_ref[...] = jnp.zeros((gang, hkv, g, 1), jnp.float32)
    acc_ref[...] = jnp.zeros((gang, hkv, g, d), jnp.float32)
    jax.lax.fori_loop(0, nsb_eff, unit, 0)
    cnt[0] = base_cnt + nsb_eff

    l = l_ref[...]
    out = acc_ref[...] / jnp.where(l == 0.0, 1.0, l)
    o_ref[...] = out.astype(o_ref.dtype)

    # drain writebacks before the kernel retires
    @pl.when(jnp.logical_and(cell == cells - 1, cnt[1] != 0))
    def _drain():
        wait_writebacks()


@functools.partial(
    jax.jit,
    static_argnames=("scale", "num_kv_heads", "sliding_window",
                     "soft_cap", "kblk", "gang", "interpret",
                     "blocksparse"),
)
def fused_decode_attention(
    q: jax.Array,  # [B, num_q_heads, d]
    k_new: jax.Array,  # [B, num_kv_heads, d]
    v_new: jax.Array,
    kv_cache: jax.Array,  # [L, N, 2R, rd] fused pair/plain
    layer_idx: jax.Array,  # [1] int32
    block_tables: jax.Array,  # [B, maxb] int32
    context_lens: jax.Array,  # [B] int32
    *,
    scale: float,
    num_kv_heads: int,
    sliding_window: Optional[int] = None,
    soft_cap: Optional[float] = None,
    alibi_slopes: Optional[jax.Array] = None,
    blocksparse: Optional[Tuple[int, int, int]] = None,
    bs_phases: Optional[jax.Array] = None,
    kblk: int = 4,
    gang: int = 16,
    prewrite: Optional[bool] = None,
    interpret: bool = False,
):
    """Returns (out [B, num_q_heads, d], kv_cache) — cache updated in
    place (aliased) with the new K/V rows at position ctx-1.

    ``prewrite`` (default VLT_DECODE_PREWRITE): scatter the new rows
    into the HBM cache via XLA BEFORE the kernel instead of merging
    them into the streamed tiles inside it — the blocks then arrive
    already up to date and the in-kernel merge/writeback disappears."""
    batch, num_q_heads, d = q.shape
    hkv = num_kv_heads
    group = num_q_heads // hkv
    # fused-plain arrives 5-D [L, N, 2*Hkv, bs, dpad]; flatten to the
    # kernel's 4-D row form (dims 2-3 merge on a tile boundary:
    # metadata-only, and XLA aliases through the round-trip reshapes)
    plain_shape = None
    if kv_cache.ndim == 5:
        plain_shape = kv_cache.shape
        lnum, nblk, two_h, bs_, dp = plain_shape
        kv_cache = kv_cache.reshape(lnum, nblk, two_h * bs_, dp)
        pair = False
    else:
        pair = True
    _, _, two_r, rd = kv_cache.shape
    r = two_r // 2
    if pair:
        assert rd == 2 * d, (kv_cache.shape, d)
    rows = r // hkv
    block_size = rows * (2 if pair else 1)

    if prewrite is None:
        import os as _os
        # 1-byte caches default to prewrite: the in-kernel merge's
        # cast-blend-cast on 1-byte tiles costs ~10 ms per 20-layer
        # decode sweep at 13B shapes (34.8 ms vs 25.1 with the XLA
        # scatter landing the rows before the kernel). An explicitly
        # set VLT_DECODE_PREWRITE (0 or 1) wins over the dtype default.
        raw = _os.getenv("VLT_DECODE_PREWRITE")
        prewrite = (bool(int(raw)) if raw is not None else
                    jnp.dtype(kv_cache.dtype).itemsize == 1)
    if prewrite:
        # Scatter the new K/V rows into the cache up front (XLA keeps
        # the donated buffer in place); dead batch rows (ctx == 0)
        # target block -1 and are dropped.
        lyr = layer_idx.astype(jnp.int32)[0]
        qpos = context_lens.astype(jnp.int32) - 1  # [B]
        safe_qpos = jnp.maximum(qpos, 0)
        blk = jnp.take_along_axis(
            block_tables, (safe_qpos // block_size)[:, None],
            axis=1)[:, 0]
        blk = jnp.where(qpos >= 0, blk, -1)  # drop dead rows
        head_base = jnp.arange(hkv, dtype=jnp.int32) * 2 * rows
        if pair:
            rrow = (safe_qpos % block_size) // 2
            half = (safe_qpos % 2)[:, None, None]
            krows = head_base[None, :] + rrow[:, None]  # [B, hkv]
            vrows = krows + rows
            lane = (jnp.arange(rd, dtype=jnp.int32) // d)[None, None, :]
            sel = lane == half
            old_k = kv_cache[lyr, blk[:, None], krows]  # [B, hkv, rd]
            old_v = kv_cache[lyr, blk[:, None], vrows]
            nk = jnp.where(sel, jnp.concatenate([k_new, k_new],
                                                -1).astype(kv_cache.dtype),
                           old_k)
            nv = jnp.where(sel, jnp.concatenate([v_new, v_new],
                                                -1).astype(kv_cache.dtype),
                           old_v)
        else:
            rrow = safe_qpos % block_size
            krows = head_base[None, :] + rrow[:, None]
            vrows = krows + rows
            nk = k_new.astype(kv_cache.dtype)
            nv = v_new.astype(kv_cache.dtype)
        kv_cache = kv_cache.at[lyr, blk[:, None], krows].set(
            nk, mode="drop")
        kv_cache = kv_cache.at[lyr, blk[:, None], vrows].set(
            nv, mode="drop")

    ncores = 2 if batch % 2 == 0 else 1
    # gang: as large as divides the per-core batch
    while gang > 1 and (batch // ncores) % gang != 0:
        gang //= 2
    cells = batch // (ncores * gang)

    # VMEM budget: double-buffered gang units + staging + compute
    # copies. Compute buffers are sized at the ACTUAL matmul dtype
    # (bf16 fast path / f32 exact) — the old always-f32 estimate halved
    # gang at MHA (hkv=40) shapes for nothing, costing ~2x per-unit
    # overhead amortization on 13B decode.
    itm = jnp.dtype(kv_cache.dtype).itemsize
    exact = jnp.dtype(kv_cache.dtype) == jnp.float32
    mm_sz = 4 if exact else 2
    blk_bytes = two_r * rd * itm

    def vmem_est(gang_, kblk_):
        bufs = (2 * kblk_ + 1) * gang_ * blk_bytes
        # plain mode computes per COLUMN (no whole-unit transposes):
        # one column's slice copies live at a time (x2 headroom for
        # Mosaic keeping the next column's slice in flight); 1-byte
        # caches add the whole-unit bf16 upcast copy; pair mode keeps
        # the whole-unit k_t/v_t transposes (+ their d-wide halves)
        col = 2 * gang_ * two_r * rd * mm_sz
        if itm == 1 or pair:
            col += gang_ * kblk_ * two_r * rd * mm_sz
        if pair:
            col += 2 * gang_ * kblk_ * r * rd * mm_sz * 2
        nr_est = kblk_ * rows if pair else rows
        smat = 3 * gang_ * hkv * group * nr_est * (
            2 if pair else 1) * 4
        acc = 4 * gang_ * hkv * group * max(d, 32) * 4
        return bufs + col + smat + acc

    # Mosaic's true scoped-vmem usage runs ~2.5x this estimate (stack
    # temporaries). Measured at 13B MHA decode shapes: gang=8 fits the
    # chip (fp8 actual 100M) but runs SLOWER than gang=4 (42.9 ms vs
    # 33.6 — VMEM pressure starves the DMA pipeline), so the budget is
    # set where those shapes settle at gang=4. Tunable for sweeps.
    import os as _os
    budget = int(_os.getenv("VLT_DECODE_VMEM_BUDGET_MB", "34")) * 2**20
    kblk_cap = kblk
    while kblk > 1 and vmem_est(gang, kblk) > budget:
        kblk //= 2
    while gang > 1 and vmem_est(gang, kblk) > budget:
        gang //= 2
        cells = batch // (ncores * gang)
    # regrow kblk once gang settled: fewer, larger units amortize the
    # per-unit overhead (7B-shape sweep: gang=4 kblk=2 ran 10.3 ms vs
    # 11.3 at kblk=1; 13B shapes stay gang=4 kblk=1 under this budget)
    while kblk < kblk_cap and vmem_est(gang, kblk * 2) <= budget:
        kblk *= 2
    # same-footprint trade: (gang/2, kblk*2) streams identical bytes
    # per unit but halves DMA count — measured faster at 7B MHA shapes
    # (gang=4 kblk=2: 10.3 ms vs gang=8 kblk=1: 10.8)
    if kblk == 1 and kblk_cap > 1 and gang >= 8 and \
            (batch // ncores) % (gang // 2) == 0 and \
            vmem_est(gang // 2, 2) <= budget:
        gang //= 2
        kblk = 2
        cells = batch // (ncores * gang)

    qr = q.reshape(ncores * cells, gang, hkv, group, d)
    kn = k_new.reshape(ncores * cells, gang, hkv,
                       d).astype(kv_cache.dtype)
    vn = v_new.reshape(ncores * cells, gang, hkv,
                       d).astype(kv_cache.dtype)

    # pad tables to a kblk multiple so superblock fetches need no
    # per-DMA bounds guards (pad entries are 0 and position-masked)
    maxb = block_tables.shape[1]
    pad_cols = (-maxb) % kblk
    if pad_cols:
        block_tables = jnp.pad(block_tables, ((0, 0), (0, pad_cols)))

    has_alibi = alibi_slopes is not None
    alibi_arr = (alibi_slopes.astype(jnp.float32) if has_alibi
                 else jnp.zeros((1, ), jnp.float32))
    phase_arr = (bs_phases.astype(jnp.int32) if bs_phases is not None
                 else jnp.zeros((1, ), jnp.int32))

    kernel = functools.partial(
        _decode_kernel,
        scale=scale,
        block_size=block_size,
        kblk=kblk,
        gang=gang,
        pair=pair,
        cells=cells,
        sliding_window=sliding_window,
        soft_cap=soft_cap,
        has_alibi=has_alibi,
        blocksparse=blocksparse,
        # exact (f32 ops + HIGHEST precision, ~6x MXU passes) is for
        # float32-cache unit tests ONLY. FP8 caches must take the bf16
        # fast path — e4m3/e5m2 upcast to bf16 exactly, and HIGHEST on
        # their f32 upcasts was costing ~7x decode time (104 ms/iter on
        # Llama-13B FP8-KV vs ~15 ms roofline).
        exact=jnp.dtype(kv_cache.dtype) == jnp.float32,
        prewrite=prewrite,
    )

    def kernel_flat(lr, bt, cl, al, ph, q5, kn5, vn5, kvc, o5, kvo,
                    kvb, mr, lr_, ar, cnt, sm, wsm):
        kernel(lr, bt, cl, al, ph, q5.at[0], kn5.at[0], vn5.at[0], kvc,
               o5.at[0], kvo, kvb, mr, lr_, ar, cnt, sm, wsm)

    def cell_map(c, i, *refs):
        return (c * cells + i, 0, 0, 0, 0)

    def cell_map4(c, i, *refs):
        return (c * cells + i, 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(ncores, cells),
        in_specs=[
            pl.BlockSpec((1, gang, hkv, group, d), cell_map),
            pl.BlockSpec((1, gang, hkv, d), cell_map4),
            pl.BlockSpec((1, gang, hkv, d), cell_map4),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, gang, hkv, group, d), cell_map),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, gang, kblk, two_r, rd), kv_cache.dtype),
            pltpu.VMEM((gang, hkv, group, 1), jnp.float32),
            pltpu.VMEM((gang, hkv, group, 1), jnp.float32),
            pltpu.VMEM((gang, hkv, group, d), jnp.float32),
            pltpu.SMEM((2, ), jnp.int32),
            pltpu.SemaphoreType.DMA((2, gang, kblk)),
            pltpu.SemaphoreType.DMA((gang, )),
        ],
    )

    out, kv_cache = pl.pallas_call(
        kernel_flat,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(qr.shape, q.dtype),
            jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
        ],
        # inputs: (layer, tables, ctx, alibi, phases, q, kn, vn, kv)
        input_output_aliases={8: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(layer_idx.astype(jnp.int32), block_tables,
      context_lens.astype(jnp.int32), alibi_arr, phase_arr, qr, kn, vn,
      kv_cache)

    if plain_shape is not None:
        kv_cache = kv_cache.reshape(plain_shape)
    return out.reshape(batch, num_q_heads, d), kv_cache
