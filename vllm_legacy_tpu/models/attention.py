"""Device-agnostic attention layer: KV-cache write + paged attention.

The role of the reference's ``vllm/attention/layer.py`` Attention
nn.Module + backend dispatch: models call :func:`attention` which scatters
the new K/V into the paged cache and runs the unified Pallas kernel.
Model code runs inside ``shard_map`` over the device mesh, so all shapes
here are per-shard (heads already divided by the "model" axis size).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from vllm_legacy_tpu.ops import attention as attn_ops



LANE = 128


def padded_head_size(head_size: int) -> int:
    """TPU lane width padding for the cache head dim.

    XLA physically tiles the last dim of every array to 128 lanes, so a
    cache allocated at head_size < 128 wastes the same HBM anyway while
    making Mosaic DMA slices misaligned. Padding is explicit instead:
    zero cost for head 128/256 models (Llama-2/3, Mistral, Qwen2);
    head-64 models can instead use the flat-packed layout below.
    """
    return ((head_size + LANE - 1) // LANE) * LANE


def use_packed_kv(head_size: int, *, sparse=None, block_size: int = 16,
                  self_extend=None) -> bool:
    """Pair-packed KV rows ([L, N, Hkv*(bs/2), 2*d]: two consecutive
    tokens per 2*d lane row) — halves KV HBM bytes and decode DMA
    traffic for head_size < 128 vs the lane-padded 5-D layout.
    Default-on (VLT_PACKED_KV=0 opts out) when the pairing is exact:

    * 2*d must fill whole 128-lane vregs (d = 64, 192, ...) or the pair
      row pads right back;
    * bs/2 pair rows per block must stay a multiple of the 8-sublane
      tile so the in-kernel HBM ref reshape splits on a tile boundary;
    * the HiP per-head-table path and self-extend (in-kernel per-token
      rope) assume per-token rows.
    """
    from vllm_legacy_tpu import envs
    if not envs.VLT_PACKED_KV:
        return False
    return (padded_head_size(head_size) != head_size
            and (2 * head_size) % LANE == 0
            and (block_size // 2) % 8 == 0
            and sparse is None and self_extend is None)


def use_fused_kv(*, sparse=None, v_offload: bool = False) -> bool:
    """FUSED single-buffer KV cache ([L, N, Hkv*2*rows, rd]: each
    block holds every local head's K rows then V rows, head-major so
    TP shards own whole heads) — a block's K AND V arrive in ONE DMA
    and decode runs the gang-batched pipelined kernel
    (ops/pallas/fused_decode.py). Default for the dense path
    (VLT_FUSED_KV=0 opts out); the HiP top-k and V-offload paths keep
    split 5-D caches (per-head virtual tables / V ring pool need
    independently addressed K and V)."""
    from vllm_legacy_tpu import envs
    if not envs.VLT_FUSED_KV:
        return False
    return sparse is None and not v_offload


def kv_cache_shape(num_layers: int, num_blocks: int, num_kv_heads: int,
                   block_size: int, head_size: int, *,
                   packed: bool, fused: bool = False) -> tuple:
    if fused and packed:
        return (num_layers, num_blocks,
                num_kv_heads * 2 * (block_size // 2), 2 * head_size)
    if fused:
        return (num_layers, num_blocks, num_kv_heads * 2, block_size,
                padded_head_size(head_size))
    if packed:
        return (num_layers, num_blocks,
                num_kv_heads * (block_size // 2), 2 * head_size)
    return (num_layers, num_blocks, num_kv_heads, block_size,
            padded_head_size(head_size))


class SparseAttentionConfig(NamedTuple):
    """Long-context sparse decode (capability of the reference fork's
    HiP attention, attention/backends/hip.py:32 + env HIP_K /
    HIP_DENSE_LAYERS :106-110 — see ops/hip_mask.py for the TPU-first
    redesign). ``top_k`` is the attended-key budget per kv head in
    tokens; blocks beyond it are pruned by representative-key scoring.
    """
    top_k: int = 1024  # HIP_K equivalent (tokens per kv head)
    dense_layers: int = 3  # first layers stay dense (HIP_DENSE_LAYERS)
    num_sink: int = 1  # always-attended leading blocks
    num_recent: int = 2  # always-attended trailing blocks
    # V-offload residency (fork CACHE_ENGINE=offload_v): selection is
    # restricted to sink + the last v_window_blocks entries, whose V
    # lives in the HBM ring pool (0 = no restriction). Set by the
    # worker from CacheConfig.v_offload_window.
    v_window_blocks: int = 0


class BlocksparseSpec(NamedTuple):
    """Phi-3-Small blocksparse pattern (reference:
    attention/backends/blocksparse_attn.py + ops/blocksparse_attention/
    utils.py:180-192): token (q, k) attends iff causal AND
    (q_blk - k_blk < local_blocks OR
     (k_blk + head*sliding_step + 1) % vert_stride == 0).

    ``phases`` carries head*sliding_step per LOCAL q head (computed from
    the global head index by the model layer, so TP shards mask their
    own stripe offsets; zeros for homo_head patterns).
    """
    block_size: int
    local_blocks: int
    vert_stride: int
    phases: Any  # jax.Array [num_q_heads local] int32


class AttentionMetadata(NamedTuple):
    """Per-step device metadata (reference: attention/backends/abstract.py
    AttentionMetadata :102, built by model_runner._prepare_model_input).

    Shapes (B = padded batch, L = padded tokens per seq; L == 1 for
    decode-only steps):
      slot_mapping  [B * L] int32  flat cache slot per new token (<0 pad)
      block_tables  [B, max_blocks] int32
      context_lens  [B] int32  total kv length incl. new tokens
      query_lens    [B] int32  new tokens this step
    """
    slot_mapping: jax.Array
    block_tables: jax.Array
    context_lens: jax.Array
    query_lens: jax.Array
    # V-offload ring-slot table [B, max_blocks] (None = V shares the
    # physical table)
    v_block_tables: Any = None
    # exact-offload availability [B, max_blocks] bool: True where the
    # entry's V is resident (in-window or staged); the sparse selection
    # restricts to these instead of the window (None = window rule)
    v_avail: Any = None


def attention(
    q: jax.Array,  # [B, L, num_q_heads(local), head]
    k: jax.Array,  # [B, L, num_kv_heads(local), head]
    v: jax.Array,  # [B, L, num_kv_heads(local), head]
    kv_cache: Tuple[jax.Array, jax.Array],  # stacked [L, N, H, bs, D]
    md: AttentionMetadata,
    *,
    scale: float,
    layer_idx: int = 0,
    sliding_window: Optional[int] = None,
    soft_cap: Optional[float] = None,
    sparse: Optional[SparseAttentionConfig] = None,
    self_extend=None,  # Optional[SelfExtendSpec]; q/k arrive UNROTATED
    alibi_slopes: Optional[jax.Array] = None,  # [Hq(local)] f32
    blocksparse: Optional[BlocksparseSpec] = None,
    kv_scale: Optional[jax.Array] = None,  # () f32, fp8 KV dequant scale
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Returns (attn output [B, L, Hq, D], updated kv cache).

    The kernel writes the new K/V into the cache itself (fused,
    input/output-aliased) — see ops/pallas/paged_attention.py for why
    this is load-bearing for in-place cache donation.

    FP8 KV scale (reference: Fp8KVCacheMethod kv_scale, fp8.py:259;
    llama.py:477-493): the cache stores K/kv_scale and V/kv_scale in
    e4m3; because K and V enter attention linearly, dequantization is
    folded into q (q *= kv_scale, so q.k_stored recovers true logits —
    rope commutes, it's a rotation) and the output (out *= kv_scale).
    The kernels never see a scale — exact algebra, zero kernel cost.
    """
    b, l, hq, d = q.shape
    cache_dt = jnp.dtype(kv_cache[0].dtype)
    is_int8_kv = cache_dt == jnp.int8
    if is_int8_kv and kv_scale is None:
        # int8 KV NEEDS a scale (resolution 1.0 is useless for ~N(0,1)
        # KV values). Default 1/8: range +-15.9 at step 0.125 (~3.6%
        # rms error on unit-variance values, comparable to e4m3 with 2x
        # the clip headroom); calibrated per-layer scales load via
        # --quantization-param-path exactly as for fp8.
        kv_scale = jnp.asarray(0.125, jnp.float32)
    if kv_scale is not None and cache_dt.itemsize == 1:
        inv = (1.0 / kv_scale).astype(q.dtype)
        s = jnp.asarray(kv_scale, q.dtype)
        k = k * inv
        v = v * inv
        if is_int8_kv:
            # The cast sites (.astype(int8) at the prewrite scatter /
            # in-kernel merge / prefill write) truncate toward zero and
            # wrap on overflow; pre-round and clip here so every cast
            # downstream is exact. Integer values <= 127 are exact in
            # bf16 and f32 alike.
            k = jnp.clip(jnp.round(k), -127.0, 127.0)
            v = jnp.clip(jnp.round(v), -127.0, 127.0)
        q = q * s
    else:
        kv_scale = None
    fused = len(kv_cache) == 1
    wanted_acc = None
    if fused:
        # [L, N, Hkv*2*rows, 2d] pair (4-D) or
        # [L, N, Hkv*2, bs, dpad] plain (5-D)
        k_cache, v_cache = kv_cache[0], None
        packed = k_cache.ndim == 4
    elif len(kv_cache) == 3:
        # exact V-offload: third element is the [S, M] wanted-scores
        # accumulator the staging planner reads back (see
        # worker/cache_engine host V pool + model_runner staging)
        k_cache, v_cache, wanted_acc = kv_cache
        packed = False
        if layer_idx == 0:
            wanted_acc = jnp.zeros_like(wanted_acc)
    else:
        k_cache, v_cache = kv_cache
        packed = False  # split caches are always the plain 5-D layout
    d_pad = d if packed else k_cache.shape[-1]
    if d_pad != d:
        pad = [(0, 0)] * 3 + [(0, d_pad - d)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    lidx = jnp.asarray([layer_idx], jnp.int32)

    if self_extend is not None:
        assert sparse is None and sliding_window is None, (
            "self-extend composes with dense global attention only")
    bs_args = {}
    if blocksparse is not None:
        assert sparse is None and sliding_window is None, (
            "blocksparse does not compose with HiP top-k or sliding "
            "window")
        bs_args = dict(
            blocksparse=(blocksparse.block_size,
                         blocksparse.local_blocks,
                         blocksparse.vert_stride),
            bs_phases=blocksparse.phases)
    offload = md.v_block_tables is not None
    if offload:
        assert not fused and not packed, (
            "V-offload requires the split 5-D cache layout")
        assert sparse is not None and sparse.v_window_blocks > 0, (
            "V-offload needs sparse attention with v_window_blocks set "
            "(worker validates the pairing)")
    if l == 1:
        tables, ctx = md.block_tables, md.context_lens
        v_tables = md.v_block_tables
        # under offload EVERY layer must restrict to resident V, so the
        # dense-layers carve-out does not apply
        use_sparse = (sparse is not None and sliding_window is None
                      and not fused and not packed
                      and (offload or layer_idx >= sparse.dense_layers))
        if use_sparse:
            from vllm_legacy_tpu.ops.hip_mask import select_kv_blocks
            block_size = k_cache.shape[3]
            num_sel = max(sparse.top_k // block_size,
                          sparse.num_sink + sparse.num_recent + 1)
            if num_sel < tables.shape[1]:  # else dense is never pruned
                exact = wanted_acc is not None and md.v_avail is not None
                sel = select_kv_blocks(
                    q[:, 0], k_cache, lidx, tables, ctx,
                    num_sel=num_sel, num_sink=sparse.num_sink,
                    num_recent=sparse.num_recent,
                    window_blocks=sparse.v_window_blocks,
                    v_block_tables=v_tables,
                    avail_entries=md.v_avail if exact else None,
                    want_scores=exact)
                if exact:
                    tables, v_tables, ctx, wanted = sel
                    bsz, m = wanted.shape
                    wanted_acc = jax.lax.dynamic_update_slice(
                        wanted_acc,
                        (jax.lax.dynamic_slice(
                            wanted_acc, (0, 0), (bsz, m)) +
                         wanted).astype(wanted_acc.dtype), (0, 0))
                elif offload:
                    tables, v_tables, ctx = sel
                else:
                    tables, ctx = sel
        if fused and self_extend is None:
            out, k_cache = attn_ops.fused_decode(
                q[:, 0], k[:, 0], v[:, 0], k_cache, lidx, tables, ctx,
                scale=scale, num_kv_heads=k.shape[2],
                sliding_window=sliding_window, soft_cap=soft_cap,
                alibi_slopes=alibi_slopes, **bs_args)
        else:
            out, k_cache, v_cache = attn_ops.paged_attention_decode(
                q[:, 0], k[:, 0], v[:, 0], k_cache, v_cache, lidx,
                tables, ctx, scale=scale,
                sliding_window=sliding_window, soft_cap=soft_cap,
                self_extend=self_extend, alibi_slopes=alibi_slopes,
                v_block_tables=v_tables, **bs_args)
        out = out[:, None]
    else:
        eff_window = sliding_window
        if offload:
            # prefill exactness is bounded by V residency: mask to the
            # ring window (sink blocks additionally survive for decode)
            block_size = k_cache.shape[3]
            w = sparse.v_window_blocks * block_size
            eff_window = w if eff_window is None else min(eff_window, w)
        out, k_cache, v_cache = attn_ops.paged_attention_prefill(
            q, k, v, k_cache, v_cache, lidx, md.block_tables,
            md.query_lens, md.context_lens, scale=scale,
            sliding_window=eff_window, soft_cap=soft_cap,
            self_extend=self_extend, alibi_slopes=alibi_slopes,
            v_block_tables=md.v_block_tables, **bs_args)
    if kv_scale is not None:
        # V was stored as v/kv_scale; P rows sum to 1, so the kernel
        # output is out_true/kv_scale — undo it here. (The K half of
        # the fold is already complete: q*s cancelled k/s in the
        # scores.) Without this the whole attention branch is uniformly
        # scaled by 1/kv_scale — RMSNorm hides it when attention
        # dominates the residual (which is how the loud-V e2e test
        # stayed green), but it distorts real models whenever
        # kv_scale != 1.
        out = out * s
    if d_pad != d:
        out = out[..., :d]
    if fused:
        return out, (k_cache, )
    if wanted_acc is not None:
        return out, (k_cache, v_cache, wanted_acc)
    return out, (k_cache, v_cache)
