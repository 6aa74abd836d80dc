"""Batch assembly + jitted model execution.

Reference: ``vllm/worker/model_runner.py`` (ModelRunner :763,
_prepare_model_input :257-683, CUDA-graph capture :1096) — redesigned for
XLA: instead of CUDA graphs per batch size, the step function is
``jax.jit``-compiled once per (phase, bucket) shape; buckets are powers of
two so a handful of compilations cover all traffic. Input prep stays
vectorized numpy on host (the reference's approach, and our hot loop too).

Execution model per step (reference builds one flat token list; we keep a
[B, L] grid which XLA prefers):

* prefill step: [B_pad, L_pad] token grid, one row per prompt (chunked
  prefill = qlen < context len; prefix-cache hits skip computed blocks)
* decode step: [B_pad, 1]
"""
from __future__ import annotations

import functools
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from vllm_legacy_tpu import envs
from vllm_legacy_tpu.config import (CacheConfig, ModelConfig,
                                    ParallelConfig, SchedulerConfig)
from vllm_legacy_tpu.layers.sampler import SamplingTensors, sample
from vllm_legacy_tpu.logger import init_logger
from vllm_legacy_tpu.models.attention import AttentionMetadata
from vllm_legacy_tpu.sequence import (CompletionSequenceGroupOutput, Logprob,
                                      SamplerOutput, SequenceGroupMetadata,
                                      SequenceOutput)
from vllm_legacy_tpu.utils import cdiv, next_power_of_2

logger = init_logger(__name__)

_MAX_NUM_SEQS_BUCKETS = (8, 16, 32, 64, 128, 256)


def pad_to_bucket(n: int, buckets=_MAX_NUM_SEQS_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


# ----------------------------------------------------------------------
# Packed host<->device transfer. The TPU is reached through a tunnel
# where every individual transfer costs ~20-30ms RTT; a step that ships
# ~18 small arrays separately spends ~400ms on the wire vs ~20ms of
# compute. So: ALL host step inputs ride ONE int32 buffer (floats/uints
# bitcast into it) and one jitted unpack call slices them apart on
# device; all step outputs are packed on device into one buffer and
# fetched with ONE device_get.
# ----------------------------------------------------------------------
_TAG_TO_JNP = {}


def _unpack_fn(spec):
    """spec: tuple of (shape, tag, size). Returns jitted buf -> leaves."""

    def unpack(buf):
        outs = []
        off = 0
        for shape, tag, size in spec:
            seg = jax.lax.slice(buf, (off, ), (off + size, ))
            if tag == "f32":
                seg = jax.lax.bitcast_convert_type(seg, jnp.float32)
            elif tag == "u32":
                seg = jax.lax.bitcast_convert_type(seg, jnp.uint32)
            elif tag == "bool":
                seg = seg != 0
            outs.append(seg.reshape(shape))
            off += size
        return outs

    return jax.jit(unpack)


_unpack_cache: Dict[Any, Any] = {}


def stage_arrays(named: List[Tuple[str, np.ndarray]],
                 replicate_sharding=None) -> Dict[str, Any]:
    """Ship many small host arrays in one H2D transfer + one dispatch.

    ``replicate_sharding``: in multi-process (multi-host) runs, step
    inputs must be GLOBAL arrays; pass NamedSharding(mesh, P()) and the
    identical host bytes on every process become one replicated global
    array (single-process leaves the committed-local fast path alone).
    """
    specs = []
    parts = []
    for name, arr in named:
        a = np.ascontiguousarray(arr)
        if a.dtype == np.bool_:
            a, tag = a.astype(np.int32), "bool"
        elif a.dtype == np.float32:
            a, tag = a.view(np.int32), "f32"
        elif a.dtype == np.uint32:
            a, tag = a.view(np.int32), "u32"
        elif a.dtype == np.int32:
            tag = "i32"
        else:
            raise TypeError(f"stage_arrays: {name} has dtype {a.dtype}")
        specs.append((arr.shape, tag, a.size))
        parts.append(a.ravel())
    host_buf = np.concatenate(parts)
    if replicate_sharding is not None:
        buf = jax.device_put(host_buf, replicate_sharding)  # the one H2D
    else:
        buf = jnp.asarray(host_buf)  # the one H2D
    key = tuple(specs)
    if key not in _unpack_cache:
        _unpack_cache[key] = _unpack_fn(key)
    leaves = _unpack_cache[key](buf)
    return {name: leaf for (name, _), leaf in zip(named, leaves)}


def _pack_fn(spec):
    """spec: tuple of (shape, dtype_str). Returns jitted leaves -> buf."""

    def pack(leaves):
        parts = []
        for leaf, (shape, dt) in zip(leaves, spec):
            x = leaf.ravel()
            if dt in ("int32", "uint32"):
                x = jax.lax.bitcast_convert_type(x, jnp.float32)
            elif dt == "bool":
                x = x.astype(jnp.float32)
            elif dt == "bfloat16":
                x = x.astype(jnp.float32)
            elif dt != "float32":
                raise TypeError(f"pack: unsupported dtype {dt}")
            parts.append(x)
        return jnp.concatenate(parts)

    return jax.jit(pack)


_pack_cache: Dict[Any, Any] = {}


def fetch_outputs(pytree):
    """device_get an arbitrary pytree of device arrays with ONE D2H.

    Returns the same-structure pytree with numpy leaves."""
    leaves, treedef = jax.tree.flatten(pytree)
    if not leaves:
        return pytree
    spec = tuple((tuple(l.shape), str(l.dtype)) for l in leaves)
    if spec not in _pack_cache:
        _pack_cache[spec] = _pack_fn(spec)
    buf = np.asarray(jax.device_get(_pack_cache[spec](leaves)))
    outs = []
    off = 0
    for shape, dt in spec:
        size = int(np.prod(shape)) if shape else 1
        seg = buf[off:off + size]
        if dt == "int32":
            seg = seg.view(np.int32)
        elif dt == "uint32":
            seg = seg.view(np.uint32)
        elif dt == "bool":
            seg = seg != 0
        elif dt == "bfloat16":
            pass  # upcast to f32 on device; keep f32 host-side
        outs.append(seg.reshape(shape))
        off += size
    return jax.tree.unflatten(treedef, outs)


class ModelRunner:
    """Prepares step inputs on host and runs the jitted model step."""

    def __init__(
        self,
        model_config: ModelConfig,
        parallel_config: ParallelConfig,
        scheduler_config: SchedulerConfig,
        cache_config: CacheConfig,
        mesh: Mesh,
    ) -> None:
        self.model_config = model_config
        self.parallel_config = parallel_config
        self.scheduler_config = scheduler_config
        self.cache_config = cache_config
        self.mesh = mesh
        # Multi-host: step inputs must be global replicated arrays
        # (parallel/multihost.py); single-process keeps committed-local.
        self._replicated = (NamedSharding(mesh, P())
                            if jax.process_count() > 1 else None)
        self.block_size = cache_config.block_size
        self.max_blocks_per_seq = cdiv(model_config.max_model_len,
                                       self.block_size)

        self.model: Any = None
        self.params: Any = None
        # cache pytree shape, set by the worker from the cache engine:
        # arity 1 = fused single buffer (ndim 4 pair-packed / 5 plain),
        # arity 2 = split k/v 5-D (sparse, V-offload)
        self.kv_cache_ndim = 5
        self.kv_cache_arity = 2
        # rolling phase averages served at /dev/metrics/runner
        self.runner_metrics: Dict[str, float] = dict(
            steps=0, measured_steps=0, prepare_ms=0.0, dispatch_ms=0.0,
            fetch_ms=0.0, step_ms=0.0, tokens_per_step=0.0)
        self._step_key = jax.random.PRNGKey(model_config.seed or 0)
        # host RNG for the user-logits-processor re-sampling lane
        self._host_rng = np.random.default_rng(model_config.seed or 0)
        # device-staged dense FSM tables for guided multi-step decode
        self._fsm_dev_tables: Dict[int, Optional[Tuple]] = {}
        self._jit_step_cache: Dict[Any, Any] = {}
        self._lora_struct_ver = 0
        # guided decoding: seq_id -> (consumed_out_len, fsm_state, fsm)
        self._guided_cache: Dict[int, Tuple[int, int, Any]] = {}
        # V-offload ring assignment: seq_id -> ring id (worker/
        # cache_engine.py ring pool); rings of absent sequences are
        # reclaimed — sound because offload forces recompute-only
        # preemption, so an absent sequence rebuilds its V on return.
        self._v_rings: Dict[int, int] = {}
        self._v_ring_entry_map: Optional[np.ndarray] = None
        # exact V-offload paging state: per-seq staged entries
        # (entry -> local staged slot), write-through progress, and the
        # owning CacheEngine (set by Worker.initialize_cache)
        self._v_staged: Dict[int, Dict[int, int]] = {}
        self._v_written: Dict[int, int] = {}
        self._last_step_was_prefill = False
        self.cache_engine: Any = None
        # Stacked LoRA arrays (merged into params per call; structure
        # changes only when an adapter first occupies a (layer, proj)).
        self.lora_params: Optional[Dict[str, Any]] = None

    def _md_specs(self, rep):
        from vllm_legacy_tpu.models.attention import AttentionMetadata
        if self.cache_config.v_offload_exact:
            return AttentionMetadata(rep, rep, rep, rep, rep, rep)
        if self.cache_config.v_offload_window:
            return AttentionMetadata(rep, rep, rep, rep, rep)
        return AttentionMetadata(rep, rep, rep, rep)

    def _kv_specs(self):
        spec = P(None, None, "model", None) if self.kv_cache_ndim == 4 \
            else P(None, None, "model", None, None)
        if self.kv_cache_arity == 3:
            # (k, v_ring, wanted-scores accumulator [S, M] replicated)
            return (spec, spec, P())
        return (spec, ) * self.kv_cache_arity

    # ------------------------------------------------------------------
    # Model loading
    # ------------------------------------------------------------------
    def load_model(self, load_format) -> None:
        from vllm_legacy_tpu.model_loader import get_model
        from vllm_legacy_tpu.models.base import NoiseLeaf, lazy_dummy_init
        with lazy_dummy_init():
            # Dummy-format loads return NoiseLeaf placeholders so the
            # multi-GB noise tensors are expanded on DEVICE below
            # instead of materialized + transferred from host.
            self.model, host_params = get_model(self.model_config,
                                                self.parallel_config,
                                                load_format)
        self._check_int8_kv_scales(host_params)
        specs = self.model.param_specs(host_params)
        is_leaf = lambda x: isinstance(x, (np.ndarray, jnp.ndarray,
                                           NoiseLeaf))
        noise_leaves: List[NoiseLeaf] = []
        noise_shardings: List[NamedSharding] = []

        def put(arr, spec):
            if isinstance(arr, NoiseLeaf):
                noise_leaves.append(arr)
                noise_shardings.append(NamedSharding(self.mesh, spec))
                return arr
            return jax.device_put(jnp.asarray(arr),
                                  NamedSharding(self.mesh, spec))

        # rope cache entry exists in params but not in shapes pytree; its
        # spec is replicated.
        placed = jax.tree.map(put, host_params, specs, is_leaf=is_leaf)

        if noise_leaves:
            pools: List[np.ndarray] = []
            pool_idx: List[int] = []
            for lf in noise_leaves:
                for j, p in enumerate(pools):
                    if p is lf.pool:
                        pool_idx.append(j)
                        break
                else:
                    pool_idx.append(len(pools))
                    pools.append(lf.pool)

            def gen(device_pools):
                outs = []
                for lf, pi in zip(noise_leaves, pool_idx):
                    p = device_pools[pi]
                    n = int(np.prod(lf.shape))
                    reps = (lf.start + n) // p.size + 1
                    flat = jnp.tile(p, reps)[lf.start:lf.start + n]
                    outs.append(flat.reshape(lf.shape))
                return outs

            arrs = jax.jit(gen, out_shardings=noise_shardings)(
                [jnp.asarray(p) for p in pools])
            it = iter(arrs)
            placed = jax.tree.map(
                lambda x: next(it) if isinstance(x, NoiseLeaf) else x,
                placed, is_leaf=is_leaf)
        self.params = placed

    def _check_int8_kv_scales(self, host_params) -> None:
        """An int8 KV cache quantizes at step=kv_scale; fp8-era
        checkpoints commonly carry a default-filled kv_scale=1.0,
        which on ~N(0,1) K/V silently destroys accuracy (resolution
        1.0). Mirror the reference's default-kv_scale warning
        (reference llama.py:477-493) and substitute the calibrated-
        free 0.125 default instead of using the useless value."""
        if self.cache_config.cache_dtype != "int8":
            return
        if not isinstance(host_params, dict):
            return
        for idx, lp in enumerate(host_params.get("layers", [])):
            sc = lp.get("kv_scale", {}).get("scale") \
                if isinstance(lp, dict) else None
            if sc is not None and float(sc) >= 0.5:
                logger.warning(
                    "Layer %d carries kv_scale=%.3g with an int8 KV "
                    "cache — that step size cannot represent typical "
                    "K/V values; substituting the 0.125 default. Load "
                    "calibrated int8 scales via "
                    "--quantization-param-path.", idx, float(sc))
                lp.pop("kv_scale", None)

    def param_bytes(self) -> int:
        return sum(
            np.prod(a.shape) * a.dtype.itemsize
            for a in jax.tree.leaves(self.params))

    # ------------------------------------------------------------------
    # Host-side input preparation
    # ------------------------------------------------------------------
    def set_lora_params(self, lora_params: Optional[Dict[str, Any]]
                        ) -> None:
        # structure version keys the jit/shard_map cache: under TP the
        # shard_map in_specs must match the merged param structure
        old = self.lora_params
        self.lora_params = lora_params

        def struct(x):
            return (str(jax.tree.structure(x))
                    if x is not None else None)

        if struct(old) != struct(lora_params):
            self._lora_struct_ver += 1

    def _merged_params(self):
        """Overlay stacked LoRA entries onto the param pytree (dict
        merge only — no array copies)."""
        if self.lora_params is None:
            return self.params
        merged = dict(self.params)
        merged["layers"] = []
        for base_lp, lora_lp in zip(self.params["layers"],
                                    self.lora_params["layers"]):
            new_lp = dict(base_lp)
            for proj, extra in lora_lp.items():
                new_lp[proj] = {**base_lp[proj], **extra}
            merged["layers"].append(new_lp)
        if "rope_cache" in self.lora_params:
            # long-context LoRA: multi-segment cache; per-row position
            # offsets select the adapter's scaling segment
            merged["rope_cache"] = self.lora_params["rope_cache"]
        return merged

    def _prepare_inputs(
        self, seq_group_metadata_list: List[SequenceGroupMetadata]
    ) -> Tuple[Dict[str, Any], List[Tuple[str, int]], bool, int]:
        """Build padded numpy step inputs.

        Returns (arrays dict, rows = [(request_id, seq_id)] per batch row,
        is_prefill, padded batch size).
        """
        # A batch may MIX prefill chunks with decode rows (the chunked-
        # prefill policy schedules decodes first, then fills leftover
        # budget with prompt chunks — scheduler._schedule_chunked_
        # prefill). The unified kernel runs both in one [B, L_pad] grid:
        # decode rows are simply qlen == 1 (their write uses the
        # kernel's unaligned merge path).
        is_prefill = any(m.is_prompt for m in seq_group_metadata_list)

        rows: List[Tuple[str, int]] = []
        token_rows: List[List[int]] = []
        pos_rows: List[List[int]] = []
        query_lens: List[int] = []
        context_lens: List[int] = []
        block_tables: List[List[int]] = []
        mm_rows: List[Optional[np.ndarray]] = []
        emb_rows: List[Optional[Tuple[np.ndarray,
                                      Optional[np.ndarray]]]] = []

        for meta in seq_group_metadata_list:
            if meta.is_prompt:
                assert len(meta.seq_data) == 1
                seq_id = next(iter(meta.seq_data))
                data = meta.seq_data[seq_id]
                token_chunk = meta.token_chunk_size
                all_tokens = data.get_token_ids()
                ctx = data.get_num_computed_tokens()
                # prefix-cache hit: skip already-computed blocks
                if meta.computed_block_nums:
                    cached = len(meta.computed_block_nums) * self.block_size
                    if cached > ctx and cached < len(all_tokens):
                        ctx = cached
                        token_chunk = len(all_tokens) - ctx
                new_tokens = all_tokens[ctx:ctx + token_chunk]
                assert ctx % self.block_size == 0, (
                    "prefill must start block-aligned (chunked-prefill "
                    f"chunks are block-multiples): ctx={ctx}")
                rows.append((meta.request_id, seq_id))
                token_rows.append(new_tokens)
                pos_rows.append(list(range(ctx, ctx + len(new_tokens))))
                query_lens.append(len(new_tokens))
                context_lens.append(ctx + len(new_tokens))
                block_tables.append(meta.block_tables[seq_id])
                mm = getattr(meta, "multi_modal_data", None)
                emb = None
                if mm is not None:
                    assert len(new_tokens) == len(all_tokens), (
                        "multimodal prompts must prefill in one chunk")
                    if isinstance(mm, dict) and "prompt_embeds" in mm:
                        # precomputed embedding substitution (XComposer2
                        # image encoder path; reference:
                        # Sequence.prompt_embeds/prompt_im_masks,
                        # vllm/sequence.py:125-126)
                        mask = mm.get("embeds_mask")
                        emb = (np.asarray(mm["prompt_embeds"],
                                          np.float32),
                               None if mask is None else
                               np.asarray(mask, bool))
                        mm = None
                    else:
                        if isinstance(mm, dict):
                            mm = mm.get("pixel_values", mm.get("image"))
                        mm = np.asarray(mm, np.float32)
                        if mm.ndim == 4:
                            mm = mm[0]
                mm_rows.append(mm)
                emb_rows.append(emb)
            else:
                for seq_id, data in meta.seq_data.items():
                    rows.append((meta.request_id, seq_id))
                    token_rows.append([data.get_last_token_id()])
                    pos = data.get_len() - 1
                    pos_rows.append([pos])
                    query_lens.append(1)
                    context_lens.append(data.get_len())
                    block_tables.append(meta.block_tables[seq_id])
                    mm_rows.append(None)
                    emb_rows.append(None)

        # observability: tokens actually computed in prefill steps
        # (prefix-cache hits shrink this below the prompt length)
        if is_prefill:
            self.total_prefill_tokens = (
                getattr(self, "total_prefill_tokens", 0) + sum(query_lens))

        n = len(rows)
        b_pad = pad_to_bucket(n)
        # Prefill L_pad must be a whole number of KV blocks: the fused
        # Pallas cache write emits whole-block DMAs (alignment
        # invariants, ops/pallas/paged_attention.py).
        l_pad = max(next_power_of_2(max(query_lens)),
                    self.block_size) if is_prefill else 1

        tokens = np.zeros((b_pad, l_pad), np.int32)
        positions = np.zeros((b_pad, l_pad), np.int32)
        slot_mapping = np.full((b_pad, l_pad), -1, np.int32)
        ctx_arr = np.zeros((b_pad, ), np.int32)
        qlen_arr = np.zeros((b_pad, ), np.int32)
        tables = np.zeros((b_pad, self.max_blocks_per_seq), np.int32)

        for i in range(n):
            ql = query_lens[i]
            tokens[i, :ql] = token_rows[i]
            positions[i, :ql] = pos_rows[i]
            ctx_arr[i] = context_lens[i]
            qlen_arr[i] = ql
            bt = block_tables[i]
            tables[i, :len(bt)] = bt
            # slot for token at absolute position p:
            # tables[p // bs] * bs + p % bs
            pos_np = np.asarray(pos_rows[i], np.int64)
            bt_np = np.asarray(bt, np.int64)
            slot_mapping[i, :ql] = (bt_np[pos_np // self.block_size] *
                                    self.block_size +
                                    pos_np % self.block_size)

        # index of the row's sampling token within the flattened [B*L]
        sel = np.zeros((b_pad, ), np.int32)
        for i in range(n):
            sel[i] = i * l_pad + (query_lens[i] - 1)

        arrays = dict(
            tokens=tokens,
            positions=positions,
            slot_mapping=slot_mapping.reshape(-1),
            context_lens=ctx_arr,
            query_lens=qlen_arr,
            block_tables=tables,
            sel=sel,
        )
        if is_prefill and any(m is not None for m in mm_rows):
            shape = next(m.shape for m in mm_rows if m is not None)
            pixels = np.zeros((b_pad, ) + shape, np.float32)
            for i, m in enumerate(mm_rows):
                if m is not None:
                    pixels[i] = m
            arrays["pixel_values"] = pixels
        if self.cache_config.v_offload_window:
            vt = self._assign_v_rings(rows)
            if self.cache_config.v_offload_exact:
                # staged out-of-window entries: point their table slots
                # at the staged pool and mark availability for the
                # in-graph selection
                avail = np.zeros((b_pad, self.max_blocks_per_seq),
                                 np.bool_)
                sparse = self.model_config.sparse_attention
                wb = cdiv(self.cache_config.v_offload_window,
                          self.block_size)
                for i, (_, seq_id) in enumerate(rows):
                    nb = cdiv(int(ctx_arr[i]), self.block_size)
                    lo = max(nb - wb, 0)
                    avail[i, lo:nb] = True
                    avail[i, :min(sparse.num_sink, nb)] = True
                    for entry, slot in self._v_staged.get(
                            seq_id, {}).items():
                        if entry < lo:
                            vt[i, entry] = self._staged_slot_id(
                                seq_id, slot)
                            avail[i, entry] = True
                arrays["v_avail"] = avail
            arrays["v_block_tables"] = vt
            if self.cache_config.kv_offload:
                # fork offload_kv: K shares the V ring pool, so every K
                # access (write slots, reads, top-k scoring) routes
                # through the same ring tables; logical block tables
                # stay host-side bookkeeping only.
                arrays["block_tables"] = vt
                ring_sm = np.full((b_pad, l_pad), -1, np.int32)
                for i in range(n):
                    ql = query_lens[i]
                    pos_np = np.asarray(pos_rows[i], np.int64)
                    ring_sm[i, :ql] = (
                        vt[i][pos_np // self.block_size].astype(np.int64)
                        * self.block_size + pos_np % self.block_size)
                arrays["slot_mapping"] = ring_sm.reshape(-1)
        if is_prefill and any(e is not None for e in emb_rows):
            hdim = next(e[0].shape[-1] for e in emb_rows
                        if e is not None)
            pe = np.zeros((b_pad, l_pad, hdim), np.float32)
            em = np.zeros((b_pad, l_pad), bool)
            for i, e in enumerate(emb_rows):
                if e is None:
                    continue
                arr, mask = e
                ql = query_lens[i]
                pe[i, :ql] = arr[:ql]
                em[i, :ql] = True if mask is None else mask[:ql]
            arrays["prompt_embeds"] = pe
            arrays["embeds_mask"] = em
        return arrays, rows, is_prefill, b_pad

    def _assign_v_rings(self, rows) -> np.ndarray:
        """Per-row V ring-slot tables [b_pad rows padded later by the
        caller? no: [len(rows) padded to b_pad by caller's array] —
        returns [b_pad, max_blocks] int32 (extra rows map to ring 0;
        they are never read: qlen 0)."""
        sparse = self.model_config.sparse_attention
        sink = sparse.num_sink
        wb = cdiv(self.cache_config.v_offload_window, self.block_size)
        ring_blocks = sink + wb
        if self._v_ring_entry_map is None:
            e = np.arange(self.max_blocks_per_seq, dtype=np.int64)
            self._v_ring_entry_map = np.where(
                e < sink, e, sink + (e - sink) % wb).astype(np.int32)
        cap = self.scheduler_config.max_num_seqs
        current = {seq_id for _, seq_id in rows}
        for _, seq_id in rows:
            if seq_id in self._v_rings:
                continue
            if len(self._v_rings) >= cap:
                # reclaim a ring from a sequence not in this batch
                for old, ring in list(self._v_rings.items()):
                    if old not in current:
                        del self._v_rings[old]
                        self._v_staged.pop(old, None)
                        self._v_written.pop(old, None)
                        self._v_rings[seq_id] = ring
                        break
                else:
                    raise RuntimeError(
                        "V-offload ring pool exhausted: more live "
                        "sequences than max_num_seqs")
            else:
                used = set(self._v_rings.values())
                ring = next(r for r in range(cap) if r not in used)
                self._v_rings[seq_id] = ring
        b_pad = pad_to_bucket(len(rows))
        out = np.zeros((b_pad, self.max_blocks_per_seq), np.int32)
        for i, (_, seq_id) in enumerate(rows):
            base = self._v_rings[seq_id] * ring_blocks
            out[i] = base + self._v_ring_entry_map
        return out

    def _staged_slot_id(self, seq_id: int, local_slot: int) -> int:
        """Global V-pool slot id of a seq's local staged slot."""
        ce = self.cache_engine
        return (ce.v_stage_base +
                self._v_rings[seq_id] *
                self.cache_config.v_stage_blocks + local_slot)

    def _v_offload_exact_poststep(self, rows, arrays,
                                  kv_caches) -> None:
        """After each exact-offload step: (1) write completed V blocks
        through to the host pool (before their ring slots recycle);
        (2) read the selection's wanted scores and stage the most-
        desired out-of-window blocks for the NEXT step (one-step
        prefetch; LRU over the per-seq staged slots). Capability
        target: the reference fork's UVM paging
        (map_cache_engine.py:268-379), exact attention over selected
        history at bounded V residency."""
        ce = self.cache_engine
        bs = self.block_size
        sparse = self.model_config.sparse_attention
        wb = cdiv(self.cache_config.v_offload_window, bs)
        stage_cap = self.cache_config.v_stage_blocks
        tables = arrays["block_tables"]
        ctx = arrays["context_lens"]

        # ---- write-through of newly completed blocks ----
        wt_ring, wt_phys = [], []
        for i, (_, seq_id) in enumerate(rows):
            done = int(ctx[i]) // bs
            written = self._v_written.get(seq_id, 0)
            if written > done:  # recompute restart after preemption
                written = max(done - 1, 0)
            ring_base = self._v_rings[seq_id] * (sparse.num_sink + wb)
            for e in range(written, done):
                wt_ring.append(int(ring_base +
                                   self._v_ring_entry_map[e]))
                wt_phys.append(int(tables[i, e]))
            self._v_written[seq_id] = done
        ce.v_writethrough(wt_ring, wt_phys)

        # ---- staging plan from the wanted scores (decode steps only:
        # prefill runs no selection, so the accumulator is stale) ----
        if self._last_step_was_prefill:
            return
        wanted = np.asarray(jax.device_get(kv_caches[2]))  # [S, M]
        st_phys, st_slots = [], []
        for i, (_, seq_id) in enumerate(rows):
            nb = cdiv(int(ctx[i]), bs)
            lo = max(nb - wb, 0)
            written = self._v_written.get(seq_id, 0)
            # candidates: written-through entries that are out of the
            # window OR about to exit it (margin 2 — double-buffered
            # prefetch so availability never gaps at the boundary)
            cand = {
                e: float(wanted[i, e])
                for e in range(min(sparse.num_sink, lo),
                               min(lo + 2, written))
            }
            if not cand:
                continue
            desire = sorted(cand, key=cand.get,
                            reverse=True)[:stage_cap]
            staged = self._v_staged.setdefault(seq_id, {})
            want_new = [e for e in desire if e not in staged]
            if not want_new:
                continue
            free = [s for s in range(stage_cap)
                    if s not in set(staged.values())]
            # evict the least-desired currently staged entries
            victims = sorted((e for e in staged if e not in desire),
                             key=lambda e: cand.get(e, -1e30))
            for e in want_new:
                if free:
                    slot = free.pop()
                elif victims:
                    slot = staged.pop(victims.pop(0))
                else:
                    break
                staged[e] = slot
                st_phys.append(int(tables[i, e]))
                st_slots.append(self._staged_slot_id(seq_id, slot))
        ce.v_stage(st_phys, st_slots)

    def _guided_state(self, seq_id: int, fsm, output_tokens) -> int:
        """FSM state after ``output_tokens``; incremental via a per-seq
        (consumed_len, state) cache so each step walks only new tokens."""
        cached = self._guided_cache.get(seq_id)
        out = list(output_tokens)
        if cached is not None and cached[0] <= len(out) \
                and cached[2] is fsm:
            done, state, _ = cached
        else:
            done, state = 0, 0
        for tid in out[done:]:
            state = fsm.next_state(state, int(tid))
            if state < 0:
                break
        self._guided_cache[seq_id] = (len(out), state, fsm)
        return state

    def _build_token_mask(
        self, seq_group_metadata_list: List[SequenceGroupMetadata],
        rows: List[Tuple[str, int]], b_pad: int
    ) -> Optional[np.ndarray]:
        """[b_pad, V_logits] bool allowed-token mask, or None when no row
        needs one. Covers (a) guided-decoding FSM masks, (b) min-tokens
        EOS/stop-token suppression (reference: sampler.py
        _apply_min_tokens_penalty :153). Padding rows stay all-True so
        log_softmax never sees an all--inf row."""
        by_req = {m.request_id: m for m in seq_group_metadata_list}
        vocab = self.model.vocab_size  # padded logits width
        mask: Optional[np.ndarray] = None
        live_seq_ids = set()
        for i, (req_id, seq_id) in enumerate(rows):
            meta = by_req[req_id]
            sp = meta.sampling_params
            data = meta.seq_data[seq_id]
            live_seq_ids.add(seq_id)
            fsm = sp.guided_fsm
            row: Optional[np.ndarray] = None
            if fsm is not None:
                state = self._guided_state(seq_id, fsm,
                                           data.output_token_ids)
                allowed = fsm.allowed(state)
                row = np.zeros((vocab, ), np.bool_)
                row[:len(allowed)] = allowed
            if sp.min_tokens and data.get_output_len() < sp.min_tokens:
                if row is None:
                    row = np.ones((vocab, ), np.bool_)
                eos = getattr(self.model_config.hf_text_config,
                              "eos_token_id", None)
                for tid in ([eos] if isinstance(eos, int) else eos or []):
                    row[tid] = False
                for tid in sp.stop_token_ids:
                    if 0 <= tid < vocab:
                        row[tid] = False
            if row is not None:
                if mask is None:
                    mask = np.ones((b_pad, vocab), np.bool_)
                mask[i] = row
        # prune guided-state cache entries for finished/preempted seqs
        if len(self._guided_cache) > 4 * max(len(rows), 16):
            self._guided_cache = {
                k: v
                for k, v in self._guided_cache.items() if k in live_seq_ids
            }
        return mask

    def _prepare_sampling(
        self, seq_group_metadata_list: List[SequenceGroupMetadata],
        rows: List[Tuple[str, int]], b_pad: int
    ) -> Tuple[SamplingTensors, Tuple[bool, bool, bool, bool], int]:
        by_req = {m.request_id: m for m in seq_group_metadata_list}
        temp, top_p, top_k, min_p = [], [], [], []
        pres, freq, rep = [], [], []
        greedy, seeds, seedpos = [], [], []
        prompt_toks: List[List[int]] = []
        output_toks: List[List[int]] = []
        do_penalties = False
        max_logprobs = 0
        for req_id, seq_id in rows:
            meta = by_req[req_id]
            sp = meta.sampling_params
            data = meta.seq_data[seq_id]
            temp.append(sp.temperature)
            top_p.append(sp.top_p)
            top_k.append(sp.top_k if sp.top_k > 0 else 0)
            min_p.append(sp.min_p)
            pres.append(sp.presence_penalty)
            freq.append(sp.frequency_penalty)
            rep.append(sp.repetition_penalty)
            # BEAM rows need no on-device draw: beam candidates are
            # selected on host from the top-2·bw logprobs (reference:
            # sampler.py _beam_search_sample :351 does the same from
            # logprobs, not sampled ids).
            greedy.append(sp.sampling_type.name in ("GREEDY", "BEAM"))
            seeds.append((sp.seed or 0) & 0xFFFFFFFF)
            seedpos.append(data.get_output_len())
            if (abs(sp.presence_penalty) >= 1e-5
                    or abs(sp.frequency_penalty) >= 1e-5
                    or abs(sp.repetition_penalty - 1.0) >= 1e-5):
                do_penalties = True
            if sp.logprobs:
                max_logprobs = max(max_logprobs, sp.logprobs)
            prompt_toks.append(list(data.prompt_token_ids))
            output_toks.append(list(data.output_token_ids))
        if not do_penalties:
            prompt_toks, output_toks = [], []
        st_np = SamplingTensors.np_fields(
            temp, top_p, top_k, min_p, pres, freq, rep, greedy, seeds,
            seed_positions=seedpos,
            prompt_tokens=prompt_toks,
            output_tokens=output_toks,
            pad_to=b_pad,
        )
        if max_logprobs:
            max_logprobs = min(next_power_of_2(max_logprobs + 1),
                               self.model_config.max_logprobs + 1)
        # Static jit specializations — the top-k/p vocab sort is tens of
        # ms on TPU and must not be traced for greedy/plain batches.
        all_greedy = all(greedy)
        do_top_k_p = any(
            (not g) and (k > 0 or p < 1.0 - 1e-6)
            for g, k, p in zip(greedy, top_k, top_p))
        do_min_p = any((not g) and m > 0.0
                       for g, m in zip(greedy, min_p))
        flags = (do_penalties, do_top_k_p, do_min_p, all_greedy)
        return st_np, flags, max_logprobs

    # ------------------------------------------------------------------
    # Jitted step
    # ------------------------------------------------------------------
    def _build_step_fn(self, flags: Tuple[bool, bool, bool, bool],
                       max_logprobs: int, prompt_lp_k: int = -1,
                       n_samples: int = 1, return_logits: bool = False):
        """prompt_lp_k >= 0 adds prompt-logprob outputs: per-position
        next-token logprobs over the whole [B, L] grid plus top-k
        (reference: sampler.py _get_logprobs prompt path :689 +
        model_runner prefill selected indices)."""
        do_penalties, do_top_k_p, do_min_p, all_greedy = flags
        model = self.model
        mesh = self.mesh
        param_specs = self.model.param_specs(
            jax.tree.map(lambda x: None, self._merged_params()))
        kv_specs = self._kv_specs()
        rep = P()
        md_specs = self._md_specs(rep)

        def sharded_fwd(params, kv_caches, tokens, positions, md, sel,
                        lora_indices, lp_targets, pixel_values,
                        prompt_embeds, embeds_mask):
            kwargs = {}
            if pixel_values is not None:
                kwargs["pixel_values"] = pixel_values
            if prompt_embeds is not None:
                kwargs["prompt_embeds"] = prompt_embeds
                kwargs["embeds_mask"] = embeds_mask
            hidden, kv_caches = model.forward(params, kv_caches, tokens,
                                              positions, md,
                                              lora_indices=lora_indices,
                                              **kwargs)
            b, l, h = hidden.shape
            flat = hidden.reshape(b * l, h)
            selected = flat[sel]
            logits = model.compute_logits(params, selected)
            prompt_lp = None
            if prompt_lp_k >= 0:
                all_logits = model.compute_logits(params, flat)  # [BL, V]
                lps = jax.nn.log_softmax(all_logits, axis=-1)
                tgt = jnp.maximum(lp_targets.reshape(-1), 0)
                tok_lp = jnp.take_along_axis(lps, tgt[:, None],
                                             axis=-1)[:, 0]
                if prompt_lp_k > 0:
                    tv, ti = jax.lax.top_k(lps, prompt_lp_k)
                    prompt_lp = (tok_lp.reshape(b, l),
                                 tv.reshape(b, l, -1),
                                 ti.reshape(b, l, -1))
                else:
                    prompt_lp = (tok_lp.reshape(b, l), None, None)
            return logits, kv_caches, prompt_lp

        if np.prod(mesh.devices.shape) > 1:
            from jax import shard_map
            # lora_indices / lp_targets are passed positionally (None =
            # empty pytree, so a replicated spec matches trivially).
            lp_out_spec = (rep, rep, rep) if prompt_lp_k > 0 else \
                (rep, None, None) if prompt_lp_k == 0 else None
            fwd = shard_map(
                sharded_fwd,
                mesh=mesh,
                in_specs=(param_specs, kv_specs, rep, rep, md_specs, rep,
                          rep, rep, rep, rep, rep),
                out_specs=(rep, kv_specs, lp_out_spec), check_vma=False,
            )
        else:
            # Single-chip fast path: shard_map currently defeats donated
            # in-place KV aliasing (full cache copies per step); the
            # model's collectives are statically elided at tp_size == 1.
            fwd = sharded_fwd

        def step(params, kv_caches, tokens, positions, md, sel, st,
                 step_key, lora_indices=None, token_mask=None,
                 lp_targets=None, pixel_values=None, prompt_embeds=None,
                 embeds_mask=None):
            logits, kv_caches, prompt_lp = fwd(params, kv_caches, tokens,
                                               positions, md, sel,
                                               lora_indices, lp_targets,
                                               pixel_values,
                                               prompt_embeds,
                                               embeds_mask)
            sampled, logprob, top, multi = sample(
                logits, st, step_key, do_penalties=do_penalties,
                do_top_k_p=do_top_k_p, do_min_p=do_min_p,
                all_greedy=all_greedy, max_logprobs=max_logprobs,
                token_mask=token_mask, n_samples=n_samples)
            if return_logits:
                # host-callback lane for per-request user logits
                # processors: the raw pre-sampling logits travel back in
                # the same packed D2H fetch (reference analogue:
                # layers/logits_processor.py:81-126 applies callables
                # in-stream; on TPU the jitted sampler cannot, so rows
                # carrying processors are re-sampled host-side).
                return (kv_caches, sampled, logprob, top, prompt_lp,
                        multi, logits)
            return kv_caches, sampled, logprob, top, prompt_lp, multi

        return jax.jit(step, donate_argnums=(1, ))

    def _fsm_device_tables(self, fsm):
        """Dense device tables for a guided-decoding FSM so masked
        decode can ride the on-device multi-step loop: [S+1, V] bool
        allowed-mask and [S+1, V] int32 transition (row S = sink for
        violated constraints, EOS-only). Staged to device ONCE per FSM
        and cached. Returns None when the tables would exceed the
        budget (large regex FSMs fall back to per-step host masks).
        Reference analogue: the outlines logits-processor state machine
        (vllm/model_executor/guided_decoding/) runs host-side per step;
        on TPU that forfeits multi-step decode, so small FSMs are
        shipped whole.
        """
        key = id(fsm)
        cached = self._fsm_dev_tables.get(key)
        if cached is not None:
            return cached
        S = fsm.num_states
        vocab = self.model.vocab_size  # padded logits width
        if S * vocab * 5 > 48 * 2**20:  # mask(1B) + trans(4B) budget
            self._fsm_dev_tables[key] = None
            return None
        sink = S
        trans = np.full((S + 1, vocab), sink, np.int32)
        mask = np.zeros((S + 1, vocab), np.bool_)
        for s in range(S):
            t_row, m_row = fsm.next_row(s)
            v = t_row.shape[0]
            trans[s, :v] = np.where(t_row < 0, sink, t_row)
            mask[s, :v] = m_row
        # EOS keeps the state (TokenFSM.next_state semantics)
        trans[:S, fsm.eos_token_id] = np.arange(S)
        mask[sink, fsm.eos_token_id] = True
        trans[sink, fsm.eos_token_id] = sink
        dev = (jnp.asarray(mask), jnp.asarray(trans))
        if self._replicated is not None:
            dev = tuple(jax.device_put(x, self._replicated) for x in dev)
        self._fsm_dev_tables[key] = dev
        return dev

    def _try_guided_multistep(self, seq_group_metadata_list, rows,
                              b_pad):
        """If every masked row is guided by ONE common FSM whose dense
        tables fit on device (and no row needs min-tokens suppression),
        return (mask_table, trans_table, state0 [b_pad]) for the
        on-device loop; else None."""
        by_req = {m.request_id: m for m in seq_group_metadata_list}
        fsm = None
        states = np.full((b_pad, ), -1, np.int32)
        any_guided = False
        for i, (req_id, seq_id) in enumerate(rows):
            meta = by_req[req_id]
            sp = meta.sampling_params
            data = meta.seq_data[seq_id]
            if sp.min_tokens and data.get_output_len() < sp.min_tokens:
                return None
            f = sp.guided_fsm
            if f is None:
                continue
            if fsm is None:
                fsm = f
            elif fsm is not f:
                return None  # mixed FSMs: fall back
            state = self._guided_state(seq_id, f, data.output_token_ids)
            states[i] = state if state >= 0 else f.num_states  # sink
            any_guided = True
        if not any_guided:
            return None
        tables = self._fsm_device_tables(fsm)
        if tables is None:
            return None
        return tables[0], tables[1], states

    def _build_multistep_fn(self, flags: Tuple[bool, bool, bool, bool],
                            max_logprobs: int, num_steps: int,
                            guided: bool = False):
        """K decode iterations fully on device per host round-trip.

        The per-step host<->device round-trip (~1ms on local PCIe, ~100ms
        through a tunnel) would otherwise bound decode throughput; the
        reference amortizes launch overhead with CUDA graphs
        (model_runner.py:1096) — on TPU the equivalent is keeping the
        token feedback loop on device. Slot mapping for step i is
        computed on device from the (lookahead-extended) block tables.
        """
        do_penalties, do_top_k_p, do_min_p, all_greedy = flags
        assert not do_penalties, "multi-step requires no penalties"
        model = self.model
        mesh = self.mesh
        block_size = self.block_size
        param_specs = self.model.param_specs(
            jax.tree.map(lambda x: None, self._merged_params()))
        kv_specs = self._kv_specs()
        rep = P()
        md_specs = self._md_specs(rep)

        def sharded_fwd(params, kv_caches, tokens, positions, md, sel,
                        lora_indices):
            hidden, kv_caches = model.forward(params, kv_caches, tokens,
                                              positions, md,
                                              lora_indices=lora_indices)
            b, l, h = hidden.shape
            logits = model.compute_logits(params,
                                          hidden.reshape(b * l, h)[sel])
            return logits, kv_caches

        if np.prod(mesh.devices.shape) > 1:
            from jax import shard_map
            fwd = shard_map(
                sharded_fwd,
                mesh=mesh,
                in_specs=(param_specs, kv_specs, rep, rep, md_specs, rep,
                          rep),
                out_specs=(rep, kv_specs), check_vma=False,
            )
        else:
            fwd = sharded_fwd  # see _build_step_fn

        def multistep(params, kv_caches, tokens, positions, md, sel, st,
                      step_key, lora_indices=None, fsm_mask=None,
                      fsm_trans=None, fsm_state=None):
            b = tokens.shape[0]
            out_tokens = jnp.zeros((num_steps, b), jnp.int32)
            out_logprobs = jnp.zeros((num_steps, b), jnp.float32)
            if max_logprobs > 0:
                out_top_v = jnp.zeros((num_steps, b, max_logprobs),
                                      jnp.float32)
                out_top_i = jnp.zeros((num_steps, b, max_logprobs),
                                      jnp.int32)
            else:
                out_top_v = out_top_i = None
            if not guided:
                fsm_state = jnp.zeros((b, ), jnp.int32)  # carry dummy

            def body(i, carry):
                (kv_caches, tok, pos, ctx, fstate, out_tokens,
                 out_logprobs, out_top_v, out_top_i) = carry
                valid = ctx > 0
                md_i = AttentionMetadata(md.slot_mapping,
                                         md.block_tables, ctx,
                                         md.query_lens)
                # LoRA slots are per-sequence and constant across the k
                # on-device steps, so the adapter einsum lives inside
                # the loop at zero host cost (was: forced single-step)
                logits, kv_caches = fwd(params, kv_caches, tok, pos, md_i,
                                        sel, lora_indices)
                token_mask = None
                if guided:
                    # guided decoding INSIDE the loop: per-row FSM mask
                    # gather + post-sample transition — the state
                    # machine advances on device instead of forcing
                    # per-step host round-trips
                    gate = fstate >= 0
                    srow = jnp.maximum(fstate, 0)
                    token_mask = jnp.where(gate[:, None],
                                           fsm_mask[srow], True)
                import dataclasses as _dc
                st_i = _dc.replace(st,
                                   seed_positions=st.seed_positions + i)
                sampled, logprob, top, _ = sample(
                    logits, st_i, jax.random.fold_in(step_key, i),
                    do_penalties=False, do_top_k_p=do_top_k_p,
                    do_min_p=do_min_p, all_greedy=all_greedy,
                    max_logprobs=max_logprobs, token_mask=token_mask)
                if guided:
                    nxt = fsm_trans[srow, sampled]
                    fstate = jnp.where(gate, nxt, fstate)
                out_tokens = out_tokens.at[i].set(sampled.astype(jnp.int32))
                out_logprobs = out_logprobs.at[i].set(logprob)
                if top is not None:
                    out_top_v = out_top_v.at[i].set(top[0])
                    out_top_i = out_top_i.at[i].set(top[1])
                tok = sampled.astype(jnp.int32)[:, None]
                pos = jnp.where(valid[:, None], pos + 1, pos)
                ctx = jnp.where(valid, ctx + 1, ctx)
                return (kv_caches, tok, pos, ctx, fstate, out_tokens,
                        out_logprobs, out_top_v, out_top_i)

            carry = (kv_caches, tokens, positions, md.context_lens,
                     fsm_state, out_tokens, out_logprobs, out_top_v,
                     out_top_i)
            carry = jax.lax.fori_loop(0, num_steps, body, carry)
            (kv_caches, _, _, _, _, out_tokens, out_logprobs, out_top_v,
             out_top_i) = carry
            top = (out_top_v, out_top_i) if max_logprobs > 0 else None
            return kv_caches, out_tokens, out_logprobs, top

        return jax.jit(multistep, donate_argnums=(1, ))

    def _build_embed_fn(self):
        """Prefill forward + pooling for embedding models (reference:
        worker/embedding_model_runner.py:170 + layers/pooler.py:56)."""
        model = self.model
        mesh = self.mesh
        param_specs = self.model.param_specs(
            jax.tree.map(lambda x: None, self._merged_params()))
        kv_specs = self._kv_specs()
        rep = P()
        md_specs = self._md_specs(rep)

        def sharded_fwd(params, kv_caches, tokens, positions, md):
            hidden, kv_caches = model.forward(params, kv_caches, tokens,
                                              positions, md)
            pooled = model.pooler(hidden, md.query_lens)
            return pooled, kv_caches

        if np.prod(mesh.devices.shape) > 1:
            from jax import shard_map
            fwd = shard_map(
                sharded_fwd, mesh=mesh,
                in_specs=(param_specs, kv_specs, rep, rep, md_specs),
                out_specs=(rep, kv_specs), check_vma=False)
        else:
            fwd = sharded_fwd

        return jax.jit(fwd, donate_argnums=(1, ))

    def execute_pooling(self, seq_group_metadata_list, kv_caches):
        """Embedding-model step: one prefill pass -> PoolerOutput."""
        from vllm_legacy_tpu.sequence import (EmbeddingSequenceGroupOutput,
                                              PoolerOutput)
        arrays, rows, is_prefill, b_pad = self._prepare_inputs(
            seq_group_metadata_list)
        assert is_prefill, "embedding models schedule prompts only"
        staged = stage_arrays([(k, arrays[k]) for k in
                               ("tokens", "positions", "slot_mapping",
                                "context_lens", "query_lens",
                                "block_tables")],
                              replicate_sharding=self._replicated)
        md = AttentionMetadata(
            slot_mapping=staged["slot_mapping"],
            block_tables=staged["block_tables"],
            context_lens=staged["context_lens"],
            query_lens=staged["query_lens"],
        )
        key = "embed"
        if key not in self._jit_step_cache:
            self._jit_step_cache[key] = self._build_embed_fn()
        pooled, kv_caches = self._jit_step_cache[key](
            self._merged_params(), kv_caches, staged["tokens"],
            staged["positions"], md)
        pooled_np = fetch_outputs(pooled)
        outputs = [
            EmbeddingSequenceGroupOutput(
                embeddings=pooled_np[i].tolist())
            for i in range(len(rows))
        ]
        return [PoolerOutput(outputs=outputs)], kv_caches

    def _get_step_fn(self, flags: Tuple[bool, bool, bool, bool],
                     max_logprobs: int, num_steps: int = 1,
                     prompt_lp_k: int = -1, n_samples: int = 1,
                     return_logits: bool = False, guided: bool = False):
        key = (flags, max_logprobs, num_steps, prompt_lp_k, n_samples,
               return_logits, guided,
               self._lora_struct_ver if self.lora_params is not None
               else -1)
        if key not in self._jit_step_cache:
            if num_steps > 1:
                self._jit_step_cache[key] = self._build_multistep_fn(
                    flags, max_logprobs, num_steps, guided)
            else:
                self._jit_step_cache[key] = self._build_step_fn(
                    flags, max_logprobs, prompt_lp_k, n_samples,
                    return_logits)
        return self._jit_step_cache[key]

    # ------------------------------------------------------------------
    # Execution
    # ------------------------------------------------------------------
    # ------------------------------------------------------------------
    # Speculative decoding: ragged-qlen scoring + rejection verification
    # (reference: spec_decode_worker.py _run_speculative_decoding_step
    # :372 + batch_expansion.py — here one jitted call with per-sequence
    # query lengths instead of batch expansion)
    # ------------------------------------------------------------------
    def _build_propose_fn(self, num_spec: int):
        """Draft-model proposal step (reference: spec_decode/
        multi_step_worker.py MultiStepWorker + top1_proposer.py): one
        ragged catch-up forward over the tokens accepted since the last
        call, then num_spec-1 greedy single-token decodes — all inside
        one jitted call so the whole K-token proposal costs a single
        host round-trip."""
        model = self.model
        mesh = self.mesh
        param_specs = self.model.param_specs(
            jax.tree.map(lambda x: None, self._merged_params()))
        kv_specs = self._kv_specs()
        rep = P()
        md_specs = self._md_specs(rep)

        def sharded_fwd(params, kv_caches, tokens, positions, md, sel):
            hidden, kv_caches = model.forward(params, kv_caches, tokens,
                                              positions, md)
            bsz, ln, hd = hidden.shape
            logits = model.compute_logits(params,
                                          hidden.reshape(bsz * ln,
                                                         hd)[sel])
            return logits, kv_caches

        if np.prod(mesh.devices.shape) > 1:
            from jax import shard_map
            fwd = shard_map(
                sharded_fwd, mesh=mesh,
                in_specs=(param_specs, kv_specs, rep, rep, md_specs, rep),
                out_specs=(rep, kv_specs), check_vma=False)
        else:
            fwd = sharded_fwd

        def propose(params, kv_caches, tokens, positions, md, sel):
            b = tokens.shape[0]
            valid = md.query_lens > 0
            logits, kv_caches = fwd(params, kv_caches, tokens, positions,
                                    md, sel)  # [B, V] last-row logits
            first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            out = jnp.zeros((b, num_spec), jnp.int32)
            out = out.at[:, 0].set(first)

            def body(i, carry):
                kv_caches, tok, pos, ctx, out = carry
                md_i = AttentionMetadata(
                    md.slot_mapping, md.block_tables,
                    jnp.where(valid, ctx, 0),
                    jnp.where(valid, 1, 0).astype(jnp.int32))
                lg, kv_caches = fwd(params, kv_caches, tok[:, None],
                                    pos[:, None], md_i,
                                    jnp.arange(b, dtype=jnp.int32))
                nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                out = out.at[:, i + 1].set(nxt)
                return kv_caches, nxt, pos + 1, ctx + 1, out

            # proposal token i sits at position ctx + i - 1 (the
            # catch-up already covers positions up to ctx - 1)
            pos0 = md.context_lens
            ctx0 = md.context_lens + 1
            kv_caches, _, _, _, out = jax.lax.fori_loop(
                0, num_spec - 1, body,
                (kv_caches, first, pos0, ctx0, out))
            return kv_caches, out

        return jax.jit(propose, donate_argnums=(1, ))

    def execute_propose(self, rows, kv_caches, num_spec: int):
        """rows: list of (tokens_to_catch_up, start_pos, ctx, table).
        Returns (proposals [n, num_spec] np.ndarray, kv_caches)."""
        n = len(rows)
        b_pad = pad_to_bucket(n)
        l_pad = next_power_of_2(num_spec + 1)
        tokens = np.zeros((b_pad, l_pad), np.int32)
        positions = np.zeros((b_pad, l_pad), np.int32)
        ctx_arr = np.zeros((b_pad, ), np.int32)
        qlen_arr = np.zeros((b_pad, ), np.int32)
        tables = np.zeros((b_pad, self.max_blocks_per_seq), np.int32)
        sel = np.zeros((b_pad, ), np.int32)
        for i, (toks, start, ctx, bt) in enumerate(rows):
            ql = len(toks)
            assert 0 < ql <= l_pad
            tokens[i, :ql] = toks
            positions[i, :ql] = range(start, start + ql)
            ctx_arr[i] = ctx
            qlen_arr[i] = ql
            tables[i, :len(bt)] = bt
            sel[i] = i * l_pad + ql - 1
        staged = stage_arrays([
            ("tokens", tokens), ("positions", positions),
            ("slot_mapping", np.zeros((b_pad * l_pad, ), np.int32)),
            ("block_tables", tables), ("context_lens", ctx_arr),
            ("query_lens", qlen_arr), ("sel", sel)
        ], replicate_sharding=self._replicated)
        md = AttentionMetadata(
            slot_mapping=staged["slot_mapping"],
            block_tables=staged["block_tables"],
            context_lens=staged["context_lens"],
            query_lens=staged["query_lens"],
        )
        cache_key = ("propose", num_spec, b_pad,
                     self._lora_struct_ver
                     if self.lora_params is not None else -1)
        if cache_key not in self._jit_step_cache:
            self._jit_step_cache[cache_key] = self._build_propose_fn(
                num_spec)
        kv_caches, out = self._jit_step_cache[cache_key](
            self._merged_params(), kv_caches, staged["tokens"],
            staged["positions"], md, staged["sel"])
        return fetch_outputs(out)[:n], kv_caches

    def _build_spec_fn(self, num_spec: int, greedy: bool):
        from vllm_legacy_tpu.spec_decode.rejection_sampler import (
            verify_greedy, verify_stochastic)
        model = self.model
        mesh = self.mesh
        l_pad = next_power_of_2(num_spec + 1)
        param_specs = self.model.param_specs(
            jax.tree.map(lambda x: None, self._merged_params()))
        kv_specs = self._kv_specs()
        rep = P()
        md_specs = self._md_specs(rep)

        def sharded_fwd(params, kv_caches, tokens, positions, md, sel):
            hidden, kv_caches = model.forward(params, kv_caches, tokens,
                                              positions, md)
            bsz, ln, hd = hidden.shape
            logits = model.compute_logits(params,
                                          hidden.reshape(bsz * ln,
                                                         hd)[sel])
            return logits, kv_caches

        if np.prod(mesh.devices.shape) > 1:
            from jax import shard_map
            fwd = shard_map(
                sharded_fwd, mesh=mesh,
                in_specs=(param_specs, kv_specs, rep, rep, md_specs, rep),
                out_specs=(rep, kv_specs), check_vma=False)
        else:
            fwd = sharded_fwd

        def spec_step(params, kv_caches, tokens, positions, md, sel,
                      proposals, key):
            logits, kv_caches = fwd(params, kv_caches, tokens, positions,
                                    md, sel)
            bsz = tokens.shape[0]
            logits = logits.reshape(bsz, num_spec + 1, -1)
            if greedy:
                out_tokens, num_emitted = verify_greedy(logits, proposals)
            else:
                out_tokens, num_emitted = verify_stochastic(
                    logits, proposals, key)
            lps = jax.nn.log_softmax(logits, axis=-1)
            tok_lp = jnp.take_along_axis(
                lps, out_tokens[:, :, None], axis=-1)[..., 0]
            return kv_caches, out_tokens, num_emitted, tok_lp

        return jax.jit(spec_step, donate_argnums=(1, ))

    def execute_spec(
        self,
        seq_group_metadata_list: List[SequenceGroupMetadata],
        kv_caches,
        proposals_by_row: List[Optional[List[int]]],
        num_spec: int,
    ):
        """Score + verify one speculative step (decode-only batch)."""
        rows: List[Tuple[str, int]] = []
        tok_rows, pos_rows, qlens, ctxs, tables_l = [], [], [], [], []
        row_idx = 0
        for meta in seq_group_metadata_list:
            for seq_id, data in meta.seq_data.items():
                props = proposals_by_row[row_idx] or []
                rows.append((meta.request_id, seq_id))
                toks = [data.get_last_token_id()] + list(props)
                tok_rows.append(toks)
                start = data.get_len() - 1
                pos_rows.append(list(range(start, start + len(toks))))
                qlens.append(len(toks))
                ctxs.append(data.get_len() + len(props))
                tables_l.append(meta.block_tables[seq_id])
                row_idx += 1

        n = len(rows)
        b_pad = pad_to_bucket(n)
        l_pad = next_power_of_2(num_spec + 1)
        tokens = np.zeros((b_pad, l_pad), np.int32)
        positions = np.zeros((b_pad, l_pad), np.int32)
        ctx_arr = np.zeros((b_pad, ), np.int32)
        qlen_arr = np.zeros((b_pad, ), np.int32)
        tables = np.zeros((b_pad, self.max_blocks_per_seq), np.int32)
        props_arr = np.full((b_pad, num_spec), -1, np.int32)
        for i in range(n):
            ql = qlens[i]
            tokens[i, :ql] = tok_rows[i]
            positions[i, :ql] = pos_rows[i]
            ctx_arr[i] = ctxs[i]
            qlen_arr[i] = ql
            bt = tables_l[i]
            tables[i, :len(bt)] = bt
            if ql > 1:
                props_arr[i, :ql - 1] = tok_rows[i][1:]
        sel = (np.arange(b_pad)[:, None] * l_pad +
               np.arange(num_spec + 1)[None, :]).reshape(-1)
        # clamp selections to valid flat range
        sel = np.minimum(sel, b_pad * l_pad - 1).astype(np.int32)

        staged = stage_arrays([
            ("tokens", tokens), ("positions", positions),
            ("slot_mapping", np.zeros((b_pad * l_pad, ), np.int32)),
            ("block_tables", tables), ("context_lens", ctx_arr),
            ("query_lens", qlen_arr), ("sel", sel),
            ("proposals", props_arr)
        ], replicate_sharding=self._replicated)
        md = AttentionMetadata(
            slot_mapping=staged["slot_mapping"],
            block_tables=staged["block_tables"],
            context_lens=staged["context_lens"],
            query_lens=staged["query_lens"],
        )
        greedy = all(
            m.sampling_params.sampling_type.name == "GREEDY"
            for m in seq_group_metadata_list)
        key_fn = (num_spec, greedy, b_pad)
        cache_key = ("spec", key_fn,
                     self._lora_struct_ver
                     if self.lora_params is not None else -1)
        if cache_key not in self._jit_step_cache:
            self._jit_step_cache[cache_key] = self._build_spec_fn(
                num_spec, greedy)
        fn = self._jit_step_cache[cache_key]
        self._step_key, key = jax.random.split(self._step_key)
        if self._replicated is not None:
            key = jax.device_put(np.asarray(key), self._replicated)
        kv_caches, out_tokens, num_emitted, tok_lp = fn(
            self._merged_params(), kv_caches, staged["tokens"],
            staged["positions"], md, staged["sel"],
            staged["proposals"], key)

        out_np, num_np, lp_np = fetch_outputs(
            (out_tokens, num_emitted, tok_lp))

        # acceptance accounting (reference: spec_decode/metrics.py
        # AsyncMetricsCollector — draft_acceptance_rate and system
        # efficiency surfaced by StatLogger, engine/metrics.py:316-375)
        rm = self.runner_metrics
        rm["spec_proposed"] = rm.get("spec_proposed", 0) + sum(
            q - 1 for q in qlens)
        rm["spec_accepted"] = rm.get("spec_accepted", 0) + int(
            sum(max(0, int(num_np[i]) - 1) for i in range(n)))
        rm["spec_emitted"] = rm.get("spec_emitted", 0) + int(
            sum(int(num_np[i]) for i in range(n)))
        rm["spec_steps"] = rm.get("spec_steps", 0) + n

        outs: List[SamplerOutput] = []
        for j in range(num_spec + 1):
            outputs = []
            row_idx = 0
            for meta in seq_group_metadata_list:
                samples = []
                for seq_id in meta.seq_data:
                    if j < num_np[row_idx]:
                        token = int(out_np[row_idx, j])
                        samples.append(
                            SequenceOutput(
                                parent_seq_id=seq_id,
                                output_token=token,
                                logprobs={token: Logprob(
                                    logprob=float(lp_np[row_idx, j]))}))
                    row_idx += 1
                outputs.append(
                    CompletionSequenceGroupOutput(samples=samples,
                                                  prompt_logprobs=None))
            if any(o.samples for o in outputs):
                outs.append(SamplerOutput(outputs=outputs))
        return outs, kv_caches

    @staticmethod
    def _burst_len(num_steps: int, queue_pressure: bool,
                   steps_to_free: int) -> int:
        """Bound a multi-step decode burst under queue pressure.

        A waiting request that was just refused admission can only
        progress once a running decode frees its seat/KV reserve (both
        scheduler policies admit waiting work before planning a
        pure-decode step), so the burst is shortened only to the
        soonest such finish (``steps_to_free``), quantized onto the
        compiled {4, 8, 16, ...} k-ladder. A blanket k=4 cap here
        polled 8x more often than capacity could change and cost ~25%
        offline throughput (a 256-request bench runs its whole length
        with a non-empty queue). New arrivals see at most one burst of
        latency; the scheduler keeps that burst honest by pre-clamping
        the horizon to VLT_MAX_PRESSURED_BURST whenever a scheduled
        decode may finish EARLY (EOS / stop strings), since those
        finishes are unpredictable. ``steps_to_free == 0`` means the
        horizon is unknown (legacy caller or dropped field): fail
        CLOSED to the conservative 4-step cap rather than silently
        disabling the queue-pressure bound.
        """
        if not queue_pressure or num_steps <= 4:
            return num_steps
        if steps_to_free <= 0:
            return 4
        horizon = steps_to_free
        if horizon >= num_steps:
            return num_steps
        k = 4
        while k * 2 <= horizon:
            k *= 2
        return min(k, num_steps)

    def _num_multistep(self, seq_group_metadata_list, is_prefill: bool,
                       flags) -> int:
        """How many decode steps to fuse on device this call."""
        k = self.scheduler_config.num_scheduler_steps
        if k <= 1 or is_prefill:
            return 1
        do_penalties = flags[0]
        if do_penalties:
            return 1  # penalties need per-step token histories
        for meta in seq_group_metadata_list:
            sp = meta.sampling_params
            if sp is not None and (sp.use_beam_search or sp.best_of > 1):
                return 1
        return k

    def _apply_user_logits_processors(
            self, proc_rows: List[int], rows: List[Tuple[str, int]],
            by_req: Dict[str, SequenceGroupMetadata],
            logits_np: np.ndarray, token_mask: Optional[np.ndarray],
            sampled_np: np.ndarray, logprob_np: np.ndarray,
            top_np, multi_np, n_samples: int, max_logprobs: int):
        """Host-callback lane for per-request user ``logits_processors``.

        The jitted sampler cannot run arbitrary Python callables, so
        rows that carry processors are re-sampled here from the raw
        logits the step returned: mask (guided/min-tokens) first, then
        each processor in order with the reference's 2-arg
        ``(past_ids, logits)`` / 3-arg ``(prompt_ids, past_ids,
        logits)`` calling convention (reference:
        model_executor/layers/logits_processor.py:81-126), then
        temperature/top-k/top-p/min-p and the draw. Other rows keep
        their jitted results untouched. Callables receive a
        ``torch.Tensor`` row for drop-in compatibility with processors
        written against the reference.
        """
        import inspect

        import torch

        for i in proc_rows:
            rid, seq_id = rows[i]
            meta = by_req[rid]
            sp = meta.sampling_params
            data = meta.seq_data[seq_id]
            row = np.asarray(logits_np[i], np.float32).copy()
            if token_mask is not None:
                row = np.where(token_mask[i], row, -np.inf)
            t_row = torch.from_numpy(row)
            prompt_ids = list(data.prompt_token_ids)
            past_ids = list(data.output_token_ids)
            for proc in sp.logits_processors:
                try:
                    n_par = len(inspect.signature(proc).parameters)
                except (TypeError, ValueError):
                    n_par = 2
                if n_par == 3:
                    t_row = proc(prompt_ids, past_ids, t_row)
                else:
                    t_row = proc(past_ids, t_row)
            if isinstance(t_row, torch.Tensor):
                row = t_row.detach().to(torch.float32).cpu().numpy()
            else:
                row = np.asarray(t_row, np.float32)

            # log-softmax over the processed row (logprobs must reflect
            # the constrained distribution, as in the jitted path)
            m = np.max(row)
            raw_lp = row - (m + np.log(np.sum(np.exp(row - m))))

            greedy_tok = int(np.argmax(row))
            if sp.temperature < 1e-5:
                toks = [greedy_tok] * max(n_samples, 1)
            else:
                scaled = row / sp.temperature
                if sp.top_k and sp.top_k > 0:
                    kth = np.partition(scaled, -sp.top_k)[-sp.top_k]
                    scaled = np.where(scaled < kth, -np.inf, scaled)
                if sp.top_p < 1.0:
                    order = np.argsort(scaled)[::-1]
                    sm = np.max(scaled)
                    p = np.exp(scaled[order] - sm)
                    p /= p.sum()
                    cut = np.searchsorted(np.cumsum(p), sp.top_p) + 1
                    drop = order[cut:]
                    scaled[drop] = -np.inf
                if sp.min_p > 0.0:
                    sm = np.max(scaled)
                    p = np.exp(scaled - sm)
                    p /= p.sum()
                    scaled = np.where(p < sp.min_p * p.max(), -np.inf,
                                      scaled)
                sm = np.max(scaled)
                probs = np.exp(scaled - sm)
                probs /= probs.sum()
                if sp.seed:
                    rng = np.random.default_rng(
                        (sp.seed, data.get_output_len()))
                else:
                    rng = self._host_rng
                toks = [int(rng.choice(len(probs), p=probs))
                        for _ in range(max(n_samples, 1))]

            sampled_np[0, i] = toks[0]
            logprob_np[0, i] = raw_lp[toks[0]]
            if top_np is not None and max_logprobs > 0:
                tv, ti = top_np
                tv = np.array(tv)
                ti = np.array(ti)
                ids = np.argpartition(raw_lp, -max_logprobs)
                ids = ids[-max_logprobs:]
                ids = ids[np.argsort(raw_lp[ids])[::-1]]
                ti[0, i] = ids
                tv[0, i] = raw_lp[ids]
                top_np = (tv, ti)
            if multi_np is not None and n_samples > 1:
                mt, mlp = multi_np
                mt = np.array(mt)
                mlp = np.array(mlp)
                mt[i, :] = toks
                mlp[i, :] = raw_lp[np.asarray(toks)]
                multi_np = (mt, mlp)
        return top_np, multi_np

    def execute_model(
        self,
        seq_group_metadata_list: List[SequenceGroupMetadata],
        kv_caches: Tuple[jax.Array, jax.Array],
        lora_slots: Optional[List[int]] = None,
        lora_rope_offsets: Optional[List[int]] = None,
        queue_pressure: bool = False,
        steps_to_free: int = 0,
    ) -> Tuple[List[SamplerOutput], Tuple[jax.Array, jax.Array]]:
        """Run one (possibly multi-)step; returns one SamplerOutput per
        executed decode step (len 1 for prefill / single-step)."""
        if seq_group_metadata_list and \
                seq_group_metadata_list[0].pooling_params is not None:
            return self.execute_pooling(seq_group_metadata_list,
                                        kv_caches)
        t0 = time.perf_counter()
        arrays, rows, is_prefill, b_pad = self._prepare_inputs(
            seq_group_metadata_list)
        st_np, flags, max_logprobs = self._prepare_sampling(
            seq_group_metadata_list, rows, b_pad)
        token_mask = self._build_token_mask(seq_group_metadata_list, rows,
                                            b_pad)
        # prompt logprobs (prefill only): -1 = off, else the top-k width
        prompt_lp_k = -1
        if is_prefill:
            by_req = {m.request_id: m for m in seq_group_metadata_list}
            wants = [
                by_req[rid].sampling_params.prompt_logprobs
                for rid, _ in rows
                if by_req[rid].sampling_params is not None
            ]
            if any(w is not None for w in wants):
                prompt_lp_k = max(w or 0 for w in wants)
                prompt_lp_k = min(next_power_of_2(max(prompt_lp_k, 1)),
                                  self.model_config.max_logprobs) \
                    if prompt_lp_k > 0 else 0
        has_lora = lora_slots is not None and any(
            s >= 0 for s in lora_slots)
        # best_of > 1 / beam search at the prompt phase need multiple
        # candidates per parent (reference: sampler.py beam/random
        # dispatch :452-556): random draws best_of samples; beam takes
        # the top 2*best_of tokens from the logprobs.
        n_samples = 1
        has_beam = False
        for meta in seq_group_metadata_list:
            sp = meta.sampling_params
            if sp is None:
                continue
            if sp.use_beam_search:
                has_beam = True
                max_logprobs = max(max_logprobs, 2 * sp.best_of)
            elif meta.is_prompt and sp.best_of > 1:
                n_samples = max(n_samples, sp.best_of)
        if n_samples > 1 and flags[3]:
            # all_greedy + best_of>1 is rejected by SamplingParams; the
            # flag combination cannot occur
            n_samples = 1
        # Per-request user logits processors (host callables): flag the
        # rows that carry them; those batches run single-step with the
        # raw logits fetched back so the callables execute host-side
        # (reference: layers/logits_processor.py:81-126).
        by_req_all = {m.request_id: m for m in seq_group_metadata_list}
        user_proc_rows: List[int] = []
        for i, (rid, _seq_id) in enumerate(rows):
            sp = by_req_all[rid].sampling_params
            if sp is not None and sp.logits_processors:
                if sp.use_beam_search:
                    raise ValueError(
                        "logits_processors are not supported together "
                        "with beam search")
                user_proc_rows.append(i)
        # Masked steps: guided decoding rides the on-device multi-step
        # loop when the batch's rows share one FSM with device-resident
        # tables (state gather + transition happen inside the loop);
        # otherwise (mixed FSMs, min-tokens suppression, oversized
        # FSMs, user processors) fall back to single-step host masks.
        # LoRA rides multi-step: slots are per-sequence constants.
        guided_ms = None
        # V-offload steps run single-step: the in-loop metadata rebuild
        # drops the ring tables, and exact paging needs the wanted
        # scores back every step.
        num_steps = 1 if (token_mask is not None or user_proc_rows
                          or self.cache_config.v_offload_window) else \
            self._num_multistep(seq_group_metadata_list, is_prefill, flags)
        num_steps = self._burst_len(num_steps, queue_pressure,
                                    steps_to_free)
        if token_mask is not None and not user_proc_rows:
            k = self._num_multistep(seq_group_metadata_list, is_prefill,
                                    flags)
            if k > 1:
                guided_ms = self._try_guided_multistep(
                    seq_group_metadata_list, rows, b_pad)
                if guided_ms is not None:
                    # Guided bursts obey the same queue-pressure bound
                    # as plain decode bursts.
                    num_steps = self._burst_len(k, queue_pressure,
                                                steps_to_free)
                    token_mask = None  # masks now applied in-loop

        step_fn = self._get_step_fn(flags, max_logprobs, num_steps,
                                    prompt_lp_k, n_samples,
                                    return_logits=bool(user_proc_rows),
                                    guided=guided_ms is not None)

        # ---- pack every host input into ONE H2D transfer ----
        named: List[Tuple[str, np.ndarray]] = [
            (k, arrays[k])
            for k in ("tokens", "positions", "slot_mapping",
                      "context_lens", "query_lens", "block_tables", "sel")
        ]
        named += [("st." + k, v) for k, v in st_np.items()]
        # ALWAYS use the merged tree once any adapter is loaded: the
        # shard_map in_specs are built from the merged structure, so a
        # lora-free batch passing bare params would be a pytree
        # structure mismatch under TP
        params = self._merged_params()
        if has_lora:
            l_pad = arrays["tokens"].shape[1]
            tok_lora = np.full((b_pad, l_pad), -1, np.int32)
            for i, slot in enumerate(lora_slots):
                tok_lora[i, :] = slot
            named.append(("lora_indices", tok_lora.reshape(-1)))
        if token_mask is not None:
            named.append(("token_mask", token_mask))
        if guided_ms is not None:
            named.append(("fsm_state", guided_ms[2]))
        if "v_block_tables" in arrays:
            named.append(("v_block_tables", arrays["v_block_tables"]))
        if "v_avail" in arrays:
            named.append(("v_avail", arrays["v_avail"]))
        if "pixel_values" in arrays:
            named.append(("pixel_values", arrays["pixel_values"]))
        if "prompt_embeds" in arrays:
            named.append(("prompt_embeds", arrays["prompt_embeds"]))
            named.append(("embeds_mask", arrays["embeds_mask"]))
        if prompt_lp_k >= 0:
            # target of grid position j = the NEXT prompt token; -1 where
            # the target is not a prompt token (pads / final position)
            by_req = {m.request_id: m for m in seq_group_metadata_list}
            b_dim, l_dim = arrays["tokens"].shape
            lp_targets = np.full((b_dim, l_dim), -1, np.int32)
            for i, (rid, seq_id) in enumerate(rows):
                data = by_req[rid].seq_data[seq_id]
                all_toks = data.prompt_token_ids
                start = int(arrays["positions"][i, 0])
                ql = int(arrays["query_lens"][i])
                for j in range(ql):
                    p_next = start + j + 1
                    if p_next < len(all_toks):
                        lp_targets[i, j] = all_toks[p_next]
            named.append(("lp_targets", lp_targets))

        if lora_rope_offsets is not None and any(lora_rope_offsets):
            # long-context LoRA: shift each row's rope positions into
            # its adapter's scaling segment of the multi-segment cache.
            # Applied LAST: lp_targets/slot mappings above read the
            # true positions. Attention masks derive from context_lens,
            # not this array, so only the rope gather is affected.
            for i, off in enumerate(lora_rope_offsets):
                if off:
                    arrays["positions"][i, :] += off
        staged = stage_arrays(named,
                              replicate_sharding=self._replicated)
        md = AttentionMetadata(
            slot_mapping=staged["slot_mapping"],
            block_tables=staged["block_tables"],
            context_lens=staged["context_lens"],
            query_lens=staged["query_lens"],
            v_block_tables=staged.get("v_block_tables"),
            v_avail=staged.get("v_avail"),
        )
        st = SamplingTensors(
            **{k[3:]: v
               for k, v in staged.items() if k.startswith("st.")})
        extra = {
            k: staged[k]
            for k in ("lora_indices", "token_mask", "pixel_values",
                      "lp_targets", "prompt_embeds", "embeds_mask")
            if k in staged
        }
        if guided_ms is not None:
            extra["fsm_mask"] = guided_ms[0]
            extra["fsm_trans"] = guided_ms[1]
            extra["fsm_state"] = staged["fsm_state"]
        self._step_key, key = jax.random.split(self._step_key)
        if self._replicated is not None:
            key = jax.device_put(np.asarray(key), self._replicated)
        t_prep = time.perf_counter()

        out = step_fn(params, kv_caches, staged["tokens"],
                      staged["positions"], md, staged["sel"], st, key,
                      **extra)
        raw_logits = None
        if num_steps > 1:
            kv_caches, sampled, logprob, top = out
            prompt_lp = multi = None
        elif user_proc_rows:
            (kv_caches, sampled, logprob, top, prompt_lp, multi,
             raw_logits) = out
        else:
            kv_caches, sampled, logprob, top, prompt_lp, multi = out
        t_dispatch = time.perf_counter()

        # ---- fetch every output with ONE D2H transfer ----
        (sampled_f, logprob_f, top_f, prompt_lp_f, multi_f,
         raw_logits_f) = fetch_outputs(
             (sampled, logprob, top, prompt_lp, multi, raw_logits))
        # [B] single-step -> [1, B] so both paths share the fan-out.
        sampled_np = np.atleast_2d(sampled_f)
        logprob_np = np.atleast_2d(logprob_f)
        top_np = None
        if top_f is not None:
            tv, ti = top_f
            if tv.ndim == 2:
                tv, ti = tv[None], ti[None]
            top_np = (tv, ti)
        multi_np = multi_f
        prompt_lp_np = None
        if prompt_lp_f is not None:
            tok_lp, tv, ti = (prompt_lp_f + (None, None))[:3] \
                if isinstance(prompt_lp_f, tuple) else (prompt_lp_f, None,
                                                        None)
            prompt_lp_np = (tok_lp, tv, ti)
        if user_proc_rows:
            sampled_np = np.array(sampled_np)  # make writable
            logprob_np = np.array(logprob_np)
            top_np, multi_np = self._apply_user_logits_processors(
                user_proc_rows, rows, by_req_all,
                np.asarray(raw_logits_f), token_mask, sampled_np,
                logprob_np, top_np, multi_np, n_samples, max_logprobs)
        t_done = time.perf_counter()
        if envs.VLT_BENCHMARK_RUNNER:
            # Fork-parity per-step instrumentation (reference:
            # model_runner.py:992-998 BENCHMARK_RUNNER).
            logger.info(
                "step timing (k=%d): prep %.1fms dispatch %.1fms "
                "fetch %.1fms", num_steps, (t_prep - t0) * 1e3,
                (t_dispatch - t_prep) * 1e3, (t_done - t_dispatch) * 1e3)
        # rolling per-phase averages for /dev/metrics/runner (reference:
        # MetricTracer model_runner.py:75-93 + api_server.py:88-99);
        # 10-step warmup excludes compile time from the averages.
        rm = self.runner_metrics
        rm["steps"] += 1
        if rm["steps"] > 10:
            rm["measured_steps"] += 1
            n = rm["measured_steps"]
            for key, val in (("prepare_ms", (t_prep - t0) * 1e3),
                             ("dispatch_ms",
                              (t_dispatch - t_prep) * 1e3),
                             ("fetch_ms", (t_done - t_dispatch) * 1e3),
                             ("step_ms", (t_done - t0) * 1e3),
                             ("tokens_per_step",
                              float(sampled_np.size))):
                rm[key] += (val - rm[key]) / n

        outs: List[SamplerOutput] = []
        for k in range(sampled_np.shape[0]):
            outputs: List[CompletionSequenceGroupOutput] = []
            row_idx = 0
            for meta in seq_group_metadata_list:
                samples = []
                n_seqs = 1 if meta.is_prompt else len(meta.seq_data)
                sp = meta.sampling_params
                if sp is not None and sp.use_beam_search and meta.do_sample:
                    # 2·bw beam candidates per group, ranked by parent
                    # cumulative + token logprob (reference: sampler.py
                    # _beam_search_sample :351).
                    assert top_np is not None
                    bw = sp.best_of
                    cands = []
                    for _ in range(n_seqs):
                        _, seq_id = rows[row_idx]
                        cum = meta.seq_data[seq_id].cumulative_logprob
                        for v, tid in zip(top_np[0][k, row_idx][:2 * bw],
                                          top_np[1][k, row_idx][:2 * bw]):
                            cands.append((cum + float(v), seq_id,
                                          int(tid), float(v)))
                        row_idx += 1
                    cands.sort(key=lambda c: c[0], reverse=True)
                    for _, parent, tid, lp in cands[:2 * bw]:
                        samples.append(
                            SequenceOutput(
                                parent_seq_id=parent, output_token=tid,
                                logprobs={tid: Logprob(logprob=lp)}))
                    outputs.append(
                        CompletionSequenceGroupOutput(
                            samples=samples, prompt_logprobs=None))
                    continue
                if (sp is not None and meta.is_prompt and sp.best_of > 1
                        and meta.do_sample and multi_np is not None):
                    # best_of parallel samples from one prompt; the
                    # output processor forks children (reference:
                    # sampler.py _random_sample prompt phase).
                    _, seq_id = rows[row_idx]
                    for tid, lp in zip(multi_np[0][row_idx][:sp.best_of],
                                       multi_np[1][row_idx][:sp.best_of]):
                        samples.append(
                            SequenceOutput(
                                parent_seq_id=seq_id,
                                output_token=int(tid),
                                logprobs={int(tid):
                                          Logprob(logprob=float(lp))}))
                    row_idx += 1
                    outputs.append(
                        CompletionSequenceGroupOutput(
                            samples=samples, prompt_logprobs=None))
                    continue
                for _ in range(n_seqs):
                    req_id, seq_id = rows[row_idx]
                    token = int(sampled_np[k, row_idx])
                    lp = float(logprob_np[k, row_idx])
                    logprobs = {token: Logprob(logprob=lp)}
                    if sp.logprobs and top_np is not None:
                        for v, tid in zip(
                                top_np[0][k, row_idx][:sp.logprobs],
                                top_np[1][k, row_idx][:sp.logprobs]):
                            logprobs.setdefault(int(tid),
                                                Logprob(logprob=float(v)))
                    if meta.do_sample:
                        samples.append(
                            SequenceOutput(parent_seq_id=seq_id,
                                           output_token=token,
                                           logprobs=logprobs))
                    row_idx += 1
                group_prompt_lp = None
                if (prompt_lp_np is not None and meta.is_prompt
                        and meta.sampling_params is not None
                        and meta.sampling_params.prompt_logprobs
                        is not None):
                    group_prompt_lp = self._assemble_prompt_logprobs(
                        meta, rows, row_idx - 1, arrays, prompt_lp_np)
                outputs.append(
                    CompletionSequenceGroupOutput(
                        samples=samples,
                        prompt_logprobs=group_prompt_lp))
            outs.append(SamplerOutput(outputs=outputs))
        if self.cache_config.v_offload_exact and rows and \
                self.cache_engine is not None:
            # caches must be current before write-through/staging DMAs
            self._last_step_was_prefill = is_prefill
            self.cache_engine.gpu_cache = kv_caches
            self._v_offload_exact_poststep(rows, arrays, kv_caches)
            kv_caches = self.cache_engine.gpu_cache
        return outs, kv_caches

    def _assemble_prompt_logprobs(self, meta, rows, row_i, arrays,
                                  prompt_lp_np):
        """Per-position {token: Logprob} dicts for this prefill chunk
        (reference: SamplerOutput prompt_logprobs contract — the very
        first prompt token has no logprob and maps to None)."""
        tok_lp, tv, ti = prompt_lp_np
        sp = meta.sampling_params
        k = sp.prompt_logprobs or 0
        seq_id = rows[row_i][1]
        data = meta.seq_data[seq_id]
        all_toks = data.prompt_token_ids
        start = int(arrays["positions"][row_i, 0])
        ql = int(arrays["query_lens"][row_i])
        out = []
        if start == 0:
            out.append(None)
        for j in range(ql):
            p_next = start + j + 1
            if p_next >= len(all_toks):
                break
            tid = int(all_toks[p_next])
            entry = {tid: Logprob(logprob=float(tok_lp[row_i, j]))}
            if k > 0 and tv is not None:
                for v, t in zip(tv[row_i, j][:k], ti[row_i, j][:k]):
                    entry.setdefault(int(t), Logprob(logprob=float(v)))
            out.append(entry)
        return out
