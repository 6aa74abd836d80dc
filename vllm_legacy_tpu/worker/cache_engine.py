"""KV-cache allocation and block movement.

Reference: ``vllm/worker/cache_engine/cache_engine.py`` :14 — but TPU
memory is deterministic, so there is no profiling forward pass
(reference Worker.determine_num_available_blocks, worker.py:136-183):
block counts are computed arithmetically from the HBM budget.

Layout: ONE stacked pair k/v, each block-major ``[num_layers,
num_blocks, num_kv_heads, block_size, head_size]``, sharded
P(None, None, "model", None, None) over the mesh (see ops/kv_cache.py
for why stacking and block-major are load-bearing). The swap tier lives
in host RAM as numpy arrays.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from vllm_legacy_tpu.config import CacheConfig, ModelConfig, ParallelConfig
from vllm_legacy_tpu.logger import init_logger

logger = init_logger(__name__)

_GB = 1 << 30


def resolve_cache_dtype(cache_config: CacheConfig,
                        model_config: ModelConfig) -> Any:
    """'auto' follows the model dtype; fp8 variants map to e4m3/e5m2."""
    from vllm_legacy_tpu.utils import STR_DTYPE_TO_JAX_DTYPE
    name = cache_config.cache_dtype
    if name == "auto":
        name = model_config.dtype
    return jnp.dtype(STR_DTYPE_TO_JAX_DTYPE.get(name, name))


def get_cache_block_size(cache_config: CacheConfig,
                         model_config: ModelConfig,
                         parallel_config: ParallelConfig) -> int:
    """Bytes per KV block across all layers (reference:
    cache_engine.py:102-120), for the WHOLE model (all shards). Under
    V-offload only K scales with the block count (V lives in the
    fixed-size ring pool)."""
    from vllm_legacy_tpu.models.attention import (padded_head_size,
                                                  use_fused_kv,
                                                  use_packed_kv)
    fused = use_fused_kv(sparse=model_config.sparse_attention,
                         v_offload=bool(cache_config.v_offload_window))
    if fused and use_packed_kv(model_config.get_head_size(),
                               sparse=model_config.sparse_attention,
                               block_size=cache_config.block_size,
                               self_extend=model_config.self_extend):
        head_size = model_config.get_head_size()  # pair rows, no pad
    else:
        head_size = padded_head_size(model_config.get_head_size())
    num_heads = model_config.get_total_num_kv_heads()
    num_layers = model_config.get_num_layers(parallel_config)
    kv_dtype = resolve_cache_dtype(cache_config, model_config)
    per_cache = 1 if cache_config.v_offload_window else 2  # k (+ v)
    per_token = num_heads * head_size * kv_dtype.itemsize * per_cache
    return per_token * cache_config.block_size * num_layers


def v_ring_blocks(cache_config: CacheConfig, model_config) -> int:
    """Ring slots per sequence: sink + window blocks."""
    sparse = model_config.sparse_attention
    sink = sparse.num_sink if sparse is not None else 1
    bs = cache_config.block_size
    return sink + (cache_config.v_offload_window + bs - 1) // bs


def compute_num_blocks(
    available_hbm_bytes: int,
    param_bytes: int,
    cache_config: CacheConfig,
    model_config: ModelConfig,
    parallel_config: ParallelConfig,
    *,
    activation_headroom: float = 0.05,
    extra_block_bytes: int = 0,
) -> Tuple[int, int]:
    """Deterministic TPU replacement for the reference's empirical memory
    profiling: (HBM * utilization - params - headroom) / block_bytes.
    ``extra_block_bytes`` adds per-block cost of secondary caches (the
    spec-decode draft model's KV shares the target's block tables)."""
    budget = int(available_hbm_bytes * cache_config.hbm_utilization)
    budget -= param_bytes
    budget -= int(available_hbm_bytes * activation_headroom)
    block_bytes = get_cache_block_size(cache_config, model_config,
                                       parallel_config)
    block_bytes += extra_block_bytes
    num_gpu_blocks = max(budget // block_bytes, 0)
    num_cpu_blocks = int(cache_config.swap_space_bytes // block_bytes)
    return int(num_gpu_blocks), int(num_cpu_blocks)


class CacheEngine:
    """Owns the device + host KV tensors and block-movement ops."""

    def __init__(
        self,
        cache_config: CacheConfig,
        model_config: ModelConfig,
        parallel_config: ParallelConfig,
        mesh: Mesh,
        max_num_seqs: int = 256,
    ) -> None:
        self.cache_config = cache_config
        self.model_config = model_config
        self.parallel_config = parallel_config
        self.mesh = mesh

        self.block_size = cache_config.block_size
        self.num_gpu_blocks = cache_config.num_gpu_blocks
        self.num_cpu_blocks = cache_config.num_cpu_blocks or 0
        self.num_layers = model_config.get_num_layers(parallel_config)
        from vllm_legacy_tpu.models.attention import (kv_cache_shape,
                                                      padded_head_size,
                                                      use_fused_kv,
                                                      use_packed_kv)
        self.num_kv_heads = model_config.get_total_num_kv_heads()
        self.fused = use_fused_kv(
            sparse=model_config.sparse_attention,
            v_offload=bool(cache_config.v_offload_window))
        self.packed = self.fused and use_packed_kv(
            model_config.get_head_size(),
            sparse=model_config.sparse_attention,
            block_size=cache_config.block_size,
            self_extend=model_config.self_extend)
        self.head_size = (model_config.get_head_size() if self.packed
                          else padded_head_size(
                              model_config.get_head_size()))
        self.dtype = resolve_cache_dtype(cache_config, model_config)

        spec = P(None, None, "model", None) if self.packed else \
            P(None, None, "model", None, None)
        self.cache_sharding = NamedSharding(mesh, spec)
        self.cache_spec = spec

        # ONE stacked buffer per k/v for the whole model: many distinct
        # donated HBM buffers feeding Pallas reads degrade XLA/runtime
        # aliasing catastrophically (ops/kv_cache.py docstring).
        shape = kv_cache_shape(self.num_layers, self.num_gpu_blocks,
                               self.num_kv_heads, self.block_size,
                               model_config.get_head_size(),
                               packed=self.packed, fused=self.fused)
        v_shape = shape
        self.v_stage_base = 0
        if cache_config.v_offload_window:
            # V ring pool: max_num_seqs rings of sink+window blocks
            # (fork offload_v capability, map_cache_engine.py:356 — V
            # bounded in HBM while K stays full for exact in-window
            # top-k scoring)
            assert not self.packed
            num_v_slots = max_num_seqs * v_ring_blocks(
                cache_config, model_config) + 1
            if cache_config.v_offload_exact:
                # staged slots: per-seq segments appended after the
                # rings; out-of-window V blocks page back in here
                self.v_stage_base = num_v_slots
                num_v_slots += (max_num_seqs *
                                cache_config.v_stage_blocks)
            v_shape = (shape[0], num_v_slots) + shape[2:]
            logger.info(
                "V-offload: %d V ring slots vs %d K blocks "
                "(%.1fx V HBM saving at full context)", num_v_slots,
                self.num_gpu_blocks,
                max(self.num_gpu_blocks / num_v_slots, 1.0))
            if cache_config.kv_offload:
                # fork offload_kv: K shares the ring geometry, so
                # NEITHER cache scales with context; logical blocks
                # are bookkeeping-only (worker sizes them virtually)
                shape = v_shape
        def alloc(s):
            # Zeros are produced ON device with the target sharding (a
            # host-side zeros + device_put would materialize the full
            # global buffer per host and break multi-process runs).
            return jax.jit(lambda: jnp.zeros(s, self.dtype),
                           out_shardings=self.cache_sharding)()

        if self.fused:
            # ONE buffer holds K and V (block = per-head K rows then V
            # rows) — a block's K+V arrive in one DMA and the decode
            # kernel is the gang-batched fused_decode path
            self.gpu_cache: Tuple[jax.Array, ...] = (alloc(shape), )
        else:
            self.gpu_cache = (alloc(shape), alloc(v_shape))
        # Exact V-offload: host V pool (indexed by the K PHYSICAL block
        # id — one host slot per logical KV block) + the wanted-scores
        # accumulator the in-graph selection fills for the staging
        # planner. TPU analogue of the fork's UVM-managed V
        # (map_cache_engine.py:268-379): blocks retire to host RAM at
        # completion and page back into staged ring slots on demand.
        self.host_v_pool: Optional[np.ndarray] = None
        if cache_config.v_offload_exact:
            host_dtype = (jnp.dtype(self.dtype).name
                          if self.dtype != jnp.bfloat16 else "uint16")
            self.host_v_pool = np.zeros(
                (self.num_layers, self.num_gpu_blocks) + shape[2:],
                host_dtype)
            from vllm_legacy_tpu.utils import cdiv
            max_entries = cdiv(model_config.max_model_len,
                               self.block_size)
            # rows cover the LARGEST padded batch bucket (buckets pad
            # to powers of two and can exceed max_num_seqs)
            srows = max(8, 1 << (max_num_seqs - 1).bit_length())
            wanted = jax.jit(
                lambda: jnp.zeros((srows, max_entries), jnp.float32),
                out_shardings=NamedSharding(mesh, P()))()
            self.gpu_cache = self.gpu_cache + (wanted, )
        # Host swap tier (reference: pinned-CPU swap pool).
        self.cpu_cache: Optional[Tuple[np.ndarray, ...]] = None
        if self.num_cpu_blocks > 0:
            host_dtype = (jnp.dtype(self.dtype).name
                          if self.dtype != jnp.bfloat16 else "uint16")
            cshape = (self.num_layers, self.num_cpu_blocks) + shape[2:]
            self.cpu_cache = tuple(
                np.zeros(cshape, host_dtype) for _ in self.gpu_cache)

        # block-addressed arrays (copy/swap operate on these only —
        # the exact-offload wanted accumulator is not block-shaped)
        self._n_block_caches = 1 if self.fused else 2
        self._jit_copy = None

    # -- block movement ------------------------------------------------
    def copy(self, blocks_to_copy: Dict[int, List[int]]) -> None:
        """Copy-on-write duplication (reference: worker.py:214-226 →
        cache_kernels.cu copy_blocks)."""
        if not blocks_to_copy:
            return
        src, dst = [], []
        for s, ds in blocks_to_copy.items():
            for d in ds:
                src.append(s)
                dst.append(d)
        src_a = jnp.asarray(src, jnp.int32)
        dst_a = jnp.asarray(dst, jnp.int32)
        if self._jit_copy is None:
            from vllm_legacy_tpu.ops.kv_cache import copy_one

            def run(caches, s, d):
                return tuple(copy_one(c, s, d) for c in caches)

            self._jit_copy = jax.jit(run, donate_argnums=(0, ))
        n = self._n_block_caches
        self.gpu_cache = tuple(
            self._jit_copy(self.gpu_cache[:n], src_a, dst_a)
        ) + self.gpu_cache[n:]

    def swap_out(self, mapping: Dict[int, int]) -> None:
        """Device -> host block movement (gather on device, one
        transfer per cache tensor).

        Multi-host: every process runs this on the same broadcast
        mapping, but each only D2Hs its ADDRESSABLE shards (its local
        heads range under the TP sharding) into its host pool — the
        per-host shard swap the reference gets from per-GPU Ray workers
        (reference: vllm/worker/worker.py:214-226 driven through
        ray_gpu_executor)."""
        if not mapping:
            return
        from vllm_legacy_tpu.ops.kv_cache import gather_blocks
        src = jnp.asarray(list(mapping.keys()), jnp.int32)
        dst = list(mapping.values())
        multi = jax.process_count() > 1
        for host, dev in zip(self.cpu_cache,
                             self.gpu_cache[:self._n_block_caches]):
            gathered = gather_blocks(dev, src)
            if not multi:
                blocks = np.asarray(jax.device_get(gathered))
                if host.dtype == np.uint16:
                    blocks = blocks.view(np.uint16)
                host[:, dst] = blocks
                continue
            seen = set()
            for shard in gathered.addressable_shards:
                if shard.index in seen:  # replicated dims: copy once
                    continue
                seen.add(shard.index)
                data = np.asarray(shard.data)
                if host.dtype == np.uint16:
                    data = data.view(np.uint16)
                # dim 1 (blocks) is unsharded; replace its full slice
                # with the destination block ids
                host[(shard.index[0], dst) + shard.index[2:]] = data

    def swap_in(self, mapping: Dict[int, int]) -> None:
        if not mapping:
            return
        import ml_dtypes

        from vllm_legacy_tpu.ops.kv_cache import scatter_blocks
        src = list(mapping.keys())
        dst = jnp.asarray(list(mapping.values()), jnp.int32)
        multi = jax.process_count() > 1
        new_caches = []
        for host, dev in zip(self.cpu_cache,
                             self.gpu_cache[:self._n_block_caches]):
            if not multi:
                blocks = host[:, src]
                if host.dtype == np.uint16:
                    blocks = blocks.view(ml_dtypes.bfloat16)
                new_caches.append(
                    scatter_blocks(dev, jnp.asarray(blocks), dst))
                continue
            # Rebuild the global [L, P, ...] blocks array from each
            # process's host shards: the callback hands every process
            # exactly the slices it owns (the same ranges swap_out
            # filled on this host).
            gshape = (host.shape[0], len(src)) + host.shape[2:]
            sharding = jax.sharding.NamedSharding(
                dev.sharding.mesh, dev.sharding.spec)

            def cb(index, host=host):
                data = host[(index[0], src) + index[2:]]
                if host.dtype == np.uint16:
                    data = data.view(ml_dtypes.bfloat16)
                return data

            blocks = jax.make_array_from_callback(gshape, sharding, cb)
            new_caches.append(scatter_blocks(dev, blocks, dst))
        self.gpu_cache = tuple(new_caches)

    # -- exact V-offload paging -----------------------------------------
    def v_writethrough(self, ring_slots: List[int],
                       phys_blocks: List[int]) -> None:
        """Copy completed V blocks ring -> host pool (one gathered D2H).
        Called by the runner as blocks fill; the ring slot is reused a
        window later, so completion-time write-through is race-free."""
        if not ring_slots:
            return
        import ml_dtypes  # noqa: F401
        from vllm_legacy_tpu.ops.kv_cache import gather_blocks
        v_dev = self.gpu_cache[1]
        blocks = np.asarray(jax.device_get(
            gather_blocks(v_dev, jnp.asarray(ring_slots, jnp.int32))))
        if self.host_v_pool.dtype == np.uint16:
            blocks = blocks.view(np.uint16)
        self.host_v_pool[:, phys_blocks] = blocks

    def v_stage(self, phys_blocks: List[int],
                staged_slots: List[int]) -> None:
        """Page offloaded V blocks host pool -> staged ring slots (one
        H2D scatter); the runner's v_block_tables then point selected
        out-of-window entries at these slots."""
        if not phys_blocks:
            return
        import ml_dtypes

        from vllm_legacy_tpu.ops.kv_cache import scatter_blocks
        blocks = self.host_v_pool[:, phys_blocks]
        if self.host_v_pool.dtype == np.uint16:
            blocks = blocks.view(ml_dtypes.bfloat16)
        v_dev = scatter_blocks(self.gpu_cache[1], jnp.asarray(blocks),
                               jnp.asarray(staged_slots, jnp.int32))
        self.gpu_cache = (self.gpu_cache[0], v_dev) + self.gpu_cache[2:]
