"""TPU worker: owns the mesh, model runner and cache engine.

Reference: ``vllm/worker/worker.py`` :25. The reference's driver/non-driver
split with ``broadcast_tensor_dict`` control plane (:228-316) has no TPU
analogue: a single controller process drives the whole mesh, so
execute_model is a plain function call (SURVEY.md §5.8).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax

from vllm_legacy_tpu import envs
from vllm_legacy_tpu.config import EngineConfig
from vllm_legacy_tpu.logger import init_logger
from vllm_legacy_tpu.parallel.mesh import build_mesh, get_device_hbm_bytes
from vllm_legacy_tpu.sequence import ExecuteModelRequest, SamplerOutput
from vllm_legacy_tpu.worker.cache_engine import (CacheEngine,
                                                 compute_num_blocks)
from vllm_legacy_tpu.worker.model_runner import ModelRunner

logger = init_logger(__name__)

_cache_enabled = False


def _enable_compilation_cache() -> None:
    """Point jit at a persistent on-disk compilation cache so repeated
    engine starts skip the 5-40s first-compile of each (phase, bucket)
    shape (reference analogue: CUDA-graph capture cost amortized by
    long-lived processes; XLA lets us amortize across processes)."""
    global _cache_enabled
    if _cache_enabled:
        return
    _cache_enabled = True
    cache_dir = envs.VLT_COMPILATION_CACHE_DIR
    if not cache_dir:
        return
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # pragma: no cover - config name drift
        logger.warning("compilation cache unavailable: %s", e)


class Worker:

    def __init__(self, engine_config: EngineConfig) -> None:
        cfg = engine_config
        self.model_config = cfg.model_config
        self.cache_config = cfg.cache_config
        self.parallel_config = cfg.parallel_config
        self.scheduler_config = cfg.scheduler_config
        self.load_config = cfg.load_config

        _enable_compilation_cache()
        self.mesh = build_mesh(
            tensor_parallel_size=self.parallel_config.tensor_parallel_size,
            data_parallel_size=self.parallel_config.data_parallel_size)
        self.model_runner = ModelRunner(self.model_config,
                                        self.parallel_config,
                                        self.scheduler_config,
                                        self.cache_config, self.mesh)
        self.cache_engine: Optional[CacheEngine] = None

        # Multi-LoRA (reference: lora/worker_manager.py): adapters are
        # activated on demand per scheduled batch.
        self.lora_manager = None
        if cfg.lora_config is not None:
            from vllm_legacy_tpu.lora.models import LoRAManager
            self._lora_config = cfg.lora_config

        # Speculative decoding (reference: spec_decode_worker.py
        # create_spec_worker :27 — here the proposer plugs into the
        # same worker; scoring runs as a ragged-qlen model call).
        self.spec_proposer = None
        self.draft_proposer = None
        self.num_spec_tokens = 0
        spec = cfg.speculative_config
        if spec is not None and spec.method == "ngram":
            from vllm_legacy_tpu.spec_decode import NGramProposer
            self.spec_proposer = NGramProposer(
                spec.ngram_prompt_lookup_min or 1,
                spec.ngram_prompt_lookup_max,
                spec.num_speculative_tokens)
            self.num_spec_tokens = spec.num_speculative_tokens
        elif spec is not None and spec.method == "draft_model":
            from vllm_legacy_tpu.spec_decode.draft_model import (
                DraftModelProposer)
            self.draft_proposer = DraftModelProposer(
                spec, self.parallel_config, self.scheduler_config,
                self.cache_config, self.mesh)
            self.num_spec_tokens = spec.num_speculative_tokens

    # -- bring-up -------------------------------------------------------
    def load_model(self) -> None:
        if envs.VLT_TRACE_FUNCTION:
            # reference parity: worker_base.py:123
            # enable_trace_function_call_for_thread
            from vllm_legacy_tpu.logger import (enable_trace_function_call,
                                                get_trace_file_path)
            enable_trace_function_call(get_trace_file_path("worker"))
        self.model_runner.load_model(self.load_config.load_format)
        if self.draft_proposer is not None:
            self.draft_proposer.load_model(self.load_config.load_format)
        if getattr(self, "_lora_config", None) is not None:
            from vllm_legacy_tpu.lora.models import LoRAManager
            self.lora_manager = LoRAManager(
                self.model_runner.model,
                max_loras=self._lora_config.max_loras,
                max_rank=self._lora_config.max_lora_rank,
                long_scaling_factors=self._lora_config.
                long_lora_scaling_factors)

    def determine_num_available_blocks(self) -> Tuple[int, int]:
        """Deterministic HBM budgeting (replaces the reference's
        profiling forward, worker.py:136-183)."""
        hbm = get_device_hbm_bytes()
        # Per-device param bytes: total / world size (sharded weights).
        world = max(len(self.mesh.devices.flatten()), 1)
        param_bytes = self.model_runner.param_bytes() // world
        extra_block_bytes = 0
        if self.draft_proposer is not None:
            # the draft's KV cache shares block tables with the target,
            # so every block costs target + draft bytes
            from vllm_legacy_tpu.worker.cache_engine import (
                get_cache_block_size)
            param_bytes += self.draft_proposer.param_bytes() // world
            extra_block_bytes = get_cache_block_size(
                self.cache_config, self.draft_proposer.model_config,
                self.parallel_config)
        num_tpu, num_cpu = compute_num_blocks(
            hbm, param_bytes, self.cache_config, self.model_config,
            self.parallel_config, extra_block_bytes=extra_block_bytes)
        if self.cache_config.kv_offload:
            # fork offload_kv: K and V both live in fixed-size ring
            # pools, so logical blocks cost no HBM — hand the scheduler
            # enough to address every sequence at max_model_len, and
            # verify the rings themselves fit the budget.
            from vllm_legacy_tpu.utils import cdiv as _cdiv
            from vllm_legacy_tpu.worker.cache_engine import (
                get_cache_block_size, v_ring_blocks)
            max_blocks = _cdiv(self.model_config.max_model_len,
                               self.cache_config.block_size)
            per_ring_block = get_cache_block_size(
                self.cache_config, self.model_config,
                self.parallel_config)  # K-only bytes under v_offload
            slots = (self.scheduler_config.max_num_seqs *
                     v_ring_blocks(self.cache_config, self.model_config)
                     + 1)
            ring_bytes = 2 * slots * per_ring_block
            budget = int(hbm * self.cache_config.hbm_utilization
                         ) - param_bytes
            if ring_bytes > budget:
                raise ValueError(
                    f"kv_offload ring pools need {ring_bytes >> 20} MiB "
                    f"but only {max(budget, 0) >> 20} MiB fit; lower "
                    "max_num_seqs or v_offload_window")
            num_tpu = self.scheduler_config.max_num_seqs * max_blocks
            num_cpu = 0  # rings cannot swap (recompute-only)
        if self.cache_config.num_tpu_blocks_override is not None:
            num_tpu = self.cache_config.num_tpu_blocks_override
        return num_tpu, num_cpu

    def initialize_cache(self, num_tpu_blocks: int,
                         num_cpu_blocks: int) -> None:
        self.cache_config.num_tpu_blocks = num_tpu_blocks
        self.cache_config.num_cpu_blocks = num_cpu_blocks
        if self.draft_proposer is not None:
            self.draft_proposer.initialize_cache()
        self._validate_v_offload()
        self.cache_engine = CacheEngine(
            self.cache_config, self.model_config, self.parallel_config,
            self.mesh,
            max_num_seqs=self.scheduler_config.max_num_seqs)
        self.model_runner.kv_cache_ndim = \
            self.cache_engine.gpu_cache[0].ndim
        self.model_runner.kv_cache_arity = \
            len(self.cache_engine.gpu_cache)
        # exact V-offload paging: the runner drives write-through and
        # staging DMAs against the engine's host pool
        self.model_runner.cache_engine = self.cache_engine

    def _validate_v_offload(self) -> None:
        """V-offload pairs with sparse attention and recompute-only
        preemption (the ring pool cannot swap or share blocks)."""
        window = self.cache_config.v_offload_window
        if not window:
            return
        sparse = self.model_config.sparse_attention
        if sparse is None:
            raise ValueError(
                "v_offload_window requires sparse (HiP) attention "
                "(--hip-attention): the top-k selection is what keeps "
                "V reads inside the resident ring")
        if self.cache_config.enable_prefix_caching:
            raise ValueError(
                "v_offload_window is incompatible with prefix caching "
                "(ring V slots are per-sequence, not content-shared)")
        if self.draft_proposer is not None:
            raise ValueError(
                "v_offload_window with a draft spec-decode model is "
                "not supported")
        from vllm_legacy_tpu.utils import cdiv
        num_sel = max(sparse.top_k // self.cache_config.block_size,
                      sparse.num_sink + sparse.num_recent + 1)
        max_blocks = cdiv(self.model_config.max_model_len,
                          self.cache_config.block_size)
        if num_sel >= max_blocks:
            raise ValueError(
                f"v_offload_window: hip_k selects {num_sel} blocks but "
                f"max_model_len holds only {max_blocks} — offload "
                "would never restrict anything; lower hip_k or raise "
                "max_model_len")
        wb = cdiv(window, self.cache_config.block_size)
        if self.cache_config.v_offload_exact:
            # write-through happens at step end; a prefill pass longer
            # than the window would recycle ring slots before their V
            # could retire to the host pool
            if not self.scheduler_config.enable_chunked_prefill:
                raise ValueError(
                    "v_offload_exact requires chunked prefill "
                    "(--enable-chunked-prefill): write-through saves "
                    "completed V blocks between chunks")
            if (self.scheduler_config.max_num_batched_tokens
                    > window):
                raise ValueError(
                    "v_offload_exact: max_num_batched_tokens "
                    f"({self.scheduler_config.max_num_batched_tokens}) "
                    f"must not exceed v_offload_window ({window}) — a "
                    "longer chunk recycles ring slots before "
                    "write-through")
        # propagate the residency restriction into the model's sparse
        # config (models/attention.py reads v_window_blocks)
        self.model_runner.model.sparse_config = sparse._replace(
            v_window_blocks=wb)

    # -- steady state ----------------------------------------------------
    def execute_model(
            self,
            request: ExecuteModelRequest) -> List[SamplerOutput]:
        assert self.cache_engine is not None
        if request.blocks_to_swap_out:
            self.cache_engine.swap_out(request.blocks_to_swap_out)
        if request.blocks_to_swap_in:
            self.cache_engine.swap_in(request.blocks_to_swap_in)
        if request.blocks_to_copy:
            self.cache_engine.copy(request.blocks_to_copy)
        if not request.seq_group_metadata_list:
            return []
        metas = request.seq_group_metadata_list
        lora_slots: list = []
        if self.lora_manager is not None:
            dirty = False
            for meta in metas:
                slot = -1
                if meta.lora_request is not None:
                    before = self.lora_manager.slot_for(meta.lora_request)
                    slot = self.lora_manager.activate(meta.lora_request)
                    dirty |= (before != slot)
                n_rows = 1 if meta.is_prompt else len(meta.seq_data)
                lora_slots.extend([slot] * n_rows)
            if dirty or self.model_runner.lora_params is None:
                self.model_runner.set_lora_params(
                    self.lora_manager.device_lora_params()
                    if self.lora_manager.stacks else None)
        if (self.draft_proposer is not None
                and metas[0].pooling_params is None
                and not any(s >= 0 for s in lora_slots)):
            if metas[0].is_prompt:
                outputs, new_caches = self.model_runner.execute_model(
                    metas, self.cache_engine.gpu_cache)
                self.cache_engine.gpu_cache = new_caches
                # mirror the prompt into the draft KV cache
                self.draft_proposer.on_prefill(metas)
                return outputs
            speculatable = all(
                m.sampling_params is None
                or (not m.sampling_params.use_beam_search
                    and m.sampling_params.best_of == 1)
                for m in metas)
            if speculatable:
                proposals = self.draft_proposer.propose(metas)
                outputs, new_caches = self.model_runner.execute_spec(
                    metas, self.cache_engine.gpu_cache, proposals,
                    self.num_spec_tokens)
                self.cache_engine.gpu_cache = new_caches
                return outputs
        if (self.spec_proposer is not None and not metas[0].is_prompt
                and not any(s >= 0 for s in lora_slots)):
            proposals = []
            speculatable = True
            for meta in metas:
                sp = meta.sampling_params
                if sp is not None and (sp.use_beam_search
                                       or sp.best_of > 1):
                    speculatable = False
                for seq_id, data in meta.seq_data.items():
                    proposals.append(
                        self.spec_proposer.propose(data.get_token_ids()))
            if speculatable and any(p for p in proposals):
                outputs, new_caches = self.model_runner.execute_spec(
                    metas, self.cache_engine.gpu_cache, proposals,
                    self.num_spec_tokens)
                self.cache_engine.gpu_cache = new_caches
                return outputs
        rope_offsets = None
        if self.lora_manager is not None and \
                self.lora_manager.extended_rope_cache is not None:
            rope_offsets = self.lora_manager.rope_offsets_for(lora_slots)
        outputs, new_caches = self.model_runner.execute_model(
            metas, self.cache_engine.gpu_cache,
            lora_slots=lora_slots if self.lora_manager else None,
            lora_rope_offsets=rope_offsets,
            queue_pressure=request.waiting_queue_size > 0,
            steps_to_free=request.steps_to_first_free)
        self.cache_engine.gpu_cache = new_caches
        return outputs

    def check_health(self) -> None:
        # Single-process SPMD: liveness == this process being alive.
        return
