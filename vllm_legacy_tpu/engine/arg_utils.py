"""CLI/programmatic engine arguments → EngineConfig.

Reference: ``vllm/engine/arg_utils.py`` (EngineArgs, ~70 flags,
create_engine_config). Flags that only exist for CUDA mechanics
(CUDA graphs, NCCL backends, Ray) are intentionally absent; TPU-specific
knobs (hbm_utilization, num_tpu_blocks_override) replace them.
"""
from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass
from typing import Optional

from vllm_legacy_tpu.config import (CacheConfig, DecodingConfig,
                                    DeviceConfig, EngineConfig, LoadConfig,
                                    LoadFormat, LoRAConfig, ModelConfig,
                                    ParallelConfig, SchedulerConfig,
                                    SpeculativeConfig)


@dataclass
class EngineArgs:
    model: str
    tokenizer: Optional[str] = None
    tokenizer_mode: str = "auto"
    skip_tokenizer_init: bool = False
    tokenizer_pool_size: int = 0
    trust_remote_code: bool = False
    revision: Optional[str] = None
    dtype: str = "auto"
    seed: int = 0
    max_model_len: Optional[int] = None
    quantization: Optional[str] = None
    quantization_param_path: Optional[str] = None
    served_model_name: Optional[str] = None
    max_logprobs: int = 20

    load_format: str = "auto"

    # KV cache
    block_size: int = 16
    hbm_utilization: float = 0.9
    swap_space: float = 4.0  # GiB
    kv_cache_dtype: str = "auto"
    num_tpu_blocks_override: Optional[int] = None
    enable_prefix_caching: bool = False

    # Parallelism
    tensor_parallel_size: int = 1
    pipeline_parallel_size: int = 1
    data_parallel_size: int = 1

    # Scheduler
    max_num_batched_tokens: Optional[int] = None
    max_num_seqs: int = 256
    enable_chunked_prefill: bool = False
    num_scheduler_steps: int = 1
    # Compile the (decode batch-bucket, multi-step k) grid at startup
    # (TPU analogue of the reference's CUDA-graph capture) so serving
    # traffic never hits a first-use compile stall mid-request; makes
    # multi-step serving (num_scheduler_steps > 1) viable
    prewarm_decode: bool = False
    preemption_mode: Optional[str] = None
    admission_control: str = "optimistic"
    delay_factor: float = 0.0

    # LoRA
    enable_lora: bool = False
    max_loras: int = 1
    max_lora_rank: int = 16
    long_lora_scaling_factors: Optional[tuple] = None

    # Spec decode
    speculative_model: Optional[str] = None
    num_speculative_tokens: Optional[int] = None
    ngram_prompt_lookup_max: Optional[int] = None
    ngram_prompt_lookup_min: Optional[int] = None

    # Decoding
    guided_decoding_backend: str = "outlines"

    # Sparse long-context attention (fork HiP capability; reference env
    # HIP_K / HIP_DENSE_LAYERS, attention/backends/hip.py:106-110)
    hip_attention: bool = False
    hip_k: int = 1024
    # fork CACHE_ENGINE=offload_v equivalent; tokens of resident V
    v_offload_window: Optional[int] = None
    kv_offload: bool = False
    v_offload_exact: bool = False
    v_stage_blocks: int = 8
    hip_dense_layers: int = 3

    # Self-extend RoPE (reference env SE_WINDOW / SE_SCALE)
    self_extend: bool = False
    se_window: int = 1024
    se_group: int = 8

    disable_log_stats: bool = False

    @classmethod
    def add_cli_args(cls, parser: argparse.ArgumentParser
                     ) -> argparse.ArgumentParser:
        for f in dataclasses.fields(cls):
            name = "--" + f.name.replace("_", "-")
            default = f.default
            type_str = str(f.type)
            if "bool" in type_str or isinstance(default, bool):
                parser.add_argument(name, action="store_true",
                                    default=default)
            elif "float" in type_str or isinstance(default, float):
                parser.add_argument(name, type=float, default=default)
            elif "int" in type_str or isinstance(default, int):
                parser.add_argument(name, type=int, default=default)
            else:
                parser.add_argument(name, type=str, default=default)
        return parser

    @classmethod
    def from_cli_args(cls, args: argparse.Namespace) -> "EngineArgs":
        attrs = [f.name for f in dataclasses.fields(cls)]
        return cls(**{a: getattr(args, a) for a in attrs
                      if hasattr(args, a)})

    def _v_offload_window(self):
        """Explicit arg, or the fork-parity env pair
        VLT_CACHE_ENGINE=offload_v (+ VLT_V_WINDOW tokens)."""
        import os
        if self.v_offload_window is not None:
            return int(self.v_offload_window)
        if os.getenv("VLT_CACHE_ENGINE", "") == "offload_v":
            return int(os.getenv("VLT_V_WINDOW", "8192"))
        return None

    def _sparse_attention_config(self):
        if not self.hip_attention:
            return None
        from vllm_legacy_tpu.models.attention import SparseAttentionConfig
        return SparseAttentionConfig(top_k=self.hip_k,
                                     dense_layers=self.hip_dense_layers)

    def create_engine_config(self) -> EngineConfig:
        model_config = ModelConfig(
            model=self.model,
            tokenizer=self.tokenizer,
            tokenizer_mode=self.tokenizer_mode,
            trust_remote_code=self.trust_remote_code,
            dtype=self.dtype,
            seed=self.seed,
            revision=self.revision,
            max_model_len=self.max_model_len,
            quantization=self.quantization,
            quantization_param_path=self.quantization_param_path,
            max_logprobs=self.max_logprobs,
            skip_tokenizer_init=self.skip_tokenizer_init,
            tokenizer_pool_size=self.tokenizer_pool_size,
            served_model_name=self.served_model_name,
            sparse_attention=self._sparse_attention_config(),
            self_extend=((self.se_window, self.se_group)
                         if self.self_extend else None),
        )
        cache_config = CacheConfig(
            block_size=self.block_size,
            hbm_utilization=self.hbm_utilization,
            swap_space_gb=self.swap_space,
            cache_dtype=self.kv_cache_dtype,
            num_tpu_blocks_override=self.num_tpu_blocks_override,
            sliding_window=model_config.get_sliding_window(),
            enable_prefix_caching=self.enable_prefix_caching,
            v_offload_window=self._v_offload_window(),
            kv_offload=self.kv_offload,
            v_offload_exact=self.v_offload_exact,
            v_stage_blocks=self.v_stage_blocks,
        )
        parallel_config = ParallelConfig(
            pipeline_parallel_size=self.pipeline_parallel_size,
            tensor_parallel_size=self.tensor_parallel_size,
            data_parallel_size=self.data_parallel_size,
        )
        max_batched = self.max_num_batched_tokens
        if max_batched is None:
            if self.enable_chunked_prefill:
                max_batched = 512
            else:
                max_batched = max(model_config.max_model_len, 2048)
        preemption_mode = self.preemption_mode
        if self._v_offload_window():
            # ring V slots are per-sequence and cannot swap; recompute
            # rebuilds them on return
            preemption_mode = "recompute"
        scheduler_config = SchedulerConfig(
            max_num_batched_tokens=max_batched,
            max_num_seqs=self.max_num_seqs,
            max_model_len=model_config.max_model_len,
            enable_chunked_prefill=self.enable_chunked_prefill,
            num_scheduler_steps=self.num_scheduler_steps,
            num_lookahead_slots=self.num_speculative_tokens or 0,
            preemption_mode=preemption_mode,
            admission_control=self.admission_control,
            delay_factor=self.delay_factor,
        )
        long_factors = self.long_lora_scaling_factors
        if isinstance(long_factors, str):  # CLI: "2.0,4.0"
            long_factors = tuple(
                float(x) for x in long_factors.split(",") if x)
        lora_config = LoRAConfig(
            max_lora_rank=self.max_lora_rank,
            max_loras=self.max_loras,
            long_lora_scaling_factors=long_factors
        ) if self.enable_lora else None
        speculative_config = SpeculativeConfig.maybe_create_spec_config(
            model_config,
            speculative_model=self.speculative_model,
            num_speculative_tokens=self.num_speculative_tokens,
            ngram_prompt_lookup_max=self.ngram_prompt_lookup_max,
            ngram_prompt_lookup_min=self.ngram_prompt_lookup_min,
        )
        load_config = LoadConfig(load_format=LoadFormat(self.load_format))
        decoding_config = DecodingConfig(
            guided_decoding_backend=self.guided_decoding_backend)
        return EngineConfig(
            model_config=model_config,
            cache_config=cache_config,
            parallel_config=parallel_config,
            scheduler_config=scheduler_config,
            device_config=DeviceConfig(),
            load_config=load_config,
            lora_config=lora_config,
            speculative_config=speculative_config,
            decoding_config=decoding_config,
        )


@dataclass
class AsyncEngineArgs(EngineArgs):
    """Args for the async engine (reference: AsyncEngineArgs)."""
    disable_log_requests: bool = False
    max_log_len: Optional[int] = None
