"""Engine configuration dataclasses.

Capability parity with the reference's ``vllm/config.py`` (ModelConfig :29,
CacheConfig :340, LoadConfig :496, ParallelConfig :545, SchedulerConfig
:630, DeviceConfig :715, SpeculativeConfig :740, LoRAConfig :1012,
DecodingConfig :1285, EngineConfig :1300) — redesigned for a
single-controller JAX engine over a TPU device mesh:

* ``ParallelConfig`` describes mesh axes (data/tensor), not process groups.
* There is no GPU-memory-profiling forward pass: TPU KV-cache sizing is
  computed deterministically from the HBM budget (CacheConfig).
"""
from __future__ import annotations

import enum
import os
from dataclasses import dataclass, field, fields
from typing import TYPE_CHECKING, Any, Optional, Union

from vllm_legacy_tpu.logger import init_logger
from vllm_legacy_tpu.utils import STR_DTYPE_TO_JAX_DTYPE, cdiv

if TYPE_CHECKING:
    from transformers import PretrainedConfig

logger = init_logger(__name__)

_GB = 1 << 30

# Supported quantization methods (reference registry:
# vllm/model_executor/layers/quantization/__init__.py:20-33). All
# weight-only groupwise methods share one packed TPU layout + one Pallas
# fused dequant-GEMM family (see layers/quantization/).
QUANTIZATION_METHODS = [
    "aqlm",
    "gptq",
    "awq",
    "squeezellm",
    "fp8",
    "int8",
    "deepspeedfp",
    "sparseml",
    "compressed-tensors",
    # CUDA-layout aliases; repacked to the common int4 layout
    "marlin",
    "gptq_marlin",
    "gptq_marlin_24",
]


class LoadFormat(str, enum.Enum):
    AUTO = "auto"
    SAFETENSORS = "safetensors"
    PT = "pt"
    NPCACHE = "npcache"
    DUMMY = "dummy"
    SHARDED_STATE = "sharded_state"
    TENSORIZER = "tensorizer"


def _get_and_verify_dtype(config_dtype: Any, dtype: Union[str, Any]) -> str:
    """Resolve the compute dtype. TPU-first: default bfloat16.

    (Reference: _get_and_verify_dtype vllm/config.py; fp16 checkpoints run
    in bf16 on TPU — same mantissa budget as the MXU accepts natively.)
    """
    if isinstance(dtype, str):
        dtype = dtype.lower()
        if dtype == "auto":
            return "bfloat16"
        if dtype in STR_DTYPE_TO_JAX_DTYPE:
            resolved = STR_DTYPE_TO_JAX_DTYPE[dtype]
            if resolved == "float16":
                # fp16 is not MXU-native; bf16 is the TPU equivalent.
                return "bfloat16"
            return resolved
        raise ValueError(f"Unknown dtype: {dtype}")
    return str(dtype)


def _get_and_verify_max_len(hf_config: "PretrainedConfig",
                            max_model_len: Optional[int]) -> int:
    derived = None
    for key in ("max_position_embeddings", "n_positions", "max_seq_len",
                "seq_length", "max_sequence_length"):
        v = getattr(hf_config, key, None)
        if v is not None:
            derived = v if derived is None else min(derived, v)
    rope_scaling = getattr(hf_config, "rope_scaling", None)
    if rope_scaling is not None and derived is not None:
        rtype = rope_scaling.get("rope_type", rope_scaling.get("type"))
        factor = rope_scaling.get("factor", 1.0)
        if rtype in ("linear", "dynamic", "yarn"):
            derived = int(derived * factor)
    if derived is None:
        derived = 2048
    if max_model_len is None:
        return int(derived)
    if max_model_len > derived:
        logger.warning(
            "max_model_len=%d exceeds the model's derived maximum %d.",
            max_model_len, derived)
    return int(max_model_len)


class ModelConfig:
    """Model + tokenizer + dtype + quantization resolution.

    Reference: ModelConfig (vllm/config.py:29) incl. quantization sniffing
    from the HF ``quantization_config`` (:162-220).
    """

    def __init__(
        self,
        model: str,
        tokenizer: Optional[str] = None,
        tokenizer_mode: str = "auto",
        trust_remote_code: bool = False,
        dtype: Union[str, Any] = "auto",
        seed: int = 0,
        revision: Optional[str] = None,
        max_model_len: Optional[int] = None,
        quantization: Optional[str] = None,
        quantization_param_path: Optional[str] = None,
        enforce_eager: bool = False,
        max_logprobs: int = 20,
        skip_tokenizer_init: bool = False,
        tokenizer_pool_size: int = 0,
        served_model_name: Optional[str] = None,
        hf_config: Optional["PretrainedConfig"] = None,
        rope_scaling: Optional[dict] = None,
        sliding_window_override: Optional[int] = None,
        embedding_mode: bool = False,
        sparse_attention: Optional[Any] = None,
        self_extend: Optional[Any] = None,
    ) -> None:
        self.model = model
        self.tokenizer = tokenizer or model
        self.tokenizer_mode = tokenizer_mode
        self.trust_remote_code = trust_remote_code
        self.seed = seed
        self.revision = revision
        self.quantization = quantization
        self.quantization_param_path = quantization_param_path
        self.enforce_eager = enforce_eager
        self.max_logprobs = max_logprobs
        self.skip_tokenizer_init = skip_tokenizer_init
        # >0: encode_async offloads to this many pool threads
        # (reference: --tokenizer-pool-size, ray_tokenizer_group.py)
        self.tokenizer_pool_size = tokenizer_pool_size
        self.served_model_name = served_model_name or model
        self.embedding_mode = embedding_mode
        # SparseAttentionConfig or None (fork HiP capability, models/
        # attention.py) — top-k block-sparse long-context decode.
        self.sparse_attention = sparse_attention
        # (window, group) or None — self-extend RoPE (fork
        # rope_method='self_extend'); extends usable context past the
        # trained max by group-quantizing far relative positions.
        self.self_extend = self_extend

        if hf_config is None:
            from vllm_legacy_tpu.transformers_utils.config import (
                get_hf_config)
            hf_config = get_hf_config(model,
                                      trust_remote_code=trust_remote_code,
                                      revision=revision)
        self.hf_config = hf_config
        if rope_scaling is not None:
            self.hf_config.rope_scaling = rope_scaling
        self.hf_text_config = getattr(hf_config, "text_config", hf_config)
        config_dtype = getattr(self.hf_text_config, "torch_dtype", None)
        self.dtype = _get_and_verify_dtype(config_dtype, dtype)
        self.max_model_len = _get_and_verify_max_len(self.hf_text_config,
                                                     max_model_len)
        self._sliding_window_override = sliding_window_override
        if not self.embedding_mode:
            # auto-detect bare-encoder checkpoints (reference:
            # ModelConfig.embedding_mode via ModelRegistry)
            from vllm_legacy_tpu.models.registry import ModelRegistry
            archs = getattr(self.hf_config, "architectures", None) or []
            self.embedding_mode = ModelRegistry.is_embedding_model(archs)
        self._verify_quantization()

    def _verify_quantization(self) -> None:
        if self.quantization is not None:
            self.quantization = self.quantization.lower()
        # Sniff the checkpoint's quantization_config (reference
        # config.py:162-220). Local dirs only; hub models resolved lazily
        # by the loader.
        hf_quant = getattr(self.hf_config, "quantization_config", None)
        if hf_quant is not None:
            method = hf_quant.get("quant_method", "").lower()
            if method == "gptq" and hf_quant.get("checkpoint_format") == \
                    "marlin":
                method = "marlin"
            if self.quantization is None:
                self.quantization = method
            elif self.quantization != method and not (
                    self.quantization in ("gptq", "marlin", "gptq_marlin")
                    and method in ("gptq", "marlin", "gptq_marlin")):
                raise ValueError(
                    f"Quantization method {self.quantization} does not "
                    f"match checkpoint quantization {method}.")
        if (self.quantization is not None
                and self.quantization not in QUANTIZATION_METHODS):
            raise ValueError(
                f"Unknown quantization method: {self.quantization}. Must "
                f"be one of {QUANTIZATION_METHODS}.")

    # ---- derived quantities (reference config.py:250-340) ----

    def get_hidden_size(self) -> int:
        return self.hf_text_config.hidden_size

    def get_head_size(self) -> int:
        cfg = self.hf_text_config
        if hasattr(cfg, "head_dim") and cfg.head_dim is not None:
            return cfg.head_dim
        return cfg.hidden_size // cfg.num_attention_heads

    def get_total_num_kv_heads(self) -> int:
        cfg = self.hf_text_config
        # MQA models (GPT-BigCode, Falcon-7B) advertise multi_query;
        # new-decoder-arch Falcon instead carries num_kv_heads
        # (reference: config.py get_total_num_kv_heads falcon handling).
        new_arch = bool(getattr(cfg, "new_decoder_architecture", False))
        if not new_arch and bool(getattr(cfg, "multi_query", False)):
            return 1
        for attr in ("num_key_value_heads", "n_head_kv", "num_kv_heads"):
            if getattr(cfg, attr, None) is not None:
                return getattr(cfg, attr)
        return cfg.num_attention_heads

    def get_num_kv_heads(self, parallel_config: "ParallelConfig") -> int:
        """KV heads per model-parallel shard (min 1; replicate if fewer)."""
        total = self.get_total_num_kv_heads()
        return max(1, total // parallel_config.tensor_parallel_size)

    def get_num_attention_heads(self,
                                parallel_config: "ParallelConfig") -> int:
        return (self.hf_text_config.num_attention_heads //
                parallel_config.tensor_parallel_size)

    def get_num_layers(self, parallel_config: "ParallelConfig") -> int:
        total = self.hf_text_config.num_hidden_layers
        return total // parallel_config.pipeline_parallel_size

    def get_vocab_size(self) -> int:
        return self.hf_text_config.vocab_size

    def get_sliding_window(self) -> Optional[int]:
        if self._sliding_window_override is not None:
            return self._sliding_window_override
        if getattr(self.hf_text_config, "use_sliding_window", True) is False:
            return None
        return getattr(self.hf_text_config, "sliding_window", None)


class CacheConfig:
    """KV-cache layout + budget.

    Reference: CacheConfig (vllm/config.py:340). TPU redesign: instead of a
    profiling forward pass (Worker.determine_num_available_blocks,
    worker/worker.py:136), the number of blocks is derived deterministically
    from ``hbm_utilization`` × device HBM minus the (statically known)
    weight + activation footprint — XLA memory use is predictable.
    """

    def __init__(
        self,
        block_size: int = 16,
        hbm_utilization: float = 0.9,
        swap_space_gb: float = 4.0,
        cache_dtype: str = "auto",
        num_tpu_blocks_override: Optional[int] = None,
        sliding_window: Optional[int] = None,
        enable_prefix_caching: bool = False,
        v_offload_window: Optional[int] = None,
        kv_offload: bool = False,
        v_offload_exact: bool = False,
        v_stage_blocks: int = 8,
    ) -> None:
        self.block_size = block_size
        self.hbm_utilization = hbm_utilization
        self.swap_space_bytes = int(swap_space_gb * _GB)
        self.cache_dtype = cache_dtype
        self.num_tpu_blocks_override = num_tpu_blocks_override
        self.sliding_window = sliding_window
        self.enable_prefix_caching = enable_prefix_caching
        # V-offload (capability of the fork's CACHE_ENGINE=offload_v,
        # worker/cache_engine/map_cache_engine.py): V HBM bounded to a
        # per-sequence ring of sink + window blocks; K stays full so
        # the sparse top-k scores exactly within the window. Tokens.
        self.v_offload_window = v_offload_window
        # KV-offload (fork CACHE_ENGINE=offload_kv, KVMapCacheEngine
        # map_cache_engine.py:369): K joins V in the ring pool, so
        # NEITHER cache scales with context — the TPU analogue of the
        # fork's UVM-managed K/V. Selection is already window-restricted
        # under V-offload, so in-ring K preserves the served attention
        # exactly; logical KV blocks become free bookkeeping entries.
        self.kv_offload = kv_offload
        # Exact paging over offloaded V (closes the fork UVM gap,
        # map_cache_engine.py:268-379): completed V blocks write
        # through to a host pool; the sparse selection reports which
        # out-of-window blocks it WANTS and the runner stages them
        # into per-sequence device slots (one-step prefetch,
        # double-buffered), so attention over selected history is
        # exact instead of window-truncated. ``v_stage_blocks`` =
        # staged slots per sequence.
        self.v_offload_exact = v_offload_exact
        self.v_stage_blocks = v_stage_blocks
        self._verify_args()

        # Set after cache-size computation (worker/cache_engine.py).
        self.num_tpu_blocks: Optional[int] = None
        self.num_cpu_blocks: Optional[int] = None

    # Back-compat aliases used by scheduler code written against the
    # reference's naming.
    @property
    def num_gpu_blocks(self) -> Optional[int]:
        return self.num_tpu_blocks

    @num_gpu_blocks.setter
    def num_gpu_blocks(self, v: Optional[int]) -> None:
        self.num_tpu_blocks = v

    def _verify_args(self) -> None:
        if self.kv_offload and not self.v_offload_window:
            raise ValueError(
                "kv_offload extends the V-offload ring to K; set "
                "v_offload_window as well")
        if self.v_offload_exact and not self.v_offload_window:
            raise ValueError(
                "v_offload_exact pages offloaded V blocks back in; it "
                "requires v_offload_window")
        if self.v_offload_exact and self.kv_offload:
            raise ValueError(
                "v_offload_exact needs the full K cache for "
                "unrestricted top-k scoring; it is incompatible with "
                "kv_offload (ringed K)")
        if self.hbm_utilization > 1.0 or self.hbm_utilization <= 0:
            raise ValueError(
                "hbm_utilization must be in (0, 1]. Got "
                f"{self.hbm_utilization}.")
        if self.block_size < 1:
            raise ValueError(f"block_size must be >= 1: {self.block_size}")
        if self.cache_dtype not in ("auto", "fp8", "fp8_e4m3", "fp8_e5m2",
                                    "int8", "bfloat16", "float32"):
            raise ValueError(f"Unknown cache dtype: {self.cache_dtype}")
        if self.cache_dtype.startswith(("fp8", "int8")) and \
                self.block_size < 32:
            # 1-byte tiles are (32, 128): per-block DMA slices must
            # cover at least one sublane tile.
            raise ValueError(
                "fp8/int8 KV cache requires block_size >= 32 "
                f"(got {self.block_size})")

    @property
    def is_fp8_kv(self) -> bool:
        return self.cache_dtype.startswith("fp8")


@dataclass
class ParallelConfig:
    """Device-mesh description (reference: ParallelConfig config.py:545).

    TPU redesign: parallelism is expressed as a `jax.sharding.Mesh` with
    axes ``("data", "model")`` — XLA inserts ICI/DCN collectives from
    sharding annotations; there are no NCCL process groups, Ray actors, or
    driver→worker broadcast loops (SURVEY.md §5.8).
    """
    pipeline_parallel_size: int = 1
    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    # SPMD-over-mesh is the only executor; kept for arg parity.
    distributed_executor_backend: Optional[str] = None
    max_parallel_loading_workers: Optional[int] = None
    ray_workers_use_nsight: bool = False
    placement_group: Optional[Any] = None

    def __post_init__(self) -> None:
        self.world_size = (self.pipeline_parallel_size *
                           self.tensor_parallel_size *
                           self.data_parallel_size)
        if self.pipeline_parallel_size > 1:
            # Matches reference behavior at v0.4.3 (config.py:605-608);
            # mesh-axis plumbing for PP exists in parallel/mesh.py but the
            # engine schedule is not pipelined yet.
            raise NotImplementedError(
                "Pipeline parallelism is not supported yet.")


@dataclass
class SchedulerConfig:
    """Continuous-batching limits (reference: SchedulerConfig config.py:630).

    TPU note: ``max_num_batched_tokens`` also bounds the padded token bucket
    shipped to the jitted step, so it directly controls compile-cache size.
    """
    max_num_batched_tokens: Optional[int] = None
    max_num_seqs: int = 256
    max_model_len: int = 2048
    use_v2_block_manager: bool = False
    num_lookahead_slots: int = 0
    # Decode steps executed on-device per host round-trip (multi-step
    # decode; lookahead slots = num_scheduler_steps - 1).
    num_scheduler_steps: int = 1
    delay_factor: float = 0.0
    enable_chunked_prefill: bool = False
    embedding_mode: bool = False
    preemption_mode: Optional[str] = None  # "recompute" | "swap" | None
    # "optimistic" admits prompts whenever their prefill fits (reference
    # behavior; decode growth may preempt later). "reserve" admits only
    # if the KV pool can hold every admitted request at its FULL length
    # (prompt + max_tokens): no preemption thrash, at the cost of lower
    # occupancy when requests finish early. HBM is fixed per chip, so
    # heavily oversubscribed serving benefits from "reserve".
    admission_control: str = "optimistic"

    def __post_init__(self) -> None:
        if self.num_scheduler_steps > 1:
            self.num_lookahead_slots = max(self.num_lookahead_slots,
                                           self.num_scheduler_steps - 1)
        if self.max_num_batched_tokens is None:
            if self.enable_chunked_prefill:
                self.max_num_batched_tokens = 512
            else:
                self.max_num_batched_tokens = max(self.max_model_len, 2048)
        self._verify_args()

    def _verify_args(self) -> None:
        if (self.max_num_batched_tokens < self.max_model_len
                and not self.enable_chunked_prefill):
            raise ValueError(
                f"max_num_batched_tokens ({self.max_num_batched_tokens}) "
                f"is smaller than max_model_len ({self.max_model_len}). "
                "This effectively limits prompt length; enable chunked "
                "prefill or raise max_num_batched_tokens.")
        if self.max_num_batched_tokens < self.max_num_seqs:
            raise ValueError(
                "max_num_batched_tokens must be >= max_num_seqs.")
        if self.admission_control not in ("optimistic", "reserve"):
            raise ValueError(
                f"admission_control must be 'optimistic' or 'reserve', "
                f"got {self.admission_control!r}")


@dataclass
class DeviceConfig:
    device_type: str = "auto"  # "tpu" | "cpu" | "auto"

    def __post_init__(self) -> None:
        if self.device_type == "auto":
            import jax
            platform = jax.default_backend()
            self.device_type = "tpu" if platform not in ("cpu",) else "cpu"


@dataclass
class LoadConfig:
    """Weight-loading options (reference: LoadConfig config.py:496)."""
    load_format: Union[str, LoadFormat] = LoadFormat.AUTO
    download_dir: Optional[str] = None
    model_loader_extra_config: Optional[dict] = None

    def __post_init__(self) -> None:
        if isinstance(self.load_format, str):
            self.load_format = LoadFormat(self.load_format.lower())


@dataclass
class LoRAConfig:
    """Multi-LoRA limits (reference: LoRAConfig config.py:1012)."""
    max_lora_rank: int = 16
    max_loras: int = 1
    max_cpu_loras: Optional[int] = None
    lora_dtype: str = "auto"
    lora_extra_vocab_size: int = 256
    fully_sharded_loras: bool = False
    long_lora_scaling_factors: Optional[tuple] = None

    def __post_init__(self) -> None:
        if self.max_lora_rank not in (8, 16, 32, 64, 128, 256):
            raise ValueError(f"max_lora_rank ({self.max_lora_rank}) must be "
                             "one of (8, 16, 32, 64, 128, 256).")
        if self.max_loras < 1:
            raise ValueError("max_loras must be >= 1.")
        if self.max_cpu_loras is None:
            self.max_cpu_loras = self.max_loras

    def verify_with_model_config(self, model_config: ModelConfig) -> None:
        if self.lora_dtype in (None, "auto"):
            self.lora_dtype = model_config.dtype

    def verify_with_scheduler_config(self, sched: SchedulerConfig) -> None:
        pass


@dataclass
class SpeculativeConfig:
    """Draft/target speculative decoding (reference: SpeculativeConfig
    config.py:740). Built by ``maybe_create_spec_config``."""
    draft_model_config: Optional[ModelConfig] = None
    num_speculative_tokens: int = 0
    ngram_prompt_lookup_max: int = 0
    ngram_prompt_lookup_min: int = 0
    speculative_disable_by_batch_size: Optional[int] = None

    @property
    def method(self) -> str:
        if self.ngram_prompt_lookup_max > 0:
            return "ngram"
        return "draft_model"

    @staticmethod
    def maybe_create_spec_config(
        target_model_config: ModelConfig,
        speculative_model: Optional[str],
        num_speculative_tokens: Optional[int],
        ngram_prompt_lookup_max: Optional[int] = None,
        ngram_prompt_lookup_min: Optional[int] = None,
        speculative_disable_by_batch_size: Optional[int] = None,
    ) -> Optional["SpeculativeConfig"]:
        if speculative_model is None and not ngram_prompt_lookup_max:
            return None
        if num_speculative_tokens is None or num_speculative_tokens < 1:
            raise ValueError("num_speculative_tokens must be >= 1 when "
                             "speculative decoding is enabled.")
        draft_cfg = None
        if speculative_model is not None and speculative_model != "[ngram]":
            draft_cfg = ModelConfig(
                model=speculative_model,
                tokenizer=target_model_config.tokenizer,
                dtype=target_model_config.dtype,
                max_model_len=target_model_config.max_model_len,
                trust_remote_code=target_model_config.trust_remote_code,
            )
        return SpeculativeConfig(
            draft_model_config=draft_cfg,
            num_speculative_tokens=num_speculative_tokens,
            ngram_prompt_lookup_max=ngram_prompt_lookup_max or 0,
            ngram_prompt_lookup_min=ngram_prompt_lookup_min or 0,
            speculative_disable_by_batch_size=(
                speculative_disable_by_batch_size),
        )


@dataclass
class DecodingConfig:
    """Guided-decoding defaults (reference: DecodingConfig config.py:1285)."""
    guided_decoding_backend: str = "outlines"

    def __post_init__(self) -> None:
        if self.guided_decoding_backend not in ("outlines",
                                                "lm-format-enforcer"):
            raise ValueError(
                f"Invalid guided_decoding_backend "
                f"'{self.guided_decoding_backend}'")


@dataclass
class VisionLanguageConfig:
    """Multimodal input plumbing (reference: VisionLanguageConfig
    config.py:1065)."""
    image_token_id: Optional[int] = None
    image_input_shape: Optional[tuple] = None
    image_feature_size: Optional[int] = None


@dataclass
class EngineConfig:
    """Bundle handed to every layer (reference: EngineConfig config.py:1300)."""
    model_config: ModelConfig
    cache_config: CacheConfig
    parallel_config: ParallelConfig
    scheduler_config: SchedulerConfig
    device_config: DeviceConfig
    load_config: LoadConfig
    lora_config: Optional[LoRAConfig] = None
    speculative_config: Optional[SpeculativeConfig] = None
    decoding_config: Optional[DecodingConfig] = None
    vision_language_config: Optional[VisionLanguageConfig] = None

    def __post_init__(self) -> None:
        if self.decoding_config is None:
            self.decoding_config = DecodingConfig()
        if self.lora_config is not None:
            self.lora_config.verify_with_model_config(self.model_config)
            self.lora_config.verify_with_scheduler_config(
                self.scheduler_config)

    def to_dict(self) -> dict:
        return {f.name: getattr(self, f.name) for f in fields(self)}
