"""Helpers to build engines without network/checkpoint access.

Mirrors the reference's DummyModelLoader-driven bring-up
(vllm/model_executor/model_loader/loader.py:261): real architectures,
random weights — used by benchmarks, __graft_entry__ and tests.
"""
from __future__ import annotations

from typing import Optional

from vllm_legacy_tpu.config import (CacheConfig, DecodingConfig,
                                    DeviceConfig, EngineConfig, LoadConfig,
                                    LoadFormat, ModelConfig, ParallelConfig,
                                    SchedulerConfig)


def tiny_llama_hf_config(
    *,
    vocab_size: int = 2048,
    hidden_size: int = 256,
    intermediate_size: int = 688,
    num_hidden_layers: int = 4,
    num_attention_heads: int = 8,
    num_key_value_heads: int = 4,
    max_position_embeddings: int = 2048,
):
    from transformers import LlamaConfig
    return LlamaConfig(
        architectures=["LlamaForCausalLM"],
        vocab_size=vocab_size,
        hidden_size=hidden_size,
        intermediate_size=intermediate_size,
        num_hidden_layers=num_hidden_layers,
        num_attention_heads=num_attention_heads,
        num_key_value_heads=num_key_value_heads,
        max_position_embeddings=max_position_embeddings,
    )


def tinyllama_1_1b_hf_config():
    """TinyLlama-1.1B architecture (BASELINE.json config[0])."""
    return tiny_llama_hf_config(
        vocab_size=32000,
        hidden_size=2048,
        intermediate_size=5632,
        num_hidden_layers=22,
        num_attention_heads=32,
        num_key_value_heads=4,
        max_position_embeddings=2048,
    )


def llama2_7b_hf_config():
    """Llama-2-7B architecture (BASELINE.json configs[1])."""
    return tiny_llama_hf_config(
        vocab_size=32000,
        hidden_size=4096,
        intermediate_size=11008,
        num_hidden_layers=32,
        num_attention_heads=32,
        num_key_value_heads=32,
        max_position_embeddings=4096,
    )


def llama2_7b_gptq_hf_config(group_size: int = 128):
    """Llama-2-7B with a GPTQ INT4 quantization_config attached — the
    BASELINE.json north-star config[1]. Dummy loading emits the packed
    quant layout directly (base_config.dummy_packed_params)."""
    cfg = llama2_7b_hf_config()
    cfg.quantization_config = {
        "quant_method": "gptq",
        "bits": 4,
        "group_size": group_size,
        "desc_act": False,
    }
    return cfg


def llama2_13b_awq_hf_config(group_size: int = 128):
    """Llama-2-13B with an AWQ INT4 quantization_config (BASELINE.json
    config[2]; pair with kv_cache_dtype='fp8' + chunked prefill +
    prefix caching)."""
    cfg = tiny_llama_hf_config(
        vocab_size=32000,
        hidden_size=5120,
        intermediate_size=13824,
        num_hidden_layers=40,
        num_attention_heads=40,
        num_key_value_heads=40,
        max_position_embeddings=4096,
    )
    cfg.quantization_config = {
        "quant_method": "awq",
        "bits": 4,
        "group_size": group_size,
        "zero_point": True,
    }
    return cfg


def make_dummy_engine_config(
    hf_config=None,
    *,
    dtype: str = "bfloat16",
    max_model_len: Optional[int] = 1024,
    tensor_parallel_size: int = 1,
    data_parallel_size: int = 1,
    swap_space_gb: float = 1.0,
    max_num_seqs: int = 64,
    block_size: int = 16,
    num_tpu_blocks_override: Optional[int] = None,
    hbm_utilization: float = 0.85,
    enable_chunked_prefill: bool = False,
    enable_prefix_caching: bool = False,
    kv_cache_dtype: str = "auto",
    num_scheduler_steps: int = 1,
    admission_control: str = "optimistic",
    max_num_batched_tokens: Optional[int] = None,
    sparse_attention=None,
) -> EngineConfig:
    if hf_config is None:
        hf_config = tiny_llama_hf_config()
    model_config = ModelConfig(
        model="dummy",
        dtype=dtype,
        max_model_len=max_model_len,
        skip_tokenizer_init=True,
        hf_config=hf_config,
        sparse_attention=sparse_attention,
    )
    cache_config = CacheConfig(
        block_size=block_size,
        hbm_utilization=hbm_utilization,
        swap_space_gb=swap_space_gb,
        cache_dtype=kv_cache_dtype,
        num_tpu_blocks_override=num_tpu_blocks_override,
        enable_prefix_caching=enable_prefix_caching,
    )
    parallel_config = ParallelConfig(
        tensor_parallel_size=tensor_parallel_size,
        data_parallel_size=data_parallel_size)
    scheduler_config = SchedulerConfig(
        max_num_batched_tokens=max_num_batched_tokens
        or max(max_model_len or 2048, 2048),
        max_num_seqs=max_num_seqs,
        max_model_len=model_config.max_model_len,
        enable_chunked_prefill=enable_chunked_prefill,
        num_scheduler_steps=num_scheduler_steps,
        admission_control=admission_control,
    )
    return EngineConfig(
        model_config=model_config,
        cache_config=cache_config,
        parallel_config=parallel_config,
        scheduler_config=scheduler_config,
        device_config=DeviceConfig(),
        load_config=LoadConfig(load_format=LoadFormat.DUMMY),
        lora_config=None,
        speculative_config=None,
        decoding_config=DecodingConfig(),
    )
