"""Model construction + weight loading facade.

Reference: ``vllm/model_executor/model_loader/loader.py`` —
DefaultModelLoader :116 (HF safetensors/bin), DummyModelLoader :261
(random init). Returns (model, host_params); placing params onto the
device mesh with their PartitionSpecs is the worker's job
(worker/worker.py), mirroring how the reference loads weights on CPU then
moves them per-rank.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

from vllm_legacy_tpu.config import LoadFormat, ModelConfig, ParallelConfig
from vllm_legacy_tpu.logger import init_logger
from vllm_legacy_tpu.model_loader.weight_utils import (iterate_weights,
                                                       resolve_weight_files)
from vllm_legacy_tpu.models.registry import ModelRegistry
from vllm_legacy_tpu.utils import MonotonicTimer

logger = init_logger(__name__)


def resolve_quant_config(model_config: ModelConfig):
    """Build the QuantizationConfig from --quantization and/or the HF
    checkpoint's quantization_config (reference: config.py:162-220
    sniffing + weight_utils.get_quant_config)."""
    import os

    from vllm_legacy_tpu.layers.quantization import (
        get_quantization_config)
    hf_quant = getattr(model_config.hf_config, "quantization_config",
                       None)
    if hf_quant is None and os.path.isdir(model_config.model):
        from vllm_legacy_tpu.model_loader.weight_utils import (
            get_quant_config_from_checkpoint)
        hf_quant = get_quant_config_from_checkpoint(model_config.model)
    name = model_config.quantization
    if name is None and hf_quant is not None:
        name = str(hf_quant.get("quant_method", "")).lower()
    if not name:
        return None
    cfg_cls = get_quantization_config(name)
    if hf_quant is not None:
        return cfg_cls.from_config(dict(hf_quant))
    raise ValueError(
        f"--quantization={name} given but the checkpoint has no "
        "quantization_config to read bits/group_size from.")


def initialize_model(model_config: ModelConfig,
                     parallel_config: ParallelConfig):
    archs = getattr(model_config.hf_config, "architectures", [])
    model_cls, arch = ModelRegistry.resolve_model_cls(archs)
    dtype = jnp.bfloat16 if model_config.dtype == "bfloat16" \
        else jnp.float32
    quant_config = resolve_quant_config(model_config)
    model = model_cls(model_config.hf_config,
                      tp_size=parallel_config.tensor_parallel_size,
                      dtype=dtype,
                      quant_config=quant_config)
    # sparse long-context decode config (models read it via getattr so
    # architectures without the capability simply ignore it)
    model.sparse_config = model_config.sparse_attention
    model.self_extend = getattr(model_config, "self_extend", None)
    return model


def get_model(model_config: ModelConfig, parallel_config: ParallelConfig,
              load_format: LoadFormat = LoadFormat.AUTO
              ) -> Tuple[Any, Dict[str, Any]]:
    """Build the model object and load host-side params."""
    model = initialize_model(model_config, parallel_config)
    timer = MonotonicTimer()
    from vllm_legacy_tpu.model_loader import sharded_state
    if load_format == LoadFormat.DUMMY:
        params = model.init_dummy_params(seed=model_config.seed or 0)
    elif load_format == LoadFormat.TENSORIZER:
        from vllm_legacy_tpu.model_loader.tensorizer import (
            load_tensorized_params)
        params = model.load_weights(
            load_tensorized_params(model_config.model))
    elif (load_format == LoadFormat.SHARDED_STATE
          or (load_format == LoadFormat.AUTO
              and sharded_state.is_sharded_state_checkpoint(
                  model_config.model))):
        params = sharded_state.load_params(model_config.model)
    else:
        files, fmt = resolve_weight_files(model_config.model,
                                          load_format.value)
        params = model.load_weights(iterate_weights(files, fmt))
    if model_config.quantization_param_path:
        if not hasattr(model, "load_kv_cache_scales"):
            raise ValueError(
                f"{type(model).__name__} does not support FP8 KV cache "
                "scales (--quantization-param-path)")
        model.load_kv_cache_scales(params,
                                   model_config.quantization_param_path)
    logger.info("Loaded model weights in %.2fs", timer.elapsed())
    return model, params
