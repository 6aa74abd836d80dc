"""Quantization registry (reference: vllm/model_executor/layers/
quantization/__init__.py :20-33).

All groupwise weight-only methods (GPTQ, AWQ, SqueezeLLM, marlin
variants) repack at load into ONE common TPU layout consumed by the
Pallas fused dequant-matmul (ops/pallas/quant_matmul.py) — the marlin/
exllama layout zoo is a CUDA artifact with no TPU analogue.
"""
from __future__ import annotations

from typing import Dict, Type

from vllm_legacy_tpu.layers.quantization.base_config import (
    QuantizationConfig)
from vllm_legacy_tpu.layers.quantization.aqlm import AQLMConfig
from vllm_legacy_tpu.layers.quantization.awq import AWQConfig
from vllm_legacy_tpu.layers.quantization.compressed_tensors import (
    CompressedTensorsConfig)
from vllm_legacy_tpu.layers.quantization.deepspeedfp import (
    DeepSpeedFPConfig)
from vllm_legacy_tpu.layers.quantization.fp8 import Fp8Config
from vllm_legacy_tpu.layers.quantization.gptq import GPTQConfig
from vllm_legacy_tpu.layers.quantization.marlin import (GPTQMarlin24Config,
                                                        MarlinConfig)
from vllm_legacy_tpu.layers.quantization.squeezellm import SqueezeLLMConfig

QUANTIZATION_METHODS: Dict[str, Type[QuantizationConfig]] = {
    "aqlm": AQLMConfig,
    "gptq": GPTQConfig,
    "awq": AWQConfig,
    "squeezellm": SqueezeLLMConfig,
    "fp8": Fp8Config,
    "deepspeedfp": DeepSpeedFPConfig,
    # sparseml / compressed-tensors int8 w8a8
    "sparseml": CompressedTensorsConfig,
    "compressed-tensors": CompressedTensorsConfig,
    # marlin-SERIALIZED checkpoints (B/s layout) decode at load;
    # "gptq_marlin" checkpoints are plain GPTQ tensors on disk (the
    # reference repacks them at load, gptq_marlin.py) so GPTQConfig
    # reads them directly.
    "marlin": MarlinConfig,
    "gptq_marlin": GPTQConfig,
    "gptq_marlin_24": GPTQMarlin24Config,
}


def get_quantization_config(name: str) -> Type[QuantizationConfig]:
    if name not in QUANTIZATION_METHODS:
        raise ValueError(f"Invalid quantization method: {name}. "
                         f"Supported: {list(QUANTIZATION_METHODS)}")
    return QUANTIZATION_METHODS[name]
