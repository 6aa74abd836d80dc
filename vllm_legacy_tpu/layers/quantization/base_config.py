"""Quantization config ABC (reference: vllm/model_executor/layers/
quantization/base_config.py :8,34)."""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Dict, List, Optional

from vllm_legacy_tpu.layers.linear import LinearMethod


class QuantizationConfig(ABC):

    @classmethod
    @abstractmethod
    def get_name(cls) -> str:
        ...

    @classmethod
    @abstractmethod
    def from_config(cls, config: Dict[str, Any]) -> "QuantizationConfig":
        ...

    @classmethod
    def get_from_keys(cls, config: Dict[str, Any],
                      keys: List[str]) -> Any:
        for key in keys:
            if key in config:
                return config[key]
        raise ValueError(f"Cannot find any of {keys} in the model's "
                         "quantization config.")

    @abstractmethod
    def get_linear_method(self) -> LinearMethod:
        """The LinearMethod applying this scheme (may be the Pallas
        fused dequant-matmul or a dequant-at-load passthrough)."""
        ...

    def get_scaled_act_names(self) -> List[str]:
        return []
