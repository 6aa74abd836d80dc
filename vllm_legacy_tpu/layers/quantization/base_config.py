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

    # -- load-time conversion protocol ----------------------------------
    # Model loaders call wants() on each per-projection tensor dict and
    # replace it with convert_layer_params() when it matches (replaces
    # the reference's per-method create_weights/process_weights_after_
    # loading pairs).

    def wants(self, tensors: Dict[str, Any]) -> bool:
        """Does this projection's checkpoint tensor dict need
        conversion? Default: groupwise packed checkpoints (GPTQ/AWQ
        qweight)."""
        return "qweight" in tensors

    def convert_layer_params(self, tensors: Dict[str, Any],
                             np_dtype) -> Dict[str, Any]:
        """Repack one projection's tensors into device-ready params.
        Default: the common TPU packed-groupwise layout."""
        return self.convert_layer(tensors).as_params()
