"""SqueezeLLM checkpoint support (reference: vllm/model_executor/layers/
quantization/squeezellm.py :14,64 — 4-bit per-channel lookup tables).

The non-uniform per-channel LUT cannot be expressed as scale/zero, so
round 1 dequantizes to dense bf16 at load (capability parity; HBM cost
equals an fp16 checkpoint). A Pallas LUT-gather kernel restoring the 4x
memory win is tracked for a later round.

Checkpoint tensors per linear:
    qweight       int32 [K/8, N]  8 nibbles along K
    lookup_table  f16   [N, 16]
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from vllm_legacy_tpu.layers.linear import LinearMethod
from vllm_legacy_tpu.layers.quantization.base_config import (
    QuantizationConfig)
from vllm_legacy_tpu.layers.quantization.common import unpack_int32_nibbles


class SqueezeLLMConfig(QuantizationConfig):

    def __init__(self, weight_bits: int) -> None:
        if weight_bits != 4:
            raise ValueError(
                f"SqueezeLLM supports 4-bit, got {weight_bits}")
        self.weight_bits = weight_bits

    @classmethod
    def get_name(cls) -> str:
        return "squeezellm"

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "SqueezeLLMConfig":
        return cls(weight_bits=cls.get_from_keys(config, ["wbits"]))

    def get_linear_method(self) -> LinearMethod:
        return LinearMethod()  # dense after load-time dequant

    def convert_layer_params(self, tensors: Dict[str, np.ndarray],
                             np_dtype,
                             k_shards: int = 1) -> Dict[str, np.ndarray]:
        return self.convert_layer(tensors, dtype=np_dtype)

    def convert_layer(self, tensors: Dict[str, np.ndarray],
                      dtype=None) -> Dict[str, np.ndarray]:
        import ml_dtypes
        q = unpack_int32_nibbles(tensors["qweight"], axis=0)  # [K, N]
        lut = tensors["lookup_table"].astype(np.float32)  # [N, 16]
        # w[k, n] = lut[n, q[k, n]]
        w = np.take_along_axis(lut.T[None, :, :],  # [1, 16, N]
                               q[:, None, :].astype(np.int64),
                               axis=1)[:, 0, :]
        return {"weight": w.astype(ml_dtypes.bfloat16
                                   if dtype is None else dtype)}
