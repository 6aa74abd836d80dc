"""AWQ checkpoint support (reference: vllm/model_executor/layers/
quantization/awq.py + csrc/quantization/awq/gemm_kernels.cu — repacked to
the common TPU layout; the >=256-token dequant-vs-fused heuristic is
unnecessary because the Pallas kernel serves both regimes).

Checkpoint tensors per linear (in-major, as serialized by AutoAWQ):
    qweight  int32 [K, N/8]    8 nibbles along N, interleaved order
    qzeros   int32 [K/g, N/8]  same packing
    scales   f16   [K/g, N]

AWQ packs nibble j of each int32 as logical column ``AWQ_ORDER[j]``;
dequant is ``w = s * (q - z)`` (no +1).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from vllm_legacy_tpu.layers.quantization.base_config import (
    QuantizationConfig)
from vllm_legacy_tpu.layers.quantization.common import (
    PackedQuantParams, QuantLinearMethod, pack_rows_to_bytes)

# Interleave used by AWQ's CUDA kernels: nibble j holds logical column
# AWQ_ORDER[j] of the group of 8.
AWQ_ORDER = (0, 2, 4, 6, 1, 3, 5, 7)


def _unpack_awq_columns(packed: np.ndarray) -> np.ndarray:
    """int32 [..., N/8] -> uint8 [..., N] undoing the AWQ interleave."""
    p = packed.astype(np.uint32)
    nibbles = np.stack([((p >> (4 * j)) & 0xF).astype(np.uint8)
                        for j in range(8)], axis=-1)  # [..., N/8, 8]
    logical = np.empty_like(nibbles)
    for j, col in enumerate(AWQ_ORDER):
        logical[..., col] = nibbles[..., j]
    return logical.reshape(*packed.shape[:-1], packed.shape[-1] * 8)


class AWQConfig(QuantizationConfig):

    def __init__(self, weight_bits: int, group_size: int,
                 zero_point: bool) -> None:
        if weight_bits != 4:
            raise ValueError(f"AWQ supports 4-bit, got {weight_bits}")
        self.weight_bits = weight_bits
        self.group_size = group_size
        self.zero_point = zero_point

    @classmethod
    def get_name(cls) -> str:
        return "awq"

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "AWQConfig":
        return cls(
            weight_bits=cls.get_from_keys(config, ["w_bit", "bits"]),
            group_size=cls.get_from_keys(config,
                                         ["q_group_size", "group_size"]),
            zero_point=bool(config.get("zero_point", True)),
        )

    def get_linear_method(self) -> QuantLinearMethod:
        return QuantLinearMethod(self.weight_bits, self.group_size)

    def convert_layer(self,
                      tensors: Dict[str, np.ndarray]) -> PackedQuantParams:
        q = _unpack_awq_columns(tensors["qweight"])  # [K, N]
        scales = tensors["scales"].astype(np.float32)  # [K/g, N]
        if self.zero_point:
            zeros = _unpack_awq_columns(tensors["qzeros"])  # [K/g, N]
            szeros = scales * zeros.astype(np.float32)
        else:
            szeros = scales * 8.0  # symmetric: midpoint zero
        group_size = self.group_size if self.group_size != -1 \
            else q.shape[0]
        return PackedQuantParams(pack_rows_to_bytes(q), scales, szeros,
                                 4, group_size)
