"""GPTQ checkpoint support (reference: vllm/model_executor/layers/
quantization/gptq.py :16,83 and the marlin repack family — on TPU all
of them converge to the common packed layout + one Pallas kernel).

Checkpoint tensors per linear (in-major, as serialized by AutoGPTQ):
    qweight  int32 [K/8, N]      8 nibbles along K per int32
    qzeros   int32 [K/g, N/8]    8 nibbles along N per int32
    scales   f16   [K/g, N]
    g_idx    int32 [K]           group index per in-row (act-order)

GPTQ v1 zeros are stored minus one; dequant is
``w = s * (q - (z + 1))`` (gptq_v2 drops the +1).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from vllm_legacy_tpu.layers.quantization.base_config import (
    QuantizationConfig)
from vllm_legacy_tpu.layers.quantization.common import (
    PackedQuantParams, QuantLinearMethod, pack_rows_to_bytes,
    unpack_int32_nibbles)


class GPTQConfig(QuantizationConfig):

    def __init__(self, weight_bits: int, group_size: int, desc_act: bool,
                 checkpoint_format: str = "gptq") -> None:
        if weight_bits not in (4, 8):
            raise ValueError(
                "TPU fused dequant-matmul supports 4/8-bit GPTQ, got "
                f"{weight_bits} bits")
        self.weight_bits = weight_bits
        self.group_size = group_size
        self.desc_act = desc_act
        self.checkpoint_format = checkpoint_format

    @classmethod
    def get_name(cls) -> str:
        return "gptq"

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "GPTQConfig":
        return cls(
            weight_bits=cls.get_from_keys(config, ["bits"]),
            group_size=cls.get_from_keys(config, ["group_size"]),
            desc_act=bool(config.get("desc_act", False)),
            checkpoint_format=config.get("checkpoint_format", "gptq"),
        )

    def get_linear_method(self) -> QuantLinearMethod:
        return QuantLinearMethod(self.weight_bits, self.group_size)

    # -- load-time repack ---------------------------------------------
    def convert_layer(self,
                      tensors: Dict[str, np.ndarray]) -> PackedQuantParams:
        bits = self.weight_bits
        qweight = tensors["qweight"]
        scales = tensors["scales"].astype(np.float32)
        qzeros = tensors["qzeros"]
        g_idx = tensors.get("g_idx")

        if bits == 4:
            q = unpack_int32_nibbles(qweight, axis=0)  # [K, N] 0..15
            zeros = unpack_int32_nibbles(qzeros, axis=1)  # [K/g, N]
        else:
            p = qweight.astype(np.uint32)
            q = np.stack([(p >> (8 * i)) & 0xFF for i in range(4)],
                         axis=1).reshape(qweight.shape[0] * 4,
                                         qweight.shape[1]).astype(np.uint8)
            pz = qzeros.astype(np.uint32)
            zeros = np.stack([(pz >> (8 * i)) & 0xFF for i in range(4)],
                             axis=2).reshape(qzeros.shape[0],
                                             qzeros.shape[1] * 4)
        k = q.shape[0]

        if self.checkpoint_format != "gptq_v2":
            zeros = zeros + 1  # v1 stores z - 1

        in_perm = None
        if g_idx is not None and self.desc_act:
            # act-order: sort in-rows so groups are contiguous; runtime
            # gathers x columns by the same permutation (replaces the
            # reference's exllama shuffle, gptq.py:209-217).
            in_perm = np.argsort(g_idx, kind="stable").astype(np.int32)
            q = q[in_perm]

        group_size = self.group_size if self.group_size != -1 else k

        if bits == 4:
            szeros = scales * zeros.astype(np.float32)
            packed = pack_rows_to_bytes(q)
        else:
            # 8-bit stored signed as q-128; fold the offset into szeros
            # so the kernel math stays w = s*q' - szeros'.
            szeros = scales * (zeros.astype(np.float32) - 128.0)
            packed = (q.astype(np.int16) - 128).astype(np.int8)
        return PackedQuantParams(packed, scales, szeros, bits, group_size,
                                 in_perm=in_perm)
