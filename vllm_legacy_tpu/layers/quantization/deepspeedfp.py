"""DeepSpeedFP fp6/fp8 weight quantization (reference: vllm/
model_executor/layers/quantization/deepspeedfp.py — fp16 checkpoints
quantized at LOAD TIME into groupwise minifloat codes, dequantized per
forward).

TPU layout: one uint8 code per element plus a 2**bits-entry decode LUT
(e4m3 for 8-bit, e3m2 for 6-bit) and per-group scales along the
contraction axis. The device decode is ``lut[fpq] * scale`` — a VMEM
table gather XLA fuses into the consuming bf16 MXU matmul; no CUDA-style
bit-unpacking kernel is needed because the LUT *is* the decode.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_legacy_tpu.layers.linear import LinearMethod
from vllm_legacy_tpu.layers.quantization.base_config import (
    QuantizationConfig)


def minifloat_lut(exp_bits: int, man_bits: int) -> np.ndarray:
    """Decode table for a signed 1+exp+man minifloat (no inf/nan
    specials; IEEE-like subnormals), indexed by the raw code byte."""
    n = 1 << (1 + exp_bits + man_bits)
    bias = (1 << (exp_bits - 1)) - 1
    out = np.zeros(n, np.float32)
    for code in range(n):
        sign = -1.0 if code >> (exp_bits + man_bits) else 1.0
        exp = (code >> man_bits) & ((1 << exp_bits) - 1)
        man = code & ((1 << man_bits) - 1)
        if exp == 0:  # subnormal
            val = (man / (1 << man_bits)) * 2.0**(1 - bias)
        else:
            val = (1 + man / (1 << man_bits)) * 2.0**(exp - bias)
        out[code] = sign * val
    return out


def encode_minifloat(w: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """Nearest-entry encode (load-time only; O(K*N*2^bits) vectorized
    via searchsorted on the sorted LUT)."""
    order = np.argsort(lut)
    sorted_lut = lut[order]
    pos = np.searchsorted(sorted_lut, w)
    pos = np.clip(pos, 1, len(lut) - 1)
    left = sorted_lut[pos - 1]
    right = sorted_lut[pos]
    pick = np.where(np.abs(w - left) <= np.abs(right - w), pos - 1, pos)
    return order[pick].astype(np.uint8)


class DeepSpeedFPConfig(QuantizationConfig):

    def __init__(self, weight_bits: int = 8,
                 group_size: int = 512) -> None:
        if weight_bits not in (6, 8):
            raise ValueError(
                f"deepspeedfp supports 6/8 bits, got {weight_bits}")
        self.weight_bits = weight_bits
        self.group_size = group_size
        # e4m3 for 8-bit (matches DeepSpeed FP_Quantize), e3m2 for 6-bit
        self.lut = (minifloat_lut(4, 3)
                    if weight_bits == 8 else minifloat_lut(3, 2))

    @classmethod
    def get_name(cls) -> str:
        return "deepspeedfp"

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "DeepSpeedFPConfig":
        return cls(weight_bits=cls.get_from_keys(config, ["bits"]),
                   group_size=cls.get_from_keys(config, ["group_size"]))

    def get_linear_method(self) -> "DeepSpeedFPLinearMethod":
        return DeepSpeedFPLinearMethod()

    # -- load-time quantization -----------------------------------------
    def wants(self, tensors: Dict[str, np.ndarray]) -> bool:
        w = tensors.get("weight")
        return w is not None and w.ndim == 2 and "fpq" not in tensors

    def convert_layer_params(self, tensors: Dict[str, np.ndarray],
                             np_dtype,
                             k_shards: int = 1) -> Dict[str, np.ndarray]:
        w = tensors["weight"].astype(np.float32)  # [K, N]
        k, n = w.shape
        g = min(self.group_size, k)
        while k % g:  # groups tile the contraction axis
            g //= 2
        lut_max = float(np.abs(self.lut).max())
        wg = w.reshape(k // g, g, n)
        scales = np.maximum(np.abs(wg).max(axis=1) / lut_max, 1e-12)
        codes = encode_minifloat(wg / scales[:, None, :],
                                 self.lut).reshape(k, n)
        return {
            "fpq": codes,
            "fpscales": scales.astype(np.float32),  # [K/g, N]
            "fplut": self.lut,
        }


class DeepSpeedFPLinearMethod(LinearMethod):

    name = "deepspeedfp"

    def partition_specs(self, mode: str) -> Dict[str, P]:
        if mode == "column":
            return {"fpq": P(None, "model"), "fpscales": P(None, "model"),
                    "fplut": P(), "bias": P("model")}
        if mode == "row":
            return {"fpq": P("model", None), "fpscales": P("model", None),
                    "fplut": P(), "bias": P()}
        return {"fpq": P(), "fpscales": P(), "fplut": P(), "bias": P()}

    def apply(self, params: Dict[str, jax.Array],
              x: jax.Array) -> jax.Array:
        codes = params["fpq"]              # [K, N] uint8
        scales = params["fpscales"]        # [K/g, N]
        lut = params["fplut"]
        k, n = codes.shape
        g = k // scales.shape[0]
        w = jnp.take(lut, codes.astype(jnp.int32), axis=0)
        w = w.reshape(k // g, g, n) * scales[:, None, :]
        out = jnp.dot(x.astype(jnp.float32), w.reshape(k, n),
                      preferred_element_type=jnp.float32)
        out = out.astype(x.dtype)
        if "bias" in params:
            out = out + params["bias"].astype(out.dtype)
        return out
