"""compressed-tensors (sparseml) W8A8 static-tensor quantization
(reference: vllm/model_executor/layers/quantization/compressed_tensors/
— CompressedTensorsW8A8StaticTensor backed by the cutlass int8 GEMM,
csrc/quantization/cutlass_w8a8/).

Checkpoint tensors per linear: int8 ``weight`` plus ``weight_scale``
(per-tensor or per-out-channel), ``input_scale``/``input_zero_point``
(static per-tensor activation scale), ``weight_zero_point`` (always 0,
symmetric).

TPU execution: activations are quantized on device with the static
scale and the int8×int8 matmul runs on the MXU via
``preferred_element_type=int32`` (the TPU form of the cutlass epilogue:
one multiply by ``input_scale * weight_scale`` on the int32
accumulator). Per-out-channel weight scales ride the "oscales" key so
column-parallel sharding splits them with the output axis.
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


class CompressedTensorsConfig(QuantizationConfig):

    def __init__(self, target_scheme: str = "w8a8_static") -> None:
        self.target_scheme = target_scheme

    @classmethod
    def get_name(cls) -> str:
        return "sparseml"

    @classmethod
    def from_config(cls, config: Dict[str, Any]
                    ) -> "CompressedTensorsConfig":
        # 0.4.3 supports only the static-per-tensor int8 scheme; accept
        # the config and validate tensors at load.
        return cls()

    def get_linear_method(self) -> "W8A8LinearMethod":
        return W8A8LinearMethod()

    # -- load-time conversion -------------------------------------------
    def wants(self, tensors: Dict[str, np.ndarray]) -> bool:
        w = tensors.get("weight")
        return (w is not None and w.ndim == 2
                and "input_scale" in tensors)

    def convert_layer_params(self, tensors: Dict[str, np.ndarray],
                             np_dtype,
                             k_shards: int = 1) -> Dict[str, np.ndarray]:
        w = tensors["weight"]  # [K, N] int8 (transposed at load)
        if w.dtype != np.int8:
            raise ValueError(
                "compressed-tensors w8a8 expects int8 weights, got "
                f"{w.dtype}")
        zp = tensors.get("weight_zero_point")
        if zp is not None and np.any(np.asarray(zp) != 0):
            raise ValueError("asymmetric int8 weights unsupported "
                             "(reference is symmetric-only too)")
        ws = np.asarray(tensors["weight_scale"], np.float32).reshape(-1)
        out = {
            "weight": w,
            "input_scale": np.float32(
                np.asarray(tensors["input_scale"]).reshape(-1)[0]),
        }
        if ws.size == 1:
            out["weight_scale"] = np.float32(ws[0])
        else:  # per-out-channel
            out["oscales"] = ws
        return out


class W8A8LinearMethod(LinearMethod):

    name = "w8a8"

    def partition_specs(self, mode: str) -> Dict[str, P]:
        if mode == "column":
            return {"weight": P(None, "model"), "weight_scale": P(),
                    "oscales": P("model"), "input_scale": P(),
                    "bias": P("model")}
        if mode == "row":
            return {"weight": P("model", None), "weight_scale": P(),
                    "oscales": P(), "input_scale": P(), "bias": P()}
        return {k: P() for k in ("weight", "weight_scale", "oscales",
                                 "input_scale", "bias")}

    def apply(self, params: Dict[str, jax.Array],
              x: jax.Array) -> jax.Array:
        inv = 1.0 / params["input_scale"]
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * inv),
                      -128, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, params["weight"],
            dimension_numbers=(((1, ), (0, )), ((), ())),
            preferred_element_type=jnp.int32)
        scale = params.get("oscales", params.get("weight_scale", 1.0))
        out = acc.astype(jnp.float32) * (params["input_scale"] * scale)
        out = out.astype(x.dtype)
        if "bias" in params:
            out = out + params["bias"].astype(out.dtype)
        return out
