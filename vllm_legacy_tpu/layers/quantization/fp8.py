"""FP8 (W8A8-style) support (reference: vllm/model_executor/layers/
quantization/fp8.py — Fp8Config :20, load-time quantization of fp16
checkpoints :179-230, Fp8KVCacheMethod kv_scale :259).

TPU v5e has no fp8 MXU: weights are stored e4m3 (+ per-tensor scale) to
halve HBM traffic and are upcast to bf16 inside the matmul — XLA fuses
the convert+scale into the dot. The FP8 KV-cache path (quantize on
write, dequantize in the attention kernel) lives in worker/cache_engine
and ops/pallas/paged_attention.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_legacy_tpu.layers.linear import LinearMethod
from vllm_legacy_tpu.layers.quantization.base_config import (
    QuantizationConfig)

E4M3_MAX = 448.0


class Fp8LinearMethod(LinearMethod):

    name = "fp8"

    def partition_specs(self, mode: str) -> Dict[str, P]:
        base = super().partition_specs(mode)
        base["weight_scale"] = P()
        return base

    def apply(self, params: Dict[str, jax.Array],
              x: jax.Array) -> jax.Array:
        w = params["weight"].astype(jnp.bfloat16)
        scale = params.get("weight_scale")
        out = jnp.dot(x, w, preferred_element_type=jnp.float32)
        if scale is not None:
            out = out * scale
        out = out.astype(x.dtype)
        if "bias" in params:
            out = out + params["bias"].astype(out.dtype)
        return out


class Fp8Config(QuantizationConfig):

    def __init__(self,
                 is_checkpoint_fp8_serialized: bool = False,
                 activation_scheme: str = "dynamic") -> None:
        self.is_checkpoint_fp8_serialized = is_checkpoint_fp8_serialized
        self.activation_scheme = activation_scheme

    @classmethod
    def get_name(cls) -> str:
        return "fp8"

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "Fp8Config":
        quant_method = cls.get_from_keys(config, ["quant_method"])
        return cls(is_checkpoint_fp8_serialized=("fp8" in quant_method),
                   activation_scheme=config.get("activation_scheme",
                                                "dynamic"))

    def get_linear_method(self) -> Fp8LinearMethod:
        return Fp8LinearMethod()

    # -- load-time conversion -------------------------------------------
    def wants(self, tensors: Dict[str, np.ndarray]) -> bool:
        w = tensors.get("weight")
        return w is not None and getattr(w, "ndim", 0) == 2

    def convert_layer_params(self, tensors: Dict[str, np.ndarray],
                             np_dtype,
                             k_shards: int = 1) -> Dict[str, np.ndarray]:
        import ml_dtypes
        w = tensors["weight"]
        if w.dtype == ml_dtypes.float8_e4m3fn:  # fp8-serialized ckpt
            scale = np.float32(
                np.asarray(tensors.get("weight_scale",
                                       1.0)).reshape(-1)[0])
            return {"weight": w, "weight_scale": scale}
        return self.quantize_weight(w)

    def quantize_weight(
            self, w: np.ndarray) -> Dict[str, np.ndarray]:
        """Per-tensor symmetric quantization of a bf16/f16 weight at
        load (reference: fp8.py process_weights_after_loading)."""
        import ml_dtypes
        wf = w.astype(np.float32)
        scale = max(np.abs(wf).max() / E4M3_MAX, 1e-12)
        q = np.clip(wf / scale, -E4M3_MAX, E4M3_MAX)
        return {
            "weight": q.astype(ml_dtypes.float8_e4m3fn),
            "weight_scale": np.float32(scale),
        }
