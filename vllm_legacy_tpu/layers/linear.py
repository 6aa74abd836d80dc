"""Linear layers as pure functions over param dicts.

Replaces the reference's TP nn.Modules (vllm/model_executor/layers/
linear.py — ColumnParallelLinear :187, MergedColumnParallelLinear :301,
QKVParallelLinear :461, RowParallelLinear :662). On TPU there is ONE
linear: weights are stored ``[in_features, out_features]`` and annotated
with a ``PartitionSpec``; GSPMD inserts the all-reduce the reference
hand-codes after RowParallelLinear. Merged/QKV fusion happens at weight
*load* time (model_loader), not in layer code.

Quantized variants plug in through ``LinearMethod`` (mirrors the
reference's LinearMethodBase :29) — a static object chosen per layer at
model build; params stay a flat dict of arrays so the whole model is one
jittable pytree.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

Params = Dict[str, jax.Array]


class LinearMethod:
    """Unquantized bf16/f32 matmul (reference: UnquantizedLinearMethod)."""

    name = "unquantized"

    def create_params(self, in_features: int, out_features: int,
                      dtype: Any, *, bias: bool = False) -> Dict[str, Any]:
        shapes = {"weight": ((in_features, out_features), dtype)}
        if bias:
            shapes["bias"] = ((out_features, ), dtype)
        return shapes

    def partition_specs(self, mode: str) -> Dict[str, P]:
        """mode: column | row | replicated (tensor axis = "model")."""
        if mode == "column":
            return {"weight": P(None, "model"), "bias": P("model")}
        if mode == "row":
            return {"weight": P("model", None), "bias": P()}
        return {"weight": P(None, None), "bias": P()}

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        out = jnp.dot(x, params["weight"],
                      preferred_element_type=jnp.float32)
        out = out.astype(x.dtype)
        if "bias" in params:
            out = out + params["bias"].astype(out.dtype)
        return out


def linear(x: jax.Array,
           params: Params,
           method: Optional[LinearMethod] = None,
           lora_indices: Optional[jax.Array] = None) -> jax.Array:
    if method is None:
        method = _dispatch(params)
    out = method.apply(
        {k: v for k, v in params.items()
         if not k.startswith("lora_")}, x)
    if lora_indices is not None and "lora_a" in params:
        from vllm_legacy_tpu.lora.layers import apply_lora
        out = apply_lora(x, out, params["lora_a"], params["lora_b"],
                         params["lora_scale"], lora_indices,
                         mode="column")
    return out


def _dispatch(params: Params) -> "LinearMethod":
    """Pick the method from the param structure (static under jit):
    packed quant params carry qweight/scales/szeros, AQLM carries
    codes/codebooks, DeepSpeedFP fpq/fplut, int8 w8a8 an input_scale,
    fp8 a weight_scale; bits and group size are inferred from shapes so
    model code needs no quantization plumbing at all."""
    if "qweight" in params:
        from vllm_legacy_tpu.layers.quantization.common import (
            infer_quant_method)
        return infer_quant_method(params)
    if "codes" in params:
        from vllm_legacy_tpu.layers.quantization.aqlm import (
            AQLMLinearMethod)
        return AQLMLinearMethod()
    if "fpq" in params:
        from vllm_legacy_tpu.layers.quantization.deepspeedfp import (
            DeepSpeedFPLinearMethod)
        return DeepSpeedFPLinearMethod()
    if "input_scale" in params:
        from vllm_legacy_tpu.layers.quantization.compressed_tensors \
            import W8A8LinearMethod
        return W8A8LinearMethod()
    if "weight_scale" in params:
        from vllm_legacy_tpu.layers.quantization.fp8 import Fp8LinearMethod
        return Fp8LinearMethod()
    return _DEFAULT


def row_parallel_linear(x: jax.Array,
                        params: Params,
                        method: Optional[LinearMethod] = None,
                        axis: str = "model",
                        tp_size: int = 1,
                        lora_indices: Optional[jax.Array] = None
                        ) -> jax.Array:
    """Row-parallel matmul under shard_map: partial matmul on the locally
    sharded contraction dim, psum over the mesh axis, THEN bias (the
    reference's RowParallelLinear all-reduce, linear.py:755-780).

    tp_size == 1 statically elides the collective so the model runs
    OUTSIDE shard_map on one chip — shard_map currently defeats donated
    in-place KV updates (full cache copies per step)."""
    if method is None:
        method = _dispatch(params)
    bias = params.get("bias")
    out = method.apply(
        {k: v for k, v in params.items()
         if k != "bias" and not k.startswith("lora_")}, x)
    if tp_size > 1:
        out = jax.lax.psum(out, axis)
    if lora_indices is not None and "lora_a" in params:
        # row layers shard A on the contraction dim; the rank-space
        # activations psum inside apply_lora
        from vllm_legacy_tpu.lora.layers import apply_lora
        out = apply_lora(x, out, params["lora_a"], params["lora_b"],
                         params["lora_scale"], lora_indices,
                         mode="row", tp_size=tp_size, axis=axis)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


_DEFAULT = LinearMethod()
