"""Snowflake Arctic: hybrid dense/MoE transformer with parallel
residual MLP on MoE layers.

Capability parity with the reference's ``vllm/model_executor/models/
arctic.py`` (:38-520): layer ``i`` is MoE iff ``(i+1) %
moe_layer_frequency == 0`` (dense SwiGLU otherwise, :97-105); when
``use_residual`` a MoE layer additionally runs a hidden-size SwiGLU
``residual_mlp`` on the post-attention stream in parallel with the MoE on
the *pre-attention* stream (:339-356). Experts run expert-parallel over
the "model" mesh axis via the shared fused_moe path (the reference
TP-shards every expert instead).

Checkpoint mapping (HF Arctic):
    block_sparse_moe.mlp.w1/w3/w2          dense-layer SwiGLU
    block_sparse_moe.gate.weight           router [E, hidden]
    block_sparse_moe.experts.{e}.w1/w3/w2  stacked -> moe_w1 / moe_w2
    residual_layernorm / residual_mlp.w*   parallel residual branch
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_legacy_tpu.layers.activation import silu_and_mul
from vllm_legacy_tpu.layers.fused_moe import fused_moe
from vllm_legacy_tpu.layers.linear import linear, row_parallel_linear
from vllm_legacy_tpu.layers.norm import rms_norm
from vllm_legacy_tpu.layers.rotary import apply_rope
from vllm_legacy_tpu.models.attention import attention
from vllm_legacy_tpu.models.llama import LlamaForCausalLM


class ArcticForCausalLM(LlamaForCausalLM):

    _COL_PROJS = LlamaForCausalLM._COL_PROJS + ("res_gate_proj",
                                                "res_up_proj")
    _ROW_PROJS = LlamaForCausalLM._ROW_PROJS + ("res_down_proj", )

    def __init__(self, hf_config: Any, *, tp_size: int = 1,
                 dtype: Any = jnp.bfloat16,
                 quant_config: Any = None) -> None:
        super().__init__(hf_config, tp_size=tp_size, dtype=dtype,
                         quant_config=quant_config)
        c = hf_config
        self.num_experts = getattr(c, "num_local_experts", 1)
        self.top_k = getattr(c, "num_experts_per_tok", 1)
        self.moe_layer_frequency = getattr(c, "moe_layer_frequency", 2)
        self.use_residual = bool(getattr(c, "use_residual", True))
        if self.num_experts % tp_size != 0:
            raise ValueError(
                f"tensor_parallel_size={tp_size} must divide "
                f"num_experts={self.num_experts} (experts are "
                "expert-parallel)")

    def _is_moe_layer(self, idx: int) -> bool:
        return (idx + 1) % self.moe_layer_frequency == 0

    # -- param structure ------------------------------------------------
    def _layer_shapes_for(self, idx: int) -> Dict[str, Any]:
        shapes = super()._layer_shapes()
        if not self._is_moe_layer(idx):
            return shapes
        for k in ("gate_proj", "up_proj", "down_proj"):
            shapes.pop(k)
        h, inter, e = (self.hidden_size, self.intermediate_size,
                       self.num_experts)
        shapes["moe_router"] = {"weight": ((h, e), self.dtype)}
        shapes["moe_w1"] = {"weight": ((e, h, 2 * inter), self.dtype)}
        shapes["moe_w2"] = {"weight": ((e, inter, h), self.dtype)}
        if self.use_residual:
            shapes["residual_layernorm"] = {"weight": ((h, ), self.dtype)}
            shapes["res_gate_proj"] = {"weight": ((h, h), self.dtype)}
            shapes["res_up_proj"] = {"weight": ((h, h), self.dtype)}
            shapes["res_down_proj"] = {"weight": ((h, h), self.dtype)}
        return shapes

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        shapes["layers"] = [
            self._layer_shapes_for(i) for i in range(self.num_layers)
        ]
        return shapes

    def param_specs(self, params=None):
        specs = super().param_specs(params)
        for lp in specs["layers"]:
            if "moe_router" in lp:
                lp["moe_router"] = {"weight": P()}
                lp["moe_w1"] = {"weight": P("model", None, None)}
                lp["moe_w2"] = {"weight": P("model", None, None)}
        return specs

    # -- compute ---------------------------------------------------------
    def _moe(self, p, xf):
        return fused_moe(xf, p["moe_router"]["weight"],
                         p["moe_w1"]["weight"], p["moe_w2"]["weight"],
                         top_k=self.top_k, num_experts=self.num_experts,
                         tp_size=self.tp_size)

    def _residual_mlp(self, p, xf):
        gate = linear(xf, p["res_gate_proj"])
        up = linear(xf, p["res_up_proj"])
        mlp = silu_and_mul(jnp.concatenate([gate, up], axis=-1))
        return row_parallel_linear(mlp, p["res_down_proj"],
                                   tp_size=self.tp_size)

    def _decoder_layer(self, p, hidden, residual, q_pos, rope_cache,
                       kv_caches, md, layer_idx, lora_indices=None):
        """Arctic layer under the fused-residual convention: the true
        activation entering/leaving a layer is ``hidden + residual``
        (residual None on entry to layer 0)."""
        b, l, h = hidden.shape
        full_in = hidden if residual is None else hidden + residual

        x = rms_norm(full_in, p["input_layernorm"]["weight"],
                     eps=self.rms_eps)
        xf = x.reshape(b * l, h)
        q, k, v = self._project_qkv(p, xf)
        q, k = apply_rope(q, k, q_pos, rope_cache,
                          rotary_dim=self.rotary_dim)
        q = q.reshape(b, l, -1, self.head_dim)
        k = k.reshape(b, l, -1, self.head_dim)
        v = v.reshape(b, l, -1, self.head_dim)
        attn_out, kv_caches = attention(q, k, v, kv_caches, md,
                                        scale=self.scale,
                                        layer_idx=layer_idx)
        o = row_parallel_linear(attn_out.reshape(b * l, -1), p["o_proj"],
                                tp_size=self.tp_size)
        residual_attn = full_in + o.reshape(b, l, h)

        is_moe = "moe_router" in p
        if is_moe and self.use_residual and "residual_layernorm" in p:
            rm = rms_norm(residual_attn, p["residual_layernorm"]["weight"],
                          eps=self.rms_eps)
            rm = self._residual_mlp(p, rm.reshape(b * l, h)).reshape(
                b, l, h)
            # MoE branch reads the PRE-attention stream (reference :352).
            mx = rms_norm(full_in, p["post_attention_layernorm"]["weight"],
                          eps=self.rms_eps)
            mx = self._moe(p, mx.reshape(b * l, h)).reshape(b, l, h)
            return rm + mx, residual_attn, kv_caches

        x = rms_norm(residual_attn, p["post_attention_layernorm"]["weight"],
                     eps=self.rms_eps)
        xf = x.reshape(b * l, h)
        mlp = self._moe(p, xf) if is_moe else self._mlp(p, xf)
        return mlp.reshape(b, l, h), residual_attn, kv_caches

    # -- loading ---------------------------------------------------------
    def load_weights(self, weights):
        import ml_dtypes
        np_dtype = (ml_dtypes.bfloat16
                    if self.dtype == jnp.bfloat16 else np.float32)
        expert_parts: Dict[int, Dict[str, Dict[int, np.ndarray]]] = {}
        routers: Dict[int, np.ndarray] = {}

        def base_weights():
            for name, w in weights:
                if ".residual_layernorm." in name:
                    # route through the layernorm path of the base loader
                    yield name, w
                    continue
                if ".residual_mlp." in name:
                    # w1 -> res_gate, w3 -> res_up, w2 -> res_down
                    wn = name.split(".residual_mlp.")[1].split(".")[0]
                    proj = {"w1": "res_gate_proj", "w3": "res_up_proj",
                            "w2": "res_down_proj"}[wn]
                    yield name.replace(f"residual_mlp.{wn}",
                                       f"mlp.{proj}"), w
                    continue
                if ".block_sparse_moe." not in name:
                    yield name, w
                    continue
                parts = name.split(".")
                layer = int(parts[2])
                if parts[4] == "mlp":  # dense layer SwiGLU
                    proj = {"w1": "gate_proj", "w3": "up_proj",
                            "w2": "down_proj"}[parts[5]]
                    yield f"model.layers.{layer}.mlp.{proj}.weight", w
                elif parts[4] == "gate":
                    routers[layer] = np.asarray(w).astype(np_dtype)
                else:  # experts.{e}.w{1,2,3}.weight
                    e = int(parts[5])
                    expert_parts.setdefault(layer, {}).setdefault(
                        parts[6], {})[e] = np.asarray(w).astype(np_dtype)

        params = super().load_weights(base_weights())

        for layer, parts in expert_parts.items():
            lp = params["layers"][layer]
            e_count = self.num_experts
            w1 = np.stack([parts["w1"][e].T for e in range(e_count)])
            w3 = np.stack([parts["w3"][e].T for e in range(e_count)])
            w2 = np.stack([parts["w2"][e].T for e in range(e_count)])
            lp["moe_w1"] = {"weight": np.concatenate([w1, w3], axis=-1)}
            lp["moe_w2"] = {"weight": w2}
        for layer, r in routers.items():
            params["layers"][layer]["moe_router"] = {"weight": r.T}
        return params
