"""Qwen2-MoE (reference: vllm/model_executor/models/qwen2_moe.py).

Mixtral-style routed experts PLUS an always-on shared expert whose
output is gated by sigmoid(shared_expert_gate(x)); some layers are plain
dense MLPs (mlp_only_layers / decoder_sparse_step); qkv carry biases
(Qwen lineage); router top-k is NOT renormalized unless norm_topk_prob.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_legacy_tpu.layers.activation import silu_and_mul
from vllm_legacy_tpu.layers.fused_moe import fused_moe
from vllm_legacy_tpu.layers.linear import linear, row_parallel_linear
from vllm_legacy_tpu.models.llama import LlamaForCausalLM


class Qwen2MoeForCausalLM(LlamaForCausalLM):

    def __init__(self, hf_config: Any, *, tp_size: int = 1,
                 dtype: Any = jnp.bfloat16, quant_config: Any = None):
        hf_config.attention_bias = True  # Qwen lineage: biased qkv
        super().__init__(hf_config, tp_size=tp_size, dtype=dtype,
                         quant_config=quant_config)
        c = hf_config
        self.num_experts = getattr(c, "num_experts", 60)
        self.top_k = getattr(c, "num_experts_per_tok", 4)
        self.moe_inter = getattr(c, "moe_intermediate_size", 1408)
        self.shared_inter = getattr(c, "shared_expert_intermediate_size",
                                    5632)
        self.norm_topk_prob = bool(getattr(c, "norm_topk_prob", False))
        self.sparse_step = getattr(c, "decoder_sparse_step", 1)
        self.mlp_only_layers = list(getattr(c, "mlp_only_layers", []) or [])
        if self.num_experts % tp_size != 0:
            raise ValueError("num_experts must divide tp size (EP)")

    def _is_sparse(self, layer_idx: int) -> bool:
        return (layer_idx not in self.mlp_only_layers
                and self.num_experts > 0
                and (layer_idx + 1) % self.sparse_step == 0)

    def _sparse_layer_shapes(self) -> Dict[str, Any]:
        shapes = super()._layer_shapes()
        for k in ("gate_proj", "up_proj", "down_proj"):
            shapes.pop(k)
        h, e = self.hidden_size, self.num_experts
        mi, si = self.moe_inter, self.shared_inter
        shapes["moe_router"] = {"weight": ((h, e), self.dtype)}
        shapes["moe_w1"] = {"weight": ((e, h, 2 * mi), self.dtype)}
        shapes["moe_w2"] = {"weight": ((e, mi, h), self.dtype)}
        shapes["shared_gate_proj"] = {"weight": ((h, si), self.dtype)}
        shapes["shared_up_proj"] = {"weight": ((h, si), self.dtype)}
        shapes["shared_down_proj"] = {"weight": ((si, h), self.dtype)}
        shapes["shared_expert_gate"] = {"weight": ((h, 1), self.dtype)}
        return shapes

    _COL_PROJS = LlamaForCausalLM._COL_PROJS + ("shared_gate_proj",
                                                "shared_up_proj")
    _ROW_PROJS = LlamaForCausalLM._ROW_PROJS + ("shared_down_proj", )

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        shapes["layers"] = [
            self._sparse_layer_shapes()
            if self._is_sparse(i) else super()._layer_shapes()
            for i in range(self.num_layers)
        ]
        return shapes

    def param_specs(self, params=None):
        specs = super().param_specs(params)
        for lp in specs["layers"]:
            if "moe_router" in lp:
                lp["moe_router"] = {"weight": P()}
                lp["moe_w1"] = {"weight": P("model", None, None)}
                lp["moe_w2"] = {"weight": P("model", None, None)}
                lp["shared_expert_gate"] = {"weight": P()}
        return specs

    def _mlp(self, p, xf, lora_indices=None):
        if "moe_router" not in p:
            return super()._mlp(p, xf, lora_indices=lora_indices)
        moe_out = fused_moe(
            xf, p["moe_router"]["weight"], p["moe_w1"]["weight"],
            p["moe_w2"]["weight"], top_k=self.top_k,
            num_experts=self.num_experts, tp_size=self.tp_size,
            renormalize=self.norm_topk_prob)
        gate = linear(xf, p["shared_gate_proj"])
        up = linear(xf, p["shared_up_proj"])
        shared = silu_and_mul(jnp.concatenate([gate, up], axis=-1))
        shared = row_parallel_linear(shared, p["shared_down_proj"],
                                     tp_size=self.tp_size)
        gate_logit = jnp.dot(xf, p["shared_expert_gate"]["weight"],
                             preferred_element_type=jnp.float32)
        shared = shared * jax.nn.sigmoid(gate_logit).astype(shared.dtype)
        return moe_out + shared

    def load_weights(self, weights):
        np_dtype = self._np_dtype()
        expert_parts: Dict[int, Dict[str, Dict[int, np.ndarray]]] = {}
        extras: Dict[int, Dict[str, np.ndarray]] = {}

        def base_weights():
            for name, w in weights:
                if ".mlp.experts." in name:
                    parts = name.split(".")
                    layer, e, wn = int(parts[2]), int(parts[5]), parts[6]
                    expert_parts.setdefault(layer, {}).setdefault(
                        wn, {})[e] = np.asarray(w).astype(np_dtype)
                elif ".mlp.gate.weight" in name:
                    layer = int(name.split(".")[2])
                    extras.setdefault(layer, {})["router"] = \
                        np.asarray(w).astype(np_dtype)
                elif ".mlp.shared_expert_gate.weight" in name:
                    layer = int(name.split(".")[2])
                    extras.setdefault(layer, {})["seg"] = \
                        np.asarray(w).astype(np_dtype)
                elif ".mlp.shared_expert." in name:
                    parts = name.split(".")
                    layer, wn = int(parts[2]), parts[5]
                    extras.setdefault(layer, {})[wn] = \
                        np.asarray(w).astype(np_dtype)
                else:
                    yield name, w

        params = super().load_weights(base_weights())
        for layer, parts in expert_parts.items():
            lp = params["layers"][layer]
            e_count = self.num_experts
            w1 = np.stack([parts["gate_proj"][e].T
                           for e in range(e_count)])
            w3 = np.stack([parts["up_proj"][e].T for e in range(e_count)])
            w2 = np.stack([parts["down_proj"][e].T
                           for e in range(e_count)])
            lp["moe_w1"] = {"weight": np.concatenate([w1, w3], axis=-1)}
            lp["moe_w2"] = {"weight": w2}
        for layer, ex in extras.items():
            lp = params["layers"][layer]
            if "router" in ex:
                lp["moe_router"] = {"weight": ex["router"].T}
            if "seg" in ex:
                lp["shared_expert_gate"] = {"weight": ex["seg"].T}
            for wn, key in (("gate_proj", "shared_gate_proj"),
                            ("up_proj", "shared_up_proj"),
                            ("down_proj", "shared_down_proj")):
                if wn in ex:
                    lp[key] = {"weight": ex[wn].T}
        return params
