"""DeepSeek (v1) MoE (reference: vllm/model_executor/models/deepseek.py).

Llama attention + routed experts with ALWAYS-ON shared experts (ungated,
unlike Qwen2-MoE's sigmoid gate); the first ``first_k_dense_replace``
layers and layers off the ``moe_layer_freq`` grid stay dense.
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_legacy_tpu.layers.activation import silu_and_mul
from vllm_legacy_tpu.layers.fused_moe import fused_moe
from vllm_legacy_tpu.layers.linear import linear, row_parallel_linear
from vllm_legacy_tpu.models.llama import LlamaForCausalLM


class DeepseekForCausalLM(LlamaForCausalLM):

    def __init__(self, hf_config: Any, *, tp_size: int = 1,
                 dtype: Any = jnp.bfloat16, quant_config: Any = None):
        super().__init__(hf_config, tp_size=tp_size, dtype=dtype,
                         quant_config=quant_config)
        c = hf_config
        self.num_experts = getattr(c, "n_routed_experts", 64)
        self.top_k = getattr(c, "num_experts_per_tok", 6)
        self.moe_inter = getattr(c, "moe_intermediate_size", 1408)
        self.n_shared = getattr(c, "n_shared_experts", 2) or 0
        self.norm_topk_prob = bool(getattr(c, "norm_topk_prob", False))
        self.first_dense = getattr(c, "first_k_dense_replace", 1)
        self.moe_freq = getattr(c, "moe_layer_freq", 1)
        if self.num_experts % tp_size != 0:
            raise ValueError("n_routed_experts must divide tp size (EP)")

    def _is_sparse(self, layer_idx: int) -> bool:
        return (layer_idx >= self.first_dense
                and layer_idx % self.moe_freq == 0)

    def _sparse_layer_shapes(self) -> Dict[str, Any]:
        shapes = super()._layer_shapes()
        for k in ("gate_proj", "up_proj", "down_proj"):
            shapes.pop(k)
        h, e, mi = self.hidden_size, self.num_experts, self.moe_inter
        shapes["moe_router"] = {"weight": ((h, e), self.dtype)}
        shapes["moe_w1"] = {"weight": ((e, h, 2 * mi), self.dtype)}
        shapes["moe_w2"] = {"weight": ((e, mi, h), self.dtype)}
        if self.n_shared:
            si = mi * self.n_shared
            shapes["shared_gate_proj"] = {"weight": ((h, si), self.dtype)}
            shapes["shared_up_proj"] = {"weight": ((h, si), self.dtype)}
            shapes["shared_down_proj"] = {"weight": ((si, h), self.dtype)}
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
        return specs

    def _mlp(self, p, xf, lora_indices=None):
        if "moe_router" not in p:
            return super()._mlp(p, xf, lora_indices=lora_indices)
        out = fused_moe(
            xf, p["moe_router"]["weight"], p["moe_w1"]["weight"],
            p["moe_w2"]["weight"], top_k=self.top_k,
            num_experts=self.num_experts, tp_size=self.tp_size,
            renormalize=self.norm_topk_prob)
        if "shared_gate_proj" in p:
            gate = linear(xf, p["shared_gate_proj"])
            up = linear(xf, p["shared_up_proj"])
            shared = silu_and_mul(jnp.concatenate([gate, up], axis=-1))
            out = out + row_parallel_linear(shared, p["shared_down_proj"],
                                            tp_size=self.tp_size)
        return out

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
                elif ".mlp.shared_experts." in name:
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
            for wn, key in (("gate_proj", "shared_gate_proj"),
                            ("up_proj", "shared_up_proj"),
                            ("down_proj", "shared_down_proj")):
                if wn in ex:
                    lp[key] = {"weight": ex[wn].T}
        return params
