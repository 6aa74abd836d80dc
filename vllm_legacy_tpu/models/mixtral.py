"""Mixtral 8x7B MoE (reference: vllm/model_executor/models/mixtral.py,
612 LoC). Attention is identical to Llama; the MLP is a routed
mixture-of-experts (layers/fused_moe.py) with experts EXPERT-PARALLEL
over the "model" mesh axis — the reference TP-shards every expert
instead (SURVEY.md §2.10 notes EP is absent there).

Checkpoint mapping (HF Mixtral):
    block_sparse_moe.gate.weight          [E, hidden]   -> moe_router
    block_sparse_moe.experts.{e}.w1       [inter, h]    -> moe_w1[:, :, :I]
    block_sparse_moe.experts.{e}.w3       [inter, h]    -> moe_w1[:, :, I:]
    block_sparse_moe.experts.{e}.w2       [h, inter]    -> moe_w2
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_legacy_tpu.layers.fused_moe import fused_moe
from vllm_legacy_tpu.models.llama import LlamaForCausalLM


class MixtralForCausalLM(LlamaForCausalLM):

    def __init__(self, hf_config: Any, *, tp_size: int = 1,
                 dtype: Any = jnp.bfloat16,
                 quant_config: Any = None) -> None:
        super().__init__(hf_config, tp_size=tp_size, dtype=dtype,
                         quant_config=quant_config)
        self.num_experts = hf_config.num_local_experts
        self.top_k = hf_config.num_experts_per_tok
        if self.num_experts % tp_size != 0:
            raise ValueError(
                f"num_experts={self.num_experts} must divide by tensor "
                f"parallel size {tp_size} (experts are expert-parallel)")

    # -- param structure ------------------------------------------------
    def _layer_shapes(self) -> Dict[str, Any]:
        shapes = super()._layer_shapes()
        for k in ("gate_proj", "up_proj", "down_proj"):
            shapes.pop(k)
        h, inter, e = (self.hidden_size, self.intermediate_size,
                       self.num_experts)
        shapes["moe_router"] = {"weight": ((h, e), self.dtype)}
        shapes["moe_w1"] = {"weight": ((e, h, 2 * inter), self.dtype)}
        shapes["moe_w2"] = {"weight": ((e, inter, h), self.dtype)}
        return shapes

    @staticmethod
    def _proj_entry_spec(mode: str, key: str) -> P:
        return LlamaForCausalLM._proj_entry_spec(mode, key)

    def param_specs(self, params=None):
        specs = super().param_specs(params)
        for lp in specs["layers"]:
            if "moe_router" in lp:
                lp["moe_router"] = {"weight": P()}
                lp["moe_w1"] = {"weight": P("model", None, None)}
                lp["moe_w2"] = {"weight": P("model", None, None)}
        return specs

    # -- compute ---------------------------------------------------------
    def _mlp(self, p, xf, lora_indices=None):
        return fused_moe(
            xf,
            p["moe_router"]["weight"],
            p["moe_w1"]["weight"],
            p["moe_w2"]["weight"],
            top_k=self.top_k,
            num_experts=self.num_experts,
            tp_size=self.tp_size,
        )

    # -- loading ---------------------------------------------------------
    def load_weights(self, weights):
        """Collect per-expert tensors into the stacked layout, passing
        everything else to the Llama loader."""
        import ml_dtypes
        np_dtype = (ml_dtypes.bfloat16
                    if self.dtype == jnp.bfloat16 else np.float32)
        expert_parts: Dict[int, Dict[str, Dict[int, np.ndarray]]] = {}
        routers: Dict[int, np.ndarray] = {}

        def base_weights():
            for name, w in weights:
                if ".block_sparse_moe." not in name:
                    yield name, w
                    continue
                parts = name.split(".")
                layer = int(parts[2])
                if parts[4] == "gate":
                    routers[layer] = np.asarray(w).astype(np_dtype)
                else:  # experts.{e}.w{1,2,3}.weight
                    e = int(parts[5])
                    wn = parts[6]
                    expert_parts.setdefault(layer, {}).setdefault(
                        wn, {})[e] = np.asarray(w).astype(np_dtype)

        params = super().load_weights(base_weights())

        inter = self.intermediate_size
        for layer, parts in expert_parts.items():
            lp = params["layers"][layer]
            e_count = self.num_experts
            w1 = np.stack([parts["w1"][e].T for e in range(e_count)])
            w3 = np.stack([parts["w3"][e].T for e in range(e_count)])
            w2 = np.stack([parts["w2"][e].T for e in range(e_count)])
            lp["moe_w1"] = {
                "weight": np.concatenate([w1, w3], axis=-1)
            }  # [E, H, 2I]
            lp["moe_w2"] = {"weight": w2}  # [E, I, H]
        for layer, r in routers.items():
            params["layers"][layer]["moe_router"] = {"weight": r.T}
        return params
