"""Orion (OrionStarAI) (reference: vllm/model_executor/models/orion.py).

Llama architecture with LayerNorm (weight+bias) in place of RMSNorm.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from vllm_legacy_tpu.layers.norm import layer_norm
from vllm_legacy_tpu.models.llama import LlamaForCausalLM


class OrionForCausalLM(LlamaForCausalLM):

    def __init__(self, hf_config: Any, *, tp_size: int = 1,
                 dtype: Any = jnp.bfloat16, quant_config: Any = None):
        super().__init__(hf_config, tp_size=tp_size, dtype=dtype,
                         quant_config=quant_config)
        self.ln_eps = getattr(hf_config, "rms_norm_eps", 1e-5)

    def _layer_shapes(self):
        shapes = super()._layer_shapes()
        h = self.hidden_size
        for key in ("input_layernorm", "post_attention_layernorm"):
            shapes[key] = {"weight": ((h, ), self.dtype),
                           "bias": ((h, ), self.dtype)}
        return shapes

    def param_shapes(self):
        shapes = super().param_shapes()
        h = self.hidden_size
        shapes["norm"] = {"weight": ((h, ), self.dtype),
                          "bias": ((h, ), self.dtype)}
        return shapes

    def _norm(self, x, norm_params, residual=None):
        if residual is not None:
            x = x + residual
            return layer_norm(x, norm_params["weight"],
                              norm_params.get("bias"),
                              eps=self.ln_eps), x
        return layer_norm(x, norm_params["weight"],
                          norm_params.get("bias"), eps=self.ln_eps)
