"""StableLM 2 / StableLM-3B (reference: vllm/model_executor/models/
stablelm.py).

Llama-like decoder with LayerNorm (weight+bias) instead of RMSNorm,
partial rotary (partial_rotary_factor / rope_pct), optional qkv bias
(use_qkv_bias), SwiGLU MLP.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from vllm_legacy_tpu.layers.norm import layer_norm
from vllm_legacy_tpu.layers.rotary import build_cos_sin_cache
from vllm_legacy_tpu.models.llama import LlamaForCausalLM


class StablelmForCausalLM(LlamaForCausalLM):

    def __init__(self, hf_config: Any, *, tp_size: int = 1,
                 dtype: Any = jnp.bfloat16, quant_config: Any = None):
        hf_config.attention_bias = bool(
            getattr(hf_config, "use_qkv_bias", False))
        super().__init__(hf_config, tp_size=tp_size, dtype=dtype,
                         quant_config=quant_config)
        c = hf_config
        self.ln_eps = getattr(c, "layer_norm_eps", 1e-5)
        pct = getattr(c, "partial_rotary_factor",
                      getattr(c, "rope_pct", 0.25))
        self.rotary_dim = int(self.head_dim * pct)

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

    def make_rope_cache(self):
        return build_cos_sin_cache(self.head_dim, self.rotary_dim,
                                   self.max_position, self.rope_theta,
                                   self.rope_scaling)

    def _rotary_dim(self):
        return self.rotary_dim

    def _norm(self, x, norm_params, residual=None):
        if residual is not None:
            x = x + residual
            return layer_norm(x, norm_params["weight"],
                              norm_params.get("bias"),
                              eps=self.ln_eps), x
        return layer_norm(x, norm_params["weight"],
                          norm_params.get("bias"), eps=self.ln_eps)
