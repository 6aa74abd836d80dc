"""OLMo (reference: vllm/model_executor/models/olmo.py).

Llama-shaped decoder with NON-PARAMETRIC LayerNorm (no weight/bias),
optional clip_qkv, SwiGLU MLP, bias-free linears, optionally tied
embeddings (weight_tying).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from vllm_legacy_tpu.layers.linear import linear
from vllm_legacy_tpu.layers.norm import layer_norm
from vllm_legacy_tpu.models.llama import LlamaForCausalLM


class OlmoForCausalLM(LlamaForCausalLM):

    def __init__(self, hf_config: Any, *, tp_size: int = 1,
                 dtype: Any = jnp.bfloat16, quant_config: Any = None):
        super().__init__(hf_config, tp_size=tp_size, dtype=dtype,
                         quant_config=quant_config)
        self.clip_qkv = getattr(hf_config, "clip_qkv", None)
        self.ln_eps = 1e-5

    def _layer_shapes(self):
        shapes = super()._layer_shapes()
        # non-parametric norms: empty param dicts keep tree structure
        shapes["input_layernorm"] = {}
        shapes["post_attention_layernorm"] = {}
        return shapes

    def param_shapes(self):
        shapes = super().param_shapes()
        shapes["norm"] = {}
        return shapes

    def _norm(self, x, norm_params, residual=None):
        if residual is not None:
            x = x + residual
            return layer_norm(x, None, eps=self.ln_eps), x
        return layer_norm(x, None, eps=self.ln_eps)

    def load_weights(self, weights):
        params = super().load_weights(weights)
        # non-parametric norms never appear in the checkpoint; the
        # forward still indexes their (empty) param dicts
        for lp in params["layers"]:
            lp.setdefault("input_layernorm", {})
            lp.setdefault("post_attention_layernorm", {})
        return params

    def _project_qkv(self, p, xf, lora_indices=None):
        q, k, v = super()._project_qkv(p, xf, lora_indices)
        if self.clip_qkv is not None:
            q = jnp.clip(q, -self.clip_qkv, self.clip_qkv)
            k = jnp.clip(k, -self.clip_qkv, self.clip_qkv)
            v = jnp.clip(v, -self.clip_qkv, self.clip_qkv)
        return q, k, v
