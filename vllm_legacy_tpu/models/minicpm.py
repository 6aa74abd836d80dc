"""MiniCPM (reference: vllm/model_executor/models/minicpm.py).

Llama-shaped with muP-style scalings: embeddings x scale_emb, each
sublayer's residual contribution x (scale_depth / sqrt(num_layers)),
and logits computed against hidden / (hidden_size / dim_model_base).
"""
from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp

from vllm_legacy_tpu.layers import embedding
from vllm_legacy_tpu.layers.linear import row_parallel_linear
from vllm_legacy_tpu.layers.rotary import apply_rope
from vllm_legacy_tpu.models.attention import attention
from vllm_legacy_tpu.models.llama import LlamaForCausalLM


class MiniCPMForCausalLM(LlamaForCausalLM):

    def __init__(self, hf_config: Any, *, tp_size: int = 1,
                 dtype: Any = jnp.bfloat16, quant_config: Any = None):
        super().__init__(hf_config, tp_size=tp_size, dtype=dtype,
                         quant_config=quant_config)
        c = hf_config
        self.scale_emb = getattr(c, "scale_emb", 1.0)
        scale_depth = getattr(c, "scale_depth", 1.0)
        self.residual_scale = scale_depth / math.sqrt(self.num_layers)
        dim_base = getattr(c, "dim_model_base", None) or self.hidden_size
        self.logit_scale = 1.0 / (self.hidden_size / dim_base)

    def _decoder_layer(self, p, hidden, residual, q_pos, rope_cache,
                       kv_caches, md, layer_idx, lora_indices=None):
        # scaled residuals don't fit the fused add-in-norm flow; fold
        # residuals eagerly (residual is always None here)
        b, l, h = hidden.shape
        x = self._norm(hidden, p["input_layernorm"])
        xf = x.reshape(b * l, h)
        q, k, v = self._project_qkv(p, xf, lora_indices)
        q, k = apply_rope(q, k, q_pos, rope_cache,
                          rotary_dim=self.rotary_dim)
        q = q.reshape(b, l, -1, self.head_dim)
        k = k.reshape(b, l, -1, self.head_dim)
        v = v.reshape(b, l, -1, self.head_dim)
        attn_out, kv_caches = attention(q, k, v, kv_caches, md,
                                        scale=self.scale,
                                        layer_idx=layer_idx)
        o = row_parallel_linear(attn_out.reshape(b * l, -1), p["o_proj"],
                                tp_size=self.tp_size).reshape(b, l, h)
        hidden = hidden + o * self.residual_scale
        x = self._norm(hidden, p["post_attention_layernorm"])
        mlp = self._mlp(p, x.reshape(b * l, h)).reshape(b, l, h)
        hidden = hidden + mlp * self.residual_scale
        return hidden, None, kv_caches

    def forward(self, params, kv_caches, token_ids, positions, md,
                lora_indices=None):
        b, l = token_ids.shape
        hidden = embedding.embed(params["embed"], token_ids.reshape(-1),
                                 tp_size=self.tp_size)
        hidden = (hidden * self.scale_emb).astype(hidden.dtype)
        hidden = hidden.reshape(b, l, self.hidden_size)
        q_pos = jnp.clip(positions.reshape(-1), 0,
                         params["rope_cache"].shape[0] - 1)
        for i in range(self.num_layers):
            hidden, _, kv_caches = self._decoder_layer(
                params["layers"][i], hidden, None, q_pos,
                params["rope_cache"], kv_caches, md, i,
                lora_indices=lora_indices)
        hidden = self._norm(hidden, params["norm"])
        return hidden, kv_caches

    def compute_logits(self, params, hidden):
        return super().compute_logits(
            params, (hidden * self.logit_scale).astype(hidden.dtype))
