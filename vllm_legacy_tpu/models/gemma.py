"""Gemma 1/2 (reference: vllm/model_executor/models/gemma.py).

Differences from Llama: embedding scaled by sqrt(hidden); RMSNorm uses
(1 + weight); GeLU-tanh MLP; tied embeddings always; head_dim from
config (256 for 2B).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from vllm_legacy_tpu.layers import embedding
from vllm_legacy_tpu.layers.activation import gelu_and_mul
from vllm_legacy_tpu.layers.linear import linear, row_parallel_linear
from vllm_legacy_tpu.models.llama import LlamaForCausalLM


def _gemma_rms_norm(x, weight, *, eps, residual=None):
    orig_dtype = x.dtype
    if residual is not None:
        x = x + residual
        residual = x
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    out = (normed * (1.0 + weight.astype(jnp.float32))).astype(orig_dtype)
    if residual is not None:
        return out, residual
    return out


class GemmaForCausalLM(LlamaForCausalLM):

    def __init__(self, hf_config: Any, **kw) -> None:
        super().__init__(hf_config, **kw)
        self.tie_word_embeddings = True
        self.hidden_act = getattr(hf_config, "hidden_activation", None) \
            or getattr(hf_config, "hidden_act", "gelu_pytorch_tanh")
        self.embed_scale = self.hidden_size**0.5

    def _norm(self, x, norm_params, residual=None):
        return _gemma_rms_norm(x, norm_params["weight"], eps=self.rms_eps,
                               residual=residual)

    def _mlp(self, p, xf, lora_indices=None):
        gate = linear(xf, p["gate_proj"], lora_indices=lora_indices)
        up = linear(xf, p["up_proj"], lora_indices=lora_indices)
        act = gelu_and_mul(jnp.concatenate([gate, up], axis=-1),
                           approximate="tanh")
        return row_parallel_linear(act, p["down_proj"],
                                   tp_size=self.tp_size)

    def forward(self, params, kv_caches, token_ids, positions, md,
                lora_indices=None):
        b, l = token_ids.shape
        hidden = embedding.embed(params["embed"], token_ids.reshape(-1),
                                 tp_size=self.tp_size)
        hidden = (hidden * self.embed_scale).astype(hidden.dtype)
        hidden = hidden.reshape(b, l, self.hidden_size)
        q_pos = jnp.clip(positions.reshape(-1), 0,
                         params["rope_cache"].shape[0] - 1)
        residual = None
        for i in range(self.num_layers):
            hidden, residual, kv_caches = self._decoder_layer(
                params["layers"][i], hidden, residual, q_pos,
                params["rope_cache"], kv_caches, md, i)
        hidden, _ = _gemma_rms_norm(hidden, params["norm"]["weight"],
                                    eps=self.rms_eps, residual=residual)
        return hidden, kv_caches
