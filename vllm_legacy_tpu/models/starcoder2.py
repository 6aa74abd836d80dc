"""StarCoder2 (reference: vllm/model_executor/models/starcoder2.py).

Llama-shaped decoder with LayerNorm (weight+bias), biased linears
everywhere, a plain (non-gated) gelu-tanh MLP (c_fc -> act -> c_proj),
rope, GQA, optional sliding window, usually tied embeddings.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from vllm_legacy_tpu.layers.activation import get_act_fn
from vllm_legacy_tpu.layers.linear import linear, row_parallel_linear
from vllm_legacy_tpu.layers.norm import layer_norm
from vllm_legacy_tpu.models.llama import LlamaForCausalLM


class Starcoder2ForCausalLM(LlamaForCausalLM):

    _COL_PROJS = ("q_proj", "k_proj", "v_proj", "c_fc")
    _ROW_PROJS = ("o_proj", "c_proj")

    def __init__(self, hf_config: Any, *, tp_size: int = 1,
                 dtype: Any = jnp.bfloat16, quant_config: Any = None):
        hf_config.attention_bias = bool(getattr(hf_config, "use_bias",
                                                True))
        super().__init__(hf_config, tp_size=tp_size, dtype=dtype,
                         quant_config=quant_config)
        c = hf_config
        self.ln_eps = getattr(c, "norm_epsilon", 1e-5)
        self.use_bias = bool(getattr(c, "use_bias", True))
        self.act = get_act_fn(getattr(c, "hidden_act",
                                      "gelu_pytorch_tanh"))
        self.tie_word_embeddings = bool(
            getattr(c, "tie_word_embeddings", True))

    def _layer_shapes(self):
        h, d = self.hidden_size, self.head_dim
        nq, nkv, inter = self.num_heads, self.num_kv_heads, \
            self.intermediate_size

        def lin(i, o):
            t = {"weight": ((i, o), self.dtype)}
            if self.use_bias:
                t["bias"] = ((o, ), self.dtype)
            return t

        def ln():
            return {"weight": ((h, ), self.dtype),
                    "bias": ((h, ), self.dtype)}

        return {
            "input_layernorm": ln(),
            "q_proj": lin(h, nq * d),
            "k_proj": lin(h, nkv * d),
            "v_proj": lin(h, nkv * d),
            "o_proj": lin(nq * d, h),
            "post_attention_layernorm": ln(),
            "c_fc": lin(h, inter),
            "c_proj": lin(inter, h),
        }

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

    def _mlp(self, p, xf, lora_indices=None):
        h = self.act(linear(xf, p["c_fc"], lora_indices=lora_indices))
        return row_parallel_linear(h, p["c_proj"], tp_size=self.tp_size,
                                   lora_indices=lora_indices)
