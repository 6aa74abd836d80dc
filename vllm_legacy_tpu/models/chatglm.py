"""ChatGLM2/3 (reference: vllm/model_executor/models/chatglm.py).

Llama-shaped RMSNorm decoder with trust-remote-code names
(transformer.encoder.layers.*), fused biased query_key_value (plain
q|k|v concat over GQA groups), fused gate_up dense_h_to_4h (SwiGLU),
and HALF-dim INTERLEAVED rotary (rotary_dim = head_dim // 2,
is_neox_style=False).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from vllm_legacy_tpu.layers.rotary import apply_rope, build_cos_sin_cache
from vllm_legacy_tpu.models.llama import LlamaForCausalLM


class ChatGLMForCausalLM(LlamaForCausalLM):

    def __init__(self, hf_config: Any, *, tp_size: int = 1,
                 dtype: Any = jnp.bfloat16, quant_config: Any = None):
        c = hf_config
        if not hasattr(c, "num_hidden_layers"):
            c.num_hidden_layers = c.num_layers
        c.num_key_value_heads = (c.multi_query_group_num
                                 if getattr(c, "multi_query_attention",
                                            False)
                                 else c.num_attention_heads)
        c.intermediate_size = c.ffn_hidden_size
        c.rms_norm_eps = getattr(c, "layernorm_epsilon", 1e-5)
        c.max_position_embeddings = getattr(c, "seq_length", 8192)
        c.attention_bias = bool(getattr(c, "add_qkv_bias", True))
        c.head_dim = getattr(c, "kv_channels", None) or (
            c.hidden_size // c.num_attention_heads)
        super().__init__(c, tp_size=tp_size, dtype=dtype,
                         quant_config=quant_config)
        self.rotary_dim = self.head_dim // 2
        self.tie_word_embeddings = False
        self.rope_in_projection = True

    def make_rope_cache(self):
        # chatglm rope_ratio scales the base
        base = 10000.0 * getattr(self.hf_config, "rope_ratio", 1.0)
        return build_cos_sin_cache(self.head_dim, self.rotary_dim,
                                   self.max_position, base)

    def _decoder_layer(self, p, hidden, residual, q_pos, rope_cache,
                       kv_caches, md, layer_idx, lora_indices=None):
        # interleaved (GPT-J-style) partial rope: override the rope
        # application by rotating q/k inside _project_qkv
        self._rope_args = (q_pos, rope_cache)
        return super()._decoder_layer(p, hidden, residual, q_pos,
                                      rope_cache, kv_caches, md,
                                      layer_idx,
                                      lora_indices=lora_indices)

    def _project_qkv(self, p, xf, lora_indices=None):
        q, k, v = super()._project_qkv(p, xf, lora_indices)
        q_pos, rope_cache = self._rope_args
        q, k = apply_rope(q, k, q_pos, rope_cache,
                          rotary_dim=self.rotary_dim,
                          is_neox_style=False)
        return q, k, v

    def load_weights(self, weights):
        d = self.head_dim
        nq, nkv = self.num_heads, self.num_kv_heads

        def remap(weights):
            for name, w in weights:
                if "rotary_pos_emb" in name:
                    continue
                name = name.removeprefix("transformer.")
                if name == "embedding.word_embeddings.weight":
                    yield "model.embed_tokens.weight", w
                elif name == "encoder.final_layernorm.weight":
                    yield "model.norm.weight", w
                elif name == "output_layer.weight":
                    yield "lm_head.weight", w
                elif name.startswith("encoder.layers."):
                    parts = name.split(".")
                    idx, kind = parts[2], parts[-1]
                    sub = ".".join(parts[3:-1])
                    base = f"model.layers.{idx}"
                    if sub == "input_layernorm":
                        yield f"{base}.input_layernorm.{kind}", w
                    elif sub == "post_attention_layernorm":
                        yield (f"{base}.post_attention_layernorm.{kind}",
                               w)
                    elif sub == "self_attention.query_key_value":
                        w = np.asarray(w)
                        qw = w[:nq * d]
                        kw = w[nq * d:nq * d + nkv * d]
                        vw = w[nq * d + nkv * d:]
                        yield f"{base}.self_attn.q_proj.{kind}", qw
                        yield f"{base}.self_attn.k_proj.{kind}", kw
                        yield f"{base}.self_attn.v_proj.{kind}", vw
                    elif sub == "self_attention.dense":
                        yield f"{base}.self_attn.o_proj.{kind}", w
                    elif sub == "mlp.dense_h_to_4h":
                        w = np.asarray(w)
                        half = w.shape[0] // 2
                        yield f"{base}.mlp.gate_proj.{kind}", w[:half]
                        yield f"{base}.mlp.up_proj.{kind}", w[half:]
                    elif sub == "mlp.dense_4h_to_h":
                        yield f"{base}.mlp.down_proj.{kind}", w

        return super().load_weights(remap(weights))
