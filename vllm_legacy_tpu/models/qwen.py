"""Qwen v1 (reference: vllm/model_executor/models/qwen.py).

Llama-shaped (RMSNorm, rope, SwiGLU) with trust-remote-code checkpoint
names: fused biased c_attn, mlp.w1 = UP, mlp.w2 = GATE (note the swap —
reference qwen.py maps gate_up = [w2, w1]), mlp.c_proj = down.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from vllm_legacy_tpu.models.llama import LlamaForCausalLM


class QWenLMHeadModel(LlamaForCausalLM):

    def __init__(self, hf_config: Any, *, tp_size: int = 1,
                 dtype: Any = jnp.bfloat16, quant_config: Any = None):
        c = hf_config
        if not hasattr(c, "hidden_size"):
            c.hidden_size = c.n_embd
        if not hasattr(c, "num_hidden_layers"):
            c.num_hidden_layers = c.n_layer
        if not hasattr(c, "num_attention_heads"):
            c.num_attention_heads = c.n_head
        # qwen stores intermediate_size as 2x the per-branch width
        c.intermediate_size = c.intermediate_size // 2
        c.attention_bias = True
        c.rms_norm_eps = getattr(c, "layer_norm_epsilon", 1e-6)
        c.rope_theta = getattr(c, "rotary_emb_base", 10000.0)
        c.max_position_embeddings = getattr(c, "seq_length", 2048)
        super().__init__(c, tp_size=tp_size, dtype=dtype,
                         quant_config=quant_config)

    def load_weights(self, weights):
        d, nq = self.head_dim, self.num_heads

        def remap(weights):
            for name, w in weights:
                if "rotary_emb" in name:
                    continue
                name = name.removeprefix("transformer.")
                if name == "wte.weight":
                    yield "model.embed_tokens.weight", w
                elif name == "ln_f.weight":
                    yield "model.norm.weight", w
                elif name == "lm_head.weight":
                    yield name, w
                elif name.startswith("h."):
                    parts = name.split(".")
                    idx, kind = parts[1], parts[-1]
                    sub = ".".join(parts[2:-1])
                    base = f"model.layers.{idx}"
                    if sub == "ln_1":
                        yield f"{base}.input_layernorm.{kind}", w
                    elif sub == "ln_2":
                        yield f"{base}.post_attention_layernorm.{kind}", w
                    elif sub == "attn.c_attn":
                        w = np.asarray(w)
                        for j, proj in enumerate(("q_proj", "k_proj",
                                                  "v_proj")):
                            yield (f"{base}.self_attn.{proj}.{kind}",
                                   w[j * nq * d:(j + 1) * nq * d])
                    elif sub == "attn.c_proj":
                        yield f"{base}.self_attn.o_proj.{kind}", w
                    elif sub == "mlp.w1":  # up
                        yield f"{base}.mlp.up_proj.{kind}", w
                    elif sub == "mlp.w2":  # gate
                        yield f"{base}.mlp.gate_proj.{kind}", w
                    elif sub == "mlp.c_proj":
                        yield f"{base}.mlp.down_proj.{kind}", w

        return super().load_weights(remap(weights))
