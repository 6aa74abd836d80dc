"""InternLM2 (reference: vllm/model_executor/models/internlm2.py).

Llama architecture with trust-remote-code weight names: tok_embeddings,
attention.wqkv fused GROUPED-interleaved ([nkv, g+2, d] per group),
attention.wo, feed_forward.w1/w3/w2 (gate/up/down), attention_norm /
ffn_norm, output head.
"""
from __future__ import annotations

import numpy as np

from vllm_legacy_tpu.models.llama import LlamaForCausalLM


class InternLM2ForCausalLM(LlamaForCausalLM):

    def load_weights(self, weights):
        d = self.head_dim
        nq, nkv = self.num_heads, self.num_kv_heads
        g = nq // nkv

        def remap(weights):
            for name, w in weights:
                if "rotary_emb" in name:
                    continue
                if name == "model.tok_embeddings.weight":
                    yield "model.embed_tokens.weight", w
                elif name == "output.weight":
                    yield "lm_head.weight", w
                elif name == "model.norm.weight":
                    yield name, w
                elif name.startswith("model.layers."):
                    parts = name.split(".")
                    idx, kind = parts[2], parts[-1]
                    sub = ".".join(parts[3:-1])
                    base = f"model.layers.{idx}"
                    if sub == "attention_norm":
                        yield f"{base}.input_layernorm.{kind}", w
                    elif sub == "ffn_norm":
                        yield (f"{base}.post_attention_layernorm.{kind}",
                               w)
                    elif sub == "attention.wqkv":
                        # [nkv, g+2, d, hidden] grouped interleaving
                        # (reference: internlm2.py load_weights wqkv)
                        w = np.asarray(w)
                        grp = w.reshape(nkv, g + 2, d, *w.shape[1:])
                        yield (f"{base}.self_attn.q_proj.{kind}",
                               grp[:, :g].reshape(nq * d, *w.shape[1:]))
                        yield (f"{base}.self_attn.k_proj.{kind}",
                               grp[:, g].reshape(nkv * d, *w.shape[1:]))
                        yield (f"{base}.self_attn.v_proj.{kind}",
                               grp[:, g + 1].reshape(nkv * d,
                                                     *w.shape[1:]))
                    elif sub == "attention.wo":
                        yield f"{base}.self_attn.o_proj.{kind}", w
                    elif sub == "feed_forward.w1":
                        yield f"{base}.mlp.gate_proj.{kind}", w
                    elif sub == "feed_forward.w3":
                        yield f"{base}.mlp.up_proj.{kind}", w
                    elif sub == "feed_forward.w2":
                        yield f"{base}.mlp.down_proj.{kind}", w

        return super().load_weights(remap(weights))
