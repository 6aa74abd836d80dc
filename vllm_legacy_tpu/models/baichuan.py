"""Baichuan 1/2, 7B/13B (reference: vllm/model_executor/models/
baichuan.py).

Llama-shaped with a fused W_pack qkv (plain q|k|v concat). 7B
(hidden 4096) uses rope; 13B (hidden 5120) uses ALiBi and no rope — the
reference selects by hidden size (baichuan.py BaichuanForCausalLM).
Baichuan-2 normalizes the lm_head rows at load (NormHead).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from vllm_legacy_tpu.models.base import alibi_slopes
from vllm_legacy_tpu.models.llama import LlamaForCausalLM


class BaiChuanForCausalLM(LlamaForCausalLM):
    """7B variant: rope."""
    use_alibi = False

    def __init__(self, hf_config: Any, *, tp_size: int = 1,
                 dtype: Any = jnp.bfloat16, quant_config: Any = None):
        c = hf_config
        c.max_position_embeddings = getattr(
            c, "model_max_length", getattr(c, "max_position_embeddings",
                                           4096))
        super().__init__(c, tp_size=tp_size, dtype=dtype,
                         quant_config=quant_config)

    def param_shapes(self):
        shapes = super().param_shapes()
        if self.use_alibi:
            shapes["alibi_slopes"] = ((self.num_heads, ), jnp.float32)
        return shapes

    def param_specs(self, params=None):
        from jax.sharding import PartitionSpec as P
        specs = super().param_specs(params)
        if self.use_alibi:
            specs["alibi_slopes"] = P("model")
        return specs

    def constant_params(self):
        if self.use_alibi:
            return {"alibi_slopes": alibi_slopes(self.num_heads)}
        return {}

    def load_weights(self, weights):
        d, nq = self.head_dim, self.num_heads

        def remap(weights):
            for name, w in weights:
                if ".self_attn.W_pack." in name:
                    w = np.asarray(w)
                    for j, proj in enumerate(("q_proj", "k_proj",
                                              "v_proj")):
                        yield (name.replace("W_pack", proj),
                               w[j * nq * d:(j + 1) * nq * d])
                elif name == "lm_head.weight":
                    # Baichuan-2 NormHead: weight rows are normalized at
                    # inference (reference: baichuan.py NormHead note)
                    w = np.asarray(w, np.float32)
                    norms = np.linalg.norm(w, axis=1, keepdims=True)
                    if norms.max() > 2.0:  # Baichuan2 ckpt (unnormalized)
                        w = w / np.maximum(norms, 1e-7)
                    yield name, w
                else:
                    yield name, w

        params = super().load_weights(remap(weights))
        params.update(self.constant_params())
        return params


class BaichuanForCausalLM(BaiChuanForCausalLM):
    """13B-style arch name: ALiBi unless hidden_size says 7B."""

    def __init__(self, hf_config: Any, **kw):
        self.use_alibi = hf_config.hidden_size != 4096
        super().__init__(hf_config, **kw)
