"""Phi 1/1.5/2 (reference: vllm/model_executor/models/phi.py).

Structure: parallel attention+MLP from one pre-LN (h += attn(x) +
mlp(x)), partial neox rotary (partial_rotary_factor), biased linears
everywhere, biased lm_head, final_layernorm, untied embeddings.
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_legacy_tpu.layers import embedding
from vllm_legacy_tpu.layers.activation import get_act_fn
from vllm_legacy_tpu.layers.linear import linear, row_parallel_linear
from vllm_legacy_tpu.layers.norm import layer_norm
from vllm_legacy_tpu.layers.rotary import apply_rope, build_cos_sin_cache
from vllm_legacy_tpu.models.attention import attention
from vllm_legacy_tpu.models.base import ModelBase
from vllm_legacy_tpu.utils import round_up


class PhiForCausalLM(ModelBase):

    def __init__(self, hf_config: Any, *, tp_size: int = 1,
                 dtype: Any = jnp.bfloat16, quant_config: Any = None):
        c = hf_config
        self.hf_config = c
        self.dtype = dtype
        self.tp_size = tp_size
        self.quant_config = quant_config
        self.hidden_size = c.hidden_size
        self.num_layers = c.num_hidden_layers
        self.num_heads = c.num_attention_heads
        self.num_kv_heads = getattr(c, "num_key_value_heads",
                                    None) or c.num_attention_heads
        self.head_dim = c.hidden_size // c.num_attention_heads
        self.intermediate_size = c.intermediate_size
        self.org_vocab_size = c.vocab_size
        self.vocab_size = round_up(c.vocab_size,
                                   embedding.VOCAB_PAD_TO * tp_size)
        self.max_position = c.max_position_embeddings
        self.ln_eps = getattr(c, "layer_norm_eps", 1e-5)
        self.rotary_dim = int(self.head_dim * getattr(
            c, "partial_rotary_factor", 0.5))
        self.rope_theta = getattr(c, "rope_theta", 10000.0)
        self.act = get_act_fn(getattr(c, "hidden_act", "gelu_new"))
        self.sliding_window = None
        self.scale = self.head_dim**-0.5
        if self.num_kv_heads % tp_size != 0:
            raise ValueError("kv heads must divide tp size")

    def param_shapes(self) -> Dict[str, Any]:
        h, inter, d = self.hidden_size, self.intermediate_size, \
            self.head_dim
        nq, nkv = self.num_heads, self.num_kv_heads

        def lin(i, o):
            return {"weight": ((i, o), self.dtype),
                    "bias": ((o, ), self.dtype)}

        layer = {
            "input_layernorm": {"weight": ((h, ), self.dtype),
                                "bias": ((h, ), self.dtype)},
            "q_proj": lin(h, nq * d),
            "k_proj": lin(h, nkv * d),
            "v_proj": lin(h, nkv * d),
            "dense": lin(nq * d, h),
            "fc1": lin(h, inter),
            "fc2": lin(inter, h),
        }
        return {
            "embed": {"weight": ((self.vocab_size, h), self.dtype)},
            "layers": [dict(layer) for _ in range(self.num_layers)],
            "final_norm": {"weight": ((h, ), self.dtype),
                           "bias": ((h, ), self.dtype)},
            "lm_head": {"weight": ((self.vocab_size, h), self.dtype),
                        "bias": ((self.vocab_size, ), self.dtype)},
            "rope_cache": ((0, ), jnp.float32),
        }

    def constant_params(self):
        return {"rope_cache": build_cos_sin_cache(
            self.head_dim, self.rotary_dim, self.max_position,
            self.rope_theta)}

    def param_specs(self, params: Optional[Dict] = None) -> Dict:
        col = {"weight": P(None, "model"), "bias": P("model")}
        row = {"weight": P("model", None), "bias": P()}
        rep2 = {"weight": P(), "bias": P()}
        layer = {
            "input_layernorm": rep2,
            "q_proj": col, "k_proj": col, "v_proj": col,
            "dense": row,
            "fc1": col,
            "fc2": row,
        }
        return {
            "embed": {"weight": P("model", None)},
            "layers": [dict(layer) for _ in range(self.num_layers)],
            "final_norm": rep2,
            "lm_head": {"weight": P("model", None), "bias": P()},
            "rope_cache": P(),
        }

    def forward(self, params, kv_caches, token_ids, positions, md,
                lora_indices=None):
        b, l = token_ids.shape
        h = self.hidden_size
        hidden = embedding.embed(params["embed"], token_ids.reshape(-1),
                                 tp_size=self.tp_size).reshape(b, l, h)
        q_pos = jnp.clip(positions.reshape(-1), 0,
                         params["rope_cache"].shape[0] - 1)
        for i in range(self.num_layers):
            p = params["layers"][i]
            x = layer_norm(hidden, p["input_layernorm"]["weight"],
                           p["input_layernorm"]["bias"], eps=self.ln_eps)
            xf = x.reshape(b * l, h)
            q = linear(xf, p["q_proj"]).reshape(b * l, -1, self.head_dim)
            k = linear(xf, p["k_proj"]).reshape(b * l, -1, self.head_dim)
            v = linear(xf, p["v_proj"]).reshape(b * l, -1, self.head_dim)
            q, k = apply_rope(q, k, q_pos, params["rope_cache"],
                              rotary_dim=self.rotary_dim)
            q = q.reshape(b, l, -1, self.head_dim)
            k = k.reshape(b, l, -1, self.head_dim)
            v = v.reshape(b, l, -1, self.head_dim)
            attn_out, kv_caches = attention(q, k, v, kv_caches, md,
                                            scale=self.scale, layer_idx=i)
            attn_out = row_parallel_linear(
                attn_out.reshape(b * l, -1), p["dense"],
                tp_size=self.tp_size).reshape(b, l, h)
            mlp = self.act(linear(xf, p["fc1"]))
            mlp = row_parallel_linear(mlp, p["fc2"],
                                      tp_size=self.tp_size).reshape(b, l, h)
            hidden = hidden + attn_out + mlp
        hidden = layer_norm(hidden, params["final_norm"]["weight"],
                            params["final_norm"]["bias"], eps=self.ln_eps)
        return hidden, kv_caches

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        np_dtype = self._np_dtype()
        params: Dict[str, Any] = {
            "embed": {}, "final_norm": {}, "lm_head": {},
            "layers": [dict() for _ in range(self.num_layers)],
        }
        name_map = {
            "self_attn.q_proj": "q_proj", "self_attn.k_proj": "k_proj",
            "self_attn.v_proj": "v_proj", "self_attn.dense": "dense",
            "mlp.fc1": "fc1", "mlp.fc2": "fc2",
        }
        for name, w in weights:
            if "rotary_emb" in name:
                continue
            w = np.asarray(w)
            if w.dtype.kind == "f":
                w = w.astype(np_dtype)
            if name == "model.embed_tokens.weight":
                params["embed"]["weight"] = self._pad_vocab(w)
            elif name == "lm_head.weight":
                params["lm_head"]["weight"] = self._pad_vocab(w)
            elif name == "lm_head.bias":
                if w.shape[0] < self.vocab_size:
                    w = np.pad(w, (0, self.vocab_size - w.shape[0]))
                params["lm_head"]["bias"] = w
            elif name.startswith("model.final_layernorm."):
                params["final_norm"][name.split(".")[-1]] = w
            elif name.startswith("model.layers."):
                parts = name.split(".")
                idx, kind = int(parts[2]), parts[-1]
                sub = ".".join(parts[3:-1])
                lp = params["layers"][idx]
                if sub == "input_layernorm":
                    lp.setdefault(sub, {})[kind] = w
                elif sub in name_map:
                    lp.setdefault(name_map[sub], {})[kind] = (
                        w.T if kind == "weight" else w)
        params.update(self.constant_params())
        return params
