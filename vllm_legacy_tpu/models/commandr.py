"""Cohere Command-R (reference: vllm/model_executor/models/commandr.py).

Structure: parallel attention+MLP from one bias-free LayerNorm
(h += attn(x) + mlp(x)), INTERLEAVED rope (is_neox_style=False),
optional per-head q/k norm (use_qk_norm), SwiGLU MLP, logit_scale on
the tied lm head.
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_legacy_tpu.layers import embedding
from vllm_legacy_tpu.layers.activation import silu_and_mul
from vllm_legacy_tpu.layers.linear import linear, row_parallel_linear
from vllm_legacy_tpu.layers.norm import layer_norm
from vllm_legacy_tpu.layers.rotary import apply_rope, build_cos_sin_cache
from vllm_legacy_tpu.models.attention import attention
from vllm_legacy_tpu.models.base import ModelBase
from vllm_legacy_tpu.utils import round_up


class CohereForCausalLM(ModelBase):

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
        self.rope_theta = getattr(c, "rope_theta", 10000.0)
        self.use_qk_norm = bool(getattr(c, "use_qk_norm", False))
        self.logit_scale = float(getattr(c, "logit_scale", 1.0))
        self.sliding_window = None
        self.scale = self.head_dim**-0.5
        if self.num_kv_heads % tp_size != 0:
            raise ValueError("kv heads must divide tp size")

    def param_shapes(self) -> Dict[str, Any]:
        h, inter, d = self.hidden_size, self.intermediate_size, \
            self.head_dim
        nq, nkv = self.num_heads, self.num_kv_heads
        layer = {
            "input_layernorm": {"weight": ((h, ), self.dtype)},
            "q_proj": {"weight": ((h, nq * d), self.dtype)},
            "k_proj": {"weight": ((h, nkv * d), self.dtype)},
            "v_proj": {"weight": ((h, nkv * d), self.dtype)},
            "o_proj": {"weight": ((nq * d, h), self.dtype)},
            "gate_proj": {"weight": ((h, inter), self.dtype)},
            "up_proj": {"weight": ((h, inter), self.dtype)},
            "down_proj": {"weight": ((inter, h), self.dtype)},
        }
        if self.use_qk_norm:
            layer["q_norm"] = {"weight": ((nq, d), self.dtype)}
            layer["k_norm"] = {"weight": ((nkv, d), self.dtype)}
        return {
            "embed": {"weight": ((self.vocab_size, h), self.dtype)},
            "layers": [dict(layer) for _ in range(self.num_layers)],
            "norm": {"weight": ((h, ), self.dtype)},
            "lm_head": {"weight": ((self.vocab_size, h), self.dtype)},
            "rope_cache": ((0, ), jnp.float32),
        }

    def constant_params(self):
        return {"rope_cache": build_cos_sin_cache(
            self.head_dim, self.head_dim, self.max_position,
            self.rope_theta)}

    def param_specs(self, params: Optional[Dict] = None) -> Dict:
        col = {"weight": P(None, "model")}
        row = {"weight": P("model", None)}
        if params is None:
            params = self.param_shapes()
        layer_specs = []
        for lp in params["layers"]:
            spec = {
                "input_layernorm": {"weight": P()},
                "q_proj": col, "k_proj": col, "v_proj": col,
                "o_proj": row,
                "gate_proj": col, "up_proj": col,
                "down_proj": row,
            }
            if "q_norm" in lp:
                spec["q_norm"] = {"weight": P("model", None)}
                spec["k_norm"] = {"weight": P("model", None)}
            layer_specs.append(spec)
        return {
            "embed": {"weight": P("model", None)},
            "layers": layer_specs,
            "norm": {"weight": P()},
            "lm_head": {"weight": P("model", None)},
            "rope_cache": P(),
        }

    def _ln(self, x, w):
        return layer_norm(x, w, None, eps=self.ln_eps)

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
            x = self._ln(hidden, p["input_layernorm"]["weight"])
            xf = x.reshape(b * l, h)
            q = linear(xf, p["q_proj"]).reshape(b * l, -1, self.head_dim)
            k = linear(xf, p["k_proj"]).reshape(b * l, -1, self.head_dim)
            v = linear(xf, p["v_proj"]).reshape(b * l, -1, self.head_dim)
            if self.use_qk_norm:
                # per-head LayerNorm over head_dim (commandr.py qk_norm)
                q = layer_norm(q, None, eps=self.ln_eps) * \
                    p["q_norm"]["weight"][None]
                k = layer_norm(k, None, eps=self.ln_eps) * \
                    p["k_norm"]["weight"][None]
            q, k = apply_rope(q, k, q_pos, params["rope_cache"],
                              rotary_dim=self.head_dim,
                              is_neox_style=False)
            q = q.reshape(b, l, -1, self.head_dim)
            k = k.reshape(b, l, -1, self.head_dim)
            v = v.reshape(b, l, -1, self.head_dim)
            attn_out, kv_caches = attention(q, k, v, kv_caches, md,
                                            scale=self.scale, layer_idx=i)
            attn_out = row_parallel_linear(
                attn_out.reshape(b * l, -1), p["o_proj"],
                tp_size=self.tp_size).reshape(b, l, h)
            gate = linear(xf, p["gate_proj"])
            up = linear(xf, p["up_proj"])
            mlp = silu_and_mul(jnp.concatenate([gate, up], axis=-1))
            mlp = row_parallel_linear(mlp, p["down_proj"],
                                      tp_size=self.tp_size).reshape(b, l, h)
            hidden = hidden + attn_out + mlp
        hidden = self._ln(hidden, params["norm"]["weight"])
        return hidden, kv_caches

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        np_dtype = self._np_dtype()
        params: Dict[str, Any] = {
            "embed": {}, "norm": {}, "lm_head": {},
            "layers": [dict() for _ in range(self.num_layers)],
        }
        for name, w in weights:
            if "rotary_emb" in name:
                continue
            w = np.asarray(w)
            if w.dtype.kind == "f":
                w = w.astype(np_dtype)
            if name == "model.embed_tokens.weight":
                params["embed"]["weight"] = self._pad_vocab(w)
            elif name == "model.norm.weight":
                params["norm"]["weight"] = w
            elif name.startswith("model.layers."):
                parts = name.split(".")
                idx, kind = int(parts[2]), parts[-1]
                sub = parts[3]
                lp = params["layers"][idx]
                if sub == "input_layernorm":
                    lp.setdefault(sub, {})[kind] = w
                elif sub in ("self_attn", "mlp"):
                    proj = parts[4]
                    if proj in ("q_norm", "k_norm"):
                        nh = (self.num_heads if proj == "q_norm" else
                              self.num_kv_heads)
                        lp.setdefault(proj, {})[kind] = w.reshape(
                            nh, self.head_dim)
                    else:
                        lp.setdefault(proj, {})[kind] = (
                            w.T if kind == "weight" else w)
        # Command-R always ties the head to the embedding
        params["lm_head"]["weight"] = params["embed"]["weight"]
        params.update(self.constant_params())
        return params
