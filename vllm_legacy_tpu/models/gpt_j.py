"""GPT-J (reference: vllm/model_executor/models/gpt_j.py).

Structure: parallel attention+MLP from ONE pre-LN (h += attn(x) +
mlp(x)), partial rotary with GPT-J INTERLEAVED rope style
(is_neox_style=False), un-biased q/k/v/out projections, biased MLP,
lm_head WITH bias, untied embeddings.
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


class GPTJForCausalLM(ModelBase):

    def __init__(self, hf_config: Any, *, tp_size: int = 1,
                 dtype: Any = jnp.bfloat16, quant_config: Any = None):
        c = hf_config
        self.hf_config = c
        self.dtype = dtype
        self.tp_size = tp_size
        self.quant_config = quant_config
        self.hidden_size = c.n_embd
        self.num_layers = c.n_layer
        self.num_heads = c.n_head
        self.num_kv_heads = c.n_head
        self.head_dim = c.n_embd // c.n_head
        self.intermediate_size = c.n_inner or 4 * c.n_embd
        self.org_vocab_size = c.vocab_size
        self.vocab_size = round_up(c.vocab_size,
                                   embedding.VOCAB_PAD_TO * tp_size)
        self.max_position = c.n_positions
        self.ln_eps = c.layer_norm_epsilon
        self.rotary_dim = getattr(c, "rotary_dim", None) or self.head_dim
        self.act = get_act_fn(getattr(c, "activation_function", "gelu_new"))
        self.sliding_window = None
        self.scale = self.head_dim**-0.5
        if self.num_kv_heads % tp_size != 0:
            raise ValueError("n_head must divide tp size")

    def param_shapes(self) -> Dict[str, Any]:
        h, inter = self.hidden_size, self.intermediate_size

        def lin(i, o, bias):
            t = {"weight": ((i, o), self.dtype)}
            if bias:
                t["bias"] = ((o, ), self.dtype)
            return t

        layer = {
            "ln_1": {"weight": ((h, ), self.dtype),
                     "bias": ((h, ), self.dtype)},
            "q_proj": lin(h, h, False),
            "k_proj": lin(h, h, False),
            "v_proj": lin(h, h, False),
            "out_proj": lin(h, h, False),
            "fc_in": lin(h, inter, True),
            "fc_out": lin(inter, h, True),
        }
        return {
            "embed": {"weight": ((self.vocab_size, h), self.dtype)},
            "layers": [dict(layer) for _ in range(self.num_layers)],
            "ln_f": {"weight": ((h, ), self.dtype),
                     "bias": ((h, ), self.dtype)},
            "lm_head": {"weight": ((self.vocab_size, h), self.dtype),
                        "bias": ((self.vocab_size, ), self.dtype)},
            "rope_cache": ((0, ), jnp.float32),
        }

    def constant_params(self):
        return {"rope_cache": build_cos_sin_cache(
            self.head_dim, self.rotary_dim, self.max_position, 10000.0)}

    def param_specs(self, params: Optional[Dict] = None) -> Dict:
        col = {"weight": P(None, "model")}
        row = {"weight": P("model", None)}
        rep2 = {"weight": P(), "bias": P()}
        layer = {
            "ln_1": rep2,
            "q_proj": col, "k_proj": col, "v_proj": col,
            "out_proj": row,
            "fc_in": {"weight": P(None, "model"), "bias": P("model")},
            "fc_out": {"weight": P("model", None), "bias": P()},
        }
        return {
            "embed": {"weight": P("model", None)},
            "layers": [dict(layer) for _ in range(self.num_layers)],
            "ln_f": rep2,
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
            x = layer_norm(hidden, p["ln_1"]["weight"], p["ln_1"]["bias"],
                           eps=self.ln_eps)
            xf = x.reshape(b * l, h)
            q = linear(xf, p["q_proj"]).reshape(b * l, -1, self.head_dim)
            k = linear(xf, p["k_proj"]).reshape(b * l, -1, self.head_dim)
            v = linear(xf, p["v_proj"]).reshape(b * l, -1, self.head_dim)
            q, k = apply_rope(q, k, q_pos, params["rope_cache"],
                              rotary_dim=self.rotary_dim,
                              is_neox_style=False)
            q = q.reshape(b, l, -1, self.head_dim)
            k = k.reshape(b, l, -1, self.head_dim)
            v = v.reshape(b, l, -1, self.head_dim)
            attn_out, kv_caches = attention(q, k, v, kv_caches, md,
                                            scale=self.scale, layer_idx=i)
            attn_out = row_parallel_linear(
                attn_out.reshape(b * l, -1), p["out_proj"],
                tp_size=self.tp_size).reshape(b, l, h)
            mlp = self.act(linear(xf, p["fc_in"]))
            mlp = row_parallel_linear(mlp, p["fc_out"],
                                      tp_size=self.tp_size).reshape(b, l, h)
            hidden = hidden + attn_out + mlp
        hidden = layer_norm(hidden, params["ln_f"]["weight"],
                            params["ln_f"]["bias"], eps=self.ln_eps)
        return hidden, kv_caches

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        np_dtype = self._np_dtype()
        params: Dict[str, Any] = {
            "embed": {}, "ln_f": {}, "lm_head": {},
            "layers": [dict() for _ in range(self.num_layers)],
        }
        name_map = {
            "attn.q_proj": "q_proj", "attn.k_proj": "k_proj",
            "attn.v_proj": "v_proj", "attn.out_proj": "out_proj",
            "mlp.fc_in": "fc_in", "mlp.fc_out": "fc_out",
        }
        for name, w in weights:
            if name.endswith((".attn.bias", ".attn.masked_bias")):
                continue
            w = np.asarray(w)
            if w.dtype.kind == "f":
                w = w.astype(np_dtype)
            if name == "transformer.wte.weight":
                params["embed"]["weight"] = self._pad_vocab(w)
            elif name == "lm_head.weight":
                params["lm_head"]["weight"] = self._pad_vocab(w)
            elif name == "lm_head.bias":
                if w.shape[0] < self.vocab_size:
                    w = np.pad(w, (0, self.vocab_size - w.shape[0]))
                params["lm_head"]["bias"] = w
            elif name.startswith("transformer.ln_f."):
                params["ln_f"][name.split(".")[-1]] = w
            elif name.startswith("transformer.h."):
                parts = name.split(".")
                idx, kind = int(parts[2]), parts[-1]
                sub = ".".join(parts[3:-1])
                lp = params["layers"][idx]
                if sub == "ln_1":
                    lp.setdefault("ln_1", {})[kind] = w
                elif sub in name_map:
                    lp.setdefault(name_map[sub], {})[kind] = (
                        w.T if kind == "weight" else w)
        if "weight" not in params["lm_head"]:
            params["lm_head"]["weight"] = params["embed"]["weight"]
        params.update(self.constant_params())
        return params
