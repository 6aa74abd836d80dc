"""GPT-BigCode / StarCoder / SantaCoder (reference:
vllm/model_executor/models/gpt_bigcode.py).

GPT-2 shape (learned positions, pre-LN, gelu-tanh MLP, tied head) with
MULTI-QUERY attention: c_attn emits [hidden | head_dim | head_dim]
(1 shared kv head), stored [out, in] (plain Linear, unlike GPT-2's
Conv1D).
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
from vllm_legacy_tpu.models.attention import attention
from vllm_legacy_tpu.models.base import ModelBase
from vllm_legacy_tpu.utils import round_up


class GPTBigCodeForCausalLM(ModelBase):

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
        self.multi_query = bool(getattr(c, "multi_query", True))
        self.num_kv_heads = 1 if self.multi_query else c.n_head
        self.head_dim = c.n_embd // c.n_head
        self.intermediate_size = c.n_inner or 4 * c.n_embd
        self.org_vocab_size = c.vocab_size
        self.vocab_size = round_up(c.vocab_size,
                                   embedding.VOCAB_PAD_TO * tp_size)
        self.max_position = c.n_positions
        self.ln_eps = c.layer_norm_epsilon
        self.act = get_act_fn(getattr(c, "activation_function",
                                      "gelu_pytorch_tanh"))
        self.sliding_window = None
        self.scale = self.head_dim**-0.5

    def param_shapes(self) -> Dict[str, Any]:
        h, inter, d = self.hidden_size, self.intermediate_size, \
            self.head_dim
        nkv = self.num_kv_heads

        def lin(i, o):
            return {"weight": ((i, o), self.dtype),
                    "bias": ((o, ), self.dtype)}

        def ln():
            return {"weight": ((h, ), self.dtype),
                    "bias": ((h, ), self.dtype)}

        layer = {
            "ln_1": ln(),
            "q_proj": lin(h, h),
            "k_proj": lin(h, nkv * d),
            "v_proj": lin(h, nkv * d),
            "c_proj": lin(h, h),
            "ln_2": ln(),
            "mlp_fc": lin(h, inter),
            "mlp_proj": lin(inter, h),
        }
        return {
            "wte": {"weight": ((self.vocab_size, h), self.dtype)},
            "wpe": {"weight": ((self.max_position, h), self.dtype)},
            "layers": [dict(layer) for _ in range(self.num_layers)],
            "ln_f": ln(),
            "lm_head": {"weight": ((self.vocab_size, h), self.dtype)},
        }

    def param_specs(self, params: Optional[Dict] = None) -> Dict:
        col = {"weight": P(None, "model"), "bias": P("model")}
        row = {"weight": P("model", None), "bias": P()}
        rep2 = {"weight": P(), "bias": P()}
        kv = rep2 if self.multi_query else col  # MQA kv replicated
        layer = {
            "ln_1": rep2,
            "q_proj": col,
            "k_proj": dict(kv),
            "v_proj": dict(kv),
            "c_proj": row,
            "ln_2": rep2,
            "mlp_fc": col,
            "mlp_proj": row,
        }
        return {
            "wte": {"weight": P("model", None)},
            "wpe": {"weight": P()},
            "layers": [dict(layer) for _ in range(self.num_layers)],
            "ln_f": rep2,
            "lm_head": {"weight": P("model", None)},
        }

    def forward(self, params, kv_caches, token_ids, positions, md,
                lora_indices=None):
        b, l = token_ids.shape
        h = self.hidden_size
        tok = embedding.embed(params["wte"], token_ids.reshape(-1),
                              tp_size=self.tp_size)
        pos = jnp.take(params["wpe"]["weight"],
                       jnp.clip(positions.reshape(-1), 0,
                                self.max_position - 1), axis=0)
        hidden = (tok + pos).reshape(b, l, h)
        for i in range(self.num_layers):
            p = params["layers"][i]
            x = layer_norm(hidden, p["ln_1"]["weight"], p["ln_1"]["bias"],
                           eps=self.ln_eps)
            xf = x.reshape(b * l, h)
            q = linear(xf, p["q_proj"]).reshape(b, l, -1, self.head_dim)
            k = linear(xf, p["k_proj"]).reshape(b, l, -1, self.head_dim)
            v = linear(xf, p["v_proj"]).reshape(b, l, -1, self.head_dim)
            attn_out, kv_caches = attention(q, k, v, kv_caches, md,
                                            scale=self.scale, layer_idx=i)
            o = row_parallel_linear(
                attn_out.reshape(b * l, -1), p["c_proj"],
                tp_size=self.tp_size).reshape(b, l, h)
            hidden = hidden + o
            x = layer_norm(hidden, p["ln_2"]["weight"], p["ln_2"]["bias"],
                           eps=self.ln_eps)
            mlp = self.act(linear(x.reshape(b * l, h), p["mlp_fc"]))
            mlp = row_parallel_linear(mlp, p["mlp_proj"],
                                      tp_size=self.tp_size).reshape(b, l, h)
            hidden = hidden + mlp
        hidden = layer_norm(hidden, params["ln_f"]["weight"],
                            params["ln_f"]["bias"], eps=self.ln_eps)
        return hidden, kv_caches

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        np_dtype = self._np_dtype()
        params: Dict[str, Any] = {
            "wte": {}, "wpe": {}, "ln_f": {}, "lm_head": {},
            "layers": [dict() for _ in range(self.num_layers)],
        }
        h = self.hidden_size
        kv_dim = self.num_kv_heads * self.head_dim
        for name, w in weights:
            w = np.asarray(w)
            if w.dtype.kind == "f":
                w = w.astype(np_dtype)
            name = name.removeprefix("transformer.")
            if name == "wte.weight":
                params["wte"]["weight"] = self._pad_vocab(w)
            elif name == "wpe.weight":
                params["wpe"]["weight"] = w
            elif name.startswith("ln_f."):
                params["ln_f"][name.split(".")[-1]] = w
            elif name == "lm_head.weight":
                params["lm_head"]["weight"] = self._pad_vocab(w)
            elif name.startswith("h."):
                parts = name.split(".")
                idx, kind = int(parts[1]), parts[-1]
                sub = ".".join(parts[2:-1])
                lp = params["layers"][idx]
                if sub in ("ln_1", "ln_2"):
                    lp.setdefault(sub, {})[kind] = w
                elif sub == "attn.c_attn":
                    # rows: [hidden q | kv_dim k | kv_dim v]
                    qw, kw, vw = (w[:h], w[h:h + kv_dim],
                                  w[h + kv_dim:])
                    for proj, t in (("q_proj", qw), ("k_proj", kw),
                                    ("v_proj", vw)):
                        lp.setdefault(proj, {})[kind] = (
                            t.T if kind == "weight" else t)
                elif sub == "attn.c_proj":
                    lp.setdefault("c_proj", {})[kind] = (
                        w.T if kind == "weight" else w)
                elif sub == "mlp.c_fc":
                    lp.setdefault("mlp_fc", {})[kind] = (
                        w.T if kind == "weight" else w)
                elif sub == "mlp.c_proj":
                    lp.setdefault("mlp_proj", {})[kind] = (
                        w.T if kind == "weight" else w)
        if "weight" not in params["lm_head"]:
            params["lm_head"]["weight"] = params["wte"]["weight"]
        return params
