"""Jais (core42) (reference: vllm/model_executor/models/jais.py).

GPT-2 lineage with muP scalings: ALiBi (no wpe), SwiGLU MLP
(x1=c_fc(x), x2=c_fc2(x), x1*silu(x2), jais.py:50), embeddings *
embeddings_scale, logits * width_scale, and optionally qk scaled by
1/d instead of 1/sqrt(d) (mup_scale_qk_dot_by_d). Conv1D-style [in,out]
checkpoint tensors (no transpose).
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_legacy_tpu.layers import embedding
from vllm_legacy_tpu.layers.linear import linear, row_parallel_linear
from vllm_legacy_tpu.layers.norm import layer_norm
from vllm_legacy_tpu.models.attention import attention
from vllm_legacy_tpu.models.base import ModelBase, alibi_slopes
from vllm_legacy_tpu.utils import round_up


class JAISLMHeadModel(ModelBase):

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
        self.ln_eps = getattr(c, "layer_norm_epsilon", 1e-5)
        self.swiglu = getattr(c, "activation_function",
                              "swiglu") == "swiglu"
        scale_by_d = getattr(c, "mup_scale_qk_dot_by_d",
                             getattr(c, "scale_qk_dot_by_d", False))
        self.scale = float(self.head_dim)**(-1.0 if scale_by_d else -0.5)
        self.embeddings_scale = getattr(
            c, "embeddings_scale", getattr(c, "mup_embeddings_scale", 1.0))
        self.logit_scale = float(
            getattr(c, "width_scale", None)
            or getattr(c, "mup_output_alpha", 1.0) *
            getattr(c, "mup_width_scale", 1.0))
        self.sliding_window = None

    def param_shapes(self) -> Dict[str, Any]:
        h, inter = self.hidden_size, self.intermediate_size

        def lin(i, o):
            return {"weight": ((i, o), self.dtype),
                    "bias": ((o, ), self.dtype)}

        def ln():
            return {"weight": ((h, ), self.dtype),
                    "bias": ((h, ), self.dtype)}

        layer = {
            "ln_1": ln(),
            "q_proj": lin(h, h),
            "k_proj": lin(h, h),
            "v_proj": lin(h, h),
            "c_proj": lin(h, h),
            "ln_2": ln(),
            "c_fc": lin(h, inter),
            "c_proj_mlp": lin(inter, h),
        }
        if self.swiglu:
            layer["c_fc2"] = lin(h, inter)
        return {
            "wte": {"weight": ((self.vocab_size, h), self.dtype)},
            "layers": [dict(layer) for _ in range(self.num_layers)],
            "ln_f": ln(),
            "lm_head": {"weight": ((self.vocab_size, h), self.dtype)},
            "alibi_slopes": ((self.num_heads, ), jnp.float32),
        }

    lm_head_key = "lm_head"

    def constant_params(self):
        return {"alibi_slopes": alibi_slopes(self.num_heads)}

    def param_specs(self, params: Optional[Dict] = None) -> Dict:
        col = {"weight": P(None, "model"), "bias": P("model")}
        row = {"weight": P("model", None), "bias": P()}
        rep2 = {"weight": P(), "bias": P()}
        layer = {
            "ln_1": rep2,
            "q_proj": col, "k_proj": col, "v_proj": col,
            "c_proj": row,
            "ln_2": rep2,
            "c_fc": col,
            "c_proj_mlp": row,
        }
        if self.swiglu:
            layer["c_fc2"] = col
        return {
            "wte": {"weight": P("model", None)},
            "layers": [dict(layer) for _ in range(self.num_layers)],
            "ln_f": rep2,
            "lm_head": {"weight": P("model", None)},
            "alibi_slopes": P("model"),
        }

    def forward(self, params, kv_caches, token_ids, positions, md,
                lora_indices=None):
        b, l = token_ids.shape
        h = self.hidden_size
        hidden = embedding.embed(params["wte"], token_ids.reshape(-1),
                                 tp_size=self.tp_size)
        hidden = (hidden * self.embeddings_scale).astype(hidden.dtype)
        hidden = hidden.reshape(b, l, h)
        slopes = params["alibi_slopes"]
        for i in range(self.num_layers):
            p = params["layers"][i]
            x = layer_norm(hidden, p["ln_1"]["weight"], p["ln_1"]["bias"],
                           eps=self.ln_eps)
            xf = x.reshape(b * l, h)
            q = linear(xf, p["q_proj"]).reshape(b, l, -1, self.head_dim)
            k = linear(xf, p["k_proj"]).reshape(b, l, -1, self.head_dim)
            v = linear(xf, p["v_proj"]).reshape(b, l, -1, self.head_dim)
            attn_out, kv_caches = attention(q, k, v, kv_caches, md,
                                            scale=self.scale, layer_idx=i,
                                            alibi_slopes=slopes)
            o = row_parallel_linear(
                attn_out.reshape(b * l, -1), p["c_proj"],
                tp_size=self.tp_size).reshape(b, l, h)
            hidden = hidden + o
            x = layer_norm(hidden, p["ln_2"]["weight"], p["ln_2"]["bias"],
                           eps=self.ln_eps)
            xf = x.reshape(b * l, h)
            x1 = linear(xf, p["c_fc"])
            if self.swiglu:
                x2 = linear(xf, p["c_fc2"])
                act = x1 * jax.nn.silu(x2)
            else:
                act = jax.nn.gelu(x1)
            mlp = row_parallel_linear(act, p["c_proj_mlp"],
                                      tp_size=self.tp_size).reshape(b, l, h)
            hidden = hidden + mlp
        hidden = layer_norm(hidden, params["ln_f"]["weight"],
                            params["ln_f"]["bias"], eps=self.ln_eps)
        return hidden, kv_caches

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        np_dtype = self._np_dtype()
        params: Dict[str, Any] = {
            "wte": {}, "ln_f": {}, "lm_head": {},
            "layers": [dict() for _ in range(self.num_layers)],
        }
        h = self.hidden_size
        for name, w in weights:
            if "relative_pe" in name:
                continue
            w = np.asarray(w)
            if w.dtype.kind == "f":
                w = w.astype(np_dtype)
            name = name.removeprefix("transformer.")
            if name == "wte.weight":
                params["wte"]["weight"] = self._pad_vocab(w)
            elif name == "lm_head.weight":
                params["lm_head"]["weight"] = self._pad_vocab(w)
            elif name.startswith("ln_f."):
                params["ln_f"][name.split(".")[-1]] = w
            elif name.startswith("h."):
                parts = name.split(".")
                idx, kind = int(parts[1]), parts[-1]
                sub = ".".join(parts[2:-1])
                lp = params["layers"][idx]
                # Conv1D tensors are already [in, out]
                if sub in ("ln_1", "ln_2"):
                    lp.setdefault(sub, {})[kind] = w
                elif sub == "attn.c_attn":
                    if kind == "weight":
                        q, k2, v = np.split(w, 3, axis=-1)
                    else:
                        q, k2, v = np.split(w, 3)
                    lp.setdefault("q_proj", {})[kind] = q
                    lp.setdefault("k_proj", {})[kind] = k2
                    lp.setdefault("v_proj", {})[kind] = v
                elif sub == "attn.c_proj":
                    lp.setdefault("c_proj", {})[kind] = w
                elif sub == "mlp.c_fc":
                    lp.setdefault("c_fc", {})[kind] = w
                elif sub == "mlp.c_fc2":
                    lp.setdefault("c_fc2", {})[kind] = w
                elif sub == "mlp.c_proj":
                    lp.setdefault("c_proj_mlp", {})[kind] = w
        if "weight" not in params["lm_head"]:
            params["lm_head"]["weight"] = params["wte"]["weight"]
        params.update(self.constant_params())
        return params
