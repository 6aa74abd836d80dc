"""BLOOM (reference: vllm/model_executor/models/bloom.py).

Structure: ALiBi positional bias (no rope), embedding layernorm after the
token embedding, sequential pre-LN blocks, fused query_key_value
interleaved PER HEAD ([H, 3, d] rows), gelu MLP, tied lm head.

ALiBi slopes live in the param pytree (spec P("model")) so tensor
parallelism slices each shard's own head slopes automatically.
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
from vllm_legacy_tpu.models.base import ModelBase, alibi_slopes
from vllm_legacy_tpu.utils import round_up


class BloomForCausalLM(ModelBase):

    def __init__(self, hf_config: Any, *, tp_size: int = 1,
                 dtype: Any = jnp.bfloat16, quant_config: Any = None):
        c = hf_config
        self.hf_config = c
        self.dtype = dtype
        self.tp_size = tp_size
        self.quant_config = quant_config
        self.hidden_size = c.hidden_size
        self.num_layers = c.n_layer
        self.num_heads = c.n_head
        self.num_kv_heads = c.n_head
        self.head_dim = c.hidden_size // c.n_head
        self.intermediate_size = 4 * c.hidden_size
        self.org_vocab_size = c.vocab_size
        self.vocab_size = round_up(c.vocab_size,
                                   embedding.VOCAB_PAD_TO * tp_size)
        self.ln_eps = c.layer_norm_epsilon
        self.act = get_act_fn("gelu")
        self.sliding_window = None
        self.scale = self.head_dim**-0.5
        if self.num_kv_heads % tp_size != 0:
            raise ValueError("n_head must divide tp size")

    def param_shapes(self) -> Dict[str, Any]:
        h, inter = self.hidden_size, self.intermediate_size

        def lin(i, o):
            return {"weight": ((i, o), self.dtype),
                    "bias": ((o, ), self.dtype)}

        def ln():
            return {"weight": ((h, ), self.dtype),
                    "bias": ((h, ), self.dtype)}

        layer = {
            "input_layernorm": ln(),
            "q_proj": lin(h, h),
            "k_proj": lin(h, h),
            "v_proj": lin(h, h),
            "dense": lin(h, h),
            "post_attention_layernorm": ln(),
            "mlp_fc": lin(h, inter),
            "mlp_proj": lin(inter, h),
        }
        return {
            "embed": {"weight": ((self.vocab_size, h), self.dtype)},
            "embed_norm": ln(),
            "layers": [dict(layer) for _ in range(self.num_layers)],
            "ln_f": ln(),
            "lm_head": {"weight": ((self.vocab_size, h), self.dtype)},
            "alibi_slopes": ((self.num_heads, ), jnp.float32),
        }

    def constant_params(self):
        return {"alibi_slopes": alibi_slopes(self.num_heads)}

    def param_specs(self, params: Optional[Dict] = None) -> Dict:
        col = {"weight": P(None, "model"), "bias": P("model")}
        row = {"weight": P("model", None), "bias": P()}
        rep2 = {"weight": P(), "bias": P()}
        layer = {
            "input_layernorm": rep2,
            "q_proj": col, "k_proj": col, "v_proj": col,
            "dense": row,
            "post_attention_layernorm": rep2,
            "mlp_fc": col,
            "mlp_proj": row,
        }
        return {
            "embed": {"weight": P("model", None)},
            "embed_norm": rep2,
            "layers": [dict(layer) for _ in range(self.num_layers)],
            "ln_f": rep2,
            "lm_head": {"weight": P("model", None)},
            "alibi_slopes": P("model"),
        }

    def forward(self, params, kv_caches, token_ids, positions, md,
                lora_indices=None):
        b, l = token_ids.shape
        h = self.hidden_size
        hidden = embedding.embed(params["embed"], token_ids.reshape(-1),
                                 tp_size=self.tp_size).reshape(b, l, h)
        hidden = layer_norm(hidden, params["embed_norm"]["weight"],
                            params["embed_norm"]["bias"], eps=self.ln_eps)
        slopes = params["alibi_slopes"]
        for i in range(self.num_layers):
            p = params["layers"][i]
            x = layer_norm(hidden, p["input_layernorm"]["weight"],
                           p["input_layernorm"]["bias"], eps=self.ln_eps)
            xf = x.reshape(b * l, h)
            q = linear(xf, p["q_proj"]).reshape(b, l, -1, self.head_dim)
            k = linear(xf, p["k_proj"]).reshape(b, l, -1, self.head_dim)
            v = linear(xf, p["v_proj"]).reshape(b, l, -1, self.head_dim)
            attn_out, kv_caches = attention(q, k, v, kv_caches, md,
                                            scale=self.scale, layer_idx=i,
                                            alibi_slopes=slopes)
            attn_out = row_parallel_linear(
                attn_out.reshape(b * l, -1), p["dense"],
                tp_size=self.tp_size).reshape(b, l, h)
            hidden = hidden + attn_out
            x = layer_norm(hidden, p["post_attention_layernorm"]["weight"],
                           p["post_attention_layernorm"]["bias"],
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
            "embed": {}, "embed_norm": {}, "ln_f": {}, "lm_head": {},
            "layers": [dict() for _ in range(self.num_layers)],
        }
        nq, d = self.num_heads, self.head_dim
        for name, w in weights:
            w = np.asarray(w)
            if w.dtype.kind == "f":
                w = w.astype(np_dtype)
            name = name.removeprefix("transformer.")
            if name == "word_embeddings.weight":
                params["embed"]["weight"] = self._pad_vocab(w)
            elif name.startswith("word_embeddings_layernorm."):
                params["embed_norm"][name.split(".")[-1]] = w
            elif name.startswith("ln_f."):
                params["ln_f"][name.split(".")[-1]] = w
            elif name == "lm_head.weight":
                params["lm_head"]["weight"] = self._pad_vocab(w)
            elif name.startswith("h."):
                parts = name.split(".")
                idx, kind = int(parts[1]), parts[-1]
                sub = ".".join(parts[2:-1])
                lp = params["layers"][idx]
                if sub in ("input_layernorm", "post_attention_layernorm"):
                    lp.setdefault(sub, {})[kind] = w
                elif sub == "self_attention.query_key_value":
                    # [H, 3, d] row interleaving (reference: bloom.py
                    # _reorder note)
                    if kind == "weight":
                        w3 = w.reshape(nq, 3, d, self.hidden_size)
                        for j, proj in enumerate(("q_proj", "k_proj",
                                                  "v_proj")):
                            lp.setdefault(proj, {})["weight"] = (
                                w3[:, j].reshape(nq * d, -1).T)
                    else:
                        b3 = w.reshape(nq, 3, d)
                        for j, proj in enumerate(("q_proj", "k_proj",
                                                  "v_proj")):
                            lp.setdefault(proj, {})["bias"] = (
                                b3[:, j].reshape(-1))
                elif sub == "self_attention.dense":
                    lp.setdefault("dense", {})[kind] = (
                        w.T if kind == "weight" else w)
                elif sub == "mlp.dense_h_to_4h":
                    lp.setdefault("mlp_fc", {})[kind] = (
                        w.T if kind == "weight" else w)
                elif sub == "mlp.dense_4h_to_h":
                    lp.setdefault("mlp_proj", {})[kind] = (
                        w.T if kind == "weight" else w)
        if "weight" not in params["lm_head"]:
            params["lm_head"]["weight"] = params["embed"]["weight"]
        params.update(self.constant_params())
        return params
