"""GPT-NeoX / Pythia (reference: vllm/model_executor/models/gpt_neox.py).

Structure: pre-LN blocks with optional PARALLEL residual
(use_parallel_residual: h += attn(ln1(h)) + mlp(ln2(h))), fused
query_key_value interleaved PER HEAD in the checkpoint (unpacked to
separate q/k/v at load for clean TP sharding), partial rotary
(rotary_pct), biased linears, untied embed_out head.
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


class GPTNeoXForCausalLM(ModelBase):

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
        self.num_kv_heads = c.num_attention_heads
        self.head_dim = c.hidden_size // c.num_attention_heads
        self.intermediate_size = c.intermediate_size
        self.org_vocab_size = c.vocab_size
        self.vocab_size = round_up(c.vocab_size,
                                   embedding.VOCAB_PAD_TO * tp_size)
        self.max_position = c.max_position_embeddings
        self.ln_eps = c.layer_norm_eps
        self.rotary_dim = int(self.head_dim * getattr(c, "rotary_pct", 1.0))
        self.rope_theta = getattr(c, "rotary_emb_base", 10000.0)
        self.parallel_residual = bool(
            getattr(c, "use_parallel_residual", True))
        self.act = get_act_fn(getattr(c, "hidden_act", "gelu"))
        self.sliding_window = None
        self.scale = self.head_dim**-0.5
        if self.num_kv_heads % tp_size != 0:
            raise ValueError("num heads must divide tp size")

    def param_shapes(self) -> Dict[str, Any]:
        h, inter, d = self.hidden_size, self.intermediate_size, \
            self.head_dim
        nq = self.num_heads

        def lin(i, o):
            return {"weight": ((i, o), self.dtype),
                    "bias": ((o, ), self.dtype)}

        def ln():
            return {"weight": ((h, ), self.dtype),
                    "bias": ((h, ), self.dtype)}

        layer = {
            "input_layernorm": ln(),
            "q_proj": lin(h, nq * d),
            "k_proj": lin(h, nq * d),
            "v_proj": lin(h, nq * d),
            "dense": lin(nq * d, h),
            "post_attention_layernorm": ln(),
            "mlp_fc": lin(h, inter),
            "mlp_proj": lin(inter, h),
        }
        return {
            "embed": {"weight": ((self.vocab_size, h), self.dtype)},
            "layers": [dict(layer) for _ in range(self.num_layers)],
            "final_norm": ln(),
            "lm_head": {"weight": ((self.vocab_size, h), self.dtype)},
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
            "post_attention_layernorm": rep2,
            "mlp_fc": col,
            "mlp_proj": row,
        }
        return {
            "embed": {"weight": P("model", None)},
            "layers": [dict(layer) for _ in range(self.num_layers)],
            "final_norm": rep2,
            "lm_head": {"weight": P("model", None)},
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
            attn_out, kv_caches = attention(
                q, k, v, kv_caches, md, scale=self.scale, layer_idx=i,
                sparse=getattr(self, "sparse_config", None))
            attn_out = row_parallel_linear(
                attn_out.reshape(b * l, -1), p["dense"],
                tp_size=self.tp_size).reshape(b, l, h)

            mlp_src = hidden if self.parallel_residual else (hidden +
                                                             attn_out)
            x2 = layer_norm(mlp_src,
                            p["post_attention_layernorm"]["weight"],
                            p["post_attention_layernorm"]["bias"],
                            eps=self.ln_eps)
            mlp = self.act(linear(x2.reshape(b * l, h), p["mlp_fc"]))
            mlp = row_parallel_linear(mlp, p["mlp_proj"],
                                      tp_size=self.tp_size).reshape(b, l, h)
            hidden = mlp_src + mlp if not self.parallel_residual \
                else hidden + attn_out + mlp
        hidden = layer_norm(hidden, params["final_norm"]["weight"],
                            params["final_norm"]["bias"], eps=self.ln_eps)
        return hidden, kv_caches

    # -- loading -----------------------------------------------------------
    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        np_dtype = self._np_dtype()
        params: Dict[str, Any] = {
            "embed": {}, "final_norm": {}, "lm_head": {},
            "layers": [dict() for _ in range(self.num_layers)],
        }
        d, nq = self.head_dim, self.num_heads
        for name, w in weights:
            if "rotary_emb" in name or name.endswith((".attn.bias",
                                                      ".masked_bias")):
                continue
            w = np.asarray(w)
            if w.dtype.kind == "f":
                w = w.astype(np_dtype)
            if name == "gpt_neox.embed_in.weight":
                params["embed"]["weight"] = self._pad_vocab(w)
                continue
            if name == "embed_out.weight":
                params["lm_head"]["weight"] = self._pad_vocab(w)
                continue
            if name.startswith("gpt_neox.final_layer_norm."):
                params["final_norm"][name.split(".")[-1]] = w
                continue
            if not name.startswith("gpt_neox.layers."):
                continue
            parts = name.split(".")
            idx, kind = int(parts[2]), parts[-1]
            sub = ".".join(parts[3:-1])
            lp = params["layers"][idx]
            if sub in ("input_layernorm", "post_attention_layernorm"):
                lp.setdefault(sub, {})[kind] = w
            elif sub == "attention.query_key_value":
                # interleaved per head: rows [H, 3, d, ...]
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
            elif sub == "attention.dense":
                lp.setdefault("dense", {})[kind] = (
                    w.T if kind == "weight" else w)
            elif sub == "mlp.dense_h_to_4h":
                lp.setdefault("mlp_fc", {})[kind] = (
                    w.T if kind == "weight" else w)
            elif sub == "mlp.dense_4h_to_h":
                lp.setdefault("mlp_proj", {})[kind] = (
                    w.T if kind == "weight" else w)
        params.update(self.constant_params())
        return params
