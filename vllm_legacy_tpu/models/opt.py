"""OPT (reference: vllm/model_executor/models/opt.py).

Learned positions with a +2 offset, pre/post-LayerNorm per config,
separate biased q/k/v/out projections, ReLU MLP.
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
from vllm_legacy_tpu.utils import round_up


class OPTForCausalLM:

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
        self.intermediate_size = c.ffn_dim
        self.org_vocab_size = c.vocab_size
        self.vocab_size = round_up(c.vocab_size,
                                   embedding.VOCAB_PAD_TO * tp_size)
        self.max_position = c.max_position_embeddings
        self.do_ln_before = bool(getattr(c, "do_layer_norm_before", True))
        self.sliding_window = None
        self.scale = self.head_dim**-0.5
        # 350m variant: token embeddings live in word_embed_proj_dim
        # and replicated project_in/project_out linears bridge to the
        # transformer width (reference: models/opt.py:208-222).
        self.word_embed_proj_dim = c.word_embed_proj_dim
        self.has_proj = c.word_embed_proj_dim != c.hidden_size
        if self.num_heads % tp_size != 0:
            raise ValueError("num heads must divide tp size")

    def param_specs(self, params: Optional[Dict] = None) -> Dict:
        col = {"weight": P(None, "model"), "bias": P("model")}
        row = {"weight": P("model", None), "bias": P()}
        rep2 = {"weight": P(), "bias": P()}
        layer = {
            "self_attn_layer_norm": rep2,
            "q_proj": col, "k_proj": col, "v_proj": col,
            "out_proj": row,
            "final_layer_norm": rep2,
            "fc1": col, "fc2": row,
        }
        specs = {
            "embed_tokens": {"weight": P("model", None)},
            "embed_positions": {"weight": P()},
            "layers": [dict(layer) for _ in range(self.num_layers)],
            "final_layer_norm": rep2,
            "lm_head": {"weight": P("model", None)},
        }
        if self.has_proj:
            specs["project_in"] = {"weight": P()}
            specs["project_out"] = {"weight": P()}
        return specs

    def forward(self, params, kv_caches, token_ids, positions, md,
                lora_indices=None):
        b, l = token_ids.shape
        tok = embedding.embed(params["embed_tokens"],
                              token_ids.reshape(-1),
                              tp_size=self.tp_size)
        # OPT's learned positions are offset by 2 (padding idx legacy).
        pos_ids = jnp.clip(positions.reshape(-1) + 2, 0,
                           self.max_position + 1)
        pos = jnp.take(params["embed_positions"]["weight"], pos_ids,
                       axis=0)
        if self.has_proj:
            tok = linear(tok, params["project_in"])
        hidden = (tok + pos).reshape(b, l, self.hidden_size)

        for i in range(self.num_layers):
            p = params["layers"][i]
            residual = hidden
            x = hidden
            if self.do_ln_before:
                x = layer_norm(x, p["self_attn_layer_norm"]["weight"],
                               p["self_attn_layer_norm"]["bias"])
            xf = x.reshape(b * l, self.hidden_size)
            q = linear(xf, p["q_proj"]).reshape(b, l, -1, self.head_dim)
            k = linear(xf, p["k_proj"]).reshape(b, l, -1, self.head_dim)
            v = linear(xf, p["v_proj"]).reshape(b, l, -1, self.head_dim)
            attn_out, kv_caches = attention(q, k, v, kv_caches, md,
                                            scale=self.scale,
                                            layer_idx=i)
            o = row_parallel_linear(attn_out.reshape(b * l, -1),
                                    p["out_proj"],
                                    tp_size=self.tp_size)
            hidden = residual + o.reshape(b, l, -1)
            if not self.do_ln_before:
                hidden = layer_norm(hidden,
                                    p["self_attn_layer_norm"]["weight"],
                                    p["self_attn_layer_norm"]["bias"])

            residual = hidden
            x = hidden
            if self.do_ln_before:
                x = layer_norm(x, p["final_layer_norm"]["weight"],
                               p["final_layer_norm"]["bias"])
            xf = x.reshape(b * l, self.hidden_size)
            h = jax.nn.relu(linear(xf, p["fc1"]))
            mlp = row_parallel_linear(h, p["fc2"],
                                      tp_size=self.tp_size)
            hidden = residual + mlp.reshape(b, l, -1)
            if not self.do_ln_before:
                hidden = layer_norm(hidden,
                                    p["final_layer_norm"]["weight"],
                                    p["final_layer_norm"]["bias"])

        if self.do_ln_before and "weight" in params["final_layer_norm"]:
            hidden = layer_norm(hidden,
                                params["final_layer_norm"]["weight"],
                                params["final_layer_norm"]["bias"])
        if self.has_proj:
            hidden = linear(hidden.reshape(b * l, self.hidden_size),
                            params["project_out"]).reshape(
                                b, l, self.word_embed_proj_dim)
        return hidden, kv_caches

    def compute_logits(self, params, hidden):
        logits = embedding.compute_logits(params["lm_head"], hidden,
                                          tp_size=self.tp_size)
        if self.vocab_size != self.org_vocab_size:
            mask = jnp.arange(self.vocab_size) >= self.org_vocab_size
            logits = jnp.where(mask[None, :],
                               jnp.finfo(jnp.float32).min, logits)
        return logits

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        import ml_dtypes
        np_dtype = (ml_dtypes.bfloat16
                    if self.dtype == jnp.bfloat16 else np.float32)
        params: Dict[str, Any] = {
            "embed_tokens": {}, "embed_positions": {},
            "layers": [dict() for _ in range(self.num_layers)],
            "final_layer_norm": {}, "lm_head": {},
        }
        for name, w in weights:
            w = np.asarray(w)
            if w.dtype.kind == "f":
                w = w.astype(np_dtype)
            name = name.removeprefix("model.").removeprefix("decoder.")
            if name == "embed_tokens.weight":
                params["embed_tokens"]["weight"] = self._pad_vocab(w)
            elif name == "embed_positions.weight":
                params["embed_positions"]["weight"] = w
            elif name.startswith("final_layer_norm."):
                params["final_layer_norm"][name.split(".")[-1]] = w
            elif name in ("project_in.weight", "project_out.weight"):
                params.setdefault(name.split(".")[0],
                                  {})["weight"] = w.T
            elif name == "lm_head.weight":
                params["lm_head"]["weight"] = self._pad_vocab(w)
            elif name.startswith("layers."):
                parts = name.split(".")
                idx = int(parts[1])
                kind = parts[-1]
                sub = ".".join(parts[2:-1]).removeprefix("self_attn.")
                lp = params["layers"][idx]
                if kind == "weight" and sub in ("q_proj", "k_proj",
                                                "v_proj", "out_proj",
                                                "fc1", "fc2"):
                    w = w.T
                lp.setdefault(sub, {})[kind] = w
        if "weight" not in params["lm_head"]:
            params["lm_head"]["weight"] = params["embed_tokens"]["weight"]
        return params

    def _pad_vocab(self, w):
        if w.shape[0] < self.vocab_size:
            w = np.pad(w, ((0, self.vocab_size - w.shape[0]), (0, 0)))
        return w

    def init_dummy_params(self, seed: int = 0):
        raise NotImplementedError("use a real OPT checkpoint")
