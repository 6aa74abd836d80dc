"""MPT (reference: vllm/model_executor/models/mpt.py).

Structure: ALiBi, fused non-interleaved Wqkv (plain q|k|v concat, split
at load), bias-free linears (no_bias), weight-only layernorms, gelu MLP
with expansion_ratio, tied lm head. Supports grouped KV (kv_n_heads) and
qk_ln / clip_qkv attention-config options.
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


def _attn_cfg(c, key, default):
    ac = getattr(c, "attn_config", None) or {}
    if not isinstance(ac, dict):
        ac = ac.to_dict() if hasattr(ac, "to_dict") else vars(ac)
    return ac.get(key, default)


class MPTForCausalLM(ModelBase):

    def __init__(self, hf_config: Any, *, tp_size: int = 1,
                 dtype: Any = jnp.bfloat16, quant_config: Any = None):
        c = hf_config
        self.hf_config = c
        self.dtype = dtype
        self.tp_size = tp_size
        self.quant_config = quant_config
        self.hidden_size = c.d_model
        self.num_layers = c.n_layers
        self.num_heads = c.n_heads
        self.num_kv_heads = _attn_cfg(c, "kv_n_heads", c.n_heads)
        self.head_dim = c.d_model // c.n_heads
        self.intermediate_size = int(
            getattr(c, "expansion_ratio", 4) * c.d_model)
        self.org_vocab_size = c.vocab_size
        self.vocab_size = round_up(c.vocab_size,
                                   embedding.VOCAB_PAD_TO * tp_size)
        self.ln_eps = getattr(c, "layer_norm_epsilon", 1e-5)
        self.use_alibi = bool(_attn_cfg(c, "alibi", True))
        self.clip_qkv = _attn_cfg(c, "clip_qkv", None)
        self.qk_ln = bool(_attn_cfg(c, "qk_ln", False))
        softmax_scale = _attn_cfg(c, "softmax_scale", None)
        self.scale = float(softmax_scale or self.head_dim**-0.5)
        self.no_bias = bool(getattr(c, "no_bias", True))
        self.act = get_act_fn("gelu")
        self.sliding_window = None
        if not self.use_alibi:
            raise ValueError("MPT without ALiBi (learned pos) unsupported")
        if self.num_kv_heads % tp_size != 0:
            raise ValueError("kv heads must divide tp size")

    def _lin(self, i, o):
        t = {"weight": ((i, o), self.dtype)}
        if not self.no_bias:
            t["bias"] = ((o, ), self.dtype)
        return t

    def param_shapes(self) -> Dict[str, Any]:
        h, inter, d = self.hidden_size, self.intermediate_size, \
            self.head_dim
        nq, nkv = self.num_heads, self.num_kv_heads
        layer = {
            "norm_1": {"weight": ((h, ), self.dtype)},
            "q_proj": self._lin(h, nq * d),
            "k_proj": self._lin(h, nkv * d),
            "v_proj": self._lin(h, nkv * d),
            "out_proj": self._lin(nq * d, h),
            "norm_2": {"weight": ((h, ), self.dtype)},
            "up_proj": self._lin(h, inter),
            "down_proj": self._lin(inter, h),
        }
        if self.qk_ln:
            layer["q_ln"] = {"weight": ((nq * d, ), self.dtype)}
            layer["k_ln"] = {"weight": ((nkv * d, ), self.dtype)}
        return {
            "embed": {"weight": ((self.vocab_size, h), self.dtype)},
            "layers": [dict(layer) for _ in range(self.num_layers)],
            "norm_f": {"weight": ((h, ), self.dtype)},
            "lm_head": {"weight": ((self.vocab_size, h), self.dtype)},
            "alibi_slopes": ((nq, ), jnp.float32),
        }

    def constant_params(self):
        return {"alibi_slopes": alibi_slopes(self.num_heads)}

    def param_specs(self, params: Optional[Dict] = None) -> Dict:
        col = ({"weight": P(None, "model")} if self.no_bias else
               {"weight": P(None, "model"), "bias": P("model")})
        row = ({"weight": P("model", None)} if self.no_bias else
               {"weight": P("model", None), "bias": P()})
        rep = {"weight": P()}
        layer = {
            "norm_1": rep,
            "q_proj": dict(col), "k_proj": dict(col), "v_proj": dict(col),
            "out_proj": dict(row),
            "norm_2": rep,
            "up_proj": dict(col),
            "down_proj": dict(row),
        }
        if self.qk_ln:
            layer["q_ln"] = {"weight": P("model")}
            layer["k_ln"] = {"weight": P("model")}
        return {
            "embed": {"weight": P("model", None)},
            "layers": [dict(layer) for _ in range(self.num_layers)],
            "norm_f": rep,
            "lm_head": {"weight": P("model", None)},
            "alibi_slopes": P("model"),
        }

    def forward(self, params, kv_caches, token_ids, positions, md,
                lora_indices=None):
        b, l = token_ids.shape
        h = self.hidden_size
        hidden = embedding.embed(params["embed"], token_ids.reshape(-1),
                                 tp_size=self.tp_size).reshape(b, l, h)
        slopes = params["alibi_slopes"]
        for i in range(self.num_layers):
            p = params["layers"][i]
            x = layer_norm(hidden, p["norm_1"]["weight"], None,
                           eps=self.ln_eps)
            xf = x.reshape(b * l, h)
            q = linear(xf, p["q_proj"])
            k = linear(xf, p["k_proj"])
            v = linear(xf, p["v_proj"])
            if self.clip_qkv is not None:
                q = jnp.clip(q, -self.clip_qkv, self.clip_qkv)
                k = jnp.clip(k, -self.clip_qkv, self.clip_qkv)
                v = jnp.clip(v, -self.clip_qkv, self.clip_qkv)
            if self.qk_ln:
                q = layer_norm(q, p["q_ln"]["weight"], None,
                               eps=self.ln_eps)
                k = layer_norm(k, p["k_ln"]["weight"], None,
                               eps=self.ln_eps)
            q = q.reshape(b, l, -1, self.head_dim)
            k = k.reshape(b, l, -1, self.head_dim)
            v = v.reshape(b, l, -1, self.head_dim)
            attn_out, kv_caches = attention(q, k, v, kv_caches, md,
                                            scale=self.scale, layer_idx=i,
                                            alibi_slopes=slopes)
            attn_out = row_parallel_linear(
                attn_out.reshape(b * l, -1), p["out_proj"],
                tp_size=self.tp_size).reshape(b, l, h)
            hidden = hidden + attn_out
            x = layer_norm(hidden, p["norm_2"]["weight"], None,
                           eps=self.ln_eps)
            mlp = self.act(linear(x.reshape(b * l, h), p["up_proj"]))
            mlp = row_parallel_linear(mlp, p["down_proj"],
                                      tp_size=self.tp_size).reshape(b, l, h)
            hidden = hidden + mlp
        hidden = layer_norm(hidden, params["norm_f"]["weight"], None,
                            eps=self.ln_eps)
        return hidden, kv_caches

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        np_dtype = self._np_dtype()
        params: Dict[str, Any] = {
            "embed": {}, "norm_f": {}, "lm_head": {},
            "layers": [dict() for _ in range(self.num_layers)],
        }
        d, nq, nkv = self.head_dim, self.num_heads, self.num_kv_heads
        for name, w in weights:
            w = np.asarray(w)
            if w.dtype.kind == "f":
                w = w.astype(np_dtype)
            name = name.removeprefix("transformer.")
            if name == "wte.weight":
                params["embed"]["weight"] = self._pad_vocab(w)
            elif name.startswith("norm_f."):
                params["norm_f"][name.split(".")[-1]] = w
            elif name.startswith("blocks."):
                parts = name.split(".")
                idx, kind = int(parts[1]), parts[-1]
                sub = ".".join(parts[2:-1])
                lp = params["layers"][idx]
                if sub in ("norm_1", "norm_2"):
                    lp.setdefault(sub, {})[kind] = w
                elif sub == "attn.Wqkv":
                    # plain q|k|v concat (NOT per-head interleaved)
                    if kind == "weight":
                        qw = w[:nq * d]
                        kw = w[nq * d:nq * d + nkv * d]
                        vw = w[nq * d + nkv * d:]
                        lp.setdefault("q_proj", {})["weight"] = qw.T
                        lp.setdefault("k_proj", {})["weight"] = kw.T
                        lp.setdefault("v_proj", {})["weight"] = vw.T
                    else:
                        lp.setdefault("q_proj", {})["bias"] = w[:nq * d]
                        lp.setdefault("k_proj", {})["bias"] = \
                            w[nq * d:nq * d + nkv * d]
                        lp.setdefault("v_proj", {})["bias"] = \
                            w[nq * d + nkv * d:]
                elif sub == "attn.q_ln":
                    lp.setdefault("q_ln", {})[kind] = w
                elif sub == "attn.k_ln":
                    lp.setdefault("k_ln", {})[kind] = w
                elif sub == "attn.out_proj":
                    lp.setdefault("out_proj", {})[kind] = (
                        w.T if kind == "weight" else w)
                elif sub == "ffn.up_proj":
                    lp.setdefault("up_proj", {})[kind] = (
                        w.T if kind == "weight" else w)
                elif sub == "ffn.down_proj":
                    lp.setdefault("down_proj", {})[kind] = (
                        w.T if kind == "weight" else w)
        if "weight" not in params["lm_head"]:
            params["lm_head"]["weight"] = params["embed"]["weight"]
        params.update(self.constant_params())
        return params
