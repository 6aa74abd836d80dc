"""DBRX (reference: vllm/model_executor/models/dbrx.py).

MoE decoder: bias-free weight-only LayerNorms, fused clipped Wqkv (GQA,
plain q|k|v concat), rope, routed experts stored as stacked
[E*ffn, d] w1/v1/w2 tensors (silu(x@w1^T) * (x@v1^T) @ w2), untied head.
Experts run EXPERT-PARALLEL over the "model" axis (fused_moe).
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_legacy_tpu.layers import embedding
from vllm_legacy_tpu.layers.fused_moe import fused_moe
from vllm_legacy_tpu.layers.linear import linear, row_parallel_linear
from vllm_legacy_tpu.layers.norm import layer_norm
from vllm_legacy_tpu.layers.rotary import apply_rope, build_cos_sin_cache
from vllm_legacy_tpu.models.attention import attention
from vllm_legacy_tpu.models.base import ModelBase
from vllm_legacy_tpu.utils import round_up


def _ffn_cfg(c, key, default):
    fc = getattr(c, "ffn_config", None) or {}
    if not isinstance(fc, dict):
        fc = fc.to_dict() if hasattr(fc, "to_dict") else vars(fc)
    return fc.get(key, default)


def _attn_cfg(c, key, default):
    ac = getattr(c, "attn_config", None) or {}
    if not isinstance(ac, dict):
        ac = ac.to_dict() if hasattr(ac, "to_dict") else vars(ac)
    return ac.get(key, default)


class DbrxForCausalLM(ModelBase):

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
        self.ffn_size = _ffn_cfg(c, "ffn_hidden_size", 4 * c.d_model)
        self.num_experts = _ffn_cfg(c, "moe_num_experts", 16)
        self.top_k = _ffn_cfg(c, "moe_top_k", 4)
        self.renormalize = _ffn_cfg(c, "moe_normalize_expert_weights",
                                    1) is not None
        self.clip_qkv = _attn_cfg(c, "clip_qkv", None)
        self.rope_theta = _attn_cfg(c, "rope_theta", 10000.0)
        self.org_vocab_size = c.vocab_size
        self.vocab_size = round_up(c.vocab_size,
                                   embedding.VOCAB_PAD_TO * tp_size)
        self.max_position = getattr(c, "max_seq_len", 2048)
        self.ln_eps = 1e-5
        self.sliding_window = None
        self.scale = self.head_dim**-0.5
        if self.num_experts % tp_size != 0:
            raise ValueError("moe_num_experts must divide tp size")

    def param_shapes(self) -> Dict[str, Any]:
        h, d, e, f = (self.hidden_size, self.head_dim, self.num_experts,
                      self.ffn_size)
        nq, nkv = self.num_heads, self.num_kv_heads
        layer = {
            "norm_1": {"weight": ((h, ), self.dtype)},
            "q_proj": {"weight": ((h, nq * d), self.dtype)},
            "k_proj": {"weight": ((h, nkv * d), self.dtype)},
            "v_proj": {"weight": ((h, nkv * d), self.dtype)},
            "out_proj": {"weight": ((nq * d, h), self.dtype)},
            "norm_2": {"weight": ((h, ), self.dtype)},
            "moe_router": {"weight": ((h, e), self.dtype)},
            "moe_w1": {"weight": ((e, h, 2 * f), self.dtype)},
            "moe_w2": {"weight": ((e, f, h), self.dtype)},
        }
        return {
            "embed": {"weight": ((self.vocab_size, h), self.dtype)},
            "layers": [dict(layer) for _ in range(self.num_layers)],
            "norm_f": {"weight": ((h, ), self.dtype)},
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
        rep = {"weight": P()}
        layer = {
            "norm_1": rep,
            "q_proj": col, "k_proj": col, "v_proj": col,
            "out_proj": row,
            "norm_2": rep,
            "moe_router": rep,
            "moe_w1": {"weight": P("model", None, None)},
            "moe_w2": {"weight": P("model", None, None)},
        }
        return {
            "embed": {"weight": P("model", None)},
            "layers": [dict(layer) for _ in range(self.num_layers)],
            "norm_f": rep,
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
            q = q.reshape(b * l, -1, self.head_dim)
            k = k.reshape(b * l, -1, self.head_dim)
            q, k = apply_rope(q, k, q_pos, params["rope_cache"],
                              rotary_dim=self.head_dim)
            q = q.reshape(b, l, -1, self.head_dim)
            k = k.reshape(b, l, -1, self.head_dim)
            v = v.reshape(b, l, -1, self.head_dim)
            attn_out, kv_caches = attention(q, k, v, kv_caches, md,
                                            scale=self.scale, layer_idx=i)
            o = row_parallel_linear(
                attn_out.reshape(b * l, -1), p["out_proj"],
                tp_size=self.tp_size).reshape(b, l, h)
            hidden = hidden + o
            x = layer_norm(hidden, p["norm_2"]["weight"], None,
                           eps=self.ln_eps)
            moe = fused_moe(
                x.reshape(b * l, h), p["moe_router"]["weight"],
                p["moe_w1"]["weight"], p["moe_w2"]["weight"],
                top_k=self.top_k, num_experts=self.num_experts,
                tp_size=self.tp_size, renormalize=self.renormalize)
            hidden = hidden + moe.reshape(b, l, h)
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
        e, f, h = self.num_experts, self.ffn_size, self.hidden_size
        for name, w in weights:
            w = np.asarray(w)
            if w.dtype.kind == "f":
                w = w.astype(np_dtype)
            name = name.removeprefix("transformer.")
            if name == "wte.weight":
                params["embed"]["weight"] = self._pad_vocab(w)
            elif name == "lm_head.weight":
                params["lm_head"]["weight"] = self._pad_vocab(w)
            elif name.startswith("norm_f."):
                params["norm_f"]["weight"] = w
            elif name.startswith("blocks."):
                parts = name.split(".")
                idx = int(parts[1])
                lp = params["layers"][idx]
                rest = ".".join(parts[2:])
                if rest == "norm_attn_norm.norm_1.weight":
                    lp["norm_1"] = {"weight": w}
                elif rest == "norm_attn_norm.norm_2.weight":
                    lp["norm_2"] = {"weight": w}
                elif rest == "norm_attn_norm.attn.Wqkv.weight":
                    lp["q_proj"] = {"weight": w[:nq * d].T}
                    lp["k_proj"] = {
                        "weight": w[nq * d:nq * d + nkv * d].T}
                    lp["v_proj"] = {"weight": w[nq * d + nkv * d:].T}
                elif rest == "norm_attn_norm.attn.out_proj.weight":
                    lp["out_proj"] = {"weight": w.T}
                elif rest == "ffn.router.layer.weight":
                    lp["moe_router"] = {"weight": w.T}
                elif rest == "ffn.experts.mlp.w1":
                    lp["_w1"] = w.reshape(e, f, h)
                elif rest == "ffn.experts.mlp.v1":
                    lp["_v1"] = w.reshape(e, f, h)
                elif rest == "ffn.experts.mlp.w2":
                    lp["moe_w2"] = {"weight": w.reshape(e, f, h)}
        for lp in params["layers"]:
            w1 = lp.pop("_w1")
            v1 = lp.pop("_v1")
            # fused_moe expects [E, h, 2f] gate||up
            lp["moe_w1"] = {"weight": np.concatenate(
                [w1.transpose(0, 2, 1), v1.transpose(0, 2, 1)], axis=-1)}
        if "weight" not in params["lm_head"]:
            params["lm_head"]["weight"] = params["embed"]["weight"]
        params.update(self.constant_params())
        return params
