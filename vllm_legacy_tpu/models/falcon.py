"""Falcon 7B/40B/RW (reference: vllm/model_executor/models/falcon.py).

Three block layouts, selected by config:
  * new_decoder_architecture (40B/180B): GQA; parallel attention+MLP
    with SEPARATE ln_attn / ln_mlp; fused qkv interleaved PER KV GROUP
    ([G q | 1 k | 1 v] x num_kv rows).
  * multi_query + parallel_attn (7B): MQA; ONE input_layernorm feeds
    both attention and MLP; fused qkv = plain [q | k | v] concat.
  * neither (falcon-rw): MHA, sequential pre-LN blocks.
Rotary or ALiBi by config.alibi; gelu MLP; tied lm head.
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
from vllm_legacy_tpu.models.base import ModelBase, alibi_slopes
from vllm_legacy_tpu.utils import round_up


class FalconForCausalLM(ModelBase):

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
        self.new_arch = bool(getattr(c, "new_decoder_architecture", False))
        self.multi_query = bool(getattr(c, "multi_query", True))
        if self.new_arch:
            self.num_kv_heads = getattr(c, "num_kv_heads", None) or 1
        elif self.multi_query:
            self.num_kv_heads = 1
        else:
            self.num_kv_heads = self.num_heads
        self.head_dim = c.hidden_size // c.num_attention_heads
        self.intermediate_size = getattr(c, "ffn_hidden_size",
                                         None) or 4 * c.hidden_size
        self.org_vocab_size = c.vocab_size
        self.vocab_size = round_up(c.vocab_size,
                                   embedding.VOCAB_PAD_TO * tp_size)
        self.max_position = getattr(c, "max_position_embeddings", 2048)
        self.ln_eps = getattr(c, "layer_norm_epsilon", 1e-5)
        self.use_alibi = bool(getattr(c, "alibi", False))
        self.rope_theta = getattr(c, "rope_theta", 10000.0)
        self.use_bias = bool(getattr(c, "bias", False))
        self.parallel_attn = bool(getattr(c, "parallel_attn", True))
        self.act = get_act_fn("gelu")
        self.sliding_window = None
        self.scale = self.head_dim**-0.5
        if self.num_kv_heads % tp_size != 0 and self.num_kv_heads > 1:
            raise ValueError("kv heads must divide tp size")

    def _lin(self, i, o):
        t = {"weight": ((i, o), self.dtype)}
        if self.use_bias:
            t["bias"] = ((o, ), self.dtype)
        return t

    def param_shapes(self) -> Dict[str, Any]:
        h, inter, d = self.hidden_size, self.intermediate_size, \
            self.head_dim
        nq, nkv = self.num_heads, self.num_kv_heads

        def ln():
            return {"weight": ((h, ), self.dtype),
                    "bias": ((h, ), self.dtype)}

        layer = {
            "q_proj": self._lin(h, nq * d),
            "k_proj": self._lin(h, nkv * d),
            "v_proj": self._lin(h, nkv * d),
            "dense": self._lin(nq * d, h),
            "mlp_fc": self._lin(h, inter),
            "mlp_proj": self._lin(inter, h),
        }
        if self.new_arch:
            layer["ln_attn"] = ln()
            layer["ln_mlp"] = ln()
        else:
            layer["input_layernorm"] = ln()
            if not self.parallel_attn:
                layer["post_attention_layernorm"] = ln()
        shapes = {
            "embed": {"weight": ((self.vocab_size, h), self.dtype)},
            "layers": [dict(layer) for _ in range(self.num_layers)],
            "ln_f": ln(),
            "lm_head": {"weight": ((self.vocab_size, h), self.dtype)},
        }
        if self.use_alibi:
            shapes["alibi_slopes"] = ((nq, ), jnp.float32)
        else:
            shapes["rope_cache"] = ((0, ), jnp.float32)
        return shapes

    def constant_params(self):
        if self.use_alibi:
            # HF falcon computes (scores + alibi) * inv_norm_factor —
            # the alibi bias is scaled by 1/sqrt(d) too
            # (modeling_falcon.py attention_logits *= inv_norm_factor).
            return {"alibi_slopes": alibi_slopes(self.num_heads) *
                    np.float32(self.scale)}
        return {"rope_cache": build_cos_sin_cache(
            self.head_dim, self.head_dim, self.max_position,
            self.rope_theta)}

    def param_specs(self, params: Optional[Dict] = None) -> Dict:
        col = ({"weight": P(None, "model"), "bias": P("model")}
               if self.use_bias else {"weight": P(None, "model")})
        row = ({"weight": P("model", None), "bias": P()}
               if self.use_bias else {"weight": P("model", None)})
        rep2 = {"weight": P(), "bias": P()}
        layer = {
            "q_proj": dict(col),
            "k_proj": dict(col) if self.num_kv_heads > 1 else
            {k: P() for k in col},  # MQA: replicate the single kv head
            "v_proj": dict(col) if self.num_kv_heads > 1 else
            {k: P() for k in col},
            "dense": dict(row),
            "mlp_fc": dict(col),
            "mlp_proj": dict(row),
        }
        if self.new_arch:
            layer["ln_attn"] = rep2
            layer["ln_mlp"] = rep2
        else:
            layer["input_layernorm"] = rep2
            if not self.parallel_attn:
                layer["post_attention_layernorm"] = rep2
        specs = {
            "embed": {"weight": P("model", None)},
            "layers": [dict(layer) for _ in range(self.num_layers)],
            "ln_f": rep2,
            "lm_head": {"weight": P("model", None)},
        }
        if self.use_alibi:
            specs["alibi_slopes"] = P("model")
        else:
            specs["rope_cache"] = P()
        return specs

    def forward(self, params, kv_caches, token_ids, positions, md,
                lora_indices=None):
        b, l = token_ids.shape
        h = self.hidden_size
        hidden = embedding.embed(params["embed"], token_ids.reshape(-1),
                                 tp_size=self.tp_size).reshape(b, l, h)
        slopes = params.get("alibi_slopes")
        if not self.use_alibi:
            q_pos = jnp.clip(positions.reshape(-1), 0,
                             params["rope_cache"].shape[0] - 1)
        for i in range(self.num_layers):
            p = params["layers"][i]
            if self.new_arch:
                x_attn = layer_norm(hidden, p["ln_attn"]["weight"],
                                    p["ln_attn"]["bias"], eps=self.ln_eps)
                x_mlp = layer_norm(hidden, p["ln_mlp"]["weight"],
                                   p["ln_mlp"]["bias"], eps=self.ln_eps)
            else:
                x_attn = layer_norm(hidden, p["input_layernorm"]["weight"],
                                    p["input_layernorm"]["bias"],
                                    eps=self.ln_eps)
                x_mlp = x_attn  # parallel_attn shares it; sequential
                # recomputes below
            xf = x_attn.reshape(b * l, h)
            q = linear(xf, p["q_proj"]).reshape(b * l, -1, self.head_dim)
            k = linear(xf, p["k_proj"]).reshape(b * l, -1, self.head_dim)
            v = linear(xf, p["v_proj"]).reshape(b * l, -1, self.head_dim)
            if not self.use_alibi:
                q, k = apply_rope(q, k, q_pos, params["rope_cache"],
                                  rotary_dim=self.head_dim)
            q = q.reshape(b, l, -1, self.head_dim)
            k = k.reshape(b, l, -1, self.head_dim)
            v = v.reshape(b, l, -1, self.head_dim)
            attn_out, kv_caches = attention(q, k, v, kv_caches, md,
                                            scale=self.scale, layer_idx=i,
                                            alibi_slopes=slopes)
            attn_out = row_parallel_linear(
                attn_out.reshape(b * l, -1), p["dense"],
                tp_size=self.tp_size).reshape(b, l, h)

            if self.new_arch or self.parallel_attn:
                mlp = self.act(linear(x_mlp.reshape(b * l, h),
                                      p["mlp_fc"]))
                mlp = row_parallel_linear(
                    mlp, p["mlp_proj"],
                    tp_size=self.tp_size).reshape(b, l, h)
                hidden = hidden + attn_out + mlp
            else:
                hidden = hidden + attn_out
                x_mlp = layer_norm(
                    hidden, p["post_attention_layernorm"]["weight"],
                    p["post_attention_layernorm"]["bias"],
                    eps=self.ln_eps)
                mlp = self.act(linear(x_mlp.reshape(b * l, h),
                                      p["mlp_fc"]))
                mlp = row_parallel_linear(
                    mlp, p["mlp_proj"],
                    tp_size=self.tp_size).reshape(b, l, h)
                hidden = hidden + mlp
        hidden = layer_norm(hidden, params["ln_f"]["weight"],
                            params["ln_f"]["bias"], eps=self.ln_eps)
        return hidden, kv_caches

    def _split_qkv(self, w: np.ndarray, is_bias: bool):
        """Unfuse the checkpoint's query_key_value rows (see module
        docstring for the three layouts)."""
        d, nq, nkv = self.head_dim, self.num_heads, self.num_kv_heads
        if self.new_arch:
            g = nq // nkv
            grp = w.reshape(nkv, (g + 2) * d, *w.shape[1:])
            qw = grp[:, :g * d].reshape(nq * d, *w.shape[1:])
            kw = grp[:, g * d:(g + 1) * d].reshape(nkv * d, *w.shape[1:])
            vw = grp[:, (g + 1) * d:].reshape(nkv * d, *w.shape[1:])
        elif self.multi_query:
            qw = w[:nq * d]
            kw = w[nq * d:nq * d + nkv * d]
            vw = w[nq * d + nkv * d:]
        else:
            # old-arch MHA: per-head [H, 3, d] interleaving
            # (modeling_falcon.py _split_heads MHA branch)
            grp = w.reshape(nq, 3, d, *w.shape[1:])
            qw = grp[:, 0].reshape(nq * d, *w.shape[1:])
            kw = grp[:, 1].reshape(nq * d, *w.shape[1:])
            vw = grp[:, 2].reshape(nq * d, *w.shape[1:])
        return qw, kw, vw

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        np_dtype = self._np_dtype()
        params: Dict[str, Any] = {
            "embed": {}, "ln_f": {}, "lm_head": {},
            "layers": [dict() for _ in range(self.num_layers)],
        }
        for name, w in weights:
            if "rotary_emb" in name:
                continue
            w = np.asarray(w)
            if w.dtype.kind == "f":
                w = w.astype(np_dtype)
            name = name.removeprefix("transformer.")
            if name == "word_embeddings.weight":
                params["embed"]["weight"] = self._pad_vocab(w)
            elif name == "lm_head.weight":
                params["lm_head"]["weight"] = self._pad_vocab(w)
            elif name.startswith("ln_f."):
                params["ln_f"][name.split(".")[-1]] = w
            elif name.startswith("h."):
                parts = name.split(".")
                idx, kind = int(parts[1]), parts[-1]
                sub = ".".join(parts[2:-1])
                lp = params["layers"][idx]
                if sub in ("input_layernorm", "post_attention_layernorm",
                           "ln_attn", "ln_mlp"):
                    lp.setdefault(sub, {})[kind] = w
                elif sub == "self_attention.query_key_value":
                    qw, kw, vw = self._split_qkv(w, kind == "bias")
                    for proj, t in (("q_proj", qw), ("k_proj", kw),
                                    ("v_proj", vw)):
                        lp.setdefault(proj, {})[kind] = (
                            t.T if kind == "weight" else t)
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
