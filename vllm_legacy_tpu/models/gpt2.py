"""GPT-2 (reference: vllm/model_executor/models/gpt2.py).

Structure: learned positional embeddings added to token embeddings,
pre-LayerNorm blocks, fused c_attn (qkv) / c_proj Conv1D weights
(already stored [in, out] in HF checkpoints — no transpose), gelu_new
MLP, tied LM head, MHA (no GQA).
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_legacy_tpu.layers import embedding
from vllm_legacy_tpu.layers.activation import gelu_new
from vllm_legacy_tpu.layers.linear import linear, row_parallel_linear
from vllm_legacy_tpu.layers.norm import layer_norm
from vllm_legacy_tpu.models.attention import AttentionMetadata, attention
from vllm_legacy_tpu.utils import round_up


class GPT2LMHeadModel:

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
        self.intermediate_size = (c.n_inner or 4 * c.n_embd)
        self.org_vocab_size = c.vocab_size
        self.vocab_size = round_up(c.vocab_size,
                                   embedding.VOCAB_PAD_TO * tp_size)
        self.max_position = c.n_positions
        self.ln_eps = c.layer_norm_epsilon
        self.sliding_window = None
        self.scale = self.head_dim**-0.5
        if self.num_kv_heads % tp_size != 0:
            raise ValueError("n_head must divide tp size")

    # -- specs -----------------------------------------------------------
    def param_specs(self, params: Optional[Dict] = None) -> Dict:
        col = {"weight": P(None, "model"), "bias": P("model")}
        row = {"weight": P("model", None), "bias": P()}
        rep2 = {"weight": P(), "bias": P()}
        layer = {
            "ln_1": rep2,
            "c_attn": col,
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

    # -- forward ---------------------------------------------------------
    def forward(self, params, kv_caches, token_ids, positions, md,
                lora_indices=None):
        b, l = token_ids.shape
        tok = embedding.embed(params["wte"], token_ids.reshape(-1),
                              tp_size=self.tp_size)
        pos = jnp.take(params["wpe"]["weight"],
                       jnp.clip(positions.reshape(-1), 0,
                                self.max_position - 1), axis=0)
        hidden = (tok + pos).reshape(b, l, self.hidden_size)

        for i in range(self.num_layers):
            p = params["layers"][i]
            x = layer_norm(hidden, p["ln_1"]["weight"],
                           p["ln_1"]["bias"], eps=self.ln_eps)
            xf = x.reshape(b * l, self.hidden_size)
            qkv = linear(xf, p["c_attn"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(b, l, -1, self.head_dim)
            k = k.reshape(b, l, -1, self.head_dim)
            v = v.reshape(b, l, -1, self.head_dim)
            attn_out, kv_caches = attention(q, k, v, kv_caches, md,
                                            scale=self.scale,
                                            layer_idx=i)
            o = row_parallel_linear(
                attn_out.reshape(b * l, -1), p["c_proj"],
                tp_size=self.tp_size).reshape(b, l, -1)
            hidden = hidden + o

            x = layer_norm(hidden, p["ln_2"]["weight"],
                           p["ln_2"]["bias"], eps=self.ln_eps)
            xf = x.reshape(b * l, self.hidden_size)
            h = gelu_new(linear(xf, p["mlp_fc"]))
            mlp = row_parallel_linear(h, p["mlp_proj"],
                                      tp_size=self.tp_size)
            hidden = hidden + mlp.reshape(b, l, -1)

        hidden = layer_norm(hidden, params["ln_f"]["weight"],
                            params["ln_f"]["bias"], eps=self.ln_eps)
        return hidden, kv_caches

    def compute_logits(self, params, hidden):
        logits = embedding.compute_logits(params["lm_head"], hidden,
                                          tp_size=self.tp_size)
        if self.vocab_size != self.org_vocab_size:
            mask = jnp.arange(self.vocab_size) >= self.org_vocab_size
            logits = jnp.where(mask[None, :],
                               jnp.finfo(jnp.float32).min, logits)
        return logits

    # -- loading ---------------------------------------------------------
    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        import ml_dtypes
        np_dtype = (ml_dtypes.bfloat16
                    if self.dtype == jnp.bfloat16 else np.float32)
        params: Dict[str, Any] = {
            "wte": {}, "wpe": {},
            "layers": [dict() for _ in range(self.num_layers)],
            "ln_f": {}, "lm_head": {},
        }
        name_map = {"attn.c_attn": "c_attn", "attn.c_proj": "c_proj",
                    "mlp.c_fc": "mlp_fc", "mlp.c_proj": "mlp_proj"}
        for name, w in weights:
            if name.endswith(".attn.bias") or name.endswith(
                    ".attn.masked_bias"):
                continue  # causal-mask buffers
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
                idx = int(parts[1])
                rest = ".".join(parts[2:-1])
                kind = parts[-1]
                lp = params["layers"][idx]
                if rest in ("ln_1", "ln_2"):
                    lp.setdefault(rest, {})[kind] = w
                elif rest in name_map:
                    # HF GPT-2 Conv1D stores [in, out] already
                    if name_map[rest] == "c_attn":
                        w = self._repack_qkv(w)
                    lp.setdefault(name_map[rest], {})[kind] = w
        if "weight" not in params["lm_head"]:
            params["lm_head"]["weight"] = params["wte"]["weight"]
        return params

    def _repack_qkv(self, arr: np.ndarray) -> np.ndarray:
        """Reorder fused qkv columns so each TP shard's contiguous
        slice holds [q_s | k_s | v_s] (fused Conv1D layout is
        q|k|v globally, which a plain column shard would split
        mid-projection)."""
        if self.tp_size == 1:
            return arr
        h = self.hidden_size
        per = h // self.tp_size
        q, k, v = np.split(arr, 3, axis=-1)
        parts = []
        for sdx in range(self.tp_size):
            sl = slice(sdx * per, (sdx + 1) * per)
            parts.extend([q[..., sl], k[..., sl], v[..., sl]])
        return np.concatenate(parts, axis=-1)

    def _pad_vocab(self, w):
        if w.shape[0] < self.vocab_size:
            w = np.pad(w, ((0, self.vocab_size - w.shape[0]), (0, 0)))
        return w

    def init_dummy_params(self, seed: int = 0):
        import ml_dtypes
        rng = np.random.RandomState(seed)
        np_dtype = (ml_dtypes.bfloat16
                    if self.dtype == jnp.bfloat16 else np.float32)
        h, inter, v = (self.hidden_size, self.intermediate_size,
                       self.vocab_size)

        def t(*shape):
            return (rng.standard_normal(shape) * 0.02).astype(np_dtype)

        def ln():
            return {"weight": np.ones((h, ), np_dtype),
                    "bias": np.zeros((h, ), np_dtype)}

        layers = []
        for _ in range(self.num_layers):
            layers.append({
                "ln_1": ln(),
                "c_attn": {"weight": t(h, 3 * h),
                           "bias": np.zeros((3 * h, ), np_dtype)},
                "c_proj": {"weight": t(h, h),
                           "bias": np.zeros((h, ), np_dtype)},
                "ln_2": ln(),
                "mlp_fc": {"weight": t(h, inter),
                           "bias": np.zeros((inter, ), np_dtype)},
                "mlp_proj": {"weight": t(inter, h),
                             "bias": np.zeros((h, ), np_dtype)},
            })
        wte = t(v, h)
        return {
            "wte": {"weight": wte},
            "wpe": {"weight": t(self.max_position, h)},
            "layers": layers,
            "ln_f": ln(),
            "lm_head": {"weight": wte},
        }
