"""Phi-3-Small (reference: vllm/model_executor/models/phi3_small.py,
447 LoC + attention/backends/blocksparse_attn.py + the Triton
blocksparse kernels in attention/ops/blocksparse_attention/).

Architecture deltas vs Llama: LayerNorm (weight+bias), fused head-major
qkv with bias, column-INTERLEAVED gate/up fused into ``up_proj`` feeding
the ``gegelu`` activation (quick-gelu branch clamped at gegelu_limit,
reference :59-70), muP scaling (embedding multiplier, attention scale
``mup_attn_multiplier / head_dim``, logits divided by
``mup_width_multiplier``), tiktoken dummy-token logit masking, and
**blocksparse attention** — local + per-head vertically-strided block
mask on every layer except each ``dense_attention_every_n_layers``-th
(reference :190-221).

TPU-native: the blocksparse pattern is a position predicate evaluated
inside the unified Pallas paged-attention kernel (BlocksparseSpec,
models/attention.py) rather than a CSR/Triton lookup — no mask
materialization, no separate backend; head stripe phases are computed
from the global head index so TP shards mask correctly.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from vllm_legacy_tpu.layers.linear import linear, row_parallel_linear
from vllm_legacy_tpu.layers.norm import layer_norm
from vllm_legacy_tpu.models.attention import BlocksparseSpec
from vllm_legacy_tpu.models.llama import LlamaForCausalLM


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class Phi3SmallForCausalLM(LlamaForCausalLM):

    def __init__(self, hf_config: Any, *, tp_size: int = 1,
                 dtype: Any = jnp.bfloat16, quant_config: Any = None):
        c = hf_config
        if not hasattr(c, "rope_theta"):
            c.rope_theta = getattr(c, "rope_embedding_base", 10000.0)
        if getattr(c, "rope_scaling", None) is None:
            pos_scale = getattr(c, "rope_position_scale", 1.0)
            if pos_scale != 1.0:
                c.rope_scaling = {"type": "linear", "factor": pos_scale}
        super().__init__(c, tp_size=tp_size, dtype=dtype,
                         quant_config=quant_config)
        self.attention_bias = True
        self.tie_word_embeddings = True
        self.ln_eps = getattr(c, "layer_norm_epsilon", 1e-5)
        self.gegelu_limit = getattr(c, "gegelu_limit", None)
        if getattr(c, "mup_use_scaling", False):
            self.scale = c.mup_attn_multiplier / self.head_dim
        self.mup_embedding_multiplier = getattr(
            c, "mup_embedding_multiplier", 0.0)
        self.mup_width_multiplier = getattr(c, "mup_width_multiplier",
                                            1.0)
        self.dummy_token_indices = list(
            getattr(c, "dummy_token_indices", None) or [])

        self.bs_block = getattr(c, "blocksparse_block_size", None)
        self.bs_local = getattr(c, "blocksparse_num_local_blocks", None)
        self.bs_vert = getattr(c, "blocksparse_vert_stride", None)
        self.bs_homo = bool(
            getattr(c, "blocksparse_homo_head_pattern", False))
        self.dense_every = getattr(c, "dense_attention_every_n_layers",
                                   None)

    # -- blocksparse ----------------------------------------------------
    def _blocksparse(self, layer_idx):
        if self.bs_block is None or self.bs_vert is None:
            return None
        if self.dense_every and (layer_idx + 1) % self.dense_every == 0:
            return None  # periodic dense layers (reference :196-199)
        nq_local = self.num_heads // self.tp_size
        if self.bs_homo:
            phases = jnp.zeros((nq_local, ), jnp.int32)
        else:
            step = max(1, self.bs_vert // self.num_heads)
            head = jnp.arange(nq_local, dtype=jnp.int32)
            if self.tp_size > 1:
                head = head + jax.lax.axis_index("model") * nq_local
            phases = head * step
        return BlocksparseSpec(self.bs_block, self.bs_local,
                               self.bs_vert, phases)

    # -- params ---------------------------------------------------------
    def _layer_shapes(self) -> Dict[str, Any]:
        shapes = super()._layer_shapes()
        h, inter = self.hidden_size, self.intermediate_size
        shapes["o_proj"]["bias"] = ((h, ), self.dtype)
        shapes["gate_proj"]["bias"] = ((inter, ), self.dtype)
        shapes["up_proj"]["bias"] = ((inter, ), self.dtype)
        shapes["down_proj"]["bias"] = ((h, ), self.dtype)
        for ln in ("input_layernorm", "post_attention_layernorm"):
            shapes[ln]["bias"] = ((h, ), self.dtype)
        return shapes

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        shapes["norm"]["bias"] = ((self.hidden_size, ), self.dtype)
        return shapes

    # -- compute --------------------------------------------------------
    def _norm(self, x, norm_params, residual=None):
        if residual is not None:
            x = x + residual
            return layer_norm(x, norm_params["weight"],
                              norm_params.get("bias"),
                              eps=self.ln_eps), x
        return layer_norm(x, norm_params["weight"],
                          norm_params.get("bias"), eps=self.ln_eps)

    def _mlp(self, p, xf, lora_indices=None):
        a_gelu = linear(xf, p["gate_proj"], lora_indices=lora_indices)
        a_linear = linear(xf, p["up_proj"], lora_indices=lora_indices)
        if self.gegelu_limit is not None:
            lim = jnp.asarray(self.gegelu_limit, a_gelu.dtype)
            a_gelu = jnp.minimum(a_gelu, lim)
            a_linear = jnp.clip(a_linear, -lim, lim)
        x = quick_gelu(a_gelu) * (a_linear + 1)
        return row_parallel_linear(x, p["down_proj"],
                                   tp_size=self.tp_size,
                                   lora_indices=lora_indices)

    def forward_embedded(self, params, kv_caches, hidden, positions, md,
                         lora_indices=None):
        if self.mup_embedding_multiplier > 0.0:
            hidden = hidden * self.mup_embedding_multiplier
        return super().forward_embedded(params, kv_caches, hidden,
                                        positions, md,
                                        lora_indices=lora_indices)

    def compute_logits(self, params, hidden):
        logits = super().compute_logits(params, hidden)
        # muP width scaling is applied to logits before sampling
        # (reference sample() :436) — dividing here keeps logprobs and
        # sampling consistent.
        logits = logits / self.mup_width_multiplier
        if self.dummy_token_indices:
            mask = np.zeros((self.vocab_size, ), bool)
            mask[np.asarray(self.dummy_token_indices)] = True
            logits = jnp.where(jnp.asarray(mask)[None, :],
                               jnp.finfo(jnp.float32).min, logits)
        return logits

    # -- loading --------------------------------------------------------
    def load_weights(self, weights):
        """Checkpoint names: ``self_attn.query_key_value`` (grouped
        head-major fused qkv + bias), ``self_attn.dense`` (o_proj),
        ``mlp.up_proj`` with INTERLEAVED gelu/linear columns
        (reference gegelu reads [..., ::2] / [..., 1::2] :60),
        ``model.final_layernorm``."""
        d = self.head_dim
        nq, nkv = self.num_heads, self.num_kv_heads
        g = nq // nkv

        def split_qkv(w):
            grp = w.reshape(nkv, g + 2, d, *w.shape[1:])
            return (grp[:, :g].reshape(nq * d, *w.shape[1:]),
                    grp[:, g].reshape(nkv * d, *w.shape[1:]),
                    grp[:, g + 1].reshape(nkv * d, *w.shape[1:]))

        def remap(weights):
            for name, w in weights:
                if "rotary_emb" in name:
                    continue
                w = np.asarray(w)
                if name.startswith("model.final_layernorm."):
                    yield ("model.norm." + name.split(".")[-1], w)
                    continue
                if ".self_attn.query_key_value." in name:
                    kind = name.split(".")[-1]
                    base = name.rsplit(".self_attn.", 1)[0]
                    q, k, v = split_qkv(w)
                    yield f"{base}.self_attn.q_proj.{kind}", q
                    yield f"{base}.self_attn.k_proj.{kind}", k
                    yield f"{base}.self_attn.v_proj.{kind}", v
                    continue
                if ".self_attn.dense." in name:
                    yield name.replace(".dense.", ".o_proj."), w
                    continue
                if ".mlp.up_proj." in name:
                    kind = name.split(".")[-1]
                    base = name.rsplit(".mlp.", 1)[0]
                    yield f"{base}.mlp.gate_proj.{kind}", w[0::2]
                    yield f"{base}.mlp.up_proj.{kind}", w[1::2]
                    continue
                yield name, w

        return super().load_weights(remap(weights))
