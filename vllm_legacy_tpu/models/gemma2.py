"""Gemma 2 (reference: the vLLM 0.4.3 fork predates Gemma-2; capability
added for parity with the HF family — sandwich norms, soft-capping).

Deltas vs Gemma 1: FOUR norms per layer (pre/post attention, pre/post
feed-forward — the "post" norms normalize the sublayer OUTPUT before the
residual add), attention-logit soft-capping (attn_logit_softcapping),
final-logit soft-capping, query_pre_attn_scalar attention scale, and
sliding-window attention on every second layer.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from vllm_legacy_tpu.models.attention import attention
from vllm_legacy_tpu.models.gemma import GemmaForCausalLM, _gemma_rms_norm
from vllm_legacy_tpu.models.llama import LlamaForCausalLM  # noqa: F401


class Gemma2ForCausalLM(GemmaForCausalLM):

    def __init__(self, hf_config: Any, **kw) -> None:
        super().__init__(hf_config, **kw)
        c = hf_config
        self.attn_soft_cap = getattr(c, "attn_logit_softcapping", 50.0)
        self.logit_soft_cap = getattr(c, "final_logit_softcapping", 30.0)
        q_scalar = getattr(c, "query_pre_attn_scalar", None)
        if q_scalar:
            self.scale = float(q_scalar)**-0.5
        # every second layer uses the sliding window (HF: even layers)
        self.window = getattr(c, "sliding_window", 4096)
        self.sliding_window = None  # per-layer, applied in the layer hook

    def _layer_shapes(self):
        shapes = super()._layer_shapes()
        h = self.hidden_size
        shapes["pre_feedforward_layernorm"] = {
            "weight": ((h, ), self.dtype)}
        shapes["post_feedforward_layernorm"] = {
            "weight": ((h, ), self.dtype)}
        return shapes

    def _decoder_layer(self, p, hidden, residual, q_pos, rope_cache,
                       kv_caches, md, layer_idx, lora_indices=None):
        from vllm_legacy_tpu.layers.linear import row_parallel_linear
        b, l, h = hidden.shape
        x = self._norm(hidden, p["input_layernorm"])
        xf = x.reshape(b * l, h)
        q, k, v = self._project_qkv(p, xf, lora_indices)
        from vllm_legacy_tpu.layers.rotary import apply_rope
        q, k = apply_rope(q, k, q_pos, rope_cache,
                          rotary_dim=self.rotary_dim)
        q = q.reshape(b, l, -1, self.head_dim)
        k = k.reshape(b, l, -1, self.head_dim)
        v = v.reshape(b, l, -1, self.head_dim)
        window = self.window if layer_idx % 2 == 0 else None
        attn_out, kv_caches = attention(
            q, k, v, kv_caches, md, scale=self.scale,
            layer_idx=layer_idx, sliding_window=window,
            soft_cap=self.attn_soft_cap)
        o = row_parallel_linear(attn_out.reshape(b * l, -1), p["o_proj"],
                                tp_size=self.tp_size)
        # post-attention norm applies to the OUTPUT, then residual add
        o = self._norm(o.reshape(b, l, h), p["post_attention_layernorm"])
        hidden = hidden + o

        x = self._norm(hidden, p["pre_feedforward_layernorm"])
        mlp = self._mlp(p, x.reshape(b * l, h)).reshape(b, l, h)
        mlp = self._norm(mlp, p["post_feedforward_layernorm"])
        hidden = hidden + mlp
        # residual is folded eagerly here; signal with None
        return hidden, None, kv_caches

    def forward(self, params, kv_caches, token_ids, positions, md,
                lora_indices=None):
        b, l = token_ids.shape
        from vllm_legacy_tpu.layers import embedding
        hidden = embedding.embed(params["embed"], token_ids.reshape(-1),
                                 tp_size=self.tp_size)
        hidden = (hidden * self.embed_scale).astype(hidden.dtype)
        hidden = hidden.reshape(b, l, self.hidden_size)
        q_pos = jnp.clip(positions.reshape(-1), 0,
                         params["rope_cache"].shape[0] - 1)
        for i in range(self.num_layers):
            hidden, _, kv_caches = self._decoder_layer(
                params["layers"][i], hidden, None, q_pos,
                params["rope_cache"], kv_caches, md, i)
        hidden = _gemma_rms_norm(hidden, params["norm"]["weight"],
                                 eps=self.rms_eps)
        return hidden, kv_caches
