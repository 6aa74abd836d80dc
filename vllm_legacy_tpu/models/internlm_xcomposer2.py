"""InternLM-XComposer2 (fork headline multimodal; reference:
vllm/model_executor/models/internlm_xcomposer2.py + the out-of-band
vision encoder vllm/engine/image_encoder.py).

InternLM2 decoder where every projection carries a **partial LoRA**
(PLoRA): a rank-256 adapter whose delta is applied only to image tokens
(HF upstream semantics — ``res[im_mask] += B(A(x[im_mask])) * alpha/r``;
the reference's in-tree ``torch.where(im_mask, res, res + lora)``
:46-54 inverts the mask, which would make prefill text tokens disagree
with decode steps, so we keep the upstream gating).

The vision path (CLIP ViT + HD-transform tiling + 2x-GELU projector)
runs out of the decode hot loop in ``engine/image_encoder.py``, exactly
like the reference's ImageEncoder; the engine receives precomputed
``prompt_embeds`` + ``embeds_mask`` via multi_modal_data and substitutes
the embedding rows during prefill (reference: Sequence.prompt_embeds /
prompt_im_masks, vllm/sequence.py:125-126).

TPU-native notes: the PLoRA delta is two small matmuls fused by XLA into
the surrounding projection; image-token gating is a VPU select on the
input (masked rows contribute exact zeros). Under tensor parallelism A
is replicated for column layers and contraction-sharded (psum) for row
layers; B follows the base weight's output sharding.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from vllm_legacy_tpu.layers.linear import linear, row_parallel_linear
from vllm_legacy_tpu.layers.activation import silu_and_mul
from vllm_legacy_tpu.models.internlm2 import InternLM2ForCausalLM


class InternLMXComposer2ForCausalLM(InternLM2ForCausalLM):

    # HF modeling_internlm_xcomposer2 hardcodes lora_r=256,
    # lora_alpha=256 on every projection -> scaling == 1.0 (any other
    # scaling is folded into plora_b at load time).
    PLORA_R = 256

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._im_mask = None

    # -- params ---------------------------------------------------------
    def _layer_shapes(self) -> Dict[str, Any]:
        shapes = super()._layer_shapes()
        h, d = self.hidden_size, self.head_dim
        nq, nkv, inter = self.num_heads, self.num_kv_heads, \
            self.intermediate_size
        r = self.PLORA_R
        plora_dims = {
            "q_proj": (h, nq * d),
            "k_proj": (h, nkv * d),
            "v_proj": (h, nkv * d),
            "o_proj": (nq * d, h),
            "gate_proj": (h, inter),
            "up_proj": (h, inter),
            "down_proj": (inter, h),
        }
        for proj, (n_in, n_out) in plora_dims.items():
            shapes[proj]["plora_a"] = ((n_in, r), self.dtype)
            shapes[proj]["plora_b"] = ((r, n_out), self.dtype)
        return shapes

    # -- compute --------------------------------------------------------
    def _plora_delta(self, p, x, mode: str):
        """[T, in] -> [T, out] adapter delta, zero on non-image tokens.

        mode "row": the contraction dim (and plora_a) is sharded ->
        psum the rank-space activations before B.
        """
        if self._im_mask is None or "plora_a" not in p:
            return None
        xm = jnp.where(self._im_mask[:, None], x, jnp.zeros_like(x))
        a = jnp.dot(xm, p["plora_a"],
                    preferred_element_type=jnp.float32)
        if mode == "row" and self.tp_size > 1:
            a = jax.lax.psum(a, "model")
        return jnp.dot(a, p["plora_b"].astype(jnp.float32),
                       preferred_element_type=jnp.float32)

    def _project_qkv(self, p, xf, lora_indices=None):
        q, k, v = super()._project_qkv(p, xf, lora_indices)
        for name, t in (("q_proj", q), ("k_proj", k), ("v_proj", v)):
            delta = self._plora_delta(p[name], xf, "column")
            if delta is not None:
                t = t + delta.reshape(t.shape).astype(t.dtype)
            if name == "q_proj":
                q = t
            elif name == "k_proj":
                k = t
            else:
                v = t
        return q, k, v

    def _o_proj(self, p, attn_flat, lora_indices=None):
        out = super()._o_proj(p, attn_flat, lora_indices)
        delta = self._plora_delta(p["o_proj"], attn_flat, "row")
        if delta is not None:
            out = out + delta.astype(out.dtype)
        return out

    def _mlp(self, p, xf, lora_indices=None):
        gate = linear(xf, p["gate_proj"], lora_indices=lora_indices)
        up = linear(xf, p["up_proj"], lora_indices=lora_indices)
        dg = self._plora_delta(p["gate_proj"], xf, "column")
        du = self._plora_delta(p["up_proj"], xf, "column")
        if dg is not None:
            gate = gate + dg.astype(gate.dtype)
            up = up + du.astype(up.dtype)
        mlp = silu_and_mul(jnp.concatenate([gate, up], axis=-1))
        down = row_parallel_linear(mlp, p["down_proj"],
                                   tp_size=self.tp_size,
                                   lora_indices=lora_indices)
        dd = self._plora_delta(p["down_proj"], mlp, "row")
        if dd is not None:
            down = down + dd.astype(down.dtype)
        return down

    def forward(self, params, kv_caches, token_ids, positions, md,
                lora_indices=None, prompt_embeds=None, embeds_mask=None):
        # the base class substitutes the embedding rows; here the mask
        # additionally gates the per-token PLoRA deltas
        self._im_mask = (embeds_mask.reshape(-1)
                         if embeds_mask is not None else None)
        out = super().forward(params, kv_caches, token_ids, positions,
                              md, lora_indices=lora_indices,
                              prompt_embeds=prompt_embeds,
                              embeds_mask=embeds_mask)
        self._im_mask = None
        return out

    # -- loading --------------------------------------------------------
    def load_weights(self, weights):
        """Checkpoint names: ``…attention.wqkv.linear.weight`` (grouped
        qkv as internlm2) plus ``…wqkv.Plora_A/Plora_B.weight`` (A shared
        by q/k/v; B split along the grouped output layout), same for
        wo/w1/w2/w3; ``vit.* / vision_proj.* / plora_*_GN /
        tree_avgpool_scaler`` belong to the out-of-band image encoder
        (reference skips them too, internlm_xcomposer2.py:417-421)."""
        d = self.head_dim
        nq, nkv = self.num_heads, self.num_kv_heads
        g = nq // nkv
        np_dtype = self._np_dtype()
        ploras: Dict[int, Dict[str, Dict[str, np.ndarray]]] = {}

        _PLORA_MAP = {  # ckpt module -> our projection(s)
            "attention.wo": ("o_proj", ),
            "feed_forward.w1": ("gate_proj", ),
            "feed_forward.w3": ("up_proj", ),
            "feed_forward.w2": ("down_proj", ),
        }

        def stash(idx, proj, key, arr):
            ploras.setdefault(idx, {}).setdefault(proj, {})[key] = \
                np.ascontiguousarray(arr.astype(np_dtype))

        def pre(weights):
            for name, w in weights:
                if (name.startswith(("vit.", "vision_proj."))
                        or name in ("plora_glb_GN", "plora_sub_GN")
                        or "tree_avgpool_scaler" in name):
                    continue
                if ".Plora_" in name:
                    w = np.asarray(w)
                    parts = name.split(".")
                    idx = int(parts[2])
                    sub = ".".join(parts[3:-2])  # e.g. attention.wqkv
                    which = parts[-2]  # Plora_A | Plora_B
                    if sub == "attention.wqkv":
                        if which == "Plora_A":  # [r, h] torch layout
                            a = w.T  # (h, r)
                            for proj in ("q_proj", "k_proj", "v_proj"):
                                stash(idx, proj, "plora_a", a)
                        else:  # [(nkv*(g+2))*d, r] grouped rows
                            grp = w.reshape(nkv, g + 2, d, w.shape[-1])
                            stash(idx, "q_proj", "plora_b",
                                  grp[:, :g].reshape(nq * d, -1).T)
                            stash(idx, "k_proj", "plora_b",
                                  grp[:, g].reshape(nkv * d, -1).T)
                            stash(idx, "v_proj", "plora_b",
                                  grp[:, g + 1].reshape(nkv * d, -1).T)
                    elif sub in _PLORA_MAP:
                        proj = _PLORA_MAP[sub][0]
                        key = ("plora_a" if which == "Plora_A"
                               else "plora_b")
                        stash(idx, proj, key, w.T)
                    continue
                yield (name.replace(".linear.weight", ".weight")
                           .replace(".linear.bias", ".bias"), w)

        params = super().load_weights(pre(weights))
        for idx, per_proj in ploras.items():
            for proj, tensors in per_proj.items():
                params["layers"][idx][proj].update(tensors)
        return params
