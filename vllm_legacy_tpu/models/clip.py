"""CLIP vision tower in pure JAX (reference analogue: the reference uses
torch CLIPVisionModel inside llava.py / the fork's image_encoder.py :25;
here the tower is a param-pytree function like every other model so it
jits/shards with the language model).

Implements the HF CLIPVisionModel forward: conv patch embedding + class
token + learned positions, pre-layernorm, N transformer blocks
(quick_gelu MLP), exposing per-layer hidden states so LLaVA can select
vision_feature_layer (default -2).
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vllm_legacy_tpu.layers.norm import layer_norm


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPVisionTower:

    def __init__(self, cfg: Any, dtype: Any = jnp.float32):
        self.hidden_size = cfg.hidden_size
        self.num_layers = cfg.num_hidden_layers
        self.num_heads = cfg.num_attention_heads
        self.head_dim = cfg.hidden_size // cfg.num_attention_heads
        self.intermediate_size = cfg.intermediate_size
        self.image_size = cfg.image_size
        self.patch_size = cfg.patch_size
        self.ln_eps = getattr(cfg, "layer_norm_eps", 1e-5)
        self.num_patches = (cfg.image_size // cfg.patch_size)**2
        self.num_positions = self.num_patches + 1
        self.dtype = dtype

    # -- param structure --------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        h, inter, d = self.hidden_size, self.intermediate_size, \
            self.head_dim
        p = self.patch_size

        def lin(i, o):
            return {"weight": ((i, o), self.dtype),
                    "bias": ((o, ), self.dtype)}

        def ln():
            return {"weight": ((h, ), self.dtype),
                    "bias": ((h, ), self.dtype)}

        layer = {
            "ln_1": ln(),
            "q_proj": lin(h, h), "k_proj": lin(h, h), "v_proj": lin(h, h),
            "out_proj": lin(h, h),
            "ln_2": ln(),
            "fc1": lin(h, inter),
            "fc2": lin(inter, h),
        }
        return {
            "class_embedding": ((h, ), self.dtype),
            "patch_embedding": {"weight": ((h, 3, p, p), self.dtype)},
            "position_embedding": {"weight": ((self.num_positions, h),
                                              self.dtype)},
            "pre_layernorm": ln(),
            "layers": [dict(layer) for _ in range(self.num_layers)],
        }

    # -- forward -----------------------------------------------------------
    def forward(self, params: Dict[str, Any],
                pixel_values: jax.Array,  # [B, 3, H, W]
                ) -> List[jax.Array]:
        """Returns hidden states AFTER each encoder layer (list of
        [B, 1+P, h]) with the embedding output prepended — index like
        HF's output_hidden_states (hidden_states[-2] etc.)."""
        b = pixel_values.shape[0]
        h = self.hidden_size
        # conv patch embedding == unfold + matmul (MXU-friendly)
        pw = params["patch_embedding"]["weight"]  # [h, 3, p, p]
        p = self.patch_size
        g = self.image_size // p
        x = pixel_values.reshape(b, 3, g, p, g, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, g * g, 3 * p * p)
        wm = pw.reshape(h, 3 * p * p).T  # [3pp, h]
        patches = jnp.dot(x.astype(jnp.float32), wm.astype(jnp.float32))
        cls = params["class_embedding"].astype(jnp.float32)
        emb = jnp.concatenate(
            [jnp.broadcast_to(cls[None, None], (b, 1, h)), patches],
            axis=1)
        emb = emb + params["position_embedding"]["weight"].astype(
            jnp.float32)[None]
        hidden = layer_norm(emb, params["pre_layernorm"]["weight"],
                            params["pre_layernorm"]["bias"],
                            eps=self.ln_eps)
        states = [hidden]
        t = self.num_positions
        for lp in params["layers"]:
            x = layer_norm(hidden, lp["ln_1"]["weight"],
                           lp["ln_1"]["bias"], eps=self.ln_eps)
            xf = x.reshape(b * t, h)

            def proj(pp):
                return (jnp.dot(xf, pp["weight"].astype(xf.dtype)) +
                        pp["bias"].astype(xf.dtype)).reshape(
                            b, t, self.num_heads, self.head_dim)

            q = proj(lp["q_proj"]) * self.head_dim**-0.5
            k = proj(lp["k_proj"])
            v = proj(lp["v_proj"])
            s = jnp.einsum("bihd,bjhd->bhij", q, k)
            a = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhij,bjhd->bihd", a, v).reshape(b * t, h)
            o = jnp.dot(o, lp["out_proj"]["weight"].astype(o.dtype)) + \
                lp["out_proj"]["bias"].astype(o.dtype)
            hidden = hidden + o.reshape(b, t, h)

            x = layer_norm(hidden, lp["ln_2"]["weight"],
                           lp["ln_2"]["bias"], eps=self.ln_eps)
            xf = x.reshape(b * t, h)
            m = quick_gelu(jnp.dot(xf,
                                   lp["fc1"]["weight"].astype(xf.dtype)) +
                           lp["fc1"]["bias"].astype(xf.dtype))
            m = jnp.dot(m, lp["fc2"]["weight"].astype(m.dtype)) + \
                lp["fc2"]["bias"].astype(m.dtype)
            hidden = hidden + m.reshape(b, t, h)
            states.append(hidden)
        return states

    # -- loading -----------------------------------------------------------
    def load_weights(self, weights) -> Dict[str, Any]:
        """Consume HF CLIPVisionModel names (vision_model.* prefix
        already stripped by the caller)."""
        params: Dict[str, Any] = {
            "patch_embedding": {}, "position_embedding": {},
            "pre_layernorm": {},
            "layers": [dict() for _ in range(self.num_layers)],
        }
        name_map = {
            "self_attn.q_proj": "q_proj", "self_attn.k_proj": "k_proj",
            "self_attn.v_proj": "v_proj",
            "self_attn.out_proj": "out_proj",
            "layer_norm1": "ln_1", "layer_norm2": "ln_2",
            "mlp.fc1": "fc1", "mlp.fc2": "fc2",
        }
        for name, w in weights:
            w = np.asarray(w, np.float32)
            if name == "embeddings.class_embedding":
                params["class_embedding"] = w
            elif name == "embeddings.patch_embedding.weight":
                params["patch_embedding"]["weight"] = w
            elif name == "embeddings.position_embedding.weight":
                params["position_embedding"]["weight"] = w
            elif name.startswith(("pre_layrnorm.", "pre_layernorm.")):
                params["pre_layernorm"][name.split(".")[-1]] = w
            elif name.startswith("post_layernorm."):
                continue  # unused: llava reads a pre-final layer
            elif name.startswith("encoder.layers."):
                parts = name.split(".")
                idx, kind = int(parts[2]), parts[-1]
                sub = ".".join(parts[3:-1])
                if sub in name_map:
                    lp = params["layers"][idx]
                    lp.setdefault(name_map[sub], {})[kind] = (
                        w.T if kind == "weight" and "norm" not in sub
                        else w)
        return params

    def init_dummy_params(self, rng) -> Dict[str, Any]:
        def make(tree):
            if isinstance(tree, dict):
                return {k: make(v) for k, v in tree.items()}
            if isinstance(tree, list):
                return [make(v) for v in tree]
            shape, _ = tree
            return (rng.standard_normal(shape) * 0.02).astype(np.float32)

        return make(self.param_shapes())
