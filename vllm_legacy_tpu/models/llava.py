"""LLaVA-1.5 (reference: vllm/model_executor/models/llava.py, 320 LoC +
vlm_base.py; the fork's multimodal serving counterpart is
internlm_xcomposer2.py + engine/image_encoder.py).

Vision tower (models/clip.py) + 2-layer gelu projector + Llama language
model. The prompt must contain ``image_feature_size`` repetitions of
``image_token_id`` (the reference's contract, VisionLanguageConfig
config.py:1065); their embedding rows are replaced by the projected
image patch features during prefill.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_legacy_tpu.layers import embedding
from vllm_legacy_tpu.models.clip import CLIPVisionTower
from vllm_legacy_tpu.models.llama import LlamaForCausalLM


class LlavaForConditionalGeneration:

    def __init__(self, hf_config: Any, *, tp_size: int = 1,
                 dtype: Any = jnp.bfloat16, quant_config: Any = None):
        c = hf_config
        self.hf_config = c
        self.dtype = dtype
        self.tp_size = tp_size
        text_cfg = c.text_config
        if not getattr(text_cfg, "architectures", None):
            text_cfg.architectures = ["LlamaForCausalLM"]
        self.language_model = LlamaForCausalLM(
            text_cfg, tp_size=tp_size, dtype=dtype,
            quant_config=quant_config)
        # vision tower runs f32: small, accuracy-sensitive, off hot loop
        self.vision_tower = CLIPVisionTower(c.vision_config,
                                            dtype=jnp.float32)
        self.image_token_id = c.image_token_index
        self.vision_feature_layer = getattr(c, "vision_feature_layer", -2)
        self.select_strategy = getattr(c, "vision_feature_select_strategy",
                                       "default")
        self.image_feature_size = self.vision_tower.num_patches if \
            self.select_strategy == "default" else \
            self.vision_tower.num_positions

        # mirrored language-model attrs the runner/cache need
        lm = self.language_model
        self.num_layers = lm.num_layers
        self.num_kv_heads = lm.num_kv_heads
        self.num_heads = lm.num_heads
        self.head_dim = lm.head_dim
        self.hidden_size = lm.hidden_size
        self.vocab_size = lm.vocab_size
        self.org_vocab_size = lm.org_vocab_size
        self.sliding_window = None

    # -- params ------------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        lm_h = self.language_model.hidden_size
        v_h = self.vision_tower.hidden_size
        return {
            "language_model": self.language_model.param_shapes(),
            "vision_tower": self.vision_tower.param_shapes(),
            "projector": {
                "linear_1": {"weight": ((v_h, lm_h), jnp.float32),
                             "bias": ((lm_h, ), jnp.float32)},
                "linear_2": {"weight": ((lm_h, lm_h), jnp.float32),
                             "bias": ((lm_h, ), jnp.float32)},
            },
        }

    def param_specs(self, params: Optional[Dict] = None) -> Dict:
        lm_params = params["language_model"] if params else None
        rep = jax.tree.map(
            lambda _: P(),
            params["vision_tower"] if params else
            self.vision_tower.param_shapes(),
            is_leaf=lambda x: isinstance(x, (np.ndarray, jnp.ndarray,
                                             tuple)))
        return {
            "language_model": self.language_model.param_specs(lm_params),
            "vision_tower": rep,
            "projector": {
                "linear_1": {"weight": P(), "bias": P()},
                "linear_2": {"weight": P(), "bias": P()},
            },
        }

    # -- compute -------------------------------------------------------------
    def image_features(self, params, pixel_values: jax.Array
                       ) -> jax.Array:
        """[N, 3, H, W] -> [N, image_feature_size, lm_hidden]."""
        states = self.vision_tower.forward(params["vision_tower"],
                                           pixel_values.astype(
                                               jnp.float32))
        feats = states[self.vision_feature_layer]
        if self.select_strategy == "default":
            feats = feats[:, 1:]  # drop CLS
        pj = params["projector"]
        x = jnp.dot(feats, pj["linear_1"]["weight"].astype(jnp.float32))
        x = x + pj["linear_1"]["bias"].astype(jnp.float32)
        x = jax.nn.gelu(x, approximate=False)
        x = jnp.dot(x, pj["linear_2"]["weight"].astype(jnp.float32))
        x = x + pj["linear_2"]["bias"].astype(jnp.float32)
        return x

    def forward(self, params, kv_caches, token_ids, positions, md,
                lora_indices=None, pixel_values=None):
        lm = self.language_model
        if pixel_values is None:
            return lm.forward(params["language_model"], kv_caches,
                              token_ids, positions, md,
                              lora_indices=lora_indices)
        b, l = token_ids.shape
        feats = self.image_features(params, pixel_values)  # [B, F, H]
        feats = feats.astype(self.dtype)

        # language-model embedding with image rows substituted
        lp = params["language_model"]
        emb = embedding.embed(lp["embed"], token_ids.reshape(-1),
                              tp_size=self.tp_size)
        emb = emb.reshape(b, l, -1)
        is_img = token_ids == self.image_token_id  # [B, L]
        # n-th image token of a row takes the n-th feature row
        feat_idx = jnp.clip(jnp.cumsum(is_img, axis=1) - 1, 0,
                            feats.shape[1] - 1)
        gathered = jnp.take_along_axis(feats,
                                       feat_idx[:, :, None], axis=1)
        merged = jnp.where(is_img[:, :, None], gathered, emb)
        return lm.forward_embedded(lp, kv_caches, merged, positions, md,
                                   lora_indices=lora_indices)

    def compute_logits(self, params, hidden):
        return self.language_model.compute_logits(
            params["language_model"], hidden)

    # -- loading ---------------------------------------------------------
    def load_weights(self, weights) -> Dict[str, Any]:
        lm_weights = []
        vt_weights = []
        projector: Dict[str, Dict[str, np.ndarray]] = {
            "linear_1": {}, "linear_2": {}}
        for name, w in weights:
            # transformers >= 4.52 re-roots keys under model.*
            name = name.removeprefix("model.") if name.startswith(
                ("model.vision_tower", "model.multi_modal_projector",
                 "model.language_model")) else name
            if name.startswith("vision_tower."):
                vt_weights.append(
                    (name.removeprefix("vision_tower.").removeprefix(
                        "vision_model."), w))
            elif name.startswith("multi_modal_projector."):
                parts = name.split(".")
                projector[parts[1]][parts[2]] = (
                    np.asarray(w, np.float32).T
                    if parts[2] == "weight" else np.asarray(w,
                                                            np.float32))
            elif name.startswith("language_model."):
                sub = name.removeprefix("language_model.")
                if not sub.startswith(("model.", "lm_head.")):
                    sub = "model." + sub
                lm_weights.append((sub, w))
            elif name.startswith("lm_head."):
                lm_weights.append((name, w))
        return {
            "language_model": self.language_model.load_weights(
                iter(lm_weights)),
            "vision_tower": self.vision_tower.load_weights(
                iter(vt_weights)),
            "projector": projector,
        }

    def init_dummy_params(self, seed: int = 0) -> Dict[str, Any]:
        rng = np.random.RandomState(seed)
        lm_h = self.language_model.hidden_size
        v_h = self.vision_tower.hidden_size
        return {
            "language_model": self.language_model.init_dummy_params(seed),
            "vision_tower": self.vision_tower.init_dummy_params(rng),
            "projector": {
                "linear_1": {
                    "weight": (rng.standard_normal(
                        (v_h, lm_h)) * 0.02).astype(np.float32),
                    "bias": np.zeros((lm_h, ), np.float32)},
                "linear_2": {
                    "weight": (rng.standard_normal(
                        (lm_h, lm_h)) * 0.02).astype(np.float32),
                    "bias": np.zeros((lm_h, ), np.float32)},
            },
        }
