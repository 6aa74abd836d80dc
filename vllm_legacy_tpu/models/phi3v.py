"""Phi-3-Vision (reference: vllm/model_executor/models/phi3v.py, 380
LoC — Phi-3-mini language model + the HD-transform CLIP embedding,
``Phi3HDImageEmbedding`` :95-280).

The vision math (CLIP ViT-L/14-336 penultimate layer, 2x2 patch merge,
glb/sub tiling with learnable GN separators, mlp2x_gelu projection) is
identical to InternLM-XComposer2's encoder, so it runs out-of-band in
``engine/image_encoder.py`` with ``select_layer=-2``; the engine
substitutes the projected rows during prefill via
``multi_modal_data={"prompt_embeds", "embeds_mask"}`` (the reference
marks image spans with NEGATIVE input ids and scatters in-model,
:166-176 — precomputed substitution keeps the jitted step free of
dynamic tile counts).

Serving recipe::

    enc = ImageEncoder(CLIP_VIT_L_336_cfg, lm_hidden=hidden,
                       select_layer=-2, hd_num=max_crops)
    enc.load_weights(vision_embed_tokens_weights)
    inputs = splice_images(prompt_ids, [enc.encode(img)],
                           placeholder_token_id=pad,
                           marker_token_id=image_marker)
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, Tuple

import numpy as np

from vllm_legacy_tpu.models.phi3 import Phi3ForCausalLM


class Phi3VForCausalLM(Phi3ForCausalLM):

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]
                     ) -> Dict[str, Any]:
        def drop_vision(weights):
            for name, w in weights:
                # encoder-side tensors load into ImageEncoder instead
                if "vision_embed_tokens" in name:
                    continue
                yield name, w

        return super().load_weights(drop_vision(weights))
