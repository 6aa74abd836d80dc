"""DeciLM: llama-shaped model with Variable Grouped Query Attention.

Capability parity with the reference's ``vllm/model_executor/models/
decilm.py`` (:38-123): each decoder layer has its own
``num_key_value_heads_per_layer[i]``; since a single stacked paged KV
cache wants one uniform KV-head count, the per-layer K/V projections are
*degrouped* at load time — each KV head group repeated up to the max
count (reference ``_degroup_weight`` :107-123) — after which the model is
an ordinary uniform-GQA llama on TPU.
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, Tuple

import numpy as np

from vllm_legacy_tpu.models.llama import LlamaForCausalLM


class DeciLMForCausalLM(LlamaForCausalLM):

    def __init__(self, hf_config: Any, **kw) -> None:
        per_layer = list(
            getattr(hf_config, "num_key_value_heads_per_layer", None)
            or [hf_config.num_key_value_heads])
        self._kv_heads_per_layer = per_layer
        hf_config.num_key_value_heads = max(per_layer)
        super().__init__(hf_config, **kw)

    def _degroup(self, w: np.ndarray) -> np.ndarray:
        """[n_kv_l * d, hidden] checkpoint tensor -> repeated up to the
        uniform max KV head count (HF row-major layout, pre-transpose)."""
        d = self.head_dim
        n_kv = w.shape[0] // d
        repeats = self.num_kv_heads // n_kv
        if repeats == 1:
            return w
        w = w.reshape(n_kv, d, -1)
        w = np.repeat(w, repeats, axis=0)
        return w.reshape(self.num_kv_heads * d, -1)

    def load_weights(
        self, weights: Iterable[Tuple[str, np.ndarray]]
    ) -> Dict[str, Any]:
        def degrouped():
            for name, w in weights:
                if ".k_proj.weight" in name or ".v_proj.weight" in name:
                    w = self._degroup(np.asarray(w))
                yield name, w

        return super().load_weights(degrouped())
