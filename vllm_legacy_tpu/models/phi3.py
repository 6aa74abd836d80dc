"""Phi-3 (mini/medium) (reference: vllm/model_executor/models/llama.py —
vllm serves Phi3ForCausalLM through the Llama class with fused-shard
weight mapping; phi3_small.py is the separate blocksparse variant).

Llama architecture with (a) fused qkv_proj / gate_up_proj checkpoint
tensors (split at load) and (b) su-scaled "longrope" rotary
(layers/rotary.py su branch).
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, Tuple

import numpy as np

from vllm_legacy_tpu.models.llama import LlamaForCausalLM


class Phi3ForCausalLM(LlamaForCausalLM):

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]
                     ) -> Dict[str, Any]:
        d = self.head_dim
        nq, nkv = self.num_heads, self.num_kv_heads

        def split(weights):
            for name, w in weights:
                if ".qkv_proj." in name:
                    w = np.asarray(w)
                    yield (name.replace("qkv_proj", "q_proj"),
                           w[:nq * d])
                    yield (name.replace("qkv_proj", "k_proj"),
                           w[nq * d:nq * d + nkv * d])
                    yield (name.replace("qkv_proj", "v_proj"),
                           w[nq * d + nkv * d:])
                elif ".gate_up_proj." in name:
                    w = np.asarray(w)
                    half = w.shape[0] // 2
                    yield (name.replace("gate_up_proj", "gate_proj"),
                           w[:half])
                    yield (name.replace("gate_up_proj", "up_proj"),
                           w[half:])
                else:
                    yield name, w

        return super().load_weights(split(weights))
