"""Llama/Mistral-stack embedding model (reference:
vllm/model_executor/models/llama_embedding.py LlamaEmbeddingModel :12 —
the e5-mistral-7b-instruct family: bare decoder stack + last-token
pooling + L2 normalize)."""
from __future__ import annotations

from typing import Any, Dict

import jax

from vllm_legacy_tpu.layers.pooler import PoolingType, pool
from vllm_legacy_tpu.models.llama import LlamaForCausalLM


class LlamaEmbeddingModel(LlamaForCausalLM):
    """Decoder stack reused verbatim; ``pooler`` replaces sampling.

    Bare-model HF checkpoints (architectures ``LlamaModel`` /
    ``MistralModel``) name weights without the ``model.`` prefix and
    carry no ``lm_head`` — the loader normalizes names and the base
    class already ties a missing lm_head to the input embedding.
    """

    pooling_type = PoolingType.LAST
    normalize = True

    def load_weights(self, weights) -> Dict[str, Any]:
        def prefixed():
            for name, w in weights:
                if not name.startswith(("model.", "lm_head.")):
                    name = "model." + name
                yield name, w

        return super().load_weights(prefixed())

    def pooler(self, hidden: jax.Array,
               query_lens: jax.Array) -> jax.Array:
        """[B, L, H] + [B] -> [B, H] unit-norm embeddings."""
        return pool(hidden, query_lens, self.pooling_type,
                    self.normalize)
