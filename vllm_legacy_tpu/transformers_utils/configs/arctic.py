"""Snowflake Arctic config (reference: vllm/transformers_utils/configs/
arctic.py:116-180 — llama-style fields plus MoE controls)."""
from __future__ import annotations

from transformers import PretrainedConfig


class ArcticConfig(PretrainedConfig):
    model_type = "arctic"

    def __init__(self,
                 vocab_size: int = 32000,
                 hidden_size: int = 4096,
                 intermediate_size: int = 14336,
                 num_hidden_layers: int = 32,
                 num_attention_heads: int = 32,
                 num_key_value_heads: int = None,
                 hidden_act: str = "silu",
                 max_position_embeddings: int = 4096,
                 initializer_range: float = 0.02,
                 rms_norm_eps: float = 1e-5,
                 use_cache: bool = True,
                 rope_theta: float = 1e6,
                 num_experts_per_tok: int = 1,
                 num_local_experts: int = 8,
                 moe_layer_frequency: int = 2,
                 use_residual: bool = True,
                 attention_bias: bool = False,
                 **kwargs) -> None:
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = (num_key_value_heads
                                    or num_attention_heads)
        self.hidden_act = hidden_act
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.rms_norm_eps = rms_norm_eps
        self.use_cache = use_cache
        self.rope_theta = rope_theta
        self.num_experts_per_tok = num_experts_per_tok
        self.num_local_experts = num_local_experts
        self.moe_layer_frequency = moe_layer_frequency
        self.use_residual = use_residual
        self.attention_bias = attention_bias
        super().__init__(**kwargs)
