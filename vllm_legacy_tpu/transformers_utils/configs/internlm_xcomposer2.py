"""InternLM-XComposer2 config shim (the checkpoint's config class lives
behind trust_remote_code; fields mirror InternLM2 — reference loads it
via trust_remote_code, we keep an in-tree shim like its
vllm/transformers_utils/configs/ pattern)."""
from __future__ import annotations

from transformers import PretrainedConfig


class InternLMXComposer2Config(PretrainedConfig):
    model_type = "internlmxcomposer2"

    def __init__(self,
                 vocab_size: int = 92544,
                 hidden_size: int = 4096,
                 intermediate_size: int = 14336,
                 num_hidden_layers: int = 32,
                 num_attention_heads: int = 32,
                 num_key_value_heads: int = 8,
                 hidden_act: str = "silu",
                 max_position_embeddings: int = 32768,
                 initializer_range: float = 0.02,
                 rms_norm_eps: float = 1e-5,
                 use_cache: bool = True,
                 rope_theta: float = 1000000.0,
                 rope_scaling=None,
                 tie_word_embeddings: bool = False,
                 bias: bool = False,
                 **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads
        self.hidden_act = hidden_act
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.rms_norm_eps = rms_norm_eps
        self.use_cache = use_cache
        self.rope_theta = rope_theta
        self.rope_scaling = rope_scaling
        self.attention_bias = bias
        super().__init__(tie_word_embeddings=tie_word_embeddings,
                         **kwargs)
        if not getattr(self, "architectures", None):
            self.architectures = ["InternLMXComposer2ForCausalLM"]
