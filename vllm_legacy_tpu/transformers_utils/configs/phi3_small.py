"""Phi-3-Small config shim (trust_remote_code checkpoint; defaults
mirror microsoft/Phi-3-small-8k-instruct — reference loads it via
trust_remote_code, kept in-tree like vllm/transformers_utils/configs)."""
from __future__ import annotations

from transformers import PretrainedConfig


class Phi3SmallConfig(PretrainedConfig):
    model_type = "phi3small"

    def __init__(self,
                 vocab_size: int = 100352,
                 hidden_size: int = 4096,
                 intermediate_size: int = 14336,
                 num_hidden_layers: int = 32,
                 num_attention_heads: int = 32,
                 num_key_value_heads: int = 8,
                 hidden_act: str = "gegelu",
                 gegelu_limit: float = 20.0,
                 max_position_embeddings: int = 8192,
                 layer_norm_epsilon: float = 1e-5,
                 rope_embedding_base: float = 1000000.0,
                 rope_position_scale: float = 1.0,
                 rope_scaling=None,
                 mup_use_scaling: bool = True,
                 mup_attn_multiplier: float = 1.0,
                 mup_embedding_multiplier: float = 10.0,
                 mup_width_multiplier: float = 8.0,
                 blocksparse_block_size: int = 64,
                 blocksparse_num_local_blocks: int = 16,
                 blocksparse_vert_stride: int = 8,
                 blocksparse_homo_head_pattern: bool = False,
                 blocksparse_triton_kernel_block_size: int = 64,
                 dense_attention_every_n_layers: int = 2,
                 dummy_token_indices=None,
                 **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads
        self.hidden_act = hidden_act
        self.gegelu_limit = gegelu_limit
        self.max_position_embeddings = max_position_embeddings
        self.layer_norm_epsilon = layer_norm_epsilon
        self.rope_embedding_base = rope_embedding_base
        self.rope_position_scale = rope_position_scale
        self.rope_scaling = rope_scaling
        self.mup_use_scaling = mup_use_scaling
        self.mup_attn_multiplier = mup_attn_multiplier
        self.mup_embedding_multiplier = mup_embedding_multiplier
        self.mup_width_multiplier = mup_width_multiplier
        self.blocksparse_block_size = blocksparse_block_size
        self.blocksparse_num_local_blocks = blocksparse_num_local_blocks
        self.blocksparse_vert_stride = blocksparse_vert_stride
        self.blocksparse_homo_head_pattern = \
            blocksparse_homo_head_pattern
        self.blocksparse_triton_kernel_block_size = \
            blocksparse_triton_kernel_block_size
        self.dense_attention_every_n_layers = \
            dense_attention_every_n_layers
        self.dummy_token_indices = dummy_token_indices
        super().__init__(**kwargs)
        if not getattr(self, "architectures", None):
            self.architectures = ["Phi3SmallForCausalLM"]
