"""Phi-3-Vision config shim (trust_remote_code checkpoint; defaults
mirror microsoft/Phi-3-vision-128k-instruct)."""
from __future__ import annotations

from transformers import PretrainedConfig


class Phi3VConfig(PretrainedConfig):
    model_type = "phi3_v"

    def __init__(self,
                 vocab_size: int = 32064,
                 hidden_size: int = 3072,
                 intermediate_size: int = 8192,
                 num_hidden_layers: int = 32,
                 num_attention_heads: int = 32,
                 num_key_value_heads: int = 32,
                 hidden_act: str = "silu",
                 max_position_embeddings: int = 131072,
                 original_max_position_embeddings: int = 4096,
                 rms_norm_eps: float = 1e-5,
                 rope_theta: float = 10000.0,
                 rope_scaling=None,
                 sliding_window=None,
                 tie_word_embeddings: bool = False,
                 embd_layer=None,
                 img_processor=None,
                 **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads
        self.hidden_act = hidden_act
        self.max_position_embeddings = max_position_embeddings
        self.original_max_position_embeddings = \
            original_max_position_embeddings
        self.rms_norm_eps = rms_norm_eps
        self.rope_theta = rope_theta
        self.rope_scaling = rope_scaling
        self.sliding_window = sliding_window
        self.embd_layer = embd_layer or {
            "embedding_cls": "image",
            "hd_transform_order": "glb_sub",
            "projection_cls": "mlp",
            "use_hd_transform": True,
            "with_learnable_separator": True,
        }
        self.img_processor = img_processor or {
            "image_dim_out": 1024,
            "model_name": "openai/clip-vit-large-patch14-336",
            "name": "clip_vision_model",
            "num_img_tokens": 144,
            "layer_idx": -2,
            "type_feature": "patch",
        }
        super().__init__(tie_word_embeddings=tie_word_embeddings,
                         **kwargs)
        if not getattr(self, "architectures", None):
            self.architectures = ["Phi3VForCausalLM"]
