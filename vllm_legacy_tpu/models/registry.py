"""Architecture registry (reference: vllm/model_executor/models/__init__.py
ModelRegistry with lazy import + out-of-tree registration)."""
from __future__ import annotations

import importlib
from typing import Dict, List, Optional, Tuple, Type

# architecture name -> (module, class)
_MODELS: Dict[str, Tuple[str, str]] = {
    "LlamaForCausalLM": ("llama", "LlamaForCausalLM"),
    "LLaMAForCausalLM": ("llama", "LlamaForCausalLM"),
    # llama-shaped aliases (reference: models/__init__.py:21,36)
    "AquilaModel": ("llama", "LlamaForCausalLM"),
    "AquilaForCausalLM": ("llama", "LlamaForCausalLM"),
    "InternLMForCausalLM": ("llama", "LlamaForCausalLM"),
    "MistralForCausalLM": ("llama", "LlamaForCausalLM"),
    "Qwen2ForCausalLM": ("llama", "LlamaForCausalLM"),
    "TinyLlamaForCausalLM": ("llama", "LlamaForCausalLM"),
    "MixtralForCausalLM": ("mixtral", "MixtralForCausalLM"),
    "QuantMixtralForCausalLM": ("mixtral", "MixtralForCausalLM"),
    "GemmaForCausalLM": ("gemma", "GemmaForCausalLM"),
    "Gemma2ForCausalLM": ("gemma2", "Gemma2ForCausalLM"),
    "GPT2LMHeadModel": ("gpt2", "GPT2LMHeadModel"),
    "OPTForCausalLM": ("opt", "OPTForCausalLM"),
    "GPTNeoXForCausalLM": ("gpt_neox", "GPTNeoXForCausalLM"),
    "GPTJForCausalLM": ("gpt_j", "GPTJForCausalLM"),
    "GPTBigCodeForCausalLM": ("gpt_bigcode", "GPTBigCodeForCausalLM"),
    "PhiForCausalLM": ("phi", "PhiForCausalLM"),
    "Phi3ForCausalLM": ("phi3", "Phi3ForCausalLM"),
    "Phi3SmallForCausalLM": ("phi3_small", "Phi3SmallForCausalLM"),
    "Phi3VForCausalLM": ("phi3v", "Phi3VForCausalLM"),
    "BloomForCausalLM": ("bloom", "BloomForCausalLM"),
    "MPTForCausalLM": ("mpt", "MPTForCausalLM"),
    "MptForCausalLM": ("mpt", "MPTForCausalLM"),
    "FalconForCausalLM": ("falcon", "FalconForCausalLM"),
    "RWForCausalLM": ("falcon", "FalconForCausalLM"),
    "StableLmForCausalLM": ("stablelm", "StablelmForCausalLM"),
    "StableLMEpochForCausalLM": ("stablelm", "StablelmForCausalLM"),
    "Starcoder2ForCausalLM": ("starcoder2", "Starcoder2ForCausalLM"),
    "OlmoForCausalLM": ("olmo", "OlmoForCausalLM"),
    "CohereForCausalLM": ("commandr", "CohereForCausalLM"),
    "Qwen2MoeForCausalLM": ("qwen2_moe", "Qwen2MoeForCausalLM"),
    "QWenLMHeadModel": ("qwen", "QWenLMHeadModel"),
    "BaiChuanForCausalLM": ("baichuan", "BaiChuanForCausalLM"),
    "BaichuanForCausalLM": ("baichuan", "BaichuanForCausalLM"),
    "InternLM2ForCausalLM": ("internlm2", "InternLM2ForCausalLM"),
    "OrionForCausalLM": ("orion", "OrionForCausalLM"),
    "ChatGLMModel": ("chatglm", "ChatGLMForCausalLM"),
    "ChatGLMForConditionalGeneration": ("chatglm", "ChatGLMForCausalLM"),
    "DeepseekForCausalLM": ("deepseek", "DeepseekForCausalLM"),
    "MiniCPMForCausalLM": ("minicpm", "MiniCPMForCausalLM"),
    "JAISLMHeadModel": ("jais", "JAISLMHeadModel"),
    "DbrxForCausalLM": ("dbrx", "DbrxForCausalLM"),
    "ArcticForCausalLM": ("arctic", "ArcticForCausalLM"),
    "InternLMXComposer2ForCausalLM": (
        "internlm_xcomposer2", "InternLMXComposer2ForCausalLM"),
    "DeciLMForCausalLM": ("decilm", "DeciLMForCausalLM"),
    "LlavaForConditionalGeneration": ("llava",
                                      "LlavaForConditionalGeneration"),
    # llama-architecture aliases (reference registers these separately:
    # models/decilm.py and xverse.py are llama-shaped)
    "XverseForCausalLM": ("llama", "LlamaForCausalLM"),
    "YiForCausalLM": ("llama", "LlamaForCausalLM"),
    # embedding models (reference: models/__init__.py _EMBEDDING_MODELS)
    "LlamaModel": ("llama_embedding", "LlamaEmbeddingModel"),
    "MistralModel": ("llama_embedding", "LlamaEmbeddingModel"),
    "LlamaEmbeddingModel": ("llama_embedding", "LlamaEmbeddingModel"),
}

_EMBEDDING_MODELS = {"LlamaModel", "MistralModel", "LlamaEmbeddingModel"}

_OOT_MODELS: Dict[str, Type] = {}


class ModelRegistry:

    @staticmethod
    def load_model_cls(arch: str) -> Optional[Type]:
        if arch in _OOT_MODELS:
            return _OOT_MODELS[arch]
        if arch not in _MODELS:
            return None
        module_name, cls_name = _MODELS[arch]
        module = importlib.import_module(
            f"vllm_legacy_tpu.models.{module_name}")
        return getattr(module, cls_name)

    @staticmethod
    def get_supported_archs() -> List[str]:
        return list(_MODELS.keys()) + list(_OOT_MODELS.keys())

    @staticmethod
    def register_model(arch: str, model_cls: Type) -> None:
        _OOT_MODELS[arch] = model_cls

    @staticmethod
    def is_embedding_model(architectures: List[str]) -> bool:
        return any(a in _EMBEDDING_MODELS for a in architectures)

    @staticmethod
    def resolve_model_cls(architectures: List[str]) -> Tuple[Type, str]:
        for arch in architectures:
            cls = ModelRegistry.load_model_cls(arch)
            if cls is not None:
                return cls, arch
        raise ValueError(
            f"Model architectures {architectures} are not supported. "
            f"Supported: {ModelRegistry.get_supported_archs()}")
