"""In-tree HF config shims for architectures whose configs are not in
transformers (reference: vllm/transformers_utils/configs/ — dbrx, jais,
arctic, mpt, falcon, chatglm; most of those now ship in transformers, so
only the still-missing ones live here)."""
from __future__ import annotations

from vllm_legacy_tpu.transformers_utils.configs.arctic import ArcticConfig
from vllm_legacy_tpu.transformers_utils.configs.internlm_xcomposer2 import (
    InternLMXComposer2Config)
from vllm_legacy_tpu.transformers_utils.configs.phi3_small import (
    Phi3SmallConfig)
from vllm_legacy_tpu.transformers_utils.configs.phi3_v import (
    Phi3VConfig)

# model_type -> config class, consulted by get_hf_config before
# AutoConfig so these checkpoints load without trust_remote_code.
CONFIG_REGISTRY = {
    "arctic": ArcticConfig,
    "internlmxcomposer2": InternLMXComposer2Config,
    "phi3small": Phi3SmallConfig,
    "phi3_v": Phi3VConfig,
}

__all__ = ["ArcticConfig", "InternLMXComposer2Config",
           "Phi3SmallConfig", "Phi3VConfig", "CONFIG_REGISTRY"]
