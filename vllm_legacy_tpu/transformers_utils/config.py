"""HF config resolution (reference: vllm/transformers_utils/config.py)."""
from __future__ import annotations

from typing import Optional

from transformers import AutoConfig, PretrainedConfig


def get_hf_config(model: str,
                  trust_remote_code: bool = False,
                  revision: Optional[str] = None) -> PretrainedConfig:
    # In-tree shims first (reference keeps dbrx/jais/arctic/... configs
    # in vllm/transformers_utils/configs so checkpoints load without
    # trust_remote_code).
    import json
    import os
    cfg_file = os.path.join(model, "config.json")
    if os.path.isfile(cfg_file):
        with open(cfg_file) as f:
            model_type = json.load(f).get("model_type")
        from vllm_legacy_tpu.transformers_utils.configs import (
            CONFIG_REGISTRY)
        if model_type in CONFIG_REGISTRY:
            return CONFIG_REGISTRY[model_type].from_pretrained(
                model, revision=revision)
    return AutoConfig.from_pretrained(model,
                                      trust_remote_code=trust_remote_code,
                                      revision=revision)
