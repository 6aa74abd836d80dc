"""HF config resolution (reference: vllm/transformers_utils/config.py)."""
from __future__ import annotations

from typing import Optional

from transformers import AutoConfig, PretrainedConfig


def get_hf_config(model: str,
                  trust_remote_code: bool = False,
                  revision: Optional[str] = None) -> PretrainedConfig:
    return AutoConfig.from_pretrained(model,
                                      trust_remote_code=trust_remote_code,
                                      revision=revision)
