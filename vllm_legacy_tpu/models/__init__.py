"""Model zoo (reference: vllm/model_executor/models/)."""
from vllm_legacy_tpu.models.registry import ModelRegistry

__all__ = ["ModelRegistry"]
