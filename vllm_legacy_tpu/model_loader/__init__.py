"""Weight loading (reference: vllm/model_executor/model_loader/)."""
from vllm_legacy_tpu.model_loader.loader import get_model

__all__ = ["get_model"]
