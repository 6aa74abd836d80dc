"""vllm-legacy-tpu: TPU-native continuous-batching LLM inference engine.

Brand-new JAX/XLA/Pallas implementation with the capability set of
DeepAuto-AI/vllm-legacy (vLLM 0.4.3 fork) — see SURVEY.md.
"""

__version__ = "0.1.0"

from vllm_legacy_tpu.engine.arg_utils import AsyncEngineArgs, EngineArgs
from vllm_legacy_tpu.engine.llm_engine import LLMEngine
from vllm_legacy_tpu.entrypoints.llm import LLM
from vllm_legacy_tpu.models.registry import ModelRegistry
from vllm_legacy_tpu.outputs import (CompletionOutput, RequestOutput)
from vllm_legacy_tpu.sampling_params import SamplingParams

__all__ = [
    "__version__",
    "LLM",
    "ModelRegistry",
    "SamplingParams",
    "RequestOutput",
    "CompletionOutput",
    "LLMEngine",
    "EngineArgs",
    "AsyncEngineArgs",
]
