"""Multi-LoRA serving (reference: vllm/lora/ — SURVEY.md §2.8).

TPU redesign: the reference's Punica BGMV CUDA kernels (csrc/punica/)
batch per-token adapter gathers; on TPU the adapter count is small and
ranks are tiny, so the batched application is a dense loop over ACTIVE
slots with a per-token mask — a handful of skinny MXU matmuls fused
into the base layer's epilogue (lora/layers.py), no custom kernel
needed at these sizes.
"""
from vllm_legacy_tpu.lora.request import LoRARequest

__all__ = ["LoRARequest"]
