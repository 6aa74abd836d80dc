"""TPU-native compute ops.

This package replaces the reference's CUDA/Triton kernel zoo
(``csrc/attention/attention_kernels.cu``, ``csrc/cache_kernels.cu``,
``vllm/attention/ops/``) with:

* pure-XLA reference implementations (``xla_attention.py``) — used for
  correctness tests and as a CPU fallback, and
* Pallas TPU kernels (``pallas/``) — the production path.

Dispatch between them lives in ``attention.py``.
"""
from vllm_legacy_tpu.ops.attention import (paged_attention_decode,
                                           paged_attention_prefill)
from vllm_legacy_tpu.ops.kv_cache import (copy_blocks, gather_blocks,
                                          scatter_blocks,
                                          write_to_kv_cache)

__all__ = [
    "paged_attention_decode",
    "paged_attention_prefill",
    "write_to_kv_cache",
    "copy_blocks",
    "gather_blocks",
    "scatter_blocks",
]
