"""Lazy environment-variable registry.

Parity with the reference's ``vllm/envs.py`` (~30 VLLM_* vars) plus the
fork's ad-hoc envs (CACHE_ENGINE, HIP_K, ... — SURVEY.md §5.6), renamed to
a single VLT_* namespace for this engine.
"""
from __future__ import annotations

import os
from typing import Any, Callable

environment_variables: dict[str, Callable[[], Any]] = {
    # Attention backend override: "pallas" | "xla" (reference impl).
    "VLT_ATTENTION_BACKEND":
    lambda: os.getenv("VLT_ATTENTION_BACKEND", None),
    # Logging.
    "VLT_CONFIGURE_LOGGING":
    lambda: int(os.getenv("VLT_CONFIGURE_LOGGING", "1")),
    "VLT_LOGGING_LEVEL":
    lambda: os.getenv("VLT_LOGGING_LEVEL", "INFO"),
    "VLT_TRACE_FUNCTION":
    lambda: int(os.getenv("VLT_TRACE_FUNCTION", "0")),
    # Engine behavior.
    "VLT_ENGINE_ITERATION_TIMEOUT_S":
    lambda: int(os.getenv("VLT_ENGINE_ITERATION_TIMEOUT_S", "60")),
    "VLT_API_KEY":
    lambda: os.getenv("VLT_API_KEY", None),
    # Usage stats are always off (no telemetry in this engine).
    "VLT_NO_USAGE_STATS":
    lambda: int(os.getenv("VLT_NO_USAGE_STATS", "1")),
    # Test hooks (reference: VLLM_TEST_ENABLE_ARTIFICIAL_PREEMPT,
    # core/scheduler.py:21-24).
    "VLT_TEST_ENABLE_ARTIFICIAL_PREEMPT":
    lambda: int(os.getenv("VLT_TEST_ENABLE_ARTIFICIAL_PREEMPT", "0")),
    # Per-step runner instrumentation (fork: BENCHMARK_RUNNER,
    # model_runner.py:992).
    "VLT_BENCHMARK_RUNNER":
    lambda: int(os.getenv("VLT_BENCHMARK_RUNNER", "0")),
    # Force interpret mode for Pallas kernels (debugging / CPU test runs).
    "VLT_PALLAS_INTERPRET":
    lambda: int(os.getenv("VLT_PALLAS_INTERPRET", "0")),
    # Persistent XLA compilation cache directory ("" disables). First
    # compiles of each (phase, bucket) shape cost 5-40s; the cache
    # makes every later engine start skip them.
    "VLT_COMPILATION_CACHE_DIR":
    lambda: os.getenv("VLT_COMPILATION_CACHE_DIR", "/tmp/vlt_xla_cache"),
    # Use the pure-XLA reference attention instead of Pallas kernels.
    "VLT_USE_XLA_OPS":
    lambda: int(os.getenv("VLT_USE_XLA_OPS", "0")),

    # pair-packed KV rows for head_size < 128 (halves KV HBM bytes +
    # decode DMA traffic; models/attention.use_packed_kv)
    "VLT_PACKED_KV":
    lambda: int(os.getenv("VLT_PACKED_KV", "1")),
    # fused single-buffer KV cache (K+V of a block in one DMA) +
    # gang-batched pipelined decode kernel; 0 falls back to split
    # 5-D caches (models/attention.use_fused_kv)
    "VLT_FUSED_KV":
    lambda: int(os.getenv("VLT_FUSED_KV", "1")),
    # gang decode kernel tuning: sequences per grid cell and KV blocks
    # per pipelined superblock unit (ops/pallas/fused_decode.py);
    # defaults measured best on v5e for block_size 64
    # decode new-token write strategy: 1 = XLA scatter into the HBM
    # cache before the kernel (blocks stream in already updated; no
    # in-kernel merge); 0 = in-kernel tile merge + writeback DMAs
    "VLT_DECODE_PREWRITE":
    lambda: int(os.getenv("VLT_DECODE_PREWRITE", "0")),
    "VLT_DECODE_GANG":
    lambda: int(os.getenv("VLT_DECODE_GANG", "16")),
    "VLT_DECODE_KBLK":
    lambda: int(os.getenv("VLT_DECODE_KBLK", "4")),
    # Ceiling on a multi-step decode burst under queue pressure when a
    # scheduled decode may finish EARLY (EOS / stop strings): their
    # finishes are unpredictable, so the scheduler clamps the
    # capacity-freeing horizon to this many steps (core/scheduler.py
    # finalize). Bursts with only guaranteed-length decodes (e.g.
    # ignore_eos benchmarks) use the exact max_tokens horizon instead.
    "VLT_MAX_PRESSURED_BURST":
    lambda: int(os.getenv("VLT_MAX_PRESSURED_BURST", "8")),
}


def __getattr__(name: str) -> Any:
    if name in environment_variables:
        return environment_variables[name]()
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__() -> list[str]:
    return list(environment_variables.keys())
