"""Prefix-caching benchmark (reference: benchmarks/
benchmark_prefix_caching.py — repeated long-shared-prompt batch, cached
vs uncached latency).

Sends N requests sharing one long prefix twice: the first pass
populates the content-hash block cache, the second must hit it and
skip the shared prefill compute. Prints per-pass latency and the
computed-token counts that prove the hit.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E501  repo-root import without install
import json
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=None,
                   help="HF checkpoint dir; dummy TinyLlama if unset")
    p.add_argument("--prefix-len", type=int, default=1024)
    p.add_argument("--suffix-len", type=int, default=16)
    p.add_argument("--num-prompts", type=int, default=16)
    p.add_argument("--output-len", type=int, default=32)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    from vllm_legacy_tpu.engine.llm_engine import LLMEngine
    from vllm_legacy_tpu.sampling_params import SamplingParams

    if args.model:
        from vllm_legacy_tpu.engine.arg_utils import EngineArgs
        engine = LLMEngine.from_engine_args(
            EngineArgs(model=args.model, dtype=args.dtype,
                       enable_prefix_caching=True,
                       disable_log_stats=True))
    else:
        from vllm_legacy_tpu.testing_utils import (
            make_dummy_engine_config, tinyllama_1_1b_hf_config)
        cfg = make_dummy_engine_config(
            tinyllama_1_1b_hf_config(), dtype=args.dtype,
            max_model_len=args.prefix_len + args.suffix_len +
            args.output_len + 16,
            max_num_seqs=args.num_prompts, hbm_utilization=0.85,
            enable_prefix_caching=True)
        engine = LLMEngine(cfg, log_stats=False)

    prefix = list(range(1, args.prefix_len + 1))
    sp = SamplingParams(temperature=0.0, max_tokens=args.output_len,
                        ignore_eos=True, detokenize=False)

    def run(tag: str, base: int) -> float:
        t0 = time.perf_counter()
        for i in range(args.num_prompts):
            suffix = [base + i * args.suffix_len + j
                      for j in range(args.suffix_len)]
            engine.add_request(f"{tag}-{i}",
                               {"prompt_token_ids": prefix + suffix},
                               sp)
        while engine.has_unfinished_requests():
            engine.step()
        return time.perf_counter() - t0

    runner = engine.model_executor.worker.model_runner
    cold = run("cold", 2_000)
    cold_tokens = getattr(runner, "total_prefill_tokens", 0)
    warm = run("warm", 30_000)
    warm_tokens = getattr(runner, "total_prefill_tokens", 0) - \
        cold_tokens

    print(json.dumps({
        "metric": "prefix_cache_speedup",
        "cold_s": round(cold, 3),
        "warm_s": round(warm, 3),
        "value": round(cold / warm, 3),
        "unit": "x",
        "cold_prefill_tokens": int(cold_tokens),
        "warm_prefill_tokens": int(warm_tokens),
    }))


if __name__ == "__main__":
    main()
