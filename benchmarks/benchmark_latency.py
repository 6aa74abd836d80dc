"""Single-batch latency benchmark (reference: benchmarks/
benchmark_latency.py :76-107 — avg / percentile end-to-end latency of a
fixed batch x input-len x output-len decode, with optional profiling)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E501  repo-root import without install
import time

import numpy as np


def main(args: argparse.Namespace) -> None:
    from vllm_legacy_tpu.engine.arg_utils import EngineArgs
    from vllm_legacy_tpu.engine.llm_engine import LLMEngine
    from vllm_legacy_tpu.sampling_params import SamplingParams

    engine = LLMEngine.from_engine_args(EngineArgs.from_cli_args(args))
    params = SamplingParams(temperature=0.0, max_tokens=args.output_len,
                            ignore_eos=True,
                            detokenize=not args.skip_tokenizer_init)
    prompt_ids = list(range(1, args.input_len + 1))

    def run_once(tag: str) -> float:
        for i in range(args.batch_size):
            engine.add_request(f"{tag}-{i}",
                               {"prompt_token_ids": prompt_ids}, params)
        t0 = time.perf_counter()
        while engine.has_unfinished_requests():
            engine.step()
        return time.perf_counter() - t0

    for i in range(args.num_iters_warmup):
        run_once(f"warm{i}")

    latencies = []
    profiler = None
    if args.profile:
        import jax
        jax.profiler.start_trace(args.profile_result_dir)
        profiler = True
    for i in range(args.num_iters):
        latencies.append(run_once(f"iter{i}"))
    if profiler:
        import jax
        jax.profiler.stop_trace()

    lat = np.asarray(latencies)
    pcts = [10, 25, 50, 75, 90, 99]
    print(f"Avg latency: {lat.mean():.4f} seconds")
    for p, v in zip(pcts, np.percentile(lat, pcts)):
        print(f"{p}% percentile latency: {v:.4f} seconds")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Benchmark the latency of a single batch.")
    parser.add_argument("--input-len", type=int, default=32)
    parser.add_argument("--output-len", type=int, default=128)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--num-iters-warmup", type=int, default=2)
    parser.add_argument("--num-iters", type=int, default=5)
    parser.add_argument("--profile", action="store_true")
    parser.add_argument("--profile-result-dir", type=str,
                        default="/tmp/vlt_profile")
    from vllm_legacy_tpu.engine.arg_utils import EngineArgs
    parser = EngineArgs.add_cli_args(parser)
    main(parser.parse_args())
