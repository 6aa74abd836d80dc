"""Offline throughput benchmark (reference: benchmarks/
benchmark_throughput.py :242-243 — requests/s and total tokens/s over a
fixed-length or sampled workload)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E501  repo-root import without install
import json
import random
import time


def sample_requests(args, tokenizer):
    if args.dataset:
        with open(args.dataset) as f:
            data = json.load(f)
        random.seed(args.seed)
        convs = [d["conversations"] for d in data
                 if len(d.get("conversations", [])) >= 2]
        sampled = random.sample(convs, min(args.num_prompts, len(convs)))
        return [(c[0]["value"], None, args.output_len or 128)
                for c in sampled]
    prompt_ids = list(range(1, args.input_len + 1))
    return [(None, prompt_ids, args.output_len)
            for _ in range(args.num_prompts)]


def main(args: argparse.Namespace) -> None:
    from vllm_legacy_tpu.engine.arg_utils import EngineArgs
    from vllm_legacy_tpu.engine.llm_engine import LLMEngine
    from vllm_legacy_tpu.sampling_params import SamplingParams

    engine_args = EngineArgs.from_cli_args(args)
    engine = LLMEngine.from_engine_args(engine_args)
    tokenizer = (engine.get_tokenizer()
                 if not args.skip_tokenizer_init else None)
    requests = sample_requests(args, tokenizer)

    start = time.perf_counter()
    for i, (prompt, prompt_ids, output_len) in enumerate(requests):
        params = SamplingParams(
            n=args.n,
            temperature=0.0 if args.greedy else 1.0,
            top_p=1.0,
            ignore_eos=True,
            max_tokens=output_len,
            detokenize=not args.skip_tokenizer_init,
        )
        inputs = ({"prompt": prompt} if prompt is not None else
                  {"prompt_token_ids": prompt_ids})
        engine.add_request(str(i), inputs, params)

    total_out = 0
    last = {}
    while engine.has_unfinished_requests():
        for out in engine.step():
            n_tok = sum(len(o.token_ids) for o in out.outputs)
            total_out += n_tok - last.get(out.request_id, 0)
            last[out.request_id] = n_tok
    elapsed = time.perf_counter() - start

    total_prompt = sum(
        len(r[1]) if r[1] else len(tokenizer.encode(r[0]))
        for r in requests)
    total = total_prompt + total_out
    print(f"Throughput: {len(requests) / elapsed:.2f} requests/s, "
          f"{total / elapsed:.2f} tokens/s "
          f"({total_out / elapsed:.2f} output tokens/s)")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Benchmark throughput.")
    parser.add_argument("--dataset", type=str, default=None,
                        help="ShareGPT-format json")
    parser.add_argument("--input-len", type=int, default=256)
    parser.add_argument("--output-len", type=int, default=256)
    parser.add_argument("--num-prompts", type=int, default=64)
    parser.add_argument("--n", type=int, default=1)
    parser.add_argument("--greedy", action="store_true", default=True)
    from vllm_legacy_tpu.engine.arg_utils import EngineArgs
    parser = EngineArgs.add_cli_args(parser)
    main(parser.parse_args())
