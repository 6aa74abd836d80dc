"""Perplexity harness (BASELINE.md: WikiText-2 ppl delta vs FP16 <= 0.1).

Equivalent of the reference's accuracy checks (which lean on lm-eval /
HF comparisons, e.g. tests/models/test_marlin.py): computes corpus
perplexity from the engine's prompt_logprobs over sliding windows, so
the SAME kernels/quantization path being served is what gets measured.

Zero-egress environment: pass any local text file via --text-file
(WikiText-2's wiki.test.raw once available); without one, a
deterministic synthetic corpus is used — good for comparing two engine
configurations (e.g. fp16 vs int4 of the same checkpoint), which is what
the ppl-delta target needs.

Usage:
  python benchmarks/perplexity.py --model /path/to/ckpt --dtype float32
  python benchmarks/perplexity.py --model ckpt --quantization gptq \
      --baseline-ppl 5.47
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E501  repo-root import without install
import json
import math


def synthetic_corpus(n_chars: int = 20000) -> str:
    import random
    rng = random.Random(0)
    words = ("the of and to in is was for on that with as it by at from "
             "he she they we you this which or an be are were has had "
             "its into more their time would about after first new two "
             "people years work world over only state system group").split()
    return " ".join(rng.choice(words) for _ in range(n_chars // 5))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True)
    parser.add_argument("--text-file", default=None)
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--quantization", default=None)
    parser.add_argument("--window", type=int, default=1024)
    parser.add_argument("--max-windows", type=int, default=64)
    parser.add_argument("--baseline-ppl", type=float, default=None,
                        help="print the delta against this value")
    args = parser.parse_args()

    from vllm_legacy_tpu import LLM, SamplingParams

    if args.text_file:
        with open(args.text_file) as f:
            text = f.read()
    else:
        text = synthetic_corpus()

    llm = LLM(model=args.model, dtype=args.dtype,
              quantization=args.quantization,
              max_model_len=args.window + 8, disable_log_stats=True)
    tokenizer = llm.llm_engine.tokenizer.tokenizer
    ids = tokenizer.encode(text)

    windows = [
        ids[i:i + args.window]
        for i in range(0, len(ids) - args.window, args.window)
    ][:args.max_windows]
    params = SamplingParams(temperature=0.0, max_tokens=1,
                            prompt_logprobs=0, detokenize=False)
    outputs = llm.generate(prompts=None, sampling_params=params,
                           prompt_token_ids=windows, use_tqdm=True)

    total_lp, total_toks = 0.0, 0
    for out in outputs:
        for entry in out.prompt_logprobs or []:
            if not entry:
                continue
            total_lp += next(iter(entry.values())).logprob
            total_toks += 1
    ppl = math.exp(-total_lp / max(total_toks, 1))
    result = {"metric": "perplexity", "value": round(ppl, 4),
              "tokens": total_toks}
    if args.baseline_ppl is not None:
        result["delta_vs_baseline"] = round(ppl - args.baseline_ppl, 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
