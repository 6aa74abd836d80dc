"""Offline serving simulation: Poisson arrivals into the engine loop,
TTFT/TPOT measured from RequestMetrics (first_token_time - arrival_time,
the same definitions as benchmark_serving.py / the reference's
BenchmarkMetrics, benchmarks/benchmark_serving.py:46-60) — but without
an HTTP server or tokenizer, so dummy-weight checkpoints work and the
numbers isolate engine+kernels from serving-stack overhead.

Usage (env, like bench.py):
  BENCH_MODEL=7b_int4 SIM_RATE=8 SIM_REQUESTS=64 \
      python benchmarks/offline_serving_sim.py
"""
from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E501


def main() -> None:
    from bench import build_config
    from vllm_legacy_tpu.engine.llm_engine import LLMEngine
    from vllm_legacy_tpu.sampling_params import SamplingParams

    model = os.getenv("BENCH_MODEL", "tinyllama_bf16")
    input_len = int(os.getenv("BENCH_INPUT_LEN", "256"))
    output_len = int(os.getenv("BENCH_OUTPUT_LEN", "128"))
    n_requests = int(os.getenv("SIM_REQUESTS", "64"))
    rate = float(os.getenv("SIM_RATE", "8"))  # req/s Poisson

    engine = LLMEngine(build_config(model, input_len, output_len,
                                    min(n_requests, 64)),
                       log_stats=False)
    params = SamplingParams(temperature=0.0, max_tokens=output_len,
                            ignore_eos=True, detokenize=False)

    # Warm the compile caches so TTFT measures steady-state serving,
    # not first-compile (reference servers warm up the same way).
    engine.add_request("warm", {"prompt_token_ids":
                                list(range(1, input_len + 1))}, params)
    while engine.has_unfinished_requests():
        engine.step()

    rng = random.Random(0)
    arrivals = []
    t = 0.0
    for i in range(n_requests):
        t += rng.expovariate(rate)
        arrivals.append(t)

    t0 = time.perf_counter()
    sent = 0
    groups = {}
    while sent < n_requests or engine.has_unfinished_requests():
        now = time.perf_counter() - t0
        while sent < n_requests and arrivals[sent] <= now:
            rid = str(sent)
            engine.add_request(
                rid, {"prompt_token_ids":
                      [sent % 1000 + 1] * input_len}, params)
            sent += 1
        outs = engine.step()
        for o in outs:
            groups.setdefault(o.request_id, o)
        if not outs and sent < n_requests:
            time.sleep(min(0.005, max(arrivals[sent] - now, 0)))
    elapsed = time.perf_counter() - t0

    # metrics live on the scheduler's seq groups; engine outputs carry
    # them via RequestOutput.metrics
    ttfts, tpots = [], []
    n_out = 0
    for o in groups.values():
        if o.request_id == "warm" or o.metrics is None:
            continue
        m = o.metrics
        if m.first_token_time and m.arrival_time:
            ttfts.append(m.first_token_time - m.arrival_time)
        if m.finished_time and m.first_token_time and output_len > 1:
            tpots.append((m.finished_time - m.first_token_time) /
                         (output_len - 1))
        n_out += output_len

    import numpy as np
    ttfts_a = np.asarray(sorted(ttfts))
    tpots_a = np.asarray(sorted(tpots)) if tpots else np.asarray([0.0])
    print(json.dumps({
        "model": model,
        "requests": n_requests,
        "rate_req_s": rate,
        "duration_s": round(elapsed, 2),
        "output_tok_s": round(n_out / elapsed, 1),
        "ttft_p50_ms": round(float(np.median(ttfts_a)) * 1e3, 1),
        "ttft_p99_ms": round(float(np.percentile(ttfts_a, 99)) * 1e3, 1),
        "tpot_p50_ms": round(float(np.median(tpots_a)) * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
