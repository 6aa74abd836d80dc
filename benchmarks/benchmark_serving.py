"""Online serving benchmark (reference: benchmarks/benchmark_serving.py
:46-60 BenchmarkMetrics — request/input/output tok/s and mean/median/p99
TTFT & TPOT against the OpenAI server with a Poisson request rate)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E501  repo-root import without install
import asyncio
import json
import random
import time
from dataclasses import dataclass, field
from typing import List, Optional

import aiohttp
import numpy as np


@dataclass
class RequestResult:
    prompt_len: int = 0
    output_len: int = 0
    ttft: float = 0.0
    latency: float = 0.0
    itls: List[float] = field(default_factory=list)
    success: bool = False


async def send_request(session, url, model, prompt, output_len,
                       result: RequestResult):
    payload = {
        "model": model,
        "prompt": prompt,
        "max_tokens": output_len,
        "temperature": 0.0,
        "ignore_eos": True,
        "stream": True,
    }
    t0 = time.perf_counter()
    last = t0
    try:
        async with session.post(url, json=payload) as resp:
            if resp.status != 200:
                return
            async for line in resp.content:
                line = line.decode().strip()
                if not line.startswith("data: "):
                    continue
                if line == "data: [DONE]":
                    break
                now = time.perf_counter()
                if result.ttft == 0.0:
                    result.ttft = now - t0
                else:
                    result.itls.append(now - last)
                last = now
                result.output_len += 1
        result.latency = time.perf_counter() - t0
        result.success = True
    except Exception:
        pass


async def run(args):
    if args.dataset:
        with open(args.dataset) as f:
            data = json.load(f)
        random.seed(0)
        convs = [d["conversations"][0]["value"] for d in data
                 if len(d.get("conversations", [])) >= 1]
        prompts = random.sample(convs, min(args.num_prompts, len(convs)))
    else:
        prompts = ["Benchmark prompt " + "x " * args.input_len
                   for _ in range(args.num_prompts)]

    url = f"http://{args.host}:{args.port}/v1/completions"
    results = [RequestResult(prompt_len=len(p.split()))
               for p in prompts]
    async with aiohttp.ClientSession(
            timeout=aiohttp.ClientTimeout(total=3600)) as session:
        tasks = []
        t_start = time.perf_counter()
        for prompt, result in zip(prompts, results):
            if args.request_rate != float("inf"):
                await asyncio.sleep(
                    random.expovariate(args.request_rate))
            tasks.append(asyncio.create_task(
                send_request(session, url, args.model, prompt,
                             args.output_len, result)))
        await asyncio.gather(*tasks)
        elapsed = time.perf_counter() - t_start

    ok = [r for r in results if r.success]
    if not ok:
        print("No successful requests")
        return
    total_out = sum(r.output_len for r in ok)
    ttfts = np.asarray([r.ttft for r in ok])
    tpots = np.asarray([i for r in ok for i in r.itls]) \
        if any(r.itls for r in ok) else np.asarray([0.0])
    print(f"Successful requests: {len(ok)}/{len(results)}")
    print(f"Benchmark duration: {elapsed:.2f} s")
    print(f"Request throughput: {len(ok) / elapsed:.2f} req/s")
    print(f"Output token throughput: {total_out / elapsed:.2f} tok/s")
    print(f"Mean TTFT: {ttfts.mean() * 1e3:.2f} ms | "
          f"Median: {np.median(ttfts) * 1e3:.2f} ms | "
          f"P99: {np.percentile(ttfts, 99) * 1e3:.2f} ms")
    print(f"Mean TPOT: {tpots.mean() * 1e3:.2f} ms | "
          f"Median: {np.median(tpots) * 1e3:.2f} ms | "
          f"P99: {np.percentile(tpots, 99) * 1e3:.2f} ms")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Benchmark online serving (server must be running).")
    parser.add_argument("--host", type=str, default="localhost")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--dataset", type=str, default=None)
    parser.add_argument("--num-prompts", type=int, default=100)
    parser.add_argument("--input-len", type=int, default=128)
    parser.add_argument("--output-len", type=int, default=128)
    parser.add_argument("--request-rate", type=float,
                        default=float("inf"),
                        help="Poisson arrival rate (req/s); inf=burst")
    asyncio.run(run(parser.parse_args()))
