"""Fused-MoE microbenchmark (reference:
benchmarks/kernels/benchmark_mixtral_moe.py — routed expert MLP latency
over token counts; layers/fused_moe.py dense expert-parallel form)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))  # noqa: E501
import json
import time

import jax
import jax.numpy as jnp

from vllm_legacy_tpu.layers.fused_moe import fused_moe


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--hidden", type=int, default=4096)
    p.add_argument("--inter", type=int, default=14336)
    p.add_argument("--experts", type=int, default=8)
    p.add_argument("--top-k", type=int, default=2)
    args = p.parse_args()
    h, inter, e, k = args.hidden, args.inter, args.experts, args.top_k

    key = jax.random.PRNGKey(0)
    wr = jax.random.normal(key, (h, e), jnp.bfloat16) * 0.02
    w1 = jax.random.normal(key, (e, h, 2 * inter), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(key, (e, inter, h), jnp.bfloat16) * 0.02
    f = jax.jit(lambda x: fused_moe(x, wr, w1, w2, top_k=k,
                                    num_experts=e))
    for t in (1, 64, 512, 4096):
        x = jax.random.normal(key, (t, h), jnp.bfloat16)
        out = f(x)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            out = f(x)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        useful_flops = 2 * t * k * (3 * h * inter)
        print(json.dumps({
            "metric": "fused_moe_us", "tokens": t, "experts": e,
            "top_k": k, "value": round(dt * 1e6, 1), "unit": "us",
            "useful_tflops": round(useful_flops / dt / 1e12, 2),
        }))


if __name__ == "__main__":
    main()
