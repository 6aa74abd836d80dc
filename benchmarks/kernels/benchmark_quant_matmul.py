"""Fused dequant-GEMM microbenchmark (reference counterparts:
benchmarks/kernels/benchmark_marlin.py + benchmark_aqlm.py — quantized
GEMM vs dense over M; here the single TPU packed-groupwise kernel
serves GPTQ/AWQ/marlin checkpoints, ops/pallas/quant_matmul.py)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))  # noqa: E501
import json
import time

import jax
import jax.numpy as jnp

from vllm_legacy_tpu.ops.pallas.quant_matmul import quant_matmul


def bench(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=4096)
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--bits", type=int, default=4, choices=(4, 8))
    p.add_argument("--group-size", type=int, default=128)
    args = p.parse_args()
    k, n, bits, gs = args.k, args.n, args.bits, args.group_size

    key = jax.random.PRNGKey(0)
    qw_rows = k // 2 if bits == 4 else k
    qweight = jax.random.randint(key, (qw_rows, n), 0, 255,
                                 jnp.int32).astype(jnp.uint8)
    scales = jnp.ones((k // gs, n), jnp.float32) * 0.01
    szeros = jnp.zeros((k // gs, n), jnp.float32)
    wdense = jax.random.normal(key, (k, n), jnp.bfloat16)

    for m in (1, 16, 128, 1024, 4096):
        x = jax.random.normal(key, (m, k), jnp.bfloat16)
        dt_q = bench(lambda x: quant_matmul(x, qweight, scales, szeros,
                                            bits=bits, group_size=gs), x)
        dt_d = bench(jax.jit(lambda x: jnp.dot(
            x, wdense, preferred_element_type=jnp.float32).astype(
                jnp.bfloat16)), x)
        flops = 2 * m * k * n
        print(json.dumps({
            "metric": f"quant_matmul_int{bits}",
            "m": m, "k": k, "n": n,
            "value": round(dt_q * 1e6, 1), "unit": "us",
            "tflops": round(flops / dt_q / 1e12, 2),
            "dense_us": round(dt_d * 1e6, 1),
            "vs_dense": round(dt_d / dt_q, 2),
        }))


if __name__ == "__main__":
    main()
