"""Paged-attention decode kernel microbenchmark (reference:
benchmarks/kernels/benchmark_paged_attention.py — latency over
(batch, context, GQA) grid)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))  # noqa: E501
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from vllm_legacy_tpu.ops.pallas import paged_attention as pk


def run_case(batch: int, ctx: int, hq: int, hkv: int, head: int,
             block_size: int, iters: int) -> float:
    num_blocks = batch * (ctx // block_size + 2) + 8
    kc = jnp.zeros((1, num_blocks, hkv, block_size, head), jnp.bfloat16)
    vc = jnp.zeros_like(kc)
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (batch, hq, head), jnp.bfloat16)
    kn = jax.random.normal(key, (batch, hkv, head), jnp.bfloat16)
    vn = jax.random.normal(key, (batch, hkv, head), jnp.bfloat16)
    nblk = ctx // block_size + 2
    tables = np.zeros((batch, nblk), np.int32)
    for i in range(batch):
        tables[i] = np.arange(i * nblk, (i + 1) * nblk) % (
            num_blocks - 1) + 1
    bt = jnp.asarray(tables)
    cl = jnp.full((batch, ), ctx, jnp.int32)
    lidx = jnp.zeros((1, ), jnp.int32)

    def step(q, kn, vn, kc, vc):
        o, kc, vc = pk.paged_attention_decode(
            q, kn, vn, kc, vc, lidx, bt, cl, scale=head**-0.5)
        return o.astype(jnp.float32).sum(), kc, vc

    f = jax.jit(step, donate_argnums=(3, 4))
    acc, kc, vc = f(q, kn, vn, kc, vc)
    jax.device_get(acc)
    t0 = time.perf_counter()
    for _ in range(iters):
        acc, kc, vc = f(q, kn, vn, kc, vc)
    jax.device_get(acc)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--head-size", type=int, default=128)
    p.add_argument("--block-size", type=int, default=16)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()
    for batch in (16, 64, 256):
        for ctx in (512, 2048):
            for hq, hkv in ((32, 32), (32, 8), (32, 4)):
                dt = run_case(batch, ctx, hq, hkv, args.head_size,
                              args.block_size, args.iters)
                kv_bytes = 2 * batch * ctx * hkv * args.head_size * 2
                print(json.dumps({
                    "metric": "paged_attention_decode_us",
                    "batch": batch, "ctx": ctx, "hq": hq, "hkv": hkv,
                    "value": round(dt * 1e6, 1), "unit": "us",
                    "kv_gbps": round(kv_bytes / dt / 1e9, 1),
                }))


if __name__ == "__main__":
    main()
