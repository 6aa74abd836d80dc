"""Rotary-embedding microbenchmark (reference:
benchmarks/kernels/benchmark_rope.py — batched rope latency; on TPU
rope is XLA-fused elementwise, layers/rotary.py)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))  # noqa: E501
import json
import time

import jax
import jax.numpy as jnp

from vllm_legacy_tpu.layers.rotary import apply_rope, build_cos_sin_cache


def main() -> None:
    head, hq, hkv = 128, 32, 8
    cache = jnp.asarray(build_cos_sin_cache(head, head, 8192, 10000.0,
                                            None))
    key = jax.random.PRNGKey(0)
    f = jax.jit(lambda q, k, p: apply_rope(q, k, p, cache,
                                           rotary_dim=head))
    for t in (1, 256, 4096, 16384):
        q = jax.random.normal(key, (t, hq, head), jnp.bfloat16)
        k = jax.random.normal(key, (t, hkv, head), jnp.bfloat16)
        p = jnp.arange(t, dtype=jnp.int32) % 8192
        out = f(q, k, p)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(50):
            out = f(q, k, p)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 50
        print(json.dumps({
            "metric": "rope_us", "tokens": t,
            "value": round(dt * 1e6, 1), "unit": "us",
        }))


if __name__ == "__main__":
    main()
