"""On-chip microbenchmark: fused dequant-GEMM at Llama-7B decode shapes.

Roofline: the GEMM is weight-bound at small M; time ~= qweight bytes
(K*N/2) + scales/szeros bytes over HBM bandwidth (~819 GB/s on v5e).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax
import jax.numpy as jnp
import numpy as np

from vllm_legacy_tpu.ops.pallas.quant_matmul import quant_matmul

SHAPES = [  # (m, k, n, label)
    (16, 4096, 4096, "qkv/o"),
    (16, 4096, 11008, "gate/up"),
    (16, 11264, 4096, "down (11008 padded to K tiles)"),
    (256, 4096, 11008, "gate/up b256"),
    (33, 4096, 11008, "gate/up b33"),
]

def bench(m, k, n, g=128, iters=20):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(m, k).astype(np.float32), jnp.bfloat16)
    qw = jnp.asarray(rng.randint(0, 256, size=(k // 2, n)).astype(np.uint8))
    sc = jnp.asarray(rng.rand(k // g, n).astype(np.float32) * 0.01)
    sz = jnp.asarray(rng.rand(k // g, n).astype(np.float32) * 0.01)

    # iterations chained inside ONE jit: each x depends on the previous
    # output, so neither XLA loop-invariant hoisting nor the axon
    # tunnel's identical-dispatch dedupe can elide work (repeated
    # identical f() calls measured impossible >800 GB/s rates); fence
    # with a host transfer (block_until_ready can return early through
    # the tunnel).
    @jax.jit
    def sweep(x, qw, sc, sz):
        def body(i, x):
            out = quant_matmul(x, qw, sc, sz, bits=4, group_size=g)
            return x * (1.0 + out[0, :1].astype(x.dtype) * 1e-30)
        return jax.lax.fori_loop(0, iters, body, x)

    x1 = sweep(x, qw, sc, sz)
    float(jnp.sum(x1.astype(jnp.float32)))  # compile + warm
    t0 = time.perf_counter()
    x2 = sweep(x1, qw, sc, sz)
    float(jnp.sum(x2.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    bytes_w = k * n / 2 + 2 * (k // g) * n * 4
    # ~310-430 GB/s is this chip's demonstrated HBM stream rate
    # (stream_probe.py / XLA reduce); 819 is the v5e paper number
    roof = bytes_w / 819e9
    print(f"m={m:4d} k={k:5d} n={n:5d}: {dt*1e3:7.3f} ms "
          f"(819GB/s roofline {roof*1e3:.3f} ms, {roof/dt*100:.0f}% of SoL)")

if __name__ == "__main__":
    for m, k, n, label in SHAPES:
        bench(m, k, n)
