"""On-chip microbenchmark: fused dequant-GEMM at Llama-7B decode shapes.

Roofline: the GEMM is weight-bound at small M; time ~= qweight bytes
(K*N/2) + scales/szeros bytes over HBM bandwidth (~819 GB/s on v5e).
"""
import time

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
    f = lambda: quant_matmul(x, qw, sc, sz, bits=4, group_size=g)
    f()[0, 0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f()
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    bytes_w = k * n / 2 + 2 * (k // g) * n * 4
    roof = bytes_w / 819e9
    print(f"m={m:4d} k={k:5d} n={n:5d}: {dt*1e3:7.3f} ms "
          f"(roofline {roof*1e3:.3f} ms, {roof/dt*100:.0f}% of SoL)")

if __name__ == "__main__":
    for m, k, n, label in SHAPES:
        bench(m, k, n)
