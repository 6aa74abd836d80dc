"""Measure the fused-decode per-unit compute for fp8 vs bf16 caches,
with Mosaic's own grid pipeline streaming the blocks (no manual DMA).

Each grid cell: load one [2R, rd] KV block, upcast (variant), run the
two decode matmuls against a resident q. Variants:
  bf16    : bf16 blocks, no convert (baseline)
  astype  : e4m3 blocks, jnp .astype(bf16)
  int8    : e4m3 blocks bitcast to int8, int8->bf16 convert, then
            bit-fixup-free scale (NOT numerically correct — lowering
            probe only)
  mxu     : e4m3 blocks fed to dot_general directly (Mosaic upcast in
            the MXU path), if supported
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

HKV, G, D = 40, 1, 128
ROWS = 64
TWO_R = HKV * 2 * ROWS  # 5120
N_BLOCKS = int(__import__('os').getenv('NB', '256'))


def run(mode):
    in_dt = jnp.bfloat16 if mode == "bf16" else jnp.float8_e4m3fn

    def kernel(q_ref, kv_ref, o_ref):
        kv = kv_ref[...]  # [TWO_R, D]
        if mode == "astype":
            kv = kv.astype(jnp.bfloat16)
        elif mode == "int8":
            kv = jax.lax.bitcast_convert_type(
                kv, jnp.int8).astype(jnp.bfloat16)
        q = q_ref[...]  # [HKV, G, D]
        kvr = kv.reshape(HKV, 2, ROWS, D)
        k = kvr[:, 0]
        v = kvr[:, 1]
        if mode == "mxu":
            k = k  # fp8 operands straight into the MXU
            v = v
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [HKV, G, ROWS]
        p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
        o = jax.lax.dot_general(
            p, v if mode != "mxu" else v.astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[...] += o

    kv = (jax.random.normal(jax.random.PRNGKey(0),
                            (N_BLOCKS * TWO_R, D), jnp.bfloat16)
          * 0.3).astype(in_dt)
    q = jax.random.normal(jax.random.PRNGKey(1), (HKV, G, D),
                          jnp.bfloat16) * 0.5

    f = pl.pallas_call(
        kernel,
        grid=(N_BLOCKS,),
        in_specs=[pl.BlockSpec((HKV, G, D), lambda i: (0, 0, 0)),
                  pl.BlockSpec((TWO_R, D), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((HKV, G, D), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((HKV, G, D), jnp.float32),
    )
    f = jax.jit(f)
    try:
        y = f(q, kv)
        y.block_until_ready()
    except Exception as e:
        print(f"{mode:7s} UNSUPPORTED: {str(e)[:120]}")
        return
    N = 20
    t0 = time.perf_counter()
    for _ in range(N):
        y = f(q, kv)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / N
    gb = N_BLOCKS * TWO_R * D * jnp.dtype(in_dt).itemsize / 1e9
    print(f"{mode:7s} {dt*1e3:7.3f} ms  {gb/dt:6.0f} GB/s "
          f"({dt/N_BLOCKS*1e6:.1f} us/block)")


for m in ["bf16", "astype", "int8", "mxu"]:
    run(m)
