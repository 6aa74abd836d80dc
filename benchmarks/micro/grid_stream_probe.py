"""Grid-pipelined paged-KV stream rate.

stream_probe.py shows MANUAL make_async_copy pipelines cap ~310 GB/s
on this chip no matter the depth/granularity, while the BlockSpec
grid pipeline (quant_matmul's weight stream) reaches ~800 GB/s
in-engine. This probe streams the SAME paged-cache access pattern
(block index looked up from a scalar-prefetched table) through the
AUTOMATIC grid pipeline to see which mechanism is fast, not folklore.

Env: NBLK total 1MB-ish blocks (default 3072 = 3 GB), HKV, BS, D,
FANS parallel table-driven input streams per grid step.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import functools
import time

import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HKV = int(os.getenv('HKV', '32'))
BS = int(os.getenv('BS', '64'))
D = int(os.getenv('D', '128'))
NBLK = int(os.getenv('NBLK', '3072'))
FANS = int(os.getenv('FANS', '4'))  # parallel streams per grid step
SHUFFLE = os.getenv('SHUFFLE', '1') == '1'

TWO_R = 2 * HKV * BS


def kernel(bt_ref, *refs):
    fans = (len(refs) - 1) // 1 - 1  # kv refs..., o_ref
    kv_refs = refs[:-1]
    o_ref = refs[-1]
    acc = o_ref[...]
    for kv in kv_refs:
        acc = acc + kv[0, :8, :128].astype(jnp.float32)
    o_ref[...] = acc


def main():
    steps = NBLK // FANS
    kv = jax.random.normal(jax.random.PRNGKey(0),
                           (NBLK + 1, TWO_R, D), jnp.bfloat16)
    idx = np.arange(NBLK, dtype=np.int32) + 1
    if SHUFFLE:
        np.random.RandomState(7).shuffle(idx)
    bt = jnp.asarray(idx.reshape(FANS, steps))

    in_specs = [
        pl.BlockSpec((1, TWO_R, D),
                     functools.partial(
                         lambda i, bt_, f: (bt_[f, i], 0, 0), f=f))
        for f in range(FANS)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps, ),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, 128), lambda i, bt_: (0, 0)),
    )
    f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", ),
            vmem_limit_bytes=112 * 1024 * 1024),
    )

    @jax.jit
    def run(bt, *kvs):
        return f(bt, *kvs)

    kvs = (kv, ) * FANS
    # distinct table per timed call: identical dispatches are deduped
    # by the axon tunnel
    bts = [jnp.asarray(np.roll(idx, k + 1).reshape(FANS, steps))
           for k in range(4)]
    o = run(bt, *kvs)
    float(jnp.sum(o))  # compile + warm
    n = 4
    t0 = time.perf_counter()
    x = 0.0
    for k in range(n):
        o = run(bts[k], *kvs)
        x = x + float(jnp.sum(o))  # host-transfer fence per call
    dt = (time.perf_counter() - t0) / n
    gb = NBLK * TWO_R * D * 2 / 1e9
    print(f"grid-stream NBLK={NBLK} blk={TWO_R*D*2//1024}KB fans={FANS}"
          f" shuffle={int(SHUFFLE)} ms={dt*1e3:.2f} GB={gb:.2f} ->"
          f" {gb/dt:.0f} GB/s")


if __name__ == "__main__":
    main()
