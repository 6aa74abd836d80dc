"""Pure paged-DMA stream ceiling: the fused_decode fetch pattern with
NO attention compute — just double-buffered block DMAs plus a token
scalar read to defeat DCE. Separates "HBM can't go faster for this
access pattern" from "compute/overhead is hiding in the pipeline".

Env: B, CTX, BLOCK_SIZE(64), HKV(32), D(128), LNUM(12), GANG(4),
KBLK(4), SHUFFLE(0|1 random block order).
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import functools
import time

import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(os.getenv('B', '32'))
CTX = int(os.getenv('CTX', '512'))
BS = int(os.getenv('BLOCK_SIZE', '64'))
HKV = int(os.getenv('HKV', '32'))
D = int(os.getenv('D', '128'))
LNUM = int(os.getenv('LNUM', '12'))
GANG = int(os.getenv('GANG', '4'))
KBLK = int(os.getenv('KBLK', '4'))
SLOTS = int(os.getenv('SLOTS', '2'))  # pipeline depth (prefetch SLOTS-1 units ahead)
SHUFFLE = os.getenv('SHUFFLE', '0') == '1'
# span: ONE DMA per (member, unit) covering kblk CONTIGUOUS blocks
# (exploits consecutive table entries; tests per-DMA overhead)
MODE = os.getenv('MODE', 'per-block')
TOUCH = os.getenv('TOUCH', '0') == '1'

TWO_R = 2 * HKV * BS
nblk = CTX // BS
NBLK = B * nblk + 1


def kernel(bt_ref, kv_hbm, o_ref, kv_buf, acc_ref, sem, *, cells,
           gang, kblk, nunits, slots, mode, touch):
    core = pl.program_id(0)
    cell = pl.program_id(1)
    b0 = (core * cells + cell) * gang

    def fetch(gang_b0, u, slot, wait):
        for s in range(gang):
            if mode == 'span':
                blk = bt_ref[gang_b0 + s, u * kblk]
                cp = pltpu.make_async_copy(
                    kv_hbm.at[pl.ds(blk, kblk)], kv_buf.at[slot, s],
                    sem.at[slot, s, 0])
                if wait:
                    cp.wait()
                else:
                    cp.start()
                continue
            for j in range(kblk):
                blk = bt_ref[gang_b0 + s, u * kblk + j]
                cp = pltpu.make_async_copy(
                    kv_hbm.at[blk], kv_buf.at[slot, s, j], sem.at[slot,
                                                                  s, j])
                if wait:
                    cp.wait()
                else:
                    cp.start()

    @pl.when(cell == 0)
    def _():
        for w in range(min(slots - 1, nunits)):
            fetch(b0, w, w % slots, wait=False)

    def unit(i, acc):
        slot = i % slots
        ahead = i + slots - 1

        @pl.when(ahead < nunits)
        def _():
            fetch(b0, ahead, ahead % slots, wait=False)

        @pl.when(jnp.logical_and(ahead >= nunits, cell + 1 < cells))
        def _():
            fetch(b0 + gang, ahead - nunits, ahead % slots, wait=False)

        fetch(b0, i, slot, wait=True)
        # NO VMEM touches: Mosaic DMAs are effectful and never DCE'd,
        # so the loop is pure issue/wait — any gap to the GEMM
        # pipeline's ~800 GB/s is the DMA path itself. TOUCH=1 adds
        # one vreg read per block (the old behavior) to measure the
        # cost of coupling the vector core in.
        if touch:
            t = acc_ref[...]
            for s in range(gang):
                for j in range(kblk):
                    t = t + kv_buf[slot, s, j, :8, :128].astype(
                        jnp.float32)
            acc_ref[...] = t
        return 0

    @pl.when(cell == 0)
    def _():
        acc_ref[...] = jnp.zeros((8, 128), jnp.float32)

    jax.lax.fori_loop(0, nunits, unit, 0)
    o_ref[0] = acc_ref[...]


def main():
    assert nblk % KBLK == 0
    ncores = 2 if B % 2 == 0 else 1
    cells = B // (ncores * GANG)
    nunits = nblk // KBLK
    kv = (jax.random.normal(jax.random.PRNGKey(0),
                            (NBLK, TWO_R // 8, 8 * D), jnp.bfloat16))
    idx = np.arange(B * nblk, dtype=np.int32).reshape(B, nblk) + 1
    if SHUFFLE:
        flat = idx.reshape(-1)
        np.random.RandomState(7).shuffle(flat)
        idx = flat.reshape(B, nblk)
    # LNUM pre-rotated copies: per-iteration tables differ (so the
    # call cannot be hoisted as loop-invariant) without a per-iteration
    # device gather in the dependency chain
    bts = jnp.asarray(np.stack([np.roll(idx, k, axis=0)
                                for k in range(LNUM)]))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ncores, cells),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda c, i, *_: (c, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((SLOTS, GANG, KBLK, TWO_R // 8, 8 * D),
                       jnp.bfloat16),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((SLOTS, GANG, KBLK)),
        ],
    )
    f = pl.pallas_call(
        functools.partial(kernel, cells=cells, gang=GANG, kblk=KBLK,
                          nunits=nunits, slots=SLOTS, mode=MODE,
                          touch=TOUCH),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ncores, 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=112 * 1024 * 1024),
    )

    @jax.jit
    def sweep(x, kv, bts):
        def body(i, x):
            o = f(jax.lax.dynamic_index_in_dim(bts, i, 0, False), kv)
            return x + o.astype(jnp.float32).sum() * 1e-9
        return jax.lax.fori_loop(0, LNUM, body, x)

    x = sweep(jnp.float32(0.0), kv, bts)
    float(x)  # compile + warm
    n = 4
    t0 = time.perf_counter()
    for _ in range(n):
        x = sweep(x, kv, bts)
    float(x)
    dt = (time.perf_counter() - t0) / n
    gb = LNUM * B * nblk * TWO_R * D * 2 / 1e9
    print(f"stream-only B={B} ctx={CTX} bs={BS} gang={GANG} kblk={KBLK}"
          f" slots={SLOTS} mode={MODE} touch={int(TOUCH)} shuffle={int(SHUFFLE)} ms={dt*1e3:.2f} GB={gb:.2f} ->"
          f" {gb/dt:.0f} GB/s")


if __name__ == "__main__":
    main()
