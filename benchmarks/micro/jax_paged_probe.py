"""Ground-truth paged-KV stream rate: jax's reference paged-attention
kernel vs our fused_decode at the SAME decode shapes.

Motivation: round-3 probes concluded the paged 64KB-block DMA stream
"tops out ~330 GB/s regardless of block size / gang / pipeline depth"
and called it a platform ceiling; but the jax reference kernel is
reported to reach ~935 GB/s with MORE, smaller DMAs (one per
(kv_head, page)) and leaner scalar code. This probe measures both on
this chip so the number is ground truth, not folklore.

Timing uses the fori-carry pattern (q depends on the previous output)
so the axon tunnel cannot dedupe iterations; block_until_ready on the
final value. See .claude/skills/verify round-4 notes.
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_jax_ref(batch, kv_heads, q_heads, head, ctx, page_size,
                  layers, pages_per_blk):
    from jax.experimental.pallas.ops.tpu import paged_attention as pa

    pages_per_seq = (ctx + page_size - 1) // page_size
    total_pages = batch * pages_per_seq + 1
    key = jax.random.PRNGKey(0)
    k_pages = jax.random.normal(
        key, (kv_heads, total_pages, page_size, head), jnp.bfloat16)
    v_pages = k_pages * 0.5
    lengths = jnp.full((batch,), ctx, jnp.int32)
    idx = np.arange(batch * pages_per_seq, dtype=np.int32).reshape(
        batch, pages_per_seq) + 1
    page_indices = jnp.asarray(idx)
    q0 = jax.random.normal(key, (batch, q_heads, head), jnp.bfloat16)

    attn = functools.partial(pa.paged_attention,
                             pages_per_compute_block=pages_per_blk)

    @jax.jit
    def sweep(q):
        def body(_, q):
            o = attn(q, k_pages, v_pages, lengths, page_indices)
            # carry: next q depends on this output -> no tunnel dedupe
            return (q + o.astype(q.dtype) * jnp.bfloat16(1e-6))
        return jax.lax.fori_loop(0, layers, body, q)

    out = sweep(q0)
    out.block_until_ready()  # compile + warm
    t0 = time.perf_counter()
    out = sweep(q0)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    bytes_rd = batch * ctx * kv_heads * head * 2 * 2 * layers
    return dt, bytes_rd


def bench_ours(batch, kv_heads, q_heads, head, ctx, block_size, layers):
    from vllm_legacy_tpu.ops.pallas.fused_decode import fused_decode_attention  # noqa: E501
    import inspect
    print("ours:", inspect.signature(fused_decode_attention))
    raise SystemExit("wire manually per signature")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--kv-heads", type=int, default=32)
    p.add_argument("--q-heads", type=int, default=32)
    p.add_argument("--head", type=int, default=128)
    p.add_argument("--ctx", type=int, default=512)
    p.add_argument("--page", type=int, default=64)
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--ppcb", type=int, default=4)
    args = p.parse_args()

    dt, bytes_rd = bench_jax_ref(args.batch, args.kv_heads, args.q_heads,
                                 args.head, args.ctx, args.page,
                                 args.layers, args.ppcb)
    print(f"jax reference paged_attention: {dt*1e3:.2f} ms for "
          f"{args.layers} layers, {bytes_rd/1e9:.2f} GB -> "
          f"{bytes_rd/dt/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
