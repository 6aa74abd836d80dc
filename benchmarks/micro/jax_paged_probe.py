"""Ground-truth paged-KV stream rate: jax's reference paged-attention
kernel vs our fused_decode at the SAME decode shapes.

Motivation: round-3 probes concluded the paged 64KB-block DMA stream
"tops out ~330 GB/s regardless of block size / gang / pipeline depth"
and called it a platform ceiling; jax's reference kernel uses MORE,
smaller DMAs (one per (kv_head, page)) and leaner scalar code. This
probe measures both on this chip so the number is ground truth, not
folklore.

Timing uses the fori-carry pattern (q depends on the previous output)
so the axon tunnel cannot dedupe iterations; block_until_ready on the
final value. All big arrays are passed as jit ARGUMENTS (closure
captures get serialized into the remote-compile request and 413 it).
See .claude/skills/verify round-4 notes.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

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
    def sweep(q, k_pages, v_pages, lengths, page_indices):
        def body(_, q):
            o = attn(q, k_pages, v_pages, lengths, page_indices)
            # carry: next q depends on this output -> no tunnel dedupe
            return (q + o.astype(q.dtype) * jnp.bfloat16(1e-6))
        return jax.lax.fori_loop(0, layers, body, q)

    # chain out -> next q ACROSS calls too: a repeat call with
    # identical args is deduped by the axon tunnel (impossible TB/s)
    out = sweep(q0, k_pages, v_pages, lengths, page_indices)
    float(jnp.sum(out.astype(jnp.float32)))  # compile + warm
    n = 4
    t0 = time.perf_counter()
    for _ in range(n):
        out = sweep(out, k_pages, v_pages, lengths, page_indices)
    float(jnp.sum(out.astype(jnp.float32)))  # forces execution
    dt = (time.perf_counter() - t0) / n
    bytes_rd = batch * ctx * kv_heads * head * 2 * 2 * layers
    return dt, bytes_rd


def bench_ours(batch, kv_heads, q_heads, head, ctx, block_size, layers):
    """Same shapes through fused_decode_attention (fused-plain 5-D
    cache, one layer axis streamed per iteration like the engine)."""
    from vllm_legacy_tpu.ops.pallas.fused_decode import (
        fused_decode_attention)

    nblk = (ctx + block_size - 1) // block_size
    total = batch * nblk + 1
    key = jax.random.PRNGKey(0)
    # ONE layer of cache is enough for a stream-rate probe (layer_idx
    # constant 0); total KV bytes per sweep count layers iterations.
    kv = (jax.random.normal(
        key, (1, total, 2 * kv_heads, block_size, head),
        jnp.bfloat16) * 0.3)
    idx = np.arange(batch * nblk, dtype=np.int32).reshape(
        batch, nblk) + 1
    bt = jnp.asarray(idx)
    cl = jnp.full((batch,), ctx, jnp.int32)
    q0 = jax.random.normal(key, (batch, q_heads, head), jnp.bfloat16)
    kn = jax.random.normal(key, (batch, kv_heads, head), jnp.bfloat16)
    scale = head ** -0.5

    @functools.partial(jax.jit, donate_argnums=(1,))
    def sweep(q, kv, kn, bt, cl):
        def body(_, carry):
            q, kv = carry
            o, kv = fused_decode_attention(
                q, kn, kn * 0.5, kv, jnp.zeros((1,), jnp.int32), bt, cl,
                scale=scale, num_kv_heads=kv_heads)
            return (q + o.astype(q.dtype) * jnp.bfloat16(1e-6), kv)
        return jax.lax.fori_loop(0, layers, body, (q, kv))

    out, kv = sweep(q0, kv, kn, bt, cl)
    float(jnp.sum(out.astype(jnp.float32)))  # compile + warm
    n = 4
    t0 = time.perf_counter()
    for _ in range(n):
        out, kv = sweep(out, kv, kn, bt, cl)
    float(jnp.sum(out.astype(jnp.float32)))  # forces execution
    dt = (time.perf_counter() - t0) / n
    bytes_rd = batch * nblk * block_size * kv_heads * head * 2 * 2 * \
        layers
    return dt, bytes_rd


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
    p.add_argument("--skip-ref", action="store_true")
    p.add_argument("--skip-ours", action="store_true")
    args = p.parse_args()

    if not args.skip_ref:
        dt, rd = bench_jax_ref(args.batch, args.kv_heads, args.q_heads,
                               args.head, args.ctx, args.page,
                               args.layers, args.ppcb)
        print(f"jax reference paged_attention: {dt*1e3:.2f} ms for "
              f"{args.layers} layers, {rd/1e9:.2f} GB -> "
              f"{rd/dt/1e9:.0f} GB/s")
    if not args.skip_ours:
        dt, rd = bench_ours(args.batch, args.kv_heads, args.q_heads,
                            args.head, args.ctx, args.page, args.layers)
        print(f"ours fused_decode_attention:   {dt*1e3:.2f} ms for "
              f"{args.layers} layers, {rd/1e9:.2f} GB -> "
              f"{rd/dt/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
