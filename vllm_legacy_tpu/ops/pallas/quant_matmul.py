"""Fused dequantize-matmul Pallas kernel for weight-only INT4/INT8.

One kernel family replaces the reference's per-method CUDA GEMMs
(csrc/quantization/gptq/q_gemm.cu, awq/gemm_kernels.cu, marlin/*,
squeezellm/* — SURVEY.md §2.11): every groupwise weight-only method is
repacked at load time (layers/quantization/) into the single TPU layout

    qweight  uint8 [in/2, out]   two 4-bit values per byte along IN
             uint8 [in,   out]   for 8-bit (unsigned, zeros carried in szeros)
    scales   f32   [n_groups, out]
    szeros   f32   [n_groups, out]   scale * zero, pre-multiplied

so dequant inside the kernel is ``w = q * scale - szero`` — a VPU
multiply-subtract feeding the MXU at bf16. HBM traffic for decode-sized
matmuls drops 4x (int4) vs bf16 weights, which is the whole game: these
matmuls are weight-bandwidth-bound.

Group size must divide the K-tile (bk) or be a multiple of it; the
kernel walks groups with a static stride.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dequant_matmul_kernel(x_ref, qw_ref, scales_ref, szeros_ref, out_ref,
                           acc_ref, *, bits: int, group_size: int,
                           bk: int, n_k: int):
    """Grid (m_tiles, n_tiles, k_tiles); accumulate over the k axis."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]  # [bm, bk]
    if bits == 4:
        packed = qw_ref[...]  # [bk//2, bn] uint8
        lo = (packed & 0xF).astype(jnp.float32)
        hi = (packed >> 4).astype(jnp.float32)
        # rows interleave: byte r holds in-rows 2r (lo) and 2r+1 (hi)
        q = jnp.stack([lo, hi], axis=1).reshape(bk, -1)
    else:
        q = qw_ref[...].astype(jnp.float32)  # [bk, bn] uint8

    # Per-group dequant: groups_per_tile = bk // group_size (>= 1).
    groups_per_tile = max(bk // group_size, 1)
    scales = scales_ref[...]  # [groups_per_tile, bn]
    szeros = szeros_ref[...]
    if groups_per_tile == 1:
        w = q * scales[0][None, :] - szeros[0][None, :]
    else:
        qg = q.reshape(groups_per_tile, group_size, -1)
        w = qg * scales[:, None, :] - szeros[:, None, :]
        w = w.reshape(bk, -1)

    acc_ref[...] += jax.lax.dot_general(
        x.astype(jnp.float32), w, (((1, ), (0, )), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k_idx == n_k - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bits", "group_size", "bm",
                                             "bk", "bn", "interpret"))
def quant_matmul(
    x: jax.Array,  # [M, K] bf16/f32
    qweight: jax.Array,  # [K//2, N] uint8 (4-bit) or [K, N] uint8 (8-bit)
    scales: jax.Array,  # [K // group_size, N] f32
    szeros: jax.Array,  # [K // group_size, N] f32 (scale * zero)
    *,
    bits: int = 4,
    group_size: int = 128,
    bm: int = 256,
    bk: int = 512,
    bn: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Returns x @ dequant(qweight) as x.dtype, shape [M, N]."""
    m, k = x.shape
    n = qweight.shape[1]
    assert k % group_size == 0, (k, group_size)

    bm = min(bm, m)
    bk = min(bk, k)
    bn = min(bn, n)
    if group_size > bk:
        # one group spans several k-tiles: walk at group granularity
        bk = group_size if group_size <= k else k
    assert bk % group_size == 0 or group_size % bk == 0

    n_m = pl.cdiv(m, bm)
    n_n = pl.cdiv(n, bn)
    n_k = pl.cdiv(k, bk)
    groups_per_tile = max(bk // group_size, 1)

    if bits == 4:
        qw_spec = pl.BlockSpec((bk // 2, bn),
                               lambda i, j, kk: (kk, j))
    else:
        qw_spec = pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j))

    # Block row kk covers groups [kk * groups_per_tile, (kk+1) * g_p_t):
    # with bk always a multiple of group_size (adjusted above), the
    # (groups_per_tile, bn) block at index (kk, j) is exactly the tile's
    # group rows.
    scale_spec = pl.BlockSpec((groups_per_tile, bn),
                              lambda i, j, kk: (kk, j))

    kernel = functools.partial(_dequant_matmul_kernel, bits=bits,
                               group_size=min(group_size, bk), bk=bk,
                               n_k=n_k)

    out = pl.pallas_call(
        kernel,
        grid=(n_m, n_n, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            qw_spec,
            scale_spec,
            scale_spec,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(x, qweight, scales, szeros)
    return out


def dequantize_reference(qweight: jax.Array, scales: jax.Array,
                         szeros: jax.Array, *, bits: int,
                         group_size: int) -> jax.Array:
    """Dense f32 dequant for tests / the XLA fallback path."""
    if bits == 4:
        lo = (qweight & 0xF).astype(jnp.float32)
        hi = (qweight >> 4).astype(jnp.float32)
        k2, n = qweight.shape
        q = jnp.stack([lo, hi], axis=1).reshape(k2 * 2, n)
    else:
        q = qweight.astype(jnp.float32)
    k, n = q.shape
    s = jnp.repeat(scales, group_size, axis=0)[:k]
    z = jnp.repeat(szeros, group_size, axis=0)[:k]
    return q * s - z
