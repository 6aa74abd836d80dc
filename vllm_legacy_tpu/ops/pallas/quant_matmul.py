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

K-tiling: the scales/szeros block row count is groups-per-tile, which
Mosaic requires to be sublane-aligned (multiple of 8) or the whole
array. So the K tile is 8 groups (``quant_k_tile``), and loaders pad K
up to a multiple of it (common.py as_params) — x is zero-padded to
match at apply time, so padded K rows contribute nothing to the dot.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quant_k_tile(k: int, group_size: int) -> int:
    """K rows per kernel tile: 8 groups (sublane-aligned scales block),
    or all of K when there are fewer than 8 groups (single k tile; full
    blocks are always legal)."""
    if group_size <= 0 or group_size >= k or k // group_size < 8:
        return k
    return 8 * group_size


def _group_dequant(q, scales, szeros, rows_per_group):
    """q [rows, bn] nibble/byte values -> w = q*scale - szero with the
    row axis walked group-blockwise (rows_per_group rows per scale row).
    Shapes are static; gpt == 1 skips the reshape entirely."""
    rows = q.shape[0]
    gpt = scales.shape[0]
    if gpt == 1:
        return q * scales[0][None, :] - szeros[0][None, :]
    assert rows == gpt * rows_per_group, (rows, gpt, rows_per_group)
    qg = q.reshape(gpt, rows_per_group, -1)
    w = qg * scales[:, None, :] - szeros[:, None, :]
    return w.reshape(rows, -1)


def _dot(x, w, precision):
    return jax.lax.dot_general(x.astype(jnp.float32), w,
                               (((1, ), (0, )), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=precision)


def _dequant_matmul_4bit_kernel(x_even_ref, x_odd_ref, qw_ref, scales_ref,
                                szeros_ref, out_ref, acc_ref, *,
                                group_size: int, n_k: int, precision):
    """Grid (m_tiles, n_tiles, k_tiles); accumulate over k.

    Byte row r of qweight packs in-rows 2r (low nibble) and 2r+1 (high
    nibble). Instead of re-interleaving rows in-kernel (a sublane
    shuffle Mosaic cannot lower), the wrapper pre-splits x into its
    even/odd K columns and the kernel runs two half-K dots:
        out = x_even @ dequant(lo) + x_odd @ dequant(hi)
    """
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Mosaic cannot shift or cast 8-bit vectors (arith.shrui on i8
    # fails to legalize); widen to int32 BEFORE the nibble unpack.
    packed = qw_ref[...].astype(jnp.int32)  # [bk//2, bn] uint8 -> i32
    lo = (packed & 0xF).astype(jnp.float32)
    hi = (packed >> 4).astype(jnp.float32)
    scales = scales_ref[...]  # [groups_per_tile, bn]
    szeros = szeros_ref[...]
    half_group = group_size // 2  # byte rows per group
    w_lo = _group_dequant(lo, scales, szeros, half_group)
    w_hi = _group_dequant(hi, scales, szeros, half_group)
    acc_ref[...] += (_dot(x_even_ref[...], w_lo, precision) +
                     _dot(x_odd_ref[...], w_hi, precision))

    @pl.when(k_idx == n_k - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def _dequant_matmul_8bit_kernel(x_ref, qw_ref, scales_ref, szeros_ref,
                                out_ref, acc_ref, *, group_size: int,
                                n_k: int, precision):
    """8-bit variant: qweight is int8 (q - 128), one full-K dot."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = qw_ref[...].astype(jnp.float32)  # [bk, bn] int8
    w = _group_dequant(q, scales_ref[...], szeros_ref[...], group_size)
    acc_ref[...] += _dot(x_ref[...], w, precision)

    @pl.when(k_idx == n_k - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bits", "group_size", "bm",
                                             "bn", "interpret"))
def quant_matmul(
    x: jax.Array,  # [M, K] bf16/f32
    qweight: jax.Array,  # [K//2, N] uint8 (4-bit) or [K, N] uint8 (8-bit)
    scales: jax.Array,  # [K // group_size, N] f32
    szeros: jax.Array,  # [K // group_size, N] f32 (scale * zero)
    *,
    bits: int = 4,
    group_size: int = 128,
    bm: int = 256,
    bn: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Returns x @ dequant(qweight) as x.dtype, shape [M, N].

    K must be a multiple of quant_k_tile(k, group_size) — loaders pad
    the packed params (common.py) and apply() zero-pads x to match, so
    K tiles always divide exactly (ragged K would accumulate Mosaic's
    unspecified out-of-bounds pad data into every output).
    """
    m, k = x.shape
    n = qweight.shape[1]
    if group_size <= 0:
        group_size = k  # per-channel: one group over the whole K
    assert k % group_size == 0, (k, group_size)

    bm = min(bm, m)
    bn = min(bn, n)
    bk = quant_k_tile(k, group_size)
    assert k % bk == 0, (k, bk, group_size)

    n_m = pl.cdiv(m, bm)
    n_n = pl.cdiv(n, bn)
    n_k = k // bk
    groups_per_tile = max(bk // group_size, 1)

    # Block row kk covers groups [kk * groups_per_tile, (kk+1) * g_p_t):
    # with bk always a multiple of group_size (adjusted above), the
    # (groups_per_tile, bn) block at index (kk, j) is exactly the tile's
    # group rows.
    scale_spec = pl.BlockSpec((groups_per_tile, bn),
                              lambda i, j, kk: (kk, j))
    # f32 x is truncated to bf16 on the MXU at DEFAULT precision — the
    # right trade for weight-bandwidth-bound serving matmuls; interpret
    # mode (CPU tests) computes exact f32 regardless.
    precision = jax.lax.Precision.DEFAULT

    if bits == 4:
        # Pre-split x into even/odd K columns (see kernel docstring);
        # a [m, k/2, 2] reshape keeps it a no-copy relayout for XLA.
        xr = x.reshape(m, k // 2, 2)
        operands = (xr[:, :, 0], xr[:, :, 1], qweight, scales, szeros)
        kernel = functools.partial(_dequant_matmul_4bit_kernel,
                                   group_size=min(group_size, bk),
                                   n_k=n_k, precision=precision)
        x_specs = [
            pl.BlockSpec((bm, bk // 2), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bm, bk // 2), lambda i, j, kk: (i, kk)),
        ]
        qw_spec = pl.BlockSpec((bk // 2, bn), lambda i, j, kk: (kk, j))
    else:
        operands = (x, qweight, scales, szeros)
        kernel = functools.partial(_dequant_matmul_8bit_kernel,
                                   group_size=min(group_size, bk),
                                   n_k=n_k, precision=precision)
        x_specs = [pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk))]
        qw_spec = pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j))

    out = pl.pallas_call(
        kernel,
        grid=(n_m, n_n, n_k),
        in_specs=x_specs + [qw_spec, scale_spec, scale_spec],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*operands)
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
