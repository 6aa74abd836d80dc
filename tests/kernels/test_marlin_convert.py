"""Marlin checkpoint decoders: synthesize marlin-serialized tensors
(dense and 2:4 sparse) by the reference pack recipes, decode through
MarlinConfig / GPTQMarlin24Config, and assert the dequantized dense
weights are exact.

Mirrors the reference kernel tests (tests/kernels/test_marlin_gemm.py)
at the layout level: the TPU design decodes at load instead of running
a marlin-layout GEMM.
"""
import numpy as np
import pytest

from vllm_legacy_tpu.layers.quantization.marlin import (
    TILE, GPTQMarlin24Config, MarlinConfig, _meta_swizzle_offsets,
    _scale_perms, _weight_perm)
from vllm_legacy_tpu.ops.pallas.quant_matmul import dequantize_reference

import jax.numpy as jnp


def pack_marlin(q, scales, num_bits, group_size, sparse24=False,
                scale_size_k=None):
    """Forward marlin pack (utils/marlin_utils.py marlin_weights +
    marlin_permute_scales recipe). For 2:4, q is the COMPRESSED [K/2, N]
    matrix but scales are permuted against the full K
    (marlin_24_quantize passes the original size_k)."""
    size_k, size_n = q.shape
    if scale_size_k is None:
        scale_size_k = size_k
    t = q.reshape(size_k // TILE, TILE, size_n // TILE, TILE)
    t = t.transpose(0, 2, 1, 3).reshape(size_k // TILE, size_n * TILE)
    perm = _weight_perm(num_bits, sparse24)
    t = t.reshape(-1, perm.size)[:, perm].reshape(t.shape)

    pf = 32 // num_bits
    packed = np.zeros((t.shape[0], t.shape[1] // pf), np.uint32)
    for i in range(pf):
        packed |= t[:, i::pf].astype(np.uint32) << (num_bits * i)

    grouped, single = _scale_perms(sparse24)
    sperm = grouped if 0 < group_size < scale_size_k else single
    s = scales.reshape(-1, sperm.size)[:, sperm].reshape(-1, size_n)
    return packed.astype(np.int32), s


def compress_24(q, zp):
    """Forward CUTLASS 2:4 compression of signed q-zp, transposed
    (format_24.py sparse_semi_structured_from_dense_cutlass recipe,
    int16 metadata)."""
    size_k, size_n = q.shape
    w = (q.astype(np.int32) - zp).T  # [N, K] signed
    m = size_n
    quads = w.reshape(m, size_k // 4, 4)
    nz = quads != 0
    m0, m1, m2, m3 = nz[..., 0], nz[..., 1], nz[..., 2], nz[..., 3]
    bit0 = ~m0 & m1
    bit1 = ~m0 & ~m1
    bit2 = (m0 & m1) | (~m0 & ~m1) | m3
    bit3 = (~m0 & m1) | ~m1
    idx0 = bit0.astype(np.int64) | (bit1.astype(np.int64) << 1)
    idx1 = bit2.astype(np.int64) | (bit3.astype(np.int64) << 1)
    v0 = np.take_along_axis(quads, idx0[..., None], axis=2)[..., 0]
    v1 = np.take_along_axis(quads, idx1[..., None], axis=2)[..., 0]
    values_t = np.stack([v0, v1], axis=-1).reshape(m, size_k // 2)

    codes = (idx0 | (idx1 << 2)).reshape(m, size_k // 16, 4)
    meta = (codes[..., 0] | (codes[..., 1] << 4) | (codes[..., 2] << 8)
            | (codes[..., 3] << 12)).astype(np.uint16)
    swizzled = np.empty(meta.size, np.uint16)
    swizzled[_meta_swizzle_offsets(m, size_k // 16)] = meta.ravel()
    # kept values back to unsigned with zp, [K/2, N]
    q_comp = (values_t.T + zp).astype(np.uint8)
    return q_comp, swizzled.astype(np.int16)


def dense_truth(q, scales, zp, group_size):
    size_k = q.shape[0]
    g = group_size if 0 < group_size < size_k else size_k
    return (q.astype(np.float32) - zp) * np.repeat(scales, g, axis=0)


def _decode_dense(packed):
    return np.asarray(
        dequantize_reference(jnp.asarray(packed.qweight),
                             jnp.asarray(packed.scales),
                             jnp.asarray(packed.szeros),
                             bits=packed.bits,
                             group_size=packed.group_size))


@pytest.mark.parametrize("k,n,g", [(128, 256, 64), (256, 256, -1),
                                   (256, 128, 128)])
def test_marlin_dense_roundtrip(k, n, g):
    rng = np.random.RandomState(0)
    zp = 8
    q = rng.randint(0, 16, size=(k, n)).astype(np.uint8)
    n_groups = k // g if 0 < g < k else 1
    scales = (rng.rand(n_groups, n).astype(np.float32) * 0.05 + 0.01)

    b, s_marlin = pack_marlin(q, scales, 4, g if g > 0 else k)
    cfg = MarlinConfig(group_size=g if g > 0 else k)
    assert cfg.wants({"B": b, "s": s_marlin})
    packed = cfg.convert_layer({"B": b, "s": s_marlin})
    got = _decode_dense(packed)
    np.testing.assert_allclose(got, dense_truth(q, scales, zp, g),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("k,n,g", [(128, 128, 64), (256, 128, -1)])
def test_marlin_24_sparse_roundtrip(k, n, g):
    rng = np.random.RandomState(1)
    zp = 8
    # build a genuine 2:4 pattern: per quad of K, two positions carry
    # non-zp values, two sit exactly at the zero point
    q = np.full((k, n), zp, np.uint8)
    for col in range(n):
        for quad in range(k // 4):
            pos = rng.choice(4, size=2, replace=False)
            for p in pos:
                v = rng.randint(0, 16)
                q[quad * 4 + p, col] = v
    n_groups = k // g if 0 < g < k else 1
    scales = (rng.rand(n_groups, n).astype(np.float32) * 0.05 + 0.01)

    q_comp, meta = compress_24(q, zp)
    b24, s_marlin = pack_marlin(q_comp, scales, 4, g if g > 0 else k,
                                sparse24=True, scale_size_k=k)
    meta_stored = meta.reshape(-1).reshape(k // 32, n * 2)

    cfg = GPTQMarlin24Config(weight_bits=4, group_size=g)
    assert cfg.wants({"B_24": b24, "B_meta": meta_stored,
                      "s": s_marlin})
    packed = cfg.convert_layer({"B_24": b24, "B_meta": meta_stored,
                                "s": s_marlin})
    got = _decode_dense(packed)
    want = dense_truth(q, scales, zp, g)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    # pruned positions (q == zp where the quad dropped them) are 0.0
    assert np.count_nonzero(want == 0.0) >= k * n // 4


def test_marlin_registry():
    from vllm_legacy_tpu.layers.quantization import (
        get_quantization_config)
    assert get_quantization_config("marlin") is MarlinConfig
    assert get_quantization_config("gptq_marlin_24") is GPTQMarlin24Config
