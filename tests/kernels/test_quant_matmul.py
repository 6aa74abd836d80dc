"""Quantization tests: packed-layout converters (synthetic GPTQ/AWQ
checkpoints round-trip through the reference dequant) and the Pallas
fused dequant-matmul vs a numpy oracle.

Mirrors the reference's kernel-vs-naive pattern
(tests/kernels/test_marlin_gemm.py, test_int8_quant.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_legacy_tpu.layers.quantization.awq import (AWQ_ORDER, AWQConfig)
from vllm_legacy_tpu.layers.quantization.gptq import GPTQConfig
from vllm_legacy_tpu.ops.pallas.quant_matmul import (dequantize_reference,
                                                     quant_matmul)


def make_gptq_checkpoint(rng, k, n, group_size, bits=4, desc_act=False):
    """Synthesize AutoGPTQ-format tensors + the dense f32 truth."""
    n_groups = k // group_size
    vals = 2**bits
    q = rng.randint(0, vals, size=(k, n)).astype(np.uint32)
    # round-trip through f16 like a real checkpoint so truth matches
    scales = (rng.rand(n_groups, n).astype(np.float32) * 0.1 +
              0.01).astype(np.float16).astype(np.float32)
    # v1 checkpoints store z-1; keep z >= 1 so the stored nibble doesn't
    # wrap (the historical AutoGPTQ convention).
    zeros = rng.randint(1, vals, size=(n_groups, n)).astype(np.uint32)

    if desc_act:
        g_idx = rng.permutation(np.repeat(np.arange(n_groups),
                                          group_size)).astype(np.int32)
    else:
        g_idx = np.repeat(np.arange(n_groups),
                          group_size).astype(np.int32)

    # dense truth: w[r, c] = s[g_idx[r], c] * (q[r, c] - z[g_idx[r], c])
    w = scales[g_idx] * (q.astype(np.float32) -
                         zeros.astype(np.float32)[g_idx])

    # pack: qweight int32 [k/8, n] nibbles along k
    if bits == 4:
        qw = np.zeros((k // 8, n), np.uint32)
        for i in range(8):
            qw |= q[i::8] << (4 * i)
        qz = np.zeros((n_groups, n // 8), np.uint32)
        zm1 = zeros - 1  # v1 format stores z - 1... (z stored = z-1)
        for i in range(8):
            qz |= zm1[:, i::8] << (4 * i)
    else:
        qw = np.zeros((k // 4, n), np.uint32)
        for i in range(4):
            qw |= q[i::4] << (8 * i)
        qz = np.zeros((n_groups, n // 4), np.uint32)
        zm1 = zeros - 1
        for i in range(4):
            qz |= zm1[:, i::4] << (8 * i)
    tensors = {
        "qweight": qw.astype(np.int32),
        "qzeros": qz.astype(np.int32),
        "scales": scales.astype(np.float16),
        "g_idx": g_idx,
    }
    return tensors, w


def test_gptq_convert_roundtrip():
    rng = np.random.RandomState(0)
    k, n, g = 256, 128, 64
    tensors, want = make_gptq_checkpoint(rng, k, n, g)
    cfg = GPTQConfig(weight_bits=4, group_size=g, desc_act=False)
    packed = cfg.convert_layer(tensors)
    got = np.asarray(
        dequantize_reference(jnp.asarray(packed.qweight),
                             jnp.asarray(packed.scales),
                             jnp.asarray(packed.szeros), bits=4,
                             group_size=g))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_gptq_convert_8bit():
    rng = np.random.RandomState(1)
    k, n, g = 128, 64, 32
    tensors, want = make_gptq_checkpoint(rng, k, n, g, bits=8)
    cfg = GPTQConfig(weight_bits=8, group_size=g, desc_act=False)
    packed = cfg.convert_layer(tensors)
    got = np.asarray(
        dequantize_reference(jnp.asarray(packed.qweight),
                             jnp.asarray(packed.scales),
                             jnp.asarray(packed.szeros), bits=8,
                             group_size=g))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_gptq_act_order():
    """desc_act: dequant(perm-reordered) must equal truth at permuted
    rows, and x @ W must match via the in_perm gather."""
    rng = np.random.RandomState(2)
    k, n, g = 256, 128, 64
    tensors, want = make_gptq_checkpoint(rng, k, n, g, desc_act=True)
    cfg = GPTQConfig(weight_bits=4, group_size=g, desc_act=True)
    packed = cfg.convert_layer(tensors)
    assert packed.in_perm is not None
    w_sorted = np.asarray(
        dequantize_reference(jnp.asarray(packed.qweight),
                             jnp.asarray(packed.scales),
                             jnp.asarray(packed.szeros), bits=4,
                             group_size=g))
    x = rng.randn(4, k).astype(np.float32)
    got = x[:, packed.in_perm] @ w_sorted
    np.testing.assert_allclose(got, x @ want, atol=1e-3, rtol=1e-3)


def make_awq_checkpoint(rng, k, n, group_size):
    n_groups = k // group_size
    q = rng.randint(0, 16, size=(k, n)).astype(np.uint32)
    scales = (rng.rand(n_groups, n).astype(np.float32) * 0.1 +
              0.01).astype(np.float16).astype(np.float32)
    zeros = rng.randint(0, 16, size=(n_groups, n)).astype(np.uint32)
    g_idx = np.repeat(np.arange(n_groups), group_size)
    w = scales[g_idx] * (q.astype(np.float32) -
                         zeros.astype(np.float32)[g_idx])

    def pack_cols(a):  # [..., n] -> int32 [..., n/8] with AWQ order
        out = np.zeros((*a.shape[:-1], a.shape[-1] // 8), np.uint32)
        for j, col in enumerate(AWQ_ORDER):
            out |= a[..., col::8] << (4 * j)
        return out.astype(np.int32)

    tensors = {
        "qweight": pack_cols(q),
        "qzeros": pack_cols(zeros),
        "scales": scales.astype(np.float16),
    }
    return tensors, w


def test_awq_convert_roundtrip():
    rng = np.random.RandomState(3)
    k, n, g = 128, 128, 32
    tensors, want = make_awq_checkpoint(rng, k, n, g)
    cfg = AWQConfig(weight_bits=4, group_size=g, zero_point=True)
    packed = cfg.convert_layer(tensors)
    got = np.asarray(
        dequantize_reference(jnp.asarray(packed.qweight),
                             jnp.asarray(packed.scales),
                             jnp.asarray(packed.szeros), bits=4,
                             group_size=g))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("m,k,n,g", [(8, 256, 256, 64), (3, 512, 128, 128),
                                     (16, 256, 384, 256),
                                     (8, 2048, 256, 128)])
def test_quant_matmul_kernel(bits, m, k, n, g):
    rng = np.random.RandomState(42)
    if bits == 4:
        qw = rng.randint(0, 256, size=(k // 2, n)).astype(np.uint8)
    else:
        qw = rng.randint(-128, 128, size=(k, n)).astype(np.int8)
    scales = (rng.rand(k // g, n).astype(np.float32) * 0.05 + 0.01)
    szeros = rng.randn(k // g, n).astype(np.float32) * 0.05
    x = rng.randn(m, k).astype(np.float32)

    w = np.asarray(dequantize_reference(jnp.asarray(qw),
                                        jnp.asarray(scales),
                                        jnp.asarray(szeros), bits=bits,
                                        group_size=g))
    want = x @ w
    got = np.asarray(
        quant_matmul(jnp.asarray(x), jnp.asarray(qw),
                     jnp.asarray(scales), jnp.asarray(szeros), bits=bits,
                     group_size=g, bm=8, bn=128, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("k,g,k_shards", [(1376, 32, 1), (11008, 128, 1),
                                          (5504, 32, 2)])
def test_as_params_k_padding_inert(k, g, k_shards):
    """as_params pads K per row-shard to a whole number of kernel K
    tiles (quant_k_tile); with x zero-padded to match (apply does this),
    the padded rows must not change the product."""
    from vllm_legacy_tpu.layers.quantization.common import (
        PackedQuantParams)
    from vllm_legacy_tpu.ops.pallas.quant_matmul import quant_k_tile

    rng = np.random.RandomState(7)
    n, m = 128, 4
    qw = rng.randint(0, 256, size=(k // 2, n)).astype(np.uint8)
    scales = (rng.rand(k // g, n).astype(np.float32) * 0.05 + 0.01)
    szeros = rng.randn(k // g, n).astype(np.float32) * 0.05
    x = rng.randn(m, k).astype(np.float32)

    w = np.asarray(dequantize_reference(jnp.asarray(qw),
                                        jnp.asarray(scales),
                                        jnp.asarray(szeros), bits=4,
                                        group_size=g))
    want = x @ w

    packed = PackedQuantParams(qw, scales, szeros, 4, g).as_params(
        k_shards=k_shards)
    k_new = packed["qweight"].shape[0] * 2
    assert (k_new // k_shards) % quant_k_tile(k_new // k_shards, g) == 0
    assert packed["scales"].shape[0] == k_new // g
    # emulate apply(): per-shard x zero-padding, shard-wise partial sums
    xs = x.reshape(m, k_shards, k // k_shards)
    xs = np.pad(xs, ((0, 0), (0, 0),
                     (0, (k_new - k) // k_shards))).reshape(m, k_new)
    got = np.asarray(
        quant_matmul(jnp.asarray(xs), jnp.asarray(packed["qweight"]),
                     jnp.asarray(packed["scales"]),
                     jnp.asarray(packed["szeros"]), bits=4,
                     group_size=g, bm=8, bn=128, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
