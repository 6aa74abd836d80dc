"""Layer-op unit tests vs torch / manual references (reference
strategy: tests/kernels/test_layernorm.py, test_activation.py,
test_pos_encoding.py — each op vs a naive torch implementation)."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vllm_legacy_tpu.layers.activation import (gelu_and_mul, gelu_fast,
                                               gelu_new, silu_and_mul)
from vllm_legacy_tpu.layers.norm import layer_norm, rms_norm
from vllm_legacy_tpu.layers.rotary import apply_rope, build_cos_sin_cache


@pytest.mark.parametrize("shape", [(7, 64), (3, 5, 128)])
def test_rms_norm_vs_torch(shape):
    rng = np.random.RandomState(0)
    x = rng.randn(*shape).astype(np.float32)
    w = rng.rand(shape[-1]).astype(np.float32) + 0.5
    got = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6))
    xt = torch.tensor(x)
    ref = xt * torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + 1e-6)
    ref = (ref * torch.tensor(w)).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_rms_norm_fused_residual():
    """residual variant == add then norm, and returns the sum
    (reference: fused_add_rms_norm, csrc/layernorm_kernels.cu)."""
    rng = np.random.RandomState(1)
    x = rng.randn(4, 32).astype(np.float32)
    res = rng.randn(4, 32).astype(np.float32)
    w = rng.rand(32).astype(np.float32)
    normed, new_res = rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6,
                               residual=jnp.asarray(res))
    np.testing.assert_allclose(np.asarray(new_res), x + res, atol=1e-6)
    plain = rms_norm(jnp.asarray(x + res), jnp.asarray(w), eps=1e-6)
    np.testing.assert_allclose(np.asarray(normed), np.asarray(plain),
                               atol=1e-6)


def test_layer_norm_vs_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(5, 48).astype(np.float32)
    w = rng.rand(48).astype(np.float32) + 0.5
    b = rng.randn(48).astype(np.float32)
    got = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(w),
                                jnp.asarray(b), eps=1e-5))
    ref = torch.nn.functional.layer_norm(
        torch.tensor(x), (48, ), torch.tensor(w),
        torch.tensor(b), eps=1e-5).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_activations_vs_torch():
    rng = np.random.RandomState(3)
    x = rng.randn(6, 2 * 40).astype(np.float32)
    xt = torch.tensor(x)
    g, u = xt.chunk(2, dim=-1)

    got = np.asarray(silu_and_mul(jnp.asarray(x)))
    np.testing.assert_allclose(
        got, (torch.nn.functional.silu(g) * u).numpy(), atol=1e-5)

    got = np.asarray(gelu_and_mul(jnp.asarray(x)))
    np.testing.assert_allclose(
        got, (torch.nn.functional.gelu(g) * u).numpy(), atol=1e-5)

    got = np.asarray(gelu_and_mul(jnp.asarray(x), approximate="tanh"))
    np.testing.assert_allclose(
        got,
        (torch.nn.functional.gelu(g, approximate="tanh") * u).numpy(),
        atol=1e-5)

    y = rng.randn(6, 40).astype(np.float32)
    yt = torch.tensor(y)
    # NewGELU / FastGELU (reference csrc/activation_kernels.cu)
    ref_new = (0.5 * yt * (1 + torch.tanh(
        np.sqrt(2 / np.pi) * (yt + 0.044715 * yt.pow(3))))).numpy()
    np.testing.assert_allclose(np.asarray(gelu_new(jnp.asarray(y))),
                               ref_new, atol=1e-5)
    ref_fast = (0.5 * yt * (1 + torch.tanh(
        yt * 0.7978845608 * (1 + 0.044715 * yt * yt)))).numpy()
    np.testing.assert_allclose(np.asarray(gelu_fast(jnp.asarray(y))),
                               ref_fast, atol=1e-5)


@pytest.mark.parametrize("is_neox", [True, False])
def test_rope_vs_manual(is_neox):
    """apply_rope vs a literal reimplementation of the reference's
    rotation (csrc/pos_encoding_kernels.cu semantics)."""
    d, hq, hkv, t = 32, 4, 2, 9
    rng = np.random.RandomState(4)
    q = rng.randn(t, hq, d).astype(np.float32)
    k = rng.randn(t, hkv, d).astype(np.float32)
    pos = rng.randint(0, 100, size=t).astype(np.int32)
    cache = build_cos_sin_cache(d, d, 128, 10000.0, None)
    qo, ko = apply_rope(jnp.asarray(q), jnp.asarray(k),
                        jnp.asarray(pos), jnp.asarray(cache),
                        rotary_dim=d, is_neox_style=is_neox)

    inv = 1.0 / (10000.0 ** (np.arange(0, d, 2) / d))
    ang = pos[:, None] * inv[None, :]  # [T, d/2]
    cos, sin = np.cos(ang), np.sin(ang)

    def rot(x):
        out = x.copy()
        if is_neox:
            x1, x2 = x[..., :d // 2], x[..., d // 2:]
            out[..., :d // 2] = x1 * cos[:, None] - x2 * sin[:, None]
            out[..., d // 2:] = x2 * cos[:, None] + x1 * sin[:, None]
        else:
            x1, x2 = x[..., 0::2], x[..., 1::2]
            out[..., 0::2] = x1 * cos[:, None] - x2 * sin[:, None]
            out[..., 1::2] = x2 * cos[:, None] + x1 * sin[:, None]
        return out

    np.testing.assert_allclose(np.asarray(qo), rot(q), atol=2e-5,
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(ko), rot(k), atol=2e-5,
                               rtol=2e-5)


def test_rope_partial_rotary():
    """rotary_dim < head: the tail passes through untouched (GPT-J /
    phi partial rotary)."""
    d, rd, t = 32, 16, 5
    rng = np.random.RandomState(5)
    q = rng.randn(t, 2, d).astype(np.float32)
    k = rng.randn(t, 1, d).astype(np.float32)
    pos = np.arange(t, dtype=np.int32)
    cache = build_cos_sin_cache(d, rd, 64, 10000.0, None)
    qo, ko = apply_rope(jnp.asarray(q), jnp.asarray(k),
                        jnp.asarray(pos), jnp.asarray(cache),
                        rotary_dim=rd)
    np.testing.assert_array_equal(np.asarray(qo)[..., rd:], q[..., rd:])
    np.testing.assert_array_equal(np.asarray(ko)[..., rd:], k[..., rd:])
    assert np.abs(np.asarray(qo)[1:, :, :rd] - q[1:, :, :rd]).max() > 0
