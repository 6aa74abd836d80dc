"""int8 KV cache — the TPU-native 1-byte KV format.

The reference serves fp8-e4m3 KV (docs/source/quantization/
fp8_e4m3_kvcache.rst); on this hardware the fast 8-bit path is INTEGER
(Mosaic's f8e4m3->bf16 convert lowers ~10x slower than the native
int8->bf16 widen — see ops/pallas/fused_decode.py), so int8 with the
same folded per-layer scale machinery gives half-byte KV streaming at
near-bf16 kernel wall time. Scale fold identical to fp8: stored =
round(x/kv_scale) clipped to +-127, q *= s, out *= s.
"""
import numpy as np
import pytest

from tests.test_fp8_kv import _make_ckpt, _run


@pytest.fixture(scope="module")
def tiny_llama_path(tmp_path_factory):
    return _make_ckpt(tmp_path_factory.mktemp("tiny_llama_int8"))


def test_int8_kv_cache_generates(tiny_llama_path):
    base = _run(tiny_llama_path, "auto", 32)
    q8 = _run(tiny_llama_path, "int8", 32)
    # Default scale 1/8: unit-variance K/V quantize at ~3.6% rms error;
    # greedy argmax should track the f32 cache on the leading tokens.
    for b, f in zip(base, q8):
        assert len(f) == len(b)
        assert f[0] == b[0]


def test_int8_kv_fold_is_exact_algebra():
    """attention() with an int8 cache must return outputs on the same
    scale as the f32-cache truth, for both the default and an explicit
    kv_scale."""
    import jax.numpy as jnp
    from vllm_legacy_tpu.models.attention import (AttentionMetadata,
                                                  attention,
                                                  kv_cache_shape)
    B, L, H, D = 1, 4, 2, 128
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    shape = kv_cache_shape(1, 4, H, 32, D, packed=False, fused=True)
    md = AttentionMetadata(
        slot_mapping=jnp.arange(B * L, dtype=jnp.int32),
        block_tables=jnp.asarray([[1, 2]], jnp.int32),
        context_lens=jnp.asarray([L], jnp.int32),
        query_lens=jnp.asarray([L], jnp.int32))
    truth, _ = attention(q, k, v, (jnp.zeros(shape, jnp.float32), ),
                         md, scale=D**-0.5)
    for scale in (None, jnp.asarray(0.25)):
        out8, _ = attention(q, k, v, (jnp.zeros(shape, jnp.int8), ),
                            md, scale=D**-0.5, kv_scale=scale)
        ratio = float(jnp.median(out8 / truth))
        assert 0.97 < ratio < 1.03, (scale, ratio)
        err = float(jnp.median(jnp.abs(out8 - truth)))
        assert err < 0.05, (scale, err)


def test_int8_requires_block_32():
    from vllm_legacy_tpu.config import CacheConfig
    with pytest.raises(ValueError, match="block_size"):
        CacheConfig(block_size=16, cache_dtype="int8")
