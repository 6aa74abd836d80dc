"""On-chip kernel numerics gate: run every Pallas kernel family once on
the REAL chip and compare against the XLA reference implementation
(methodology of reference tests/kernels/test_attention.py, but compiled
on hardware instead of interpret mode — Mosaic lowering regressions
fail here that the CPU suite cannot see).

Run directly, or via ``python bench.py --check-kernels`` (the driver
hook). Exits nonzero on any mismatch.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np
import jax, jax.numpy as jnp


def run_case(B, HKV, HQ, D, BS, ctx_lens, q_lens, NBLK=128, seed=0):
    """Unified paged-attention kernel (prefill/chunked/decode) vs XLA."""
    from vllm_legacy_tpu.ops.pallas import paged_attention as pk
    from vllm_legacy_tpu.ops import xla_attention as xk
    rng = np.random.RandomState(seed)
    L = max(q_lens)
    l_pad = max(BS, 1 << (L - 1).bit_length()) if L > 1 else 1
    maxb = max((c + BS - 1) // BS for c in ctx_lens) + 1
    kc = rng.randn(2, NBLK, HKV, BS, D).astype(np.float32) * 0.1
    vc = rng.randn(2, NBLK, HKV, BS, D).astype(np.float32)
    tables = np.zeros((B, maxb), np.int32)
    perm = rng.permutation(NBLK - 1) + 1
    nf = 0
    for i, c in enumerate(ctx_lens):
        nb = (c + BS - 1) // BS
        tables[i, :nb] = perm[nf:nf + nb]; nf += nb
    q = rng.randn(B, l_pad, HQ, D).astype(np.float32) * 0.5
    kn = rng.randn(B, l_pad, HKV, D).astype(np.float32) * 0.1
    vn = rng.randn(B, l_pad, HKV, D).astype(np.float32)
    ql = jnp.asarray(q_lens, jnp.int32)
    cl = jnp.asarray(ctx_lens, jnp.int32)
    lidx = jnp.zeros((1,), jnp.int32)
    args = (jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn))
    ox, kx, vx = xk.paged_attention(*args, jnp.asarray(kc), jnp.asarray(vc),
                                    lidx, jnp.asarray(tables), ql, cl,
                                    scale=D**-0.5)
    op, kp, vp = pk.paged_attention(*args, jnp.asarray(kc), jnp.asarray(vc),
                                    lidx, jnp.asarray(tables), ql, cl,
                                    scale=D**-0.5)
    ox, op = np.asarray(ox), np.asarray(op)
    kx, kp = np.asarray(kx), np.asarray(kp)
    for i, (c, l) in enumerate(zip(ctx_lens, q_lens)):
        np.testing.assert_allclose(op[i, :l], ox[i, :l], rtol=2e-2,
                                   atol=2e-2, err_msg=f"seq {i} out")
    np.testing.assert_allclose(kp, kx, rtol=1e-2, atol=1e-2,
                               err_msg="k cache")
    print(f"OK paged_attention B={B} HKV={HKV} HQ={HQ} "
          f"ctx={ctx_lens} q={q_lens}")


def check_fused_decode(pair: bool, dt_name: str, B=16, CTX=192, BS=16,
                       HKV=4, HQ=8, seed=1):
    """Gang-batched fused decode kernel, compiled-on-chip vs the XLA
    view of the same fused buffer (bf16 and fp8 cache dtypes)."""
    from vllm_legacy_tpu.ops.pallas.fused_decode import \
        fused_decode_attention
    from vllm_legacy_tpu.ops import xla_attention as xk
    rng = np.random.RandomState(seed)
    dt = (jnp.float8_e4m3fn if dt_name == "fp8" else
          jnp.int8 if dt_name == "int8" else jnp.bfloat16)
    D = 64 if pair else 128
    nblk = -(-CTX // BS)
    NBLK = B * nblk + 8
    if pair:
        kshape = (2, NBLK, HKV * 2 * (BS // 2), 2 * D)
    else:
        kshape = (2, NBLK, HKV * 2, BS, D)
    kv = (jax.random.normal(jax.random.PRNGKey(seed), kshape,
                            jnp.bfloat16) * 0.25).astype(dt)
    q = jnp.asarray(rng.randn(B, HQ, D) * 0.5, jnp.bfloat16)
    kn = jnp.asarray(rng.randn(B, HKV, D) * 0.25, jnp.bfloat16)
    vn = jnp.asarray(rng.randn(B, HKV, D) * 0.25, jnp.bfloat16)
    if dt_name == "int8":
        # integer-valued cache AND new rows so every int8 cast in both
        # implementations is exact (engine semantics: values arrive
        # pre-scaled by 1/kv_scale and pre-rounded, models/attention)
        kv = (jax.random.normal(jax.random.PRNGKey(seed), kshape,
                                jnp.bfloat16) * 10).astype(jnp.int8)
        kn = jnp.asarray(np.round(rng.randn(B, HKV, D) * 10),
                         jnp.bfloat16)
        vn = jnp.asarray(np.round(rng.randn(B, HKV, D) * 10),
                         jnp.bfloat16)
        q = q * 0.05  # keep score magnitudes sane with integer K
    tables = np.zeros((B, nblk + 1), np.int32)
    for i in range(B):
        tables[i, :nblk] = np.arange(i * nblk, (i + 1) * nblk) + 1
    ctx = rng.randint(1, CTX, B).astype(np.int32)
    ctx[0] = 1; ctx[1] = CTX
    bt = jnp.asarray(tables); cl = jnp.asarray(ctx)
    lidx = jnp.zeros((1, ), jnp.int32)
    op, kvp = fused_decode_attention(q, kn, vn, kv, lidx, bt, cl,
                                     scale=D**-0.5, num_kv_heads=HKV)
    oxx, kvx = xk.fused_decode(q, kn, vn, kv, lidx, bt, cl,
                               scale=D**-0.5, num_kv_heads=HKV)
    np.testing.assert_allclose(np.asarray(op, np.float32),
                               np.asarray(oxx, np.float32), rtol=3e-2,
                               atol=3e-2, err_msg="fused decode out")
    np.testing.assert_allclose(
        np.asarray(kvp, np.float32), np.asarray(kvx, np.float32),
        rtol=1e-2, atol=1e-2, err_msg="fused cache write")
    print(f"OK fused_decode pair={pair} dt={dt_name}")


def check_dequant_gemm():
    """Fused dequant-GEMM (INT4 packed layout) vs dense dequant matmul."""
    from vllm_legacy_tpu.ops.pallas.quant_matmul import (
        dequantize_reference, quant_matmul)
    rng = np.random.RandomState(3)
    k, n, g = 1024, 512, 128
    qweight = jnp.asarray(rng.randint(0, 256, (k // 2, n)), jnp.uint8)
    scales = jnp.asarray(rng.rand(k // g, n) * 0.02 + 0.005, jnp.float32)
    szeros = scales * 8.0
    x = jnp.asarray(rng.randn(16, k) * 0.5, jnp.bfloat16)
    got = quant_matmul(x, qweight, scales, szeros, bits=4, group_size=g)
    dense = dequantize_reference(qweight, scales, szeros, bits=4,
                                 group_size=g)
    want = x.astype(jnp.float32) @ dense
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=5e-2, atol=5e-1,
                               err_msg="dequant gemm")
    print("OK dequant_gemm int4")


def check_all() -> None:
    # decode
    run_case(4, 4, 32, 128, 16, [1, 17, 63, 250], [1, 1, 1, 1])
    # prefill
    run_case(2, 4, 32, 128, 16, [64, 128], [64, 128])
    # chunked prefill (ctx > qlen, block aligned start)
    run_case(2, 2, 8, 128, 16, [96, 160], [32, 64])
    # MHA
    run_case(2, 8, 8, 128, 16, [33, 70], [1, 1])
    # fused decode: pair/plain x bf16/fp8
    check_fused_decode(pair=True, dt_name="bf16")
    check_fused_decode(pair=False, dt_name="bf16")
    check_fused_decode(pair=False, dt_name="fp8")
    check_fused_decode(pair=False, dt_name="int8")
    check_dequant_gemm()
    print("all kernel checks passed on", jax.devices()[0].device_kind)


if __name__ == "__main__":
    check_all()
