"""Validate new-layout pallas kernel vs XLA fallback on the REAL chip."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np
import jax, jax.numpy as jnp
from vllm_legacy_tpu.ops.pallas import paged_attention as pk
from vllm_legacy_tpu.ops import xla_attention as xk

def run_case(B, HKV, HQ, D, BS, ctx_lens, q_lens, NBLK=128, seed=0):
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
    print(f"OK B={B} HKV={HKV} HQ={HQ} ctx={ctx_lens} q={q_lens}")

# decode
run_case(4, 4, 32, 128, 16, [1, 17, 63, 250], [1, 1, 1, 1])
# prefill
run_case(2, 4, 32, 128, 16, [64, 128], [64, 128])
# chunked prefill (ctx > qlen, block aligned start)
run_case(2, 2, 8, 128, 16, [96, 160], [32, 64])
# MHA
run_case(2, 8, 8, 128, 16, [33, 70], [1, 1])
print("all kernel checks passed on", jax.devices()[0].device_kind)
