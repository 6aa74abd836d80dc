"""Sweep kernel params: 22 chained attention calls in ONE jit."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import time, functools, sys
import jax, jax.numpy as jnp, numpy as np
from vllm_legacy_tpu.ops.pallas import paged_attention as pk

import os
B = int(os.getenv('B', '64'))
HKV, HQ, D = 4, 32, 128
LNUM, NBLK, BS = 22, 4000, 16
MAXB, CTX = 33, 257
key = jax.random.PRNGKey(0)
kc = jnp.zeros((LNUM, NBLK, HKV, BS, D), jnp.bfloat16)
vc = jnp.zeros((LNUM, NBLK, HKV, BS, D), jnp.bfloat16)
q = jax.random.normal(key, (B, HQ, D), jnp.bfloat16)
kn = jax.random.normal(key, (B, HKV, D), jnp.bfloat16)
vn = jax.random.normal(key, (B, HKV, D), jnp.bfloat16)
tables = np.zeros((B, MAXB), np.int32)
nblk = CTX // BS + 2
for i in range(B):
    tables[i, :nblk] = (np.arange(i*nblk, (i+1)*nblk) % (NBLK-1)) + 1
bt = jnp.asarray(tables)
cl = jnp.full((B,), CTX, jnp.int32)

def bench(kblk):
    def l22(q, kn, vn, kc, vc):
        def body(i, carry):
            kc, vc, acc = carry
            o, kc, vc = pk.paged_attention(
                q[:, None], kn[:, None], vn[:, None], kc, vc,
                jnp.zeros((1,), jnp.int32) + (i % LNUM), bt,
                jnp.ones((B,), jnp.int32), cl, scale=0.125, bq=1,
                kblk=kblk)
            return kc, vc, acc + o.astype(jnp.float32).sum()
        kc2, vc2, acc = jax.lax.fori_loop(0, 22, body,
                                          (kc, vc, jnp.float32(0)))
        return acc, kc2, vc2
    f = jax.jit(l22, donate_argnums=(3, 4))
    global kc, vc
    acc, kc, vc = f(q, kn, vn, kc, vc)
    jax.device_get(acc)
    t0 = time.perf_counter()
    N = 10
    for _ in range(N):
        acc, kc, vc = f(q, kn, vn, kc, vc)
    jax.device_get(acc)
    dt = (time.perf_counter() - t0) / N
    print(f"kblk={kblk:3d}: 22-layer attn {dt*1e3:7.2f} ms "
          f"({dt/22*1e6:6.1f} us/layer)")

bench(8)
