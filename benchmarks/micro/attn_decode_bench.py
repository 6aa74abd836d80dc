"""Decode attention-only cost: 22 chained paged_attention calls in ONE
jit at a given batch/ctx/block-size/layout. Env: B, CTX, BLOCK_SIZE,
PACKED, KBLK."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import time
import jax, jax.numpy as jnp, numpy as np
from vllm_legacy_tpu.ops.pallas import paged_attention as pk

B = int(os.getenv('B', '256'))
CTX = int(os.getenv('CTX', '384'))
BS = int(os.getenv('BLOCK_SIZE', '64'))
PACKED = bool(int(os.getenv('PACKED', '1')))
KBLK = int(os.getenv('KBLK', '8'))
HKV, HQ, D = 4, 32, 64
LNUM = 22
nblk = CTX // BS + 1
NBLK = B * nblk + 8
key = jax.random.PRNGKey(0)
if PACKED:
    shape = (LNUM, NBLK, HKV * BS // 2, 2 * D)
else:
    shape = (LNUM, NBLK, HKV, BS, 2 * D)  # padded head 128
kc = jnp.zeros(shape, jnp.bfloat16)
vc = jnp.zeros(shape, jnp.bfloat16)
DP = D if PACKED else 2 * D
q = jax.random.normal(key, (B, HQ, DP), jnp.bfloat16)
kn = jax.random.normal(key, (B, HKV, DP), jnp.bfloat16)
vn = jax.random.normal(key, (B, HKV, DP), jnp.bfloat16)
tables = np.zeros((B, nblk + 1), np.int32)
for i in range(B):
    tables[i, :nblk] = np.arange(i * nblk, (i + 1) * nblk) + 1
bt = jnp.asarray(tables)
cl = jnp.full((B,), CTX, jnp.int32)

def l22(q, kn, vn, kc, vc):
    def body(i, carry):
        kc, vc, acc = carry
        o, kc, vc = pk.paged_attention(
            q[:, None], kn[:, None], vn[:, None], kc, vc,
            jnp.zeros((1,), jnp.int32) + (i % LNUM), bt,
            jnp.ones((B,), jnp.int32), cl, scale=0.125, bq=1,
            kblk=KBLK)
        return kc, vc, acc + o.astype(jnp.float32).sum()
    kc2, vc2, acc = jax.lax.fori_loop(0, LNUM, body,
                                      (kc, vc, jnp.float32(0)))
    return acc, kc2, vc2

f = jax.jit(l22, donate_argnums=(3, 4))
acc, kc, vc = f(q, kn, vn, kc, vc)
acc.block_until_ready()
N = 8
t0 = time.perf_counter()
for _ in range(N):
    acc, kc, vc = f(q, kn, vn, kc, vc)
acc.block_until_ready()
dt = (time.perf_counter() - t0) / N
kv_gb = 2 * LNUM * B * nblk * BS * HKV * (D if PACKED else 2*D) * 2 / 1e9
print(f"B={B} ctx={CTX} bs={BS} packed={PACKED} kblk={KBLK} "
      f"attn22_ms={dt*1e3:.2f} kv_read_GB={kv_gb:.2f} "
      f"eff_BW={kv_gb/dt:.0f}GB/s")
