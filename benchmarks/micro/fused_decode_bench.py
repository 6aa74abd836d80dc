"""Correctness (vs dense oracle) + perf of fused_decode_attention.
Env: B, CTX, BLOCK_SIZE, PAIR, CHECK (interpret correctness only)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import time
import jax, jax.numpy as jnp, numpy as np
from vllm_legacy_tpu.ops.pallas.fused_decode import fused_decode_attention

B = int(os.getenv('B', '256'))
CTX = int(os.getenv('CTX', '384'))
BS = int(os.getenv('BLOCK_SIZE', '64'))
PAIR = bool(int(os.getenv('PAIR', '1')))
CHECK = bool(int(os.getenv('CHECK', '0')))
LNUM = int(os.getenv('LNUM', '22'))
HKV = int(os.getenv('HKV', '4'))
HQ = int(os.getenv('HQ', '32'))
D = int(os.getenv('D', '64' if PAIR else '128'))
RD = 2 * D if PAIR else D
ROWS = BS // 2 if PAIR else BS
R = HKV * ROWS
nblk = -(-CTX // BS)
NBLK = B * nblk + 8
rng = np.random.RandomState(0)
DT = os.getenv('DT', 'bf16')
dt = (np.float32 if CHECK else
      jnp.float8_e4m3fn if DT == 'fp8' else
      jnp.int8 if DT == 'int8' else jnp.bfloat16)

if CHECK:
    kv = rng.randn(LNUM, NBLK, 2 * R, RD).astype(np.float32) * 0.3
else:
    kv = None  # perf mode: init on device (13B shapes OOM a host f32)
q = rng.randn(B, HQ, D).astype(np.float32)
kn = rng.randn(B, HKV, D).astype(np.float32)
vn = rng.randn(B, HKV, D).astype(np.float32)
tables = np.zeros((B, nblk + 1), np.int32)
ctx_lens = np.full(B, CTX, np.int32)
if CHECK:
    ctx_lens = (rng.randint(1, CTX, B)).astype(np.int32)
    ctx_lens[0] = 1; ctx_lens[1] = CTX
perm = np.arange(B * nblk)
if os.getenv('SHUFFLE', '0') == '1':
    np.random.RandomState(7).shuffle(perm)
for i in range(B):
    tables[i, :nblk] = perm[i * nblk:(i + 1) * nblk] + 1

act_dt = jnp.bfloat16 if DT == 'fp8' else dt  # activations stay bf16
if kv is None:
    # plain (head>=128) mode feeds the engine's 5-D fused layout
    # [L, N, 2*Hkv, bs, dpad]; pair mode the flat 4-D row form
    kshape = ((LNUM, NBLK, 2 * R, RD) if PAIR else
              (LNUM, NBLK, 2 * HKV, BS, D))
    kvj = (jax.random.normal(jax.random.PRNGKey(0), kshape,
                             jnp.bfloat16) * 0.3).astype(dt)
else:
    kvj = jnp.asarray(kv, dt)
qj = jnp.asarray(q, act_dt)
knj = jnp.asarray(kn, act_dt); vnj = jnp.asarray(vn, act_dt)
bt = jnp.asarray(tables); cl = jnp.asarray(ctx_lens)
lidx = jnp.zeros((1,), jnp.int32)
scale = D ** -0.5

if CHECK:
    out, kv2 = fused_decode_attention(
        qj, knj, vnj, kvj, lidx, bt, cl, scale=scale,
        num_kv_heads=HKV, interpret=True)
    out = np.asarray(out, np.float32)
    kv2 = np.asarray(kv2, np.float32)
    # oracle
    def blockmat(kv_l, blk):  # [2R, RD] -> k, v [HKV, BS, D]
        m = kv_l[blk].reshape(HKV, 2, ROWS, RD)  # head-major K/V
        k = m[:, 0].reshape(HKV, BS, D)
        v = m[:, 1].reshape(HKV, BS, D)
        return k, v
    bad = 0
    for i in range(B):
        ctx = int(ctx_lens[i])
        ks, vs = [], []
        for e in range(-(-ctx // BS)):
            k_, v_ = blockmat(kv[0], tables[i, e])
            ks.append(k_); vs.append(v_)
        kfull = np.concatenate(ks, 1)[:, :ctx].copy()
        vfull = np.concatenate(vs, 1)[:, :ctx].copy()
        kfull[:, ctx - 1] = kn[i]; vfull[:, ctx - 1] = vn[i]
        qh = q[i].reshape(HKV, HQ // HKV, D)
        s = np.einsum('hgd,htd->hgt', qh * scale, kfull)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        o = np.einsum('hgt,htd->hgd', p, vfull).reshape(HQ, D)
        if not np.allclose(out[i], o, atol=2e-5, rtol=2e-5):
            bad += 1
            if bad < 3:
                print("MISMATCH seq", i, np.abs(out[i] - o).max())
        # cache write check
        k2, v2 = blockmat(kv2[0], tables[i, (ctx - 1) // BS])
        pos = (ctx - 1) % BS
        assert np.allclose(k2[:, pos], kn[i], atol=1e-6), (i, "k write")
        assert np.allclose(v2[:, pos], vn[i], atol=1e-6), (i, "v write")
    print("correctness:", "FAIL" if bad else "PASS", f"({bad}/{B} bad)")
else:
    def l22(q, kn, vn, kv):
        def body(i, carry):
            kv, acc = carry
            o, kv = fused_decode_attention(
                q, kn, vn, kv, jnp.zeros((1,), jnp.int32) + (i % LNUM),
                bt, cl, scale=scale, num_kv_heads=HKV,
                kblk=int(os.getenv('KBLK', '4')),
                gang=int(os.getenv('GANG', '16')))
            return kv, acc + o.astype(jnp.float32).sum()
        kv2, acc = jax.lax.fori_loop(0, LNUM, body, (kv, jnp.float32(0)))
        return acc, kv2
    f = jax.jit(l22, donate_argnums=(3,))
    acc, kvj = f(qj, knj, vnj, kvj); acc.block_until_ready()
    N = 8
    t0 = time.perf_counter()
    for _ in range(N):
        acc, kvj = f(qj, knj, vnj, kvj)
    acc.block_until_ready()
    dtm = (time.perf_counter() - t0) / N
    gb = LNUM * B * nblk * 2 * R * RD * jnp.dtype(dt).itemsize / 1e9
    print(f"B={B} ctx={CTX} bs={BS} pair={PAIR} attn22_ms={dtm*1e3:.2f} "
          f"kv_GB={gb:.2f} eff_BW={gb/dtm:.0f}GB/s")
