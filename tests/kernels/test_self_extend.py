"""Self-extend RoPE attention vs numpy oracle (reference fork:
rope_method='self_extend', SE_SCALE/SE_WINDOW — here the relative-
rotation formulation in ops/self_extend.py)."""
import numpy as np
import pytest

import jax.numpy as jnp

from vllm_legacy_tpu.ops import attention as attn_ops
from vllm_legacy_tpu.ops import xla_attention
from vllm_legacy_tpu.ops.self_extend import SelfExtendSpec

BS = 16
D = 128
HKV = 2
G = 2
WINDOW = 24
GROUP = 4

SPEC = SelfExtendSpec(window=WINDOW, group=GROUP, rotary_dim=D)


def np_rope(x, pos, rotary_dim, base=10000.0):
    """x [..., D] rotated at scalar/array pos (neox halves)."""
    inv = 1.0 / (base**(np.arange(0, rotary_dim, 2) / rotary_dim))
    ang = np.asarray(pos)[..., None] * inv  # [..., rd/2]
    cos, sin = np.cos(ang), np.sin(ang)
    half = rotary_dim // 2
    x1, x2 = x[..., :half], x[..., half:rotary_dim]
    out = np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                         axis=-1)
    return np.concatenate([out, x[..., rotary_dim:]], axis=-1)


def np_self_extend_attention(q, k, v, q_pos, scale):
    """Oracle: full attention over UNROTATED q [Hq, D], k/v [T, Hkv, D]
    with the two-pass merge at absolute positions."""
    hq = q.shape[0]
    t, hkv, _ = k.shape
    group = hq // hkv
    kv_pos = np.arange(t)
    out = np.zeros((hq, D), np.float64)
    for h in range(hq):
        kh = k[:, h // group]
        vh = v[:, h // group]
        qn = np_rope(q[h], q_pos, SPEC.rotary_dim)
        qg = np_rope(q[h], q_pos // GROUP + (WINDOW - WINDOW // GROUP),
                     SPEC.rotary_dim)
        kn = np_rope(kh, kv_pos, SPEC.rotary_dim)
        kg = np_rope(kh, kv_pos // GROUP, SPEC.rotary_dim)
        sn = (kn @ qn) * scale
        sg = (kg @ qg) * scale
        rel = q_pos - kv_pos
        s = np.where(rel <= WINDOW, sn, sg)
        s = np.where(kv_pos <= q_pos, s, -np.inf)
        p = np.exp(s - s.max())
        p = p / p.sum()
        out[h] = p @ vh
    return out


def build(rng, batch, max_blocks, num_layers=2):
    n_blocks = batch * max_blocks + 1
    k_cache = jnp.asarray(
        rng.randn(num_layers, n_blocks, HKV, BS, D) * 0.1, jnp.float32)
    v_cache = jnp.asarray(
        rng.randn(num_layers, n_blocks, HKV, BS, D), jnp.float32)
    tables = jnp.asarray(
        (rng.permutation(batch * max_blocks) + 1).reshape(
            batch, max_blocks).astype(np.int32))
    return k_cache, v_cache, tables


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_self_extend_decode_matches_oracle(impl):
    rng = np.random.RandomState(0)
    ctx = [100, 40, 17]  # beyond and within WINDOW
    batch = len(ctx)
    k_cache, v_cache, tables = build(rng, batch, 8)
    q = jnp.asarray(rng.randn(batch, HKV * G, D) * 0.5, jnp.float32)
    k_new = jnp.asarray(rng.randn(batch, HKV, D) * 0.1, jnp.float32)
    v_new = jnp.asarray(rng.randn(batch, HKV, D), jnp.float32)
    lidx = jnp.asarray([1], jnp.int32)

    fn = (attn_ops.paged_attention_decode
          if impl == "pallas" else xla_attention.paged_attention_decode)
    out, k_up, v_up = fn(q, k_new, v_new, k_cache, v_cache, lidx, tables,
                         jnp.asarray(ctx, jnp.int32), scale=D**-0.5,
                         self_extend=SPEC)

    kc = np.asarray(k_up)
    vc = np.asarray(v_up)
    tab = np.asarray(tables)
    for b, c in enumerate(ctx):
        # gather the seq's kv (incl. the new row the op wrote)
        rows_k, rows_v = [], []
        for t in range(c):
            blk, off = tab[b, t // BS], t % BS
            rows_k.append(kc[1, blk, :, off])
            rows_v.append(vc[1, blk, :, off])
        kk = np.stack(rows_k).astype(np.float64)  # [T, Hkv, D]
        vv = np.stack(rows_v).astype(np.float64)
        # the write must have stored the UNROTATED new key
        np.testing.assert_allclose(kk[-1], np.asarray(k_new)[b],
                                   rtol=1e-6, atol=1e-6)
        want = np_self_extend_attention(
            np.asarray(q)[b].astype(np.float64), kk, vv, c - 1, D**-0.5)
        np.testing.assert_allclose(np.asarray(out)[b], want,
                                   rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_self_extend_prefill_matches_oracle(impl):
    rng = np.random.RandomState(1)
    qlen, ctx = 32, 64  # chunked prefill continuing at pos 32
    k_cache, v_cache, tables = build(rng, 1, 8)
    q = jnp.asarray(rng.randn(1, qlen, HKV * G, D) * 0.5, jnp.float32)
    k_new = jnp.asarray(rng.randn(1, qlen, HKV, D) * 0.1, jnp.float32)
    v_new = jnp.asarray(rng.randn(1, qlen, HKV, D), jnp.float32)
    lidx = jnp.asarray([1], jnp.int32)

    fn = (attn_ops.paged_attention_prefill
          if impl == "pallas" else xla_attention.paged_attention)
    out, k_up, v_up = fn(q, k_new, v_new, k_cache, v_cache, lidx, tables,
                         jnp.asarray([qlen], jnp.int32),
                         jnp.asarray([ctx], jnp.int32), scale=D**-0.5,
                         self_extend=SPEC)
    kc, vc = np.asarray(k_up), np.asarray(v_up)
    tab = np.asarray(tables)
    rows_k = [kc[1, tab[0, t // BS], :, t % BS] for t in range(ctx)]
    rows_v = [vc[1, tab[0, t // BS], :, t % BS] for t in range(ctx)]
    kk = np.stack(rows_k).astype(np.float64)
    vv = np.stack(rows_v).astype(np.float64)
    for i in range(qlen):
        q_pos = ctx - qlen + i
        want = np_self_extend_attention(
            np.asarray(q)[0, i].astype(np.float64),
            kk[:q_pos + 1], vv[:q_pos + 1], q_pos, D**-0.5)
        np.testing.assert_allclose(np.asarray(out)[0, i], want,
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"q row {i}")


def test_self_extend_within_window_equals_standard_rope():
    """For contexts entirely inside the window, self-extend must equal
    ordinary rotate-then-attend dense attention."""
    rng = np.random.RandomState(2)
    ctx = [20]  # < WINDOW
    k_cache, v_cache, tables = build(rng, 1, 4)
    q_raw = jnp.asarray(rng.randn(1, HKV * G, D) * 0.5, jnp.float32)
    k_raw = jnp.asarray(rng.randn(1, HKV, D) * 0.1, jnp.float32)
    v_new = jnp.asarray(rng.randn(1, HKV, D), jnp.float32)
    lidx = jnp.asarray([1], jnp.int32)
    cl = jnp.asarray(ctx, jnp.int32)

    se_out, _, _ = xla_attention.paged_attention_decode(
        q_raw, k_raw, v_new, k_cache, v_cache, lidx, tables, cl,
        scale=D**-0.5, self_extend=SPEC)

    # standard path: pre-rotate everything at absolute positions
    kc = np.array(k_cache)
    tab = np.asarray(tables)
    for t in range(ctx[0] - 1):
        blk, off = tab[0, t // BS], t % BS
        kc[:, blk, :, off] = np_rope(kc[:, blk, :, off], t, D)
    q_rot = jnp.asarray(np_rope(np.asarray(q_raw), ctx[0] - 1, D),
                        jnp.float32)
    k_rot = jnp.asarray(np_rope(np.asarray(k_raw), ctx[0] - 1, D),
                        jnp.float32)
    std_out, _, _ = xla_attention.paged_attention_decode(
        q_rot, k_rot, v_new, jnp.asarray(kc), v_cache, lidx, tables, cl,
        scale=D**-0.5)
    np.testing.assert_allclose(np.asarray(se_out), np.asarray(std_out),
                               rtol=2e-4, atol=2e-4)
