"""Flat-packed KV layout ([L, N, Hkv, bs*d] rows for head_size < 128)
vs the dense oracle and the unpacked kernel — decode, prefill, chunked
prefill, and the engine e2e equivalence under VLT_PACKED_KV=1."""
import jax.numpy as jnp
import numpy as np
import pytest

from tests.kernels.test_paged_attention import dense_oracle
from vllm_legacy_tpu.ops import xla_attention
from vllm_legacy_tpu.ops.pallas import paged_attention as pallas_attn

BS = 16
D = 64  # a head size that lane-padding would double


def build_case(seed, batch, q_lens, ctx_lens, hkv, hq, num_blocks):
    rng = np.random.RandomState(seed)
    max_ctx = max(ctx_lens)
    max_blocks = -(-max_ctx // BS)
    l_pad = max(BS, 1 << (max(q_lens) - 1).bit_length()) \
        if max(q_lens) > 1 else 1
    k_full = rng.randn(batch, max_ctx, hkv, D).astype(np.float32)
    v_full = rng.randn(batch, max_ctx, hkv, D).astype(np.float32)
    q_pad = np.zeros((batch, l_pad, hq, D), np.float32)
    k_new = np.zeros((batch, l_pad, hkv, D), np.float32)
    v_new = np.zeros((batch, l_pad, hkv, D), np.float32)
    kc5 = np.zeros((1, num_blocks, hkv, BS, D), np.float32)
    vc5 = np.zeros_like(kc5)
    tables = np.zeros((batch, max_blocks), np.int32)
    nxt = 1
    for i in range(batch):
        ql, ctx = q_lens[i], ctx_lens[i]
        q_start = ctx - ql
        nb = -(-ctx // BS)
        tables[i, :nb] = np.arange(nxt, nxt + nb)
        nxt += nb
        for p in range(q_start):
            blk = tables[i, p // BS]
            kc5[0, blk, :, p % BS] = k_full[i, p]
            vc5[0, blk, :, p % BS] = v_full[i, p]
        q_pad[i, :ql] = rng.randn(ql, hq, D)
        k_new[i, :ql] = k_full[i, q_start:ctx]
        v_new[i, :ql] = v_full[i, q_start:ctx]
    # flat-packed: [1, N, Hkv, bs*d]
    kc = kc5.reshape(1, num_blocks, hkv, BS * D)
    vc = vc5.reshape(1, num_blocks, hkv, BS * D)
    return (jnp.asarray(q_pad), jnp.asarray(k_new), jnp.asarray(v_new),
            jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(tables),
            k_full, v_full)


@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)])
@pytest.mark.parametrize(
    "q_lens,ctx_lens",
    [
        ([1, 1, 1], [1, 33, 128]),  # decode
        ([16, 64, 32], [16, 64, 128]),  # prefill (+ chunked start)
    ])
def test_packed_vs_oracle(hq, hkv, q_lens, ctx_lens):
    batch = len(q_lens)
    scale = D**-0.5
    (q, k_new, v_new, kc, vc, tables, k_full,
     v_full) = build_case(3, batch, q_lens, ctx_lens, hkv, hq, 64)
    ql = jnp.asarray(q_lens, jnp.int32)
    cl = jnp.asarray(ctx_lens, jnp.int32)
    lidx = jnp.zeros((1, ), jnp.int32)

    got_x, kcx, _ = xla_attention.paged_attention(
        q, k_new, v_new, kc, vc, lidx, tables, ql, cl, scale=scale)
    got_p, kcp, _ = pallas_attn.paged_attention(
        q, k_new, v_new, kc, vc, lidx, tables, ql, cl, scale=scale,
        interpret=True)

    assert kcx.shape == kc.shape and kcp.shape == kc.shape  # stay flat

    max_ctx = max(ctx_lens)
    kd = np.zeros((batch, max_ctx, hkv, D), np.float32)
    vd = np.zeros_like(kd)
    for i in range(batch):
        kd[i, :ctx_lens[i]] = k_full[i, :ctx_lens[i]]
        vd[i, :ctx_lens[i]] = v_full[i, :ctx_lens[i]]
    want = dense_oracle(np.asarray(q), kd, vd, q_lens, ctx_lens, scale)
    for i, qln in enumerate(q_lens):
        np.testing.assert_allclose(np.asarray(got_x)[i, :qln],
                                   want[i, :qln], atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(got_p)[i, :qln],
                                   want[i, :qln], atol=2e-5, rtol=2e-5)

    # the fused write must land the new rows in the flat layout
    for impl_kc in (kcx, kcp):
        k5 = np.asarray(impl_kc).reshape(1, -1, hkv, BS, D)
        for i, ctx in enumerate(ctx_lens):
            for p in range(ctx):
                blk = int(tables[i, p // BS])
                np.testing.assert_allclose(k5[0, blk, :, p % BS],
                                           k_full[i, p], atol=1e-6,
                                           err_msg=f"seq {i} pos {p}")


def test_engine_packed_matches_unpacked(tmp_path, monkeypatch):
    """Full engine on CPU interpret: VLT_PACKED_KV=1 output ==
    default layout output (TinyLlama-class head-64 model)."""
    from tests.models.test_families import build_checkpoint
    path, _ = build_checkpoint("gpt_neox_seq", tmp_path)  # head 16

    def gen():
        from vllm_legacy_tpu import LLM, SamplingParams
        llm = LLM(model=path, dtype="float32", max_model_len=128,
                  num_tpu_blocks_override=64, disable_log_stats=True)
        sp = SamplingParams(temperature=0.0, max_tokens=10,
                            ignore_eos=True, detokenize=False)
        outs = llm.generate(["Hello, my name is",
                             "The quick brown fox"], sp, use_tqdm=False)
        return [list(o.outputs[0].token_ids) for o in outs]

    want = gen()
    monkeypatch.setenv("VLT_PACKED_KV", "1")
    got = gen()
    assert got == want
