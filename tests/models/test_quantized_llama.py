"""Quantized-model path: synthetic checkpoints in every supported
serialization (GPTQ incl. act-order/8-bit/group sizes, AWQ, marlin
dense, marlin 2:4 sparse) loaded through LlamaForCausalLM must produce
the same logits as a dense model whose weights equal the exact
dequantized values (loader plumbing + param specs + linear dispatch
under shard_map).

Reference parity targets: gptq.py:134-217 exact dequant math,
awq.py:164-172 zeros convention, marlin.py / gptq_marlin_24.py
serialized layouts.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from vllm_legacy_tpu.layers.quantization.awq import AWQ_ORDER, AWQConfig
from vllm_legacy_tpu.layers.quantization.gptq import GPTQConfig
from vllm_legacy_tpu.layers.quantization.marlin import (GPTQMarlin24Config,
                                                        MarlinConfig)
from vllm_legacy_tpu.models.attention import (AttentionMetadata,
                                              padded_head_size)
from vllm_legacy_tpu.models.llama import LlamaForCausalLM
from vllm_legacy_tpu.ops.pallas.quant_matmul import dequantize_reference
from vllm_legacy_tpu.parallel.mesh import build_mesh
from vllm_legacy_tpu.testing_utils import tiny_llama_hf_config


# ---------------------------------------------------------------- packers
def quantize_gptq(w, rng, group, bits=4, desc_act=False,
                  checkpoint_format="gptq"):
    """w [in, out] f32 -> AutoGPTQ serialization (in-major int32)."""
    k, n = w.shape
    n_groups = k // group
    if desc_act:
        g_idx = rng.permutation(np.repeat(np.arange(n_groups),
                                          group)).astype(np.int32)
    else:
        g_idx = np.repeat(np.arange(n_groups), group).astype(np.int32)
    vals = 1 << bits
    zp = vals // 2
    # per-(group, out) scale from the rows belonging to that group
    scale = np.zeros((n_groups, n), np.float32)
    for g in range(n_groups):
        scale[g] = np.abs(w[g_idx == g]).max(axis=0) / (zp - 1) + 1e-8
    q = np.clip(np.round(w / scale[g_idx]) + zp, 0,
                vals - 1).astype(np.uint32)
    truth = scale[g_idx] * (q.astype(np.float32) - zp)

    zoff = 0 if checkpoint_format == "gptq_v2" else 1
    zeros = np.full((n_groups, n), zp - zoff, np.uint32)
    if bits == 4:
        qw = np.zeros((k // 8, n), np.uint32)
        for i in range(8):
            qw |= q[i::8] << (4 * i)
        qz = np.zeros((n_groups, n // 8), np.uint32)
        for i in range(8):
            qz |= zeros[:, i::8] << (4 * i)
    else:
        qw = np.zeros((k // 4, n), np.uint32)
        for i in range(4):
            qw |= q[i::4] << (8 * i)
        qz = np.zeros((n_groups, n // 4), np.uint32)
        for i in range(4):
            qz |= zeros[:, i::4] << (8 * i)
    tensors = {
        "qweight": qw.astype(np.int32),
        "qzeros": qz.astype(np.int32),
        "scales": scale.astype(np.float16),
        "g_idx": g_idx,
    }
    return tensors, truth


def quantize_awq(w, rng, group):
    """w [in, out] f32 -> AWQ serialization (column-packed nibbles in
    AWQ_ORDER; zeros stored as-is, awq.py:164-172)."""
    k, n = w.shape
    n_groups = k // group
    g_idx = np.repeat(np.arange(n_groups), group)
    scale = np.abs(w).reshape(n_groups, group, n).max(axis=1) / 7.0 + 1e-8
    zeros = rng.randint(0, 16, size=(n_groups, n)).astype(np.uint32)
    q = np.clip(np.round(w / scale[g_idx]) + zeros[g_idx], 0,
                15).astype(np.uint32)
    truth = scale[g_idx] * (q.astype(np.float32) -
                            zeros[g_idx].astype(np.float32))

    def pack_cols(a):
        out = np.zeros((*a.shape[:-1], a.shape[-1] // 8), np.uint32)
        for j, col in enumerate(AWQ_ORDER):
            out |= a[..., col::8] << (4 * j)
        return out.astype(np.int32)

    tensors = {
        "qweight": pack_cols(q),
        "qzeros": pack_cols(zeros),
        "scales": scale.astype(np.float16),
    }
    return tensors, truth


def quantize_marlin(w, rng, group, sparse24=False):
    """w [in, out] f32 -> marlin-serialized tensors (B/s or
    B_24/B_meta/s) + the exact dequant truth."""
    from tests.kernels.test_marlin_convert import compress_24, pack_marlin
    k, n = w.shape
    zp = 8
    n_groups = k // group
    g_idx = np.repeat(np.arange(n_groups), group)
    scale = np.abs(w).reshape(n_groups, group, n).max(axis=1) / 7.0 + 1e-8
    q = np.clip(np.round(w / scale[g_idx]) + zp, 0, 15).astype(np.uint8)
    if sparse24:
        # prune to 2:4 along K (keep the two largest per quad)
        mag = np.abs(q.astype(np.int32) - zp).reshape(k // 4, 4, n)
        order = np.argsort(mag, axis=1)
        qq = q.reshape(k // 4, 4, n).copy()
        np.put_along_axis(qq, order[:, :2, :], zp, axis=1)
        q = qq.reshape(k, n)
    truth = scale[g_idx] * (q.astype(np.float32) - zp)
    if sparse24:
        q_comp, meta = compress_24(q, zp)
        b24, s = pack_marlin(q_comp, scale.astype(np.float16), 4, group,
                             sparse24=True, scale_size_k=k)
        tensors = {"B_24": b24, "B_meta": meta.reshape(k // 32, n * 2),
                   "s": s}
    else:
        b, s = pack_marlin(q, scale.astype(np.float16), 4, group)
        tensors = {"B": b, "s": s}
    return tensors, truth


SCHEMES = {
    # name: (sizes(h, inter, heads), quant_cfg, packer)
    "gptq4_g32": ((64, 96, 2), GPTQConfig(4, 32, False),
                  lambda w, rng: quantize_gptq(w, rng, 32)),
    "gptq4_g64_actorder": ((64, 128, 2), GPTQConfig(4, 64, True),
                           lambda w, rng: quantize_gptq(
                               w, rng, 64, desc_act=True)),
    "gptq4_g128_v2": ((128, 256, 2),
                      GPTQConfig(4, 128, False,
                                 checkpoint_format="gptq_v2"),
                      lambda w, rng: quantize_gptq(
                          w, rng, 128, checkpoint_format="gptq_v2")),
    "gptq8_g32": ((64, 96, 2), GPTQConfig(8, 32, False),
                  lambda w, rng: quantize_gptq(w, rng, 32, bits=8)),
    "awq4_g32": ((64, 96, 2), AWQConfig(4, 32, True),
                 lambda w, rng: quantize_awq(w, rng, 32)),
    "marlin4_g64": ((64, 128, 2), MarlinConfig(group_size=64),
                    lambda w, rng: quantize_marlin(w, rng, 64)),
    "marlin24_g64": ((64, 128, 2), GPTQMarlin24Config(4, 64),
                     lambda w, rng: quantize_marlin(w, rng, 64,
                                                    sparse24=True)),
}


@pytest.mark.parametrize("scheme", sorted(SCHEMES))
def test_quantized_llama_matches_dequantized_dense(scheme):
    (h, inter, nh), quant_cfg, packer = SCHEMES[scheme]
    d = h // nh
    vocab = 256
    hf = tiny_llama_hf_config(vocab_size=vocab, hidden_size=h,
                              intermediate_size=inter,
                              num_hidden_layers=2,
                              num_attention_heads=nh,
                              num_key_value_heads=nh)
    rng = np.random.RandomState(0)
    dense = LlamaForCausalLM(hf, dtype=jnp.float32)
    quant = LlamaForCausalLM(hf, dtype=jnp.float32,
                             quant_config=quant_cfg)

    def weights():
        def t(shape, scale=0.05):
            return (rng.randn(*shape) * scale).astype(np.float32)

        yield "model.embed_tokens.weight", t((vocab, h))
        yield "model.norm.weight", np.ones((h, ), np.float32)
        yield "lm_head.weight", t((vocab, h))
        for i in range(2):
            p = f"model.layers.{i}."
            yield p + "input_layernorm.weight", np.ones((h, ), np.float32)
            yield (p + "post_attention_layernorm.weight",
                   np.ones((h, ), np.float32))
            for proj, shape in (
                ("self_attn.q_proj", (nh * d, h)),
                ("self_attn.k_proj", (nh * d, h)),
                ("self_attn.v_proj", (nh * d, h)),
                ("self_attn.o_proj", (h, nh * d)),
                ("mlp.gate_proj", (inter, h)),
                ("mlp.up_proj", (inter, h)),
                ("mlp.down_proj", (h, inter)),
            ):
                yield p + proj + ".weight", t(shape)

    ckpt = list(weights())
    dense_params = dense.load_weights(iter(ckpt))

    # quantized checkpoint: linear weights emitted in the scheme's
    # serialization; remember the exact dequant truth per projection.
    qckpt = []
    truths = {}
    for name, w in ckpt:
        if ("self_attn" in name or "mlp" in name) and name.endswith(
                ".weight"):
            tensors, truth = packer(w.T.astype(np.float32), rng)
            base = name[:-len(".weight")]
            truths[base] = truth
            for k, v in tensors.items():
                qckpt.append((base + "." + k, v))
        else:
            qckpt.append((name, w))
    quant_params = quant.load_weights(iter(qckpt))

    # 1) the loaded packed params must dequantize to the exact truth
    # (act-order: rows come back group-sorted; undo via in_perm)
    for base, truth in truths.items():
        parts = base.split(".")
        qp = quant_params["layers"][int(parts[2])][parts[4]]
        bits = 4 if qp["qweight"].dtype == np.uint8 else 8
        k_rows = qp["qweight"].shape[0] * (2 if bits == 4 else 1)
        group = k_rows // qp["scales"].shape[0]
        deq = np.asarray(
            dequantize_reference(jnp.asarray(qp["qweight"]),
                                 jnp.asarray(qp["scales"]),
                                 jnp.asarray(qp["szeros"]), bits=bits,
                                 group_size=group))[:k_rows]
        if "in_perm" in qp:
            undo = np.empty_like(qp["in_perm"])
            undo[qp["in_perm"]] = np.arange(len(undo))
            deq = deq[undo]
        np.testing.assert_allclose(deq[:truth.shape[0]], truth,
                                   atol=2e-3, rtol=2e-3)

    # 2) end-to-end logits through the quantized path must match the
    # dense model loaded with the dequantized weights
    for base, truth in truths.items():
        parts = base.split(".")
        dense_params["layers"][int(parts[2])][parts[4]]["weight"] = (
            truth.astype(np.float32))

    mesh = build_mesh(1, 1)
    b, l = 2, 16  # L must be a whole number of KV blocks (fused writes)
    tokens = jnp.asarray(rng.randint(0, vocab - 1, (b, l)), jnp.int32)
    positions = jnp.tile(jnp.arange(l, dtype=jnp.int32)[None], (b, 1))
    d_pad = padded_head_size(d)
    kv = (jnp.zeros((2, 8, nh, 16, d_pad), jnp.float32),
          jnp.zeros((2, 8, nh, 16, d_pad), jnp.float32))
    md = AttentionMetadata(
        slot_mapping=jnp.arange(b * l, dtype=jnp.int32),
        block_tables=jnp.tile(jnp.arange(4, dtype=jnp.int32)[None],
                              (b, 1)),
        context_lens=jnp.full((b, ), l, jnp.int32),
        query_lens=jnp.full((b, ), l, jnp.int32),
    )

    def run(model, params):
        specs = model.param_specs(params)
        cache_spec = P(None, None, "model", None, None)
        kv_specs = (cache_spec, cache_spec)
        rep = P()
        md_specs = AttentionMetadata(rep, rep, rep, rep)

        def fwd(p, kvc, tok, pos, m):
            hidden, kvc = model.forward(p, kvc, tok, pos, m)
            return model.compute_logits(
                p, hidden.reshape(-1, hidden.shape[-1])), kvc

        fn = shard_map(fwd, mesh=mesh,
                       in_specs=(specs, kv_specs, rep, rep, md_specs),
                       out_specs=(rep, kv_specs), check_vma=False)
        dev = jax.tree.map(jnp.asarray, params)
        logits, _ = jax.jit(fn)(dev, kv, tokens, positions, md)
        return np.asarray(logits)

    got_dense = run(dense, dense_params)
    got_quant = run(quant, quant_params)
    np.testing.assert_allclose(got_quant, got_dense, atol=2e-3,
                               rtol=2e-3)
