"""Quantized-model path: a synthetic GPTQ checkpoint loaded through
LlamaForCausalLM must produce the same logits as a dense model whose
weights equal the dequantized values (loader plumbing + param specs +
linear dispatch under shard_map)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from vllm_legacy_tpu.layers.quantization.gptq import GPTQConfig
from vllm_legacy_tpu.models.attention import (AttentionMetadata,
                                              padded_head_size)
from vllm_legacy_tpu.models.llama import LlamaForCausalLM
from vllm_legacy_tpu.ops.pallas.quant_matmul import dequantize_reference
from vllm_legacy_tpu.parallel.mesh import build_mesh
from vllm_legacy_tpu.testing_utils import tiny_llama_hf_config

GROUP = 32


def quantize_dense(w: np.ndarray, rng):
    """w [in, out] f32 -> GPTQ-checkpoint-format tensors (in-major)."""
    k, n = w.shape
    n_groups = k // GROUP
    wg = w.reshape(n_groups, GROUP, n)
    scale = np.abs(wg).max(axis=1) / 7.0 + 1e-8  # [n_groups, n]
    z = 8
    q = np.clip(np.round(wg / scale[:, None, :]) + z, 0,
                15).astype(np.uint32).reshape(k, n)
    qw = np.zeros((k // 8, n), np.uint32)
    for i in range(8):
        qw |= q[i::8] << (4 * i)
    qz = np.full((n_groups, n), z - 1, np.uint32)  # v1 stores z-1
    qzp = np.zeros((n_groups, n // 8), np.uint32)
    for i in range(8):
        qzp |= qz[:, i::8] << (4 * i)
    return {
        "qweight": qw.astype(np.int32),
        "qzeros": qzp.astype(np.int32),
        "scales": scale.astype(np.float16),
        "g_idx": np.repeat(np.arange(n_groups), GROUP).astype(np.int32),
    }


def test_quantized_llama_matches_dequantized_dense():
    hf = tiny_llama_hf_config(vocab_size=256, hidden_size=64,
                              intermediate_size=96,
                              num_hidden_layers=2,
                              num_attention_heads=2,
                              num_key_value_heads=2)
    rng = np.random.RandomState(0)
    quant_cfg = GPTQConfig(weight_bits=4, group_size=GROUP,
                           desc_act=False)
    dense = LlamaForCausalLM(hf, dtype=jnp.float32)
    quant = LlamaForCausalLM(hf, dtype=jnp.float32,
                             quant_config=quant_cfg)

    # Build a synthetic checkpoint: random dense weights, linears also
    # emitted in GPTQ format.
    def weights():
        def t(shape, scale=0.05):
            return (rng.randn(*shape) * scale).astype(np.float32)

        yield "model.embed_tokens.weight", t((256, 64))
        yield "model.norm.weight", np.ones((64, ), np.float32)
        yield "lm_head.weight", t((256, 64))
        h, inter, nh, d = 64, 96, 2, 32
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

    # quantized checkpoint: replace linear weights by gptq tensors
    qckpt = []
    for name, w in ckpt:
        if ("self_attn" in name or "mlp" in name) and name.endswith(
                ".weight"):
            tensors = quantize_dense(w.T.astype(np.float32), rng)
            base = name[:-len(".weight")]
            for k, v in tensors.items():
                qckpt.append((base + "." + k, v))
        else:
            qckpt.append((name, w))
    quant_params = quant.load_weights(iter(qckpt))

    # overwrite dense linears with the dequantized values so outputs
    # must agree exactly (same numbers through both code paths)
    for i in range(2):
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
                     "up_proj", "down_proj"):
            qp = quant_params["layers"][i][proj]
            deq = np.asarray(
                dequantize_reference(jnp.asarray(qp["qweight"]),
                                     jnp.asarray(qp["scales"]),
                                     jnp.asarray(qp["szeros"]), bits=4,
                                     group_size=GROUP))
            dense_params["layers"][i][proj]["weight"] = deq.astype(
                np.float32)

    mesh = build_mesh(1, 1)
    b, l = 2, 16  # L must be a whole number of KV blocks (fused writes)
    tokens = jnp.asarray(rng.randint(0, 255, (b, l)), jnp.int32)
    positions = jnp.tile(jnp.arange(l, dtype=jnp.int32)[None], (b, 1))
    d_pad = padded_head_size(32)
    kv = (jnp.zeros((2, 8, 2, 16, d_pad), jnp.float32),
          jnp.zeros((2, 8, 2, 16, d_pad), jnp.float32))
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
