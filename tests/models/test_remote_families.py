"""Remote-code model families: checkpoint-name mapping + forward smoke.

These architectures (Qwen v1, Baichuan, InternLM2, ChatGLM, DeepSeek-MoE,
MiniCPM, Orion, Jais) ship as trust_remote_code models, so there is no
in-image HF implementation to compare against (the reference tests them
against downloaded checkpoints — zero egress here). Covered instead:
  * load_weights consumes the exact checkpoint naming and produces a
    well-formed param pytree (fused q/k/v splits verified by sentinel
    fills),
  * a jitted prefill+decode forward runs finite on the CPU backend.
"""
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

H, NQ, NKV, NL, V, INTER = 64, 4, 2, 2, 128, 96
D = H // NQ


def cfg(**kw):
    base = dict(architectures=["X"], vocab_size=V, hidden_size=H,
                num_hidden_layers=NL, num_attention_heads=NQ,
                num_key_value_heads=NKV, intermediate_size=INTER,
                max_position_embeddings=128, rms_norm_eps=1e-6,
                tie_word_embeddings=False)
    base.update(kw)
    return types.SimpleNamespace(**base)


def t(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32) * 0.02


def sentinel_qkv(rng, layout, d=D, nq=NQ, nkv=NKV, h=H):
    """Fused qkv weight where q rows ~ +1, k rows ~ +2, v rows ~ +3."""
    if layout == "concat":  # [q | k | v]
        rows = [np.full((nq * d, h), 1.0), np.full((nkv * d, h), 2.0),
                np.full((nkv * d, h), 3.0)]
        return np.concatenate(rows).astype(np.float32)
    if layout == "grouped":  # [nkv, g+2, d]
        g = nq // nkv
        grp = np.concatenate([
            np.full((nkv, g, d, h), 1.0), np.full((nkv, 1, d, h), 2.0),
            np.full((nkv, 1, d, h), 3.0)
        ], axis=1)
        return grp.reshape(-1, h).astype(np.float32)
    raise ValueError(layout)


def check_qkv(params, q_key="q_proj"):
    lp = params["layers"][0]
    assert np.allclose(lp[q_key]["weight"], 1.0)
    assert np.allclose(lp["k_proj"]["weight"], 2.0)
    assert np.allclose(lp["v_proj"]["weight"], 3.0)


def run_forward(model, params):
    """One 8-token prefill + one decode step; asserts finite output."""
    from vllm_legacy_tpu.models.attention import (AttentionMetadata,
                                                  padded_head_size)
    kv_shape = (model.num_layers, 8, model.num_kv_heads, 16,
                padded_head_size(model.head_dim))
    kv = (jnp.zeros(kv_shape, jnp.float32),
          jnp.zeros(kv_shape, jnp.float32))
    dev_params = jax.tree.map(
        jnp.asarray, params,
        is_leaf=lambda x: isinstance(x, np.ndarray))
    toks = jnp.ones((1, 16), jnp.int32)
    pos = jnp.arange(16, dtype=jnp.int32)[None]
    md = AttentionMetadata(
        slot_mapping=jnp.arange(16, dtype=jnp.int32),
        block_tables=jnp.arange(8, dtype=jnp.int32)[None],
        context_lens=jnp.asarray([8], jnp.int32),
        query_lens=jnp.asarray([8], jnp.int32))
    hidden, kv = model.forward(dev_params, kv, toks, pos, md)
    logits = model.compute_logits(dev_params,
                                  hidden.reshape(-1, hidden.shape[-1]))
    assert bool(jnp.isfinite(logits[:8, :model.org_vocab_size]).all())
    # decode step
    md2 = AttentionMetadata(
        slot_mapping=jnp.asarray([8], jnp.int32),
        block_tables=jnp.arange(8, dtype=jnp.int32)[None],
        context_lens=jnp.asarray([9], jnp.int32),
        query_lens=jnp.asarray([1], jnp.int32))
    hidden, kv = model.forward(dev_params, kv,
                               jnp.ones((1, 1), jnp.int32),
                               jnp.asarray([[8]], jnp.int32), md2)
    assert bool(jnp.isfinite(hidden).all())


def test_qwen_v1():
    from vllm_legacy_tpu.models.qwen import QWenLMHeadModel
    rng = np.random.RandomState(0)
    c = cfg(architectures=["QWenLMHeadModel"],
            intermediate_size=2 * INTER, num_key_value_heads=NQ,
            layer_norm_epsilon=1e-6, seq_length=128)
    model = QWenLMHeadModel(c, dtype=jnp.float32)
    weights = [("transformer.wte.weight", t(rng, V, H)),
               ("transformer.ln_f.weight", np.ones(H, np.float32)),
               ("lm_head.weight", t(rng, V, H))]
    for i in range(NL):
        p = f"transformer.h.{i}"
        weights += [
            (f"{p}.ln_1.weight", np.ones(H, np.float32)),
            (f"{p}.ln_2.weight", np.ones(H, np.float32)),
            (f"{p}.attn.c_attn.weight",
             sentinel_qkv(rng, "concat", nkv=NQ)),
            (f"{p}.attn.c_attn.bias", t(rng, 3 * H)),
            (f"{p}.attn.c_proj.weight", t(rng, H, H)),
            (f"{p}.mlp.w1.weight", t(rng, INTER, H)),
            (f"{p}.mlp.w2.weight", t(rng, INTER, H)),
            (f"{p}.mlp.c_proj.weight", t(rng, H, INTER)),
        ]
    params = model.load_weights(iter(weights))
    # loader transposes to [in, out]
    assert np.allclose(params["layers"][0]["q_proj"]["weight"], 1.0)
    assert np.allclose(params["layers"][0]["k_proj"]["weight"], 2.0)
    assert np.allclose(params["layers"][0]["v_proj"]["weight"], 3.0)
    run_forward(model, params)


@pytest.mark.parametrize("hidden,expect_alibi", [(4096, False), (64, True)])
def test_baichuan(hidden, expect_alibi):
    from vllm_legacy_tpu.models.baichuan import BaichuanForCausalLM
    rng = np.random.RandomState(0)
    h = 64  # keep compute small; only the flag depends on cfg hidden
    c = cfg(architectures=["BaichuanForCausalLM"], hidden_size=hidden,
            num_key_value_heads=None, model_max_length=128)
    c.hidden_size = hidden
    if hidden != 64:
        c.num_attention_heads = hidden // 16
        c.intermediate_size = hidden
    model = BaichuanForCausalLM(c, dtype=jnp.float32)
    assert model.use_alibi == expect_alibi
    if hidden != 64:
        return  # flag check only for the big config
    nq = c.num_attention_heads
    d = hidden // nq
    weights = [("model.embed_tokens.weight", t(rng, V, hidden)),
               ("model.norm.weight", np.ones(hidden, np.float32)),
               ("lm_head.weight", t(rng, V, hidden))]
    for i in range(NL):
        p = f"model.layers.{i}"
        weights += [
            (f"{p}.input_layernorm.weight", np.ones(hidden, np.float32)),
            (f"{p}.post_attention_layernorm.weight",
             np.ones(hidden, np.float32)),
            (f"{p}.self_attn.W_pack.weight",
             sentinel_qkv(rng, "concat", d=d, nq=nq, nkv=nq, h=hidden)),
            (f"{p}.self_attn.o_proj.weight", t(rng, hidden, hidden)),
            (f"{p}.mlp.gate_proj.weight", t(rng, c.intermediate_size,
                                            hidden)),
            (f"{p}.mlp.up_proj.weight", t(rng, c.intermediate_size,
                                          hidden)),
            (f"{p}.mlp.down_proj.weight", t(rng, hidden,
                                            c.intermediate_size)),
        ]
    params = model.load_weights(iter(weights))
    check_qkv(params)
    assert "alibi_slopes" in params
    run_forward(model, params)


def test_internlm2():
    from vllm_legacy_tpu.models.internlm2 import InternLM2ForCausalLM
    rng = np.random.RandomState(0)
    c = cfg(architectures=["InternLM2ForCausalLM"])
    model = InternLM2ForCausalLM(c, dtype=jnp.float32)
    weights = [("model.tok_embeddings.weight", t(rng, V, H)),
               ("model.norm.weight", np.ones(H, np.float32)),
               ("output.weight", t(rng, V, H))]
    for i in range(NL):
        p = f"model.layers.{i}"
        weights += [
            (f"{p}.attention_norm.weight", np.ones(H, np.float32)),
            (f"{p}.ffn_norm.weight", np.ones(H, np.float32)),
            (f"{p}.attention.wqkv.weight", sentinel_qkv(rng, "grouped")),
            (f"{p}.attention.wo.weight", t(rng, H, H)),
            (f"{p}.feed_forward.w1.weight", t(rng, INTER, H)),
            (f"{p}.feed_forward.w3.weight", t(rng, INTER, H)),
            (f"{p}.feed_forward.w2.weight", t(rng, H, INTER)),
        ]
    params = model.load_weights(iter(weights))
    check_qkv(params)
    run_forward(model, params)


def test_chatglm():
    from vllm_legacy_tpu.models.chatglm import ChatGLMForCausalLM
    rng = np.random.RandomState(0)
    c = types.SimpleNamespace(
        architectures=["ChatGLMModel"], vocab_size=V, hidden_size=H,
        num_layers=NL, num_attention_heads=NQ,
        multi_query_attention=True, multi_query_group_num=NKV,
        ffn_hidden_size=INTER, layernorm_epsilon=1e-5, seq_length=128,
        add_qkv_bias=True, kv_channels=D, rope_ratio=1.0,
        tie_word_embeddings=False)
    model = ChatGLMForCausalLM(c, dtype=jnp.float32)
    weights = [("transformer.embedding.word_embeddings.weight",
                t(rng, V, H)),
               ("transformer.encoder.final_layernorm.weight",
                np.ones(H, np.float32)),
               ("transformer.output_layer.weight", t(rng, V, H))]
    for i in range(NL):
        p = f"transformer.encoder.layers.{i}"
        weights += [
            (f"{p}.input_layernorm.weight", np.ones(H, np.float32)),
            (f"{p}.post_attention_layernorm.weight",
             np.ones(H, np.float32)),
            (f"{p}.self_attention.query_key_value.weight",
             sentinel_qkv(rng, "concat")),
            (f"{p}.self_attention.query_key_value.bias",
             t(rng, NQ * D + 2 * NKV * D)),
            (f"{p}.self_attention.dense.weight", t(rng, H, H)),
            (f"{p}.mlp.dense_h_to_4h.weight", t(rng, 2 * INTER, H)),
            (f"{p}.mlp.dense_4h_to_h.weight", t(rng, H, INTER)),
        ]
    params = model.load_weights(iter(weights))
    check_qkv(params)
    run_forward(model, params)


def test_deepseek_moe():
    from vllm_legacy_tpu.models.deepseek import DeepseekForCausalLM
    rng = np.random.RandomState(0)
    c = cfg(architectures=["DeepseekForCausalLM"], n_routed_experts=4,
            num_experts_per_tok=2, moe_intermediate_size=32,
            n_shared_experts=1, first_k_dense_replace=1, moe_layer_freq=1,
            norm_topk_prob=False)
    model = DeepseekForCausalLM(c, dtype=jnp.float32)
    weights = [("model.embed_tokens.weight", t(rng, V, H)),
               ("model.norm.weight", np.ones(H, np.float32)),
               ("lm_head.weight", t(rng, V, H))]
    for i in range(NL):
        p = f"model.layers.{i}"
        weights += [
            (f"{p}.input_layernorm.weight", np.ones(H, np.float32)),
            (f"{p}.post_attention_layernorm.weight",
             np.ones(H, np.float32)),
            (f"{p}.self_attn.q_proj.weight", t(rng, NQ * D, H)),
            (f"{p}.self_attn.k_proj.weight", t(rng, NKV * D, H)),
            (f"{p}.self_attn.v_proj.weight", t(rng, NKV * D, H)),
            (f"{p}.self_attn.o_proj.weight", t(rng, H, H)),
        ]
        if i == 0:  # dense layer
            weights += [
                (f"{p}.mlp.gate_proj.weight", t(rng, INTER, H)),
                (f"{p}.mlp.up_proj.weight", t(rng, INTER, H)),
                (f"{p}.mlp.down_proj.weight", t(rng, H, INTER)),
            ]
        else:
            weights.append((f"{p}.mlp.gate.weight", t(rng, 4, H)))
            for e in range(4):
                weights += [
                    (f"{p}.mlp.experts.{e}.gate_proj.weight",
                     t(rng, 32, H)),
                    (f"{p}.mlp.experts.{e}.up_proj.weight",
                     t(rng, 32, H)),
                    (f"{p}.mlp.experts.{e}.down_proj.weight",
                     t(rng, H, 32)),
                ]
            weights += [
                (f"{p}.mlp.shared_experts.gate_proj.weight",
                 t(rng, 32, H)),
                (f"{p}.mlp.shared_experts.up_proj.weight",
                 t(rng, 32, H)),
                (f"{p}.mlp.shared_experts.down_proj.weight",
                 t(rng, H, 32)),
            ]
    params = model.load_weights(iter(weights))
    assert params["layers"][1]["moe_w1"]["weight"].shape == (4, H, 64)
    run_forward(model, params)


def test_minicpm_scalings():
    from vllm_legacy_tpu.models.minicpm import MiniCPMForCausalLM
    c = cfg(architectures=["MiniCPMForCausalLM"], scale_emb=12.0,
            scale_depth=1.4, dim_model_base=32)
    model = MiniCPMForCausalLM(c, dtype=jnp.float32)
    assert abs(model.logit_scale - 32 / H) < 1e-9
    params = model.init_dummy_params()
    run_forward(model, params)


def test_orion_layernorm():
    from vllm_legacy_tpu.models.orion import OrionForCausalLM
    c = cfg(architectures=["OrionForCausalLM"])
    model = OrionForCausalLM(c, dtype=jnp.float32)
    params = model.init_dummy_params()
    assert "bias" in params["layers"][0]["input_layernorm"]
    run_forward(model, params)


def test_jais():
    from vllm_legacy_tpu.models.jais import JAISLMHeadModel
    rng = np.random.RandomState(0)
    c = types.SimpleNamespace(
        architectures=["JAISLMHeadModel"], vocab_size=V, n_embd=H,
        n_head=NQ, n_layer=NL, n_inner=INTER, n_positions=128,
        layer_norm_epsilon=1e-5, activation_function="swiglu",
        mup_scale_qk_dot_by_d=True, mup_embeddings_scale=9.8,
        mup_output_alpha=1.2, mup_width_scale=0.5,
        position_embedding_type="alibi", tie_word_embeddings=True)
    model = JAISLMHeadModel(c, dtype=jnp.float32)
    assert abs(model.scale - 1.0 / D) < 1e-9
    assert abs(model.logit_scale - 0.6) < 1e-9
    weights = [("transformer.wte.weight", t(rng, V, H)),
               ("transformer.ln_f.weight", np.ones(H, np.float32)),
               ("transformer.ln_f.bias", np.zeros(H, np.float32))]
    for i in range(NL):
        p = f"transformer.h.{i}"
        weights += [
            (f"{p}.ln_1.weight", np.ones(H, np.float32)),
            (f"{p}.ln_1.bias", np.zeros(H, np.float32)),
            (f"{p}.ln_2.weight", np.ones(H, np.float32)),
            (f"{p}.ln_2.bias", np.zeros(H, np.float32)),
            # Conv1D layout [in, 3*out]: q cols 1, k cols 2, v cols 3
            (f"{p}.attn.c_attn.weight",
             np.concatenate([np.full((H, H), 1.0), np.full((H, H), 2.0),
                             np.full((H, H), 3.0)],
                            axis=1).astype(np.float32)),
            (f"{p}.attn.c_attn.bias", t(rng, 3 * H)),
            (f"{p}.attn.c_proj.weight", t(rng, H, H)),
            (f"{p}.attn.c_proj.bias", t(rng, H)),
            (f"{p}.mlp.c_fc.weight", t(rng, H, INTER)),
            (f"{p}.mlp.c_fc.bias", t(rng, INTER)),
            (f"{p}.mlp.c_fc2.weight", t(rng, H, INTER)),
            (f"{p}.mlp.c_fc2.bias", t(rng, INTER)),
            (f"{p}.mlp.c_proj.weight", t(rng, INTER, H)),
            (f"{p}.mlp.c_proj.bias", t(rng, H)),
        ]
    params = model.load_weights(iter(weights))
    check_qkv(params)
    assert "alibi_slopes" in params
    run_forward(model, params)
