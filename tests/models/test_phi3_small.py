"""Phi-3-Small: blocksparse attention model + gegelu + muP.

No transformers implementation (trust_remote_code checkpoint; the
reference tests it only against the real model), so correctness is
internal equivalence:

- loader mapping verified with sentinel fills (grouped head-major qkv,
  interleaved gate/up deinterleave),
- blocksparse with ``vert_stride=1`` (every block vertically strided)
  must equal the all-dense configuration on the same weights,
- the truly sparse configuration must differ from dense (the mask
  actually prunes) while staying deterministic end-to-end,
- gegelu matches the reference formula (phi3_small.py:59-70).
"""
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

H, NQ, NKV, NL, V, INTER = 64, 4, 2, 2, 128, 96
D = H // NQ
G = NQ // NKV

PROMPTS = ["Hello, my name is", "The quick brown fox"]
MAX_TOKENS = 10


def _cfg(**kw):
    base = dict(architectures=["Phi3SmallForCausalLM"], vocab_size=V,
                hidden_size=H, num_hidden_layers=NL,
                num_attention_heads=NQ, num_key_value_heads=NKV,
                intermediate_size=INTER, max_position_embeddings=256,
                hidden_act="gegelu", gegelu_limit=20.0,
                layer_norm_epsilon=1e-5, rope_embedding_base=10000.0,
                rope_position_scale=1.0, rope_scaling=None,
                mup_use_scaling=True, mup_attn_multiplier=4.0,
                mup_embedding_multiplier=2.0, mup_width_multiplier=2.0,
                blocksparse_block_size=16,
                blocksparse_num_local_blocks=1,
                blocksparse_vert_stride=2,
                blocksparse_homo_head_pattern=False,
                dense_attention_every_n_layers=None,
                dummy_token_indices=[V - 1],
                tie_word_embeddings=True)
    base.update(kw)
    return types.SimpleNamespace(**base)


def t(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32) * 0.02


def _weights(rng):
    ws = [("model.embed_tokens.weight", t(rng, V, H)),
          ("model.final_layernorm.weight", np.ones(H, np.float32)),
          ("model.final_layernorm.bias", np.zeros(H, np.float32))]
    for i in range(NL):
        p = f"model.layers.{i}"
        ws += [
            (f"{p}.input_layernorm.weight", np.ones(H, np.float32)),
            (f"{p}.input_layernorm.bias", np.zeros(H, np.float32)),
            (f"{p}.post_attention_layernorm.weight",
             np.ones(H, np.float32)),
            (f"{p}.post_attention_layernorm.bias",
             np.zeros(H, np.float32)),
            (f"{p}.self_attn.query_key_value.weight",
             t(rng, NKV * (G + 2) * D, H)),
            (f"{p}.self_attn.query_key_value.bias",
             t(rng, NKV * (G + 2) * D)),
            (f"{p}.self_attn.dense.weight", t(rng, H, NQ * D)),
            (f"{p}.self_attn.dense.bias", t(rng, H)),
            (f"{p}.mlp.up_proj.weight", t(rng, 2 * INTER, H)),
            (f"{p}.mlp.up_proj.bias", t(rng, 2 * INTER)),
            (f"{p}.mlp.down_proj.weight", t(rng, H, INTER)),
            (f"{p}.mlp.down_proj.bias", t(rng, H)),
        ]
    return ws


def _build(cfg_kw=None, seed=0):
    from vllm_legacy_tpu.models.phi3_small import Phi3SmallForCausalLM
    model = Phi3SmallForCausalLM(_cfg(**(cfg_kw or {})),
                                 dtype=jnp.float32)
    rng = np.random.RandomState(seed)
    return model, model.load_weights(iter(_weights(rng)))


def _forward_logits(model, params, n=96):
    from vllm_legacy_tpu.models.attention import (AttentionMetadata,
                                                  padded_head_size)
    kv_shape = (model.num_layers, 12, model.num_kv_heads, 16,
                padded_head_size(model.head_dim))
    kv = (jnp.zeros(kv_shape, jnp.float32),
          jnp.zeros(kv_shape, jnp.float32))
    dev = jax.tree.map(jnp.asarray, params,
                       is_leaf=lambda x: isinstance(x, np.ndarray))
    toks = (jnp.arange(n, dtype=jnp.int32) % (V - 2))[None]
    md = AttentionMetadata(
        slot_mapping=jnp.arange(n, dtype=jnp.int32),
        block_tables=jnp.arange(12, dtype=jnp.int32)[None],
        context_lens=jnp.asarray([n], jnp.int32),
        query_lens=jnp.asarray([n], jnp.int32))
    hidden, kv = model.forward(dev, kv, toks,
                               jnp.arange(n, dtype=jnp.int32)[None], md)
    logits = np.asarray(
        model.compute_logits(dev, hidden.reshape(n, -1)))
    # decode one step (exercises the decode masking path)
    md2 = AttentionMetadata(
        slot_mapping=jnp.asarray([n], jnp.int32),
        block_tables=jnp.arange(12, dtype=jnp.int32)[None],
        context_lens=jnp.asarray([n + 1], jnp.int32),
        query_lens=jnp.asarray([1], jnp.int32))
    hidden2, _ = model.forward(dev, kv, jnp.asarray([[3]], jnp.int32),
                               jnp.asarray([[n]], jnp.int32), md2)
    dec = np.asarray(
        model.compute_logits(dev, hidden2.reshape(1, -1)))
    return logits, dec


def test_gegelu_matches_reference():
    import torch
    x = np.linspace(-30, 30, 64).astype(np.float32)
    gate, lin = x[0::2], x[1::2]
    limit = 20.0
    tg = torch.tensor(np.stack([gate, lin], -1).reshape(-1))
    a_gelu, a_lin = tg[::2], tg[1::2]
    a_gelu = a_gelu.clamp(max=limit)
    a_lin = a_lin.clamp(min=-limit, max=limit)
    want = (a_gelu * torch.sigmoid(1.702 * a_gelu) * (a_lin + 1)).numpy()

    from vllm_legacy_tpu.models.phi3_small import quick_gelu
    g = jnp.minimum(jnp.asarray(gate), limit)
    u = jnp.clip(jnp.asarray(lin), -limit, limit)
    got = np.asarray(quick_gelu(g) * (u + 1))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_loader_mapping():
    """qkv sentinel split + up_proj deinterleave + bias routing."""
    rng = np.random.RandomState(0)
    ws = []
    for name, w in _weights(rng):
        if name.endswith("query_key_value.weight"):
            w = np.concatenate([
                np.full((NKV, G, D, H), 1.0),
                np.full((NKV, 1, D, H), 2.0),
                np.full((NKV, 1, D, H), 3.0)
            ], axis=1).reshape(-1, H).astype(np.float32)
        if name.endswith("up_proj.weight"):
            w = np.empty((2 * INTER, H), np.float32)
            w[0::2] = 4.0
            w[1::2] = 5.0
        ws.append((name, w))
    from vllm_legacy_tpu.models.phi3_small import Phi3SmallForCausalLM
    model = Phi3SmallForCausalLM(_cfg(), dtype=jnp.float32)
    params = model.load_weights(iter(ws))
    lp = params["layers"][0]
    assert np.allclose(lp["q_proj"]["weight"], 1.0)
    assert np.allclose(lp["k_proj"]["weight"], 2.0)
    assert np.allclose(lp["v_proj"]["weight"], 3.0)
    assert np.allclose(lp["gate_proj"]["weight"], 4.0)
    assert np.allclose(lp["up_proj"]["weight"], 5.0)
    assert lp["o_proj"]["bias"].shape == (H, )
    assert "bias" in lp["input_layernorm"]
    assert "bias" in params["norm"]
    # tied head
    np.testing.assert_array_equal(np.asarray(params["lm_head"]["weight"]),
                                  np.asarray(params["embed"]["weight"]))


def test_vert_stride_one_matches_dense():
    m_bs, p_bs = _build({"blocksparse_vert_stride": 1}, seed=1)
    m_d, p_d = _build({"blocksparse_block_size": None,
                       "blocksparse_vert_stride": None}, seed=1)
    a, a_dec = _forward_logits(m_bs, p_bs)
    b, b_dec = _forward_logits(m_d, p_d)
    np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(a_dec, b_dec, atol=2e-4, rtol=1e-3)


def test_sparse_differs_and_dense_every_layers():
    m_s, p_s = _build(seed=2)  # local=1, vert=2 -> truly sparse
    m_d, p_d = _build({"blocksparse_block_size": None,
                       "blocksparse_vert_stride": None}, seed=2)
    a, _ = _forward_logits(m_s, p_s)
    b, _ = _forward_logits(m_d, p_d)
    assert np.abs(a[-1] - b[-1]).max() > 1e-4  # mask prunes something
    a2, _ = _forward_logits(m_s, p_s)
    np.testing.assert_array_equal(a, a2)  # deterministic

    # dense_attention_every_n_layers=1 -> every layer dense
    m_e, p_e = _build({"dense_attention_every_n_layers": 1}, seed=2)
    c, _ = _forward_logits(m_e, p_e)
    np.testing.assert_allclose(c, b, atol=1e-5)

    # dummy token logits are masked out
    assert (a[:, V - 1] < -1e30).all()


def test_engine_e2e(tmp_path):
    from tests.models.test_arctic_decilm import save_checkpoint
    rng = np.random.RandomState(3)
    cfg = dict(model_type="phi3small", torch_dtype="float32",
               bos_token_id=1, eos_token_id=2,
               **{k: v for k, v in vars(_cfg()).items()})
    save_checkpoint(tmp_path / "phi3small", cfg,
                    dict(_weights(rng)))
    from vllm_legacy_tpu import LLM, SamplingParams
    llm = LLM(model=str(tmp_path / "phi3small"), dtype="float32",
              max_model_len=128, num_tpu_blocks_override=128,
              disable_log_stats=True)
    sp = SamplingParams(temperature=0.0, max_tokens=MAX_TOKENS,
                        ignore_eos=True, detokenize=False)
    outs = llm.generate(PROMPTS, sp, use_tqdm=False)
    got = [list(o.outputs[0].token_ids) for o in outs]
    assert all(len(g) == MAX_TOKENS for g in got)
    outs2 = llm.generate(PROMPTS, sp, use_tqdm=False)
    assert got == [list(o.outputs[0].token_ids) for o in outs2]
