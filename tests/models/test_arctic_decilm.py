"""Arctic and DeciLM families.

Neither has a transformers implementation to diff against (the reference
ships its own config shims, vllm/transformers_utils/configs/arctic.py,
and tests arctic/decilm only via real checkpoints), so correctness is
established by *internal equivalence*:

- DeciLM with per-layer KV heads must match our Llama run on the
  explicitly-degrouped checkpoint (repeat-KV GQA is mathematically
  identical to grouped GQA).
- Arctic with no MoE layers (moe_layer_frequency out of range) must
  match our Llama on the same weights; the MoE + parallel-residual path
  must run and be deterministic.
"""
import json

import numpy as np
import pytest

PROMPTS = ["Hello, my name is", "The quick brown fox"]
MAX_TOKENS = 10


def save_tiny_tokenizer(path):
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        vocab_size=256, special_tokens=["<unk>", "<s>", "</s>"])
    tok.train_from_iterator(PROMPTS + ["the quick brown fox jumps"],
                            trainer)
    from transformers import PreTrainedTokenizerFast
    PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="<unk>",
                            bos_token="<s>",
                            eos_token="</s>").save_pretrained(path)


def save_checkpoint(path, config_dict, state):
    from safetensors.numpy import save_file
    path.mkdir(parents=True, exist_ok=True)
    with open(path / "config.json", "w") as f:
        json.dump(config_dict, f)
    save_file(state, str(path / "model.safetensors"))
    save_tiny_tokenizer(path)


def _llama_state(rng, layers, hidden, inter, heads, kv_per_layer, vocab):
    d = hidden // heads

    def w(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    state = {
        "model.embed_tokens.weight": w(vocab, hidden),
        "model.norm.weight": np.ones(hidden, np.float32),
        "lm_head.weight": w(vocab, hidden),
    }
    for i, nkv in enumerate(kv_per_layer[:layers]):
        p = f"model.layers.{i}."
        state[p + "input_layernorm.weight"] = np.ones(hidden, np.float32)
        state[p + "post_attention_layernorm.weight"] = np.ones(
            hidden, np.float32)
        state[p + "self_attn.q_proj.weight"] = w(heads * d, hidden)
        state[p + "self_attn.k_proj.weight"] = w(nkv * d, hidden)
        state[p + "self_attn.v_proj.weight"] = w(nkv * d, hidden)
        state[p + "self_attn.o_proj.weight"] = w(hidden, heads * d)
        state[p + "mlp.gate_proj.weight"] = w(inter, hidden)
        state[p + "mlp.up_proj.weight"] = w(inter, hidden)
        state[p + "mlp.down_proj.weight"] = w(hidden, inter)
    return state


def _generate(path, **kw):
    from vllm_legacy_tpu import LLM, SamplingParams
    llm = LLM(model=str(path), dtype="float32", max_model_len=128,
              num_tpu_blocks_override=128, disable_log_stats=True, **kw)
    params = SamplingParams(temperature=0.0, max_tokens=MAX_TOKENS,
                            ignore_eos=True, detokenize=False)
    outs = llm.generate(PROMPTS, params, use_tqdm=False)
    return [list(o.outputs[0].token_ids) for o in outs]


LLAMA_CFG = dict(architectures=["LlamaForCausalLM"], model_type="llama",
                 vocab_size=256, hidden_size=64, intermediate_size=128,
                 num_hidden_layers=2, num_attention_heads=4,
                 num_key_value_heads=4, max_position_embeddings=256,
                 rms_norm_eps=1e-5, rope_theta=10000.0,
                 torch_dtype="float32", tie_word_embeddings=False,
                 bos_token_id=1, eos_token_id=2)


def test_decilm_matches_degrouped_llama(tmp_path):
    rng = np.random.default_rng(0)
    kv_per_layer = [2, 4]
    state = _llama_state(rng, 2, 64, 128, 4, kv_per_layer, 256)

    deci_cfg = dict(LLAMA_CFG, architectures=["DeciLMForCausalLM"],
                    num_key_value_heads_per_layer=kv_per_layer)
    del deci_cfg["num_key_value_heads"]
    save_checkpoint(tmp_path / "deci", deci_cfg, state)

    # Hand-degrouped uniform-GQA llama checkpoint: repeat each KV head
    # group up to max(kv_per_layer).
    degrouped = dict(state)
    d = 64 // 4
    for i, nkv in enumerate(kv_per_layer):
        r = max(kv_per_layer) // nkv
        for proj in ("k_proj", "v_proj"):
            name = f"model.layers.{i}.self_attn.{proj}.weight"
            w = state[name].reshape(nkv, d, 64)
            degrouped[name] = np.repeat(w, r, axis=0).reshape(-1, 64)
    save_checkpoint(tmp_path / "llama", LLAMA_CFG, degrouped)

    got = _generate(tmp_path / "deci")
    want = _generate(tmp_path / "llama")
    assert got == want


def _arctic_cfg(**kw):
    cfg = dict(LLAMA_CFG, architectures=["ArcticForCausalLM"],
               model_type="arctic", num_local_experts=4,
               num_experts_per_tok=2, moe_layer_frequency=2,
               use_residual=True)
    cfg.update(kw)
    return cfg


def test_arctic_dense_matches_llama(tmp_path):
    rng = np.random.default_rng(1)
    state = _llama_state(rng, 2, 64, 128, 4, [4, 4], 256)
    save_checkpoint(tmp_path / "llama", LLAMA_CFG, state)

    # Same weights under Arctic's dense-layer names.
    arctic_state = {}
    for name, w in state.items():
        for proj in ("gate_proj", "up_proj", "down_proj"):
            src = f"mlp.{proj}"
            dst = "block_sparse_moe.mlp." + {
                "gate_proj": "w1", "up_proj": "w3", "down_proj": "w2"
            }[proj]
            if src in name:
                name = name.replace(src, dst)
                break
        arctic_state[name] = w
    # moe_layer_frequency=3 with 2 layers -> every layer dense.
    save_checkpoint(tmp_path / "arctic",
                    _arctic_cfg(moe_layer_frequency=3), arctic_state)

    assert _generate(tmp_path / "arctic") == _generate(tmp_path / "llama")


def test_arctic_moe_residual_path(tmp_path):
    rng = np.random.default_rng(2)
    h, inter, e = 64, 32, 4
    state = _llama_state(rng, 2, h, 128, 4, [4, 4], 256)

    def w(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    arctic_state = {}
    for name, w_ in state.items():
        if ".mlp." in name:
            continue  # replaced below per layer kind
        arctic_state[name] = w_
    # layer 0 dense ((0+1)%2 != 0), layer 1 MoE with residual branch.
    p = "model.layers.0.block_sparse_moe.mlp."
    arctic_state[p + "w1.weight"] = w(128, h)
    arctic_state[p + "w3.weight"] = w(128, h)
    arctic_state[p + "w2.weight"] = w(h, 128)
    p = "model.layers.1."
    arctic_state[p + "block_sparse_moe.gate.weight"] = w(e, h)
    for ex in range(e):
        q = p + f"block_sparse_moe.experts.{ex}."
        arctic_state[q + "w1.weight"] = w(inter, h)
        arctic_state[q + "w3.weight"] = w(inter, h)
        arctic_state[q + "w2.weight"] = w(h, inter)
    arctic_state[p + "residual_layernorm.weight"] = np.ones(h, np.float32)
    arctic_state[p + "residual_mlp.w1.weight"] = w(h, h)
    arctic_state[p + "residual_mlp.w3.weight"] = w(h, h)
    arctic_state[p + "residual_mlp.w2.weight"] = w(h, h)

    save_checkpoint(tmp_path / "arctic",
                    _arctic_cfg(intermediate_size=inter), arctic_state)
    got = _generate(tmp_path / "arctic")
    assert got == _generate(tmp_path / "arctic")  # deterministic
    assert all(len(g) == MAX_TOKENS for g in got)
