"""HF greedy-equality for the wider model zoo (reference strategy:
tests/models/test_models.py — HfRunner vs VllmRunner on tiny models).

Each family builds a tiny random checkpoint from its transformers config
class, saves it with a local BPE tokenizer (zero egress), and must
reproduce HF's greedy continuation token-for-token on CPU (f32 exact).
"""
import numpy as np
import pytest

PROMPTS = ["Hello, my name is", "The quick brown fox"]
MAX_TOKENS = 12

TINY = dict(vocab_size=512, hidden=64, inter=128, layers=2, heads=4)


def make_config(family):
    import transformers as tf
    v, h, it, nl, nh = (TINY["vocab_size"], TINY["hidden"], TINY["inter"],
                        TINY["layers"], TINY["heads"])
    if family == "gpt_neox":
        return tf.GPTNeoXConfig(
            vocab_size=v, hidden_size=h, intermediate_size=it,
            num_hidden_layers=nl, num_attention_heads=nh,
            rotary_pct=0.25, max_position_embeddings=256,
            use_parallel_residual=True)
    if family == "gpt_neox_seq":
        return tf.GPTNeoXConfig(
            vocab_size=v, hidden_size=h, intermediate_size=it,
            num_hidden_layers=nl, num_attention_heads=nh,
            rotary_pct=1.0, max_position_embeddings=256,
            use_parallel_residual=False)
    if family == "gptj":
        return tf.GPTJConfig(vocab_size=v, n_embd=h, n_head=nh,
                             n_layer=nl, n_inner=it, rotary_dim=8,
                             n_positions=256)
    if family == "phi":
        return tf.PhiConfig(vocab_size=v, hidden_size=h,
                            intermediate_size=it, num_hidden_layers=nl,
                            num_attention_heads=nh,
                            partial_rotary_factor=0.5,
                            max_position_embeddings=256)
    if family == "phi3":
        return tf.Phi3Config(vocab_size=v, hidden_size=h,
                             intermediate_size=it, num_hidden_layers=nl,
                             num_attention_heads=nh,
                             num_key_value_heads=2, pad_token_id=0,
                             bos_token_id=1, eos_token_id=2,
                             max_position_embeddings=256)
    if family == "bloom":
        return tf.BloomConfig(vocab_size=v, hidden_size=h, n_head=nh,
                              n_layer=nl)
    if family == "mpt":
        return tf.MptConfig(vocab_size=v, d_model=h, n_heads=nh,
                            n_layers=nl, expansion_ratio=2,
                            max_seq_len=256)
    if family == "falcon_7b":
        return tf.FalconConfig(vocab_size=v, hidden_size=h,
                               num_attention_heads=nh,
                               num_hidden_layers=nl, alibi=False,
                               multi_query=True, parallel_attn=True,
                               new_decoder_architecture=False, bias=False,
                               max_position_embeddings=256)
    if family == "falcon_new":
        return tf.FalconConfig(vocab_size=v, hidden_size=h,
                               num_attention_heads=nh,
                               num_hidden_layers=nl, alibi=False,
                               multi_query=False, parallel_attn=True,
                               new_decoder_architecture=True,
                               num_kv_heads=2, bias=False,
                               max_position_embeddings=256)
    if family == "falcon_alibi":
        return tf.FalconConfig(vocab_size=v, hidden_size=h,
                               num_attention_heads=nh,
                               num_hidden_layers=nl, alibi=True,
                               multi_query=False, parallel_attn=False,
                               new_decoder_architecture=False, bias=True,
                               max_position_embeddings=256)
    if family == "stablelm":
        return tf.StableLmConfig(vocab_size=v, hidden_size=h,
                                 intermediate_size=it,
                                 num_hidden_layers=nl,
                                 num_attention_heads=nh,
                                 num_key_value_heads=2,
                                 partial_rotary_factor=0.25,
                                 use_qkv_bias=True,
                                 max_position_embeddings=256)
    if family == "starcoder2":
        return tf.Starcoder2Config(vocab_size=v, hidden_size=h,
                                   intermediate_size=it,
                                   num_hidden_layers=nl,
                                   num_attention_heads=nh,
                                   num_key_value_heads=2, use_bias=True,
                                   sliding_window=None,
                                   max_position_embeddings=256)
    if family == "gpt_bigcode":
        return tf.GPTBigCodeConfig(vocab_size=v, n_embd=h, n_head=nh,
                                   n_layer=nl, n_inner=it,
                                   n_positions=256, multi_query=True)
    if family == "olmo":
        return tf.OlmoConfig(vocab_size=v, hidden_size=h,
                             intermediate_size=it, num_hidden_layers=nl,
                             num_attention_heads=nh, clip_qkv=8.0,
                             max_position_embeddings=256)
    if family == "commandr":
        return tf.CohereConfig(vocab_size=v, hidden_size=h,
                               intermediate_size=it, num_hidden_layers=nl,
                               num_attention_heads=nh,
                               num_key_value_heads=nh,
                               logit_scale=0.5, use_qk_norm=True,
                               max_position_embeddings=256)
    if family == "qwen2_moe":
        return tf.Qwen2MoeConfig(
            vocab_size=v, hidden_size=h, intermediate_size=it,
            moe_intermediate_size=32,
            shared_expert_intermediate_size=it, num_hidden_layers=nl,
            num_attention_heads=nh, num_key_value_heads=2, num_experts=4,
            num_experts_per_tok=2, decoder_sparse_step=1,
            norm_topk_prob=False, mlp_only_layers=[0],
            max_position_embeddings=256)
    if family == "dbrx":
        return tf.DbrxConfig(
            d_model=h, n_heads=nh, n_layers=nl, max_seq_len=256,
            vocab_size=v,
            attn_config={"clip_qkv": 8, "kv_n_heads": 2,
                         "rope_theta": 10000},
            ffn_config={"ffn_hidden_size": 32, "moe_num_experts": 4,
                        "moe_top_k": 2})
    if family == "gemma2":
        return tf.Gemma2Config(
            vocab_size=v, hidden_size=h, intermediate_size=it,
            num_hidden_layers=nl, num_attention_heads=nh,
            num_key_value_heads=2, head_dim=16,
            attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
            query_pre_attn_scalar=16, sliding_window=32,
            max_position_embeddings=256)
    raise ValueError(family)


FAMILIES = [
    "gpt_neox", "gpt_neox_seq", "gptj", "phi", "phi3", "bloom", "mpt",
    "falcon_7b", "falcon_new", "falcon_alibi", "stablelm", "starcoder2",
    "gpt_bigcode", "olmo", "commandr", "qwen2_moe", "gemma2", "dbrx",
]


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


def build_checkpoint(family, tmp_path, overrides=None):
    import torch
    from transformers import AutoModelForCausalLM
    cfg = make_config(family)
    for k, v in (overrides or {}).items():
        setattr(cfg, k, v)
    cfg.tie_word_embeddings = getattr(cfg, "tie_word_embeddings", False)
    path = tmp_path / family
    torch.manual_seed(0)
    model = AutoModelForCausalLM.from_config(cfg).to(torch.float32)
    model.save_pretrained(path, safe_serialization=True)
    save_tiny_tokenizer(path)
    return str(path), model


def hf_greedy(model, path, prompts, max_tokens):
    import torch
    from transformers import AutoTokenizer
    tokenizer = AutoTokenizer.from_pretrained(path)
    model.eval()
    outs = []
    for p in prompts:
        ids = tokenizer.encode(p, return_tensors="pt")
        with torch.no_grad():
            gen = model.generate(ids, max_new_tokens=max_tokens,
                                 do_sample=False, num_beams=1)
        outs.append(gen[0][ids.shape[1]:].tolist())
    return outs


@pytest.mark.parametrize("family", FAMILIES)
def test_family_matches_hf_greedy(family, tmp_path):
    path, hf_model = build_checkpoint(family, tmp_path)
    want = hf_greedy(hf_model, path, PROMPTS, MAX_TOKENS)
    del hf_model

    from vllm_legacy_tpu import LLM, SamplingParams
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              num_tpu_blocks_override=128, disable_log_stats=True)
    params = SamplingParams(temperature=0.0, max_tokens=MAX_TOKENS,
                            ignore_eos=False, detokenize=False)
    outputs = llm.generate(PROMPTS, params, use_tqdm=False)
    got = [list(o.outputs[0].token_ids) for o in outputs]
    for i, (w, g) in enumerate(zip(want, got)):
        # HF stops at its eos; compare the overlapping prefix
        n = min(len(w), len(g))
        assert g[:n] == w[:n], f"{family} prompt {i}: ours={g} hf={w}"
        assert n > 0
