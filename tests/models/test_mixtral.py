"""Mixtral MoE: HF greedy equality on a tiny random checkpoint +
expert-parallel sharding over the virtual 8-device CPU mesh (reference:
tests/models/test_mixtral.py compares against HF)."""
import numpy as np
import pytest

PROMPTS = [[9, 4, 7, 1], [40, 41, 42, 43, 44, 45]]


@pytest.fixture(scope="module")
def tiny_mixtral_path(tmp_path_factory):
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM
    path = tmp_path_factory.mktemp("tiny_mixtral")
    cfg = MixtralConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=256,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = MixtralForCausalLM(cfg).to(torch.float32)
    m.save_pretrained(path, safe_serialization=True)
    return str(path)


def hf_greedy(path, prompts, max_tokens):
    import torch
    from transformers import MixtralForCausalLM
    model = MixtralForCausalLM.from_pretrained(path,
                                               torch_dtype=torch.float32)
    model.eval()
    outs = []
    for p in prompts:
        ids = torch.tensor([p])
        with torch.no_grad():
            gen = model.generate(ids, max_new_tokens=max_tokens,
                                 do_sample=False, num_beams=1)
        outs.append(gen[0][len(p):].tolist())
    return outs


def engine_greedy(path, prompts, max_tokens, tp=1):
    from vllm_legacy_tpu.engine.arg_utils import EngineArgs
    from vllm_legacy_tpu.engine.llm_engine import LLMEngine
    from vllm_legacy_tpu.sampling_params import SamplingParams
    args = EngineArgs(model=path, dtype="float32", max_model_len=128,
                      num_tpu_blocks_override=64,
                      tensor_parallel_size=tp,
                      skip_tokenizer_init=True, disable_log_stats=True)
    engine = LLMEngine.from_engine_args(args)
    p = SamplingParams(temperature=0.0, max_tokens=max_tokens,
                       detokenize=False, ignore_eos=True)
    for i, t in enumerate(prompts):
        engine.add_request(str(i), {"prompt_token_ids": t}, p)
    outs = {}
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                outs[o.request_id] = list(o.outputs[0].token_ids)
    return [outs[str(i)] for i in range(len(prompts))]


def test_mixtral_greedy_vs_hf(tiny_mixtral_path):
    want = hf_greedy(tiny_mixtral_path, PROMPTS, 8)
    got = engine_greedy(tiny_mixtral_path, PROMPTS, 8)
    for i, (w, g) in enumerate(zip(want, got)):
        assert g == w, f"prompt {i}: ours={g} hf={w}"


def test_mixtral_expert_parallel_matches_single(tiny_mixtral_path):
    """EP over 2 shards (virtual devices) must reproduce tp=1 outputs."""
    base = engine_greedy(tiny_mixtral_path, PROMPTS, 8, tp=1)
    ep = engine_greedy(tiny_mixtral_path, PROMPTS, 8, tp=2)
    assert ep == base


@pytest.fixture(scope="module")
def tiny_mixtral8_path(tmp_path_factory):
    """8 experts so tp=2 leaves e_local=4 > top_k=2 — exercises the
    expert-sorted sharded grouped-GEMM path (fused_moe.py
    _grouped_moe_sharded); tp=4 (e_local=2=k) keeps the dense form."""
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM
    path = tmp_path_factory.mktemp("tiny_mixtral8")
    cfg = MixtralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, num_local_experts=8,
        num_experts_per_tok=2, max_position_embeddings=256,
        tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    MixtralForCausalLM(cfg).to(torch.float32).save_pretrained(
        path, safe_serialization=True)
    return str(path)


@pytest.mark.parametrize("tp", [2, 4])
def test_mixtral8_tp_grouped_matches_single(tiny_mixtral8_path, tp):
    base = engine_greedy(tiny_mixtral8_path, PROMPTS, 8, tp=1)
    sharded = engine_greedy(tiny_mixtral8_path, PROMPTS, 8, tp=tp)
    assert sharded == base
