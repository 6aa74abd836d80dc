"""Speculative decoding greedy equality (reference: tests/spec_decode/
e2e/test_ngram_correctness.py — spec output must equal non-spec
output token-for-token)."""
import numpy as np
import pytest

from vllm_legacy_tpu.spec_decode.ngram import NGramProposer


def test_ngram_proposer_basic():
    p = NGramProposer(ngram_min=2, ngram_max=4, num_speculative_tokens=3)
    # trailing "7 8" seen earlier, followed by 9 1 2
    toks = [5, 7, 8, 9, 1, 2, 3, 7, 8]
    assert p.propose(toks) == [9, 1, 2]
    # no match
    assert p.propose([1, 2, 3, 4, 5, 6]) is None


def test_ngram_proposer_prefers_longest_match():
    p = NGramProposer(ngram_min=1, ngram_max=3, num_speculative_tokens=2)
    toks = [4, 5, 6, 9, 5, 6]  # 3-gram no, 2-gram [5,6] at idx 1 -> [9, 5]
    assert p.propose(toks) == [9, 5]


@pytest.fixture(scope="module")
def tiny_llama_path(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    path = tmp_path_factory.mktemp("tiny_llama_spec")
    cfg = LlamaConfig(vocab_size=512, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=512,
                      tie_word_embeddings=False)
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).to(torch.float32).save_pretrained(
        path, safe_serialization=True)
    return str(path)


def run_engine(path, prompts, max_tokens, spec: bool):
    from vllm_legacy_tpu.engine.arg_utils import EngineArgs
    from vllm_legacy_tpu.engine.llm_engine import LLMEngine
    from vllm_legacy_tpu.sampling_params import SamplingParams
    kwargs = {}
    if spec:
        kwargs = dict(speculative_model="[ngram]",
                      num_speculative_tokens=3,
                      ngram_prompt_lookup_max=4,
                      ngram_prompt_lookup_min=2)
    args = EngineArgs(model=path, dtype="float32", max_model_len=256,
                      num_tpu_blocks_override=128,
                      skip_tokenizer_init=True, disable_log_stats=True,
                      **kwargs)
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


def test_ngram_spec_greedy_equality(tiny_llama_path):
    # Repetitive prompts so the n-gram proposer fires; mixed with a
    # non-repetitive prompt (plain decode within the spec batch).
    prompts = [
        [7, 8, 9, 10, 7, 8, 9, 10, 7, 8, 9, 10, 7, 8],
        [100, 101, 102, 103, 104, 105],
        [42, 43, 42, 43, 42, 43, 42],
    ]
    base = run_engine(tiny_llama_path, prompts, 16, spec=False)
    spec = run_engine(tiny_llama_path, prompts, 16, spec=True)
    for i, (b, s) in enumerate(zip(base, spec)):
        assert s == b, f"prompt {i}: spec={s} base={b}"
