"""Beam search / n>1 sampling e2e + sharded-state save/reload.

Reference analogues: tests/samplers/test_beam_search.py and
tests/test_sharded_state_loader.py.
"""
import numpy as np
import pytest

from tests.e2e.test_greedy_equality import tiny_llama_path  # fixture

PROMPT = "The capital of France is"


def test_beam_search_outputs(tiny_llama_path):
    from vllm_legacy_tpu import LLM, SamplingParams
    llm = LLM(model=tiny_llama_path, dtype="float32", max_model_len=128,
              num_tpu_blocks_override=128, disable_log_stats=True)
    params = SamplingParams(temperature=0.0, use_beam_search=True, n=2,
                            best_of=4, max_tokens=8, detokenize=False,
                            ignore_eos=True)
    out = llm.generate([PROMPT], params, use_tqdm=False)[0]
    assert len(out.outputs) == 2
    # ranked by cumulative logprob, best first
    scores = [o.cumulative_logprob for o in out.outputs]
    assert scores == sorted(scores, reverse=True)
    # beams must be distinct sequences
    assert out.outputs[0].token_ids != out.outputs[1].token_ids

    # beam-0 must score >= greedy (beam search explores a superset)
    greedy = llm.generate(
        [PROMPT],
        SamplingParams(temperature=0.0, max_tokens=8, detokenize=False,
                       ignore_eos=True, logprobs=0),
        use_tqdm=False)[0]
    greedy_score = sum(
        next(iter(d.values())).logprob for d in greedy.outputs[0].logprobs)
    assert scores[0] >= greedy_score - 1e-3


def test_n_gt_1_sampling(tiny_llama_path):
    from vllm_legacy_tpu import LLM, SamplingParams
    llm = LLM(model=tiny_llama_path, dtype="float32", max_model_len=128,
              num_tpu_blocks_override=128, disable_log_stats=True)
    params = SamplingParams(temperature=1.0, seed=3, n=3, max_tokens=6,
                            detokenize=False, ignore_eos=True)
    out = llm.generate([PROMPT], params, use_tqdm=False)[0]
    assert len(out.outputs) == 3
    for o in out.outputs:
        assert len(o.token_ids) == 6


def test_sharded_state_roundtrip(tiny_llama_path, tmp_path):
    from vllm_legacy_tpu import LLM, SamplingParams
    params = SamplingParams(temperature=0.0, max_tokens=8,
                            detokenize=False, ignore_eos=True)
    llm = LLM(model=tiny_llama_path, dtype="float32", max_model_len=128,
              num_tpu_blocks_override=128, disable_log_stats=True)
    want = list(
        llm.generate([PROMPT], params,
                     use_tqdm=False)[0].outputs[0].token_ids)
    saved = str(tmp_path / "sharded")
    llm.save_sharded_state(saved)
    del llm

    llm2 = LLM(model=saved, dtype="float32", max_model_len=128,
               num_tpu_blocks_override=128, disable_log_stats=True)
    got = list(
        llm2.generate([PROMPT], params,
                      use_tqdm=False)[0].outputs[0].token_ids)
    assert got == want
