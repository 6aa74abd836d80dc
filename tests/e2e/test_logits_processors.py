"""Per-request user logits processors provably change the output
(reference: vllm/model_executor/layers/logits_processor.py:81-126
_apply_logits_processors; tests/samplers exercise the same contract).

The TPU design runs the sampler jitted, so rows carrying processors
take a host-callback lane (model_runner._apply_user_logits_processors):
the step fetches that batch's raw logits and re-samples the affected
rows host-side after the callables run.
"""
import pytest

from vllm_legacy_tpu.engine.llm_engine import LLMEngine
from vllm_legacy_tpu.sampling_params import SamplingParams
from vllm_legacy_tpu.testing_utils import (make_dummy_engine_config,
                                           tiny_llama_hf_config)


def _run(engine, rid, prompt_ids, sp):
    engine.add_request(rid, {"prompt_token_ids": prompt_ids}, sp)
    outs = {}
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                outs[o.request_id] = list(o.outputs[0].token_ids)
    return outs[rid]


@pytest.fixture(scope="module")
def engine():
    cfg = make_dummy_engine_config(
        tiny_llama_hf_config(num_hidden_layers=2, hidden_size=64,
                             intermediate_size=128,
                             num_attention_heads=4,
                             num_key_value_heads=2, vocab_size=256),
        dtype="float32",  # CPU-native: bf16 emulation is ~10x slower
        max_model_len=128, max_num_seqs=8,
        num_tpu_blocks_override=64)
    return LLMEngine(cfg, log_stats=False)


def test_banning_processor_changes_output(engine):
    base_sp = SamplingParams(temperature=0.0, max_tokens=4,
                             detokenize=False, ignore_eos=True)
    baseline = _run(engine, "base", [5, 6, 7], base_sp)

    banned = set(baseline)

    def ban(past_ids, logits):
        for tid in banned:
            logits[tid] = -float("inf")
        return logits

    sp = SamplingParams(temperature=0.0, max_tokens=4, detokenize=False,
                        ignore_eos=True, logits_processors=[ban])
    out = _run(engine, "banned", [5, 6, 7], sp)
    assert not (set(out) & banned), (out, baseline)


def test_three_arg_processor_and_chaining(engine):
    """3-arg (prompt, past, logits) convention + two processors run in
    order; the second forces a specific token."""
    seen = {}

    def record(prompt_ids, past_ids, logits):
        seen["prompt"] = list(prompt_ids)
        return logits

    def force_42(past_ids, logits):
        logits[:] = -float("inf")
        logits[42] = 0.0
        return logits

    sp = SamplingParams(temperature=0.0, max_tokens=3, detokenize=False,
                        ignore_eos=True,
                        logits_processors=[record, force_42])
    out = _run(engine, "forced", [9, 8, 7], sp)
    assert out == [42, 42, 42]
    assert seen["prompt"] == [9, 8, 7]


def test_mixed_batch_unaffected_rows(engine):
    """A processor-carrying row rides the same batch as plain rows
    without disturbing them."""
    plain_sp = SamplingParams(temperature=0.0, max_tokens=4,
                              detokenize=False, ignore_eos=True)
    baseline = _run(engine, "b0", [1, 2, 3], plain_sp)

    def force_7(past_ids, logits):
        logits[:] = -float("inf")
        logits[7] = 0.0
        return logits

    engine.add_request("plain", {"prompt_token_ids": [1, 2, 3]},
                       SamplingParams(temperature=0.0, max_tokens=4,
                                      detokenize=False, ignore_eos=True))
    engine.add_request(
        "proc", {"prompt_token_ids": [4, 5, 6]},
        SamplingParams(temperature=0.0, max_tokens=4, detokenize=False,
                       ignore_eos=True, logits_processors=[force_7]))
    outs = {}
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                outs[o.request_id] = list(o.outputs[0].token_ids)
    assert outs["proc"] == [7, 7, 7, 7]
    assert outs["plain"] == baseline


def test_beam_search_rejects_processors(engine):
    def noop(past_ids, logits):
        return logits

    sp = SamplingParams(temperature=0.0, use_beam_search=True, best_of=2,
                        max_tokens=3, detokenize=False, ignore_eos=True,
                        logits_processors=[noop])
    engine.add_request("beam", {"prompt_token_ids": [3, 2, 1]}, sp)
    with pytest.raises(ValueError, match="beam"):
        while engine.has_unfinished_requests():
            engine.step()
    # the engine survives for subsequent requests
    engine.abort_request("beam")
