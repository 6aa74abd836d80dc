"""Draft-model speculative decoding e2e (reference:
tests/spec_decode/e2e/test_multistep_correctness.py — greedy equality
with and without speculation)."""
import numpy as np
import pytest


def make_ckpt(tmp_path_factory, name, layers, hidden, seed):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    path = tmp_path_factory.mktemp(name)
    cfg = LlamaConfig(vocab_size=256, hidden_size=hidden,
                      intermediate_size=hidden + 32,
                      num_hidden_layers=layers, num_attention_heads=4,
                      num_key_value_heads=2,
                      max_position_embeddings=256,
                      tie_word_embeddings=False)
    torch.manual_seed(seed)
    LlamaForCausalLM(cfg).to(torch.float32).save_pretrained(
        path, safe_serialization=True)
    return str(path)


@pytest.fixture(scope="module")
def target_path(tmp_path_factory):
    return make_ckpt(tmp_path_factory, "spec_target", 2, 64, 0)


@pytest.fixture(scope="module")
def draft_path(tmp_path_factory):
    return make_ckpt(tmp_path_factory, "spec_draft", 1, 32, 1)


def run(path, prompts, *, draft=None, k=3, max_tokens=16):
    from vllm_legacy_tpu.engine.arg_utils import EngineArgs
    from vllm_legacy_tpu.engine.llm_engine import LLMEngine
    from vllm_legacy_tpu.sampling_params import SamplingParams
    args = EngineArgs(model=path, dtype="float32", max_model_len=128,
                      num_tpu_blocks_override=64,
                      speculative_model=draft,
                      num_speculative_tokens=k if draft else None,
                      skip_tokenizer_init=True, disable_log_stats=True)
    engine = LLMEngine.from_engine_args(args)
    p = SamplingParams(temperature=0.0, max_tokens=max_tokens,
                       detokenize=False, ignore_eos=True)
    for i, t in enumerate(prompts):
        engine.add_request(str(i), {"prompt_token_ids": t}, p)
    outs, steps = {}, 0
    while engine.has_unfinished_requests():
        steps += 1
        for o in engine.step():
            if o.finished:
                outs[o.request_id] = list(o.outputs[0].token_ids)
        assert steps < 400
    return [outs[str(i)] for i in range(len(prompts))], steps


def test_draft_spec_greedy_equality(target_path, draft_path):
    """Rejection sampling preserves the target's greedy outputs exactly
    regardless of draft quality; batched, mixed prompt lengths."""
    rng = np.random.RandomState(0)
    prompts = [rng.randint(3, 250, size=n).tolist() for n in (7, 21, 40)]
    want, _ = run(target_path, prompts)
    got, _ = run(target_path, prompts, draft=draft_path)
    assert got == want


def test_draft_equals_target_accepts_everything(target_path):
    """With the draft == target checkpoint, every proposal is accepted:
    decoding must take ~max_tokens/(k+1) steps instead of max_tokens."""
    rng = np.random.RandomState(1)
    prompts = [rng.randint(3, 250, size=12).tolist()]
    want, base_steps = run(target_path, prompts, max_tokens=24)
    got, spec_steps = run(target_path, prompts, draft=target_path, k=3,
                          max_tokens=24)
    assert got == want
    # 24 tokens, k=3: full acceptance -> 6 decode calls (+1 prefill);
    # allow slack but require a real speedup in step count
    assert spec_steps <= base_steps // 2, (spec_steps, base_steps)


def test_draft_spec_survives_preemption(target_path, draft_path):
    """Block pressure forces preemption; the draft cache is rebuilt via
    the block-table fingerprint check and outputs stay exact."""
    from vllm_legacy_tpu.engine.arg_utils import EngineArgs
    from vllm_legacy_tpu.engine.llm_engine import LLMEngine
    from vllm_legacy_tpu.sampling_params import SamplingParams
    rng = np.random.RandomState(2)
    prompts = [rng.randint(3, 250, size=32).tolist() for _ in range(3)]
    want, _ = run(target_path, prompts, max_tokens=20)

    args = EngineArgs(model=target_path, dtype="float32",
                      max_model_len=128, num_tpu_blocks_override=12,
                      speculative_model=draft_path,
                      num_speculative_tokens=3,
                      skip_tokenizer_init=True, disable_log_stats=True)
    engine = LLMEngine.from_engine_args(args)
    p = SamplingParams(temperature=0.0, max_tokens=20, detokenize=False,
                       ignore_eos=True)
    for i, t in enumerate(prompts):
        engine.add_request(str(i), {"prompt_token_ids": t}, p)
    outs, steps = {}, 0
    while engine.has_unfinished_requests():
        steps += 1
        for o in engine.step():
            if o.finished:
                outs[o.request_id] = list(o.outputs[0].token_ids)
        assert steps < 500
    assert engine.scheduler.num_cumulative_preemption > 0
    assert [outs[str(i)] for i in range(3)] == want
