"""Preemption + swap end-to-end under block pressure (reference:
tests/basic_correctness/test_preemption.py). Outputs after
preempt-recompute or swap-out/swap-in must equal an unconstrained run."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    path = tmp_path_factory.mktemp("preempt_model")
    cfg = LlamaConfig(vocab_size=256, hidden_size=64,
                      intermediate_size=96, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=512,
                      tie_word_embeddings=False)
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).to(torch.float32).save_pretrained(
        path, safe_serialization=True)
    return str(path)


def make_engine(path, *, blocks, preemption_mode=None):
    from vllm_legacy_tpu.engine.arg_utils import EngineArgs
    from vllm_legacy_tpu.engine.llm_engine import LLMEngine
    args = EngineArgs(model=path, dtype="float32", max_model_len=256,
                      num_tpu_blocks_override=blocks,
                      preemption_mode=preemption_mode,
                      skip_tokenizer_init=True, disable_log_stats=True)
    return LLMEngine.from_engine_args(args)


def run_batch(engine, prompts, max_tokens=24):
    from vllm_legacy_tpu.sampling_params import SamplingParams
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


def _prompts(n, length, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(3, 250, size=length).tolist() for _ in range(n)]


@pytest.mark.parametrize("mode", ["recompute", "swap"])
def test_preemption_matches_unconstrained(model_path, mode):
    prompts = _prompts(4, 48)
    want = run_batch(make_engine(model_path, blocks=256), prompts)

    # 4 seqs x (48 prompt + 24 gen) tokens = 18 blocks each (block 16);
    # 20 blocks cannot hold all four -> forced preemption.
    tight = make_engine(model_path, blocks=20, preemption_mode=mode)
    got = run_batch(tight, prompts)
    assert tight.scheduler.num_cumulative_preemption > 0, (
        "test did not actually trigger preemption")
    assert got == want


def test_swap_mode_with_v_offload_forced_to_recompute(tmp_path_factory):
    """Adversarial pairing: user asks for swap-mode preemption with the
    V-offload ring enabled. Ring slots are per-sequence and cannot swap
    (worker._validate_v_offload), so the engine must silently force
    recompute — and survive actual block pressure without ever issuing
    a swap."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from vllm_legacy_tpu.engine.arg_utils import EngineArgs
    from vllm_legacy_tpu.engine.llm_engine import LLMEngine
    path = tmp_path_factory.mktemp("voff_swap")
    cfg = LlamaConfig(vocab_size=256, hidden_size=64,
                      intermediate_size=96, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=512,
                      tie_word_embeddings=False)
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).to(torch.float32).save_pretrained(
        path, safe_serialization=True)

    args = EngineArgs(model=str(path), dtype="float32", max_model_len=256,
                      num_tpu_blocks_override=20,
                      preemption_mode="swap",  # adversarial request
                      hip_attention=True, hip_k=32, hip_dense_layers=0,
                      v_offload_window=64, max_num_seqs=8,
                      skip_tokenizer_init=True, disable_log_stats=True)
    engine = LLMEngine.from_engine_args(args)
    assert engine.scheduler.user_specified_preemption_mode == "recompute"

    prompts = _prompts(4, 48)
    got = run_batch(engine, prompts)
    sch = engine.scheduler
    assert sch.num_cumulative_preemption > 0, "no preemption triggered"
    assert len(sch.swapped) == 0
    assert all(len(x) == 24 for x in got)
    # determinism across an identical run (ring reuse + recompute)
    engine2 = LLMEngine.from_engine_args(args)
    assert run_batch(engine2, prompts) == got
