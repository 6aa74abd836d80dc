"""Self-extend RoPE through the engine: serve context beyond the
model's trained max_position_embeddings (reference fork:
rope_method='self_extend' + SE_WINDOW/SE_SCALE)."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    path = tmp_path_factory.mktemp("se_model")
    cfg = LlamaConfig(vocab_size=256, hidden_size=64,
                      intermediate_size=96, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=64,  # trained max
                      tie_word_embeddings=False)
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).to(torch.float32).save_pretrained(
        path, safe_serialization=True)
    return str(path)


def run(path, prompts, *, self_extend=False, max_tokens=8,
        max_model_len=64):
    from vllm_legacy_tpu.engine.arg_utils import EngineArgs
    from vllm_legacy_tpu.engine.llm_engine import LLMEngine
    from vllm_legacy_tpu.sampling_params import SamplingParams
    args = EngineArgs(model=path, dtype="float32",
                      max_model_len=max_model_len,
                      num_tpu_blocks_override=64,
                      self_extend=self_extend, se_window=32, se_group=4,
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


def test_self_extend_matches_dense_within_window(model_path):
    """Everything closer than the window uses exact RoPE distances, so
    short sequences are token-exact vs the standard engine."""
    rng = np.random.RandomState(0)
    prompts = [rng.randint(3, 250, size=16).tolist()]
    dense = run(model_path, prompts, max_tokens=8)  # ctx stays <= 24
    se = run(model_path, prompts, self_extend=True, max_tokens=8)
    assert se == dense


def test_self_extend_beyond_trained_context(model_path):
    """Prompt + generation run past max_position_embeddings=64."""
    rng = np.random.RandomState(1)
    prompts = [rng.randint(3, 250, size=100).tolist()]
    out = run(model_path, prompts, self_extend=True, max_tokens=16,
              max_model_len=128)
    assert len(out[0]) == 16
    assert all(0 <= t < 256 for t in out[0])
    # degenerate repetition of one token would indicate broken rope
    assert len(set(out[0])) > 1
