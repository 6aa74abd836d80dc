"""FP8 KV cache e2e (reference: tests/models/test_fp8.py — capability:
fp8_e4m3 KV with minimal accuracy loss; here: engine runs and greedy
outputs stay close to the full-precision cache)."""
import pytest


def _run(path, kv_dtype, block_size):
    from vllm_legacy_tpu.engine.arg_utils import EngineArgs
    from vllm_legacy_tpu.engine.llm_engine import LLMEngine
    from vllm_legacy_tpu.sampling_params import SamplingParams
    args = EngineArgs(model=path, dtype="float32", max_model_len=256,
                      num_tpu_blocks_override=64,
                      kv_cache_dtype=kv_dtype, block_size=block_size,
                      skip_tokenizer_init=True, disable_log_stats=True)
    engine = LLMEngine.from_engine_args(args)
    p = SamplingParams(temperature=0.0, max_tokens=12, detokenize=False,
                       ignore_eos=True)
    prompts = [[9, 4, 7, 1, 22, 33], [100, 101, 102]]
    for i, t in enumerate(prompts):
        engine.add_request(str(i), {"prompt_token_ids": t}, p)
    outs = {}
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                outs[o.request_id] = list(o.outputs[0].token_ids)
    return [outs[str(i)] for i in range(len(prompts))]


@pytest.fixture(scope="module")
def tiny_llama_path(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    path = tmp_path_factory.mktemp("tiny_llama_fp8")
    cfg = LlamaConfig(vocab_size=512, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=512,
                      tie_word_embeddings=False)
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).to(torch.float32).save_pretrained(
        path, safe_serialization=True)
    return str(path)


def test_fp8_kv_cache_generates(tiny_llama_path):
    base = _run(tiny_llama_path, "auto", 32)
    fp8 = _run(tiny_llama_path, "fp8", 32)
    # Random tiny models have near-flat logits, so fp8 noise may flip
    # some tokens; require the first tokens to agree and all outputs to
    # be valid (quality metrics belong to the WikiText harness).
    for b, f in zip(base, fp8):
        assert len(f) == len(b)
        assert f[0] == b[0]


def test_fp8_requires_block_32(tiny_llama_path):
    from vllm_legacy_tpu.config import CacheConfig
    with pytest.raises(ValueError, match="block_size"):
        CacheConfig(block_size=16, cache_dtype="fp8")
