"""Prefix caching end-to-end (reference: tests/prefix_caching/):
a second request sharing a long block-aligned prefix must (a) produce
identical greedy output to an uncached engine and (b) actually skip the
cached blocks' computation."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    path = tmp_path_factory.mktemp("prefix_model")
    cfg = LlamaConfig(vocab_size=256, hidden_size=64,
                      intermediate_size=96, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=512,
                      tie_word_embeddings=False)
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).to(torch.float32).save_pretrained(
        path, safe_serialization=True)
    return str(path)


def make_engine(path, *, prefix_caching, blocks=96):
    from vllm_legacy_tpu.engine.arg_utils import EngineArgs
    from vllm_legacy_tpu.engine.llm_engine import LLMEngine
    args = EngineArgs(model=path, dtype="float32", max_model_len=256,
                      num_tpu_blocks_override=blocks,
                      enable_prefix_caching=prefix_caching,
                      skip_tokenizer_init=True, disable_log_stats=True)
    return LLMEngine.from_engine_args(args)


def run_one(engine, rid, prompt, max_tokens=8):
    from vllm_legacy_tpu.sampling_params import SamplingParams
    p = SamplingParams(temperature=0.0, max_tokens=max_tokens,
                       detokenize=False, ignore_eos=True)
    engine.add_request(rid, {"prompt_token_ids": prompt}, p)
    out = None
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished and o.request_id == rid:
                out = list(o.outputs[0].token_ids)
    return out


def _runner(engine):
    return engine.model_executor.worker.model_runner


def test_prefix_cache_hit_equality(model_path):
    rng = np.random.RandomState(0)
    # 48-token shared prefix = 3 full blocks (block_size 16), distinct
    # 8-token tails.
    shared = rng.randint(3, 250, size=48).tolist()
    p1 = shared + rng.randint(3, 250, size=8).tolist()
    p2 = shared + rng.randint(3, 250, size=8).tolist()

    plain = make_engine(model_path, prefix_caching=False)
    want1 = run_one(plain, "a", p1)
    want2 = run_one(plain, "b", p2)

    cached = make_engine(model_path, prefix_caching=True)
    got1 = run_one(cached, "a", p1)
    first_prefill = _runner(cached).total_prefill_tokens
    got2 = run_one(cached, "b", p2)
    second_prefill = _runner(cached).total_prefill_tokens - first_prefill

    assert got1 == want1
    assert got2 == want2
    # first request computed the whole prompt; the second skipped the
    # shared full blocks (48 tokens = 3 blocks of 16)
    assert first_prefill == len(p1)
    assert second_prefill <= len(p2) - 32  # at least 2 blocks skipped


def test_identical_prompt_rerun(model_path):
    """Fully-cached prompt must still recompute the last block (need at
    least one query token to sample from)."""
    rng = np.random.RandomState(1)
    prompt = rng.randint(3, 250, size=64).tolist()
    plain = make_engine(model_path, prefix_caching=False)
    want = run_one(plain, "a", prompt)
    cached = make_engine(model_path, prefix_caching=True)
    assert run_one(cached, "a", prompt) == want
    assert run_one(cached, "b", prompt) == want


def test_mixed_prefill_decode_batches(tmp_path):
    """Chunked prefill with a budget small enough that decode rows and
    prompt chunks share engine steps (the decode-first policy's whole
    point, reference scheduler.py:824): output must equal unchunked."""
    from tests.models.test_families import build_checkpoint
    path, _ = build_checkpoint("gpt_neox_seq", tmp_path)
    from vllm_legacy_tpu import LLM, SamplingParams
    prompts = ["Hello, my name is " + "the quick brown fox " * 8,
               "The quick brown fox",
               "Hello, my name is"]
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True,
                        detokenize=False)

    def gen(**kw):
        llm = LLM(model=path, dtype="float32", max_model_len=160,
                  num_tpu_blocks_override=96, disable_log_stats=True,
                  **kw)
        outs = llm.generate(prompts, sp, use_tqdm=False)
        return [list(o.outputs[0].token_ids) for o in outs]

    want = gen()
    # budget 24 < long prompt length: the short prompts finish and
    # decode while the long prompt is still chunking
    got = gen(enable_chunked_prefill=True, max_num_batched_tokens=24,
              max_num_seqs=8)
    assert got == want
