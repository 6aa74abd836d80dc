"""V-offload (fork CACHE_ENGINE=offload_v capability): V HBM bounded
to a per-sequence sink+window ring while K stays full for exact
in-window top-k scoring.

- with the window covering the whole context, outputs must EQUAL the
  plain sparse run (everything resident, selection unchanged),
- with a small window, long prompts run bounded and deterministic and
  the V pool is provably smaller than the K pool,
- invalid pairings fail with clear errors."""
import numpy as np
import pytest

MAX_TOKENS = 8


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from tests.models.test_families import save_tiny_tokenizer
    path = tmp_path_factory.mktemp("voff")
    cfg = LlamaConfig(vocab_size=256, hidden_size=64,
                      intermediate_size=96, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=256,
                      tie_word_embeddings=False)
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).to(torch.float32).save_pretrained(
        path, safe_serialization=True)
    save_tiny_tokenizer(path)
    return str(path)


def _gen(path, prompts, **kw):
    from vllm_legacy_tpu import LLM, SamplingParams
    llm = LLM(model=path, dtype="float32", max_model_len=256,
              num_tpu_blocks_override=128, disable_log_stats=True,
              hip_attention=True, hip_k=32, hip_dense_layers=0,
              max_num_seqs=8, **kw)
    sp = SamplingParams(temperature=0.0, max_tokens=MAX_TOKENS,
                        ignore_eos=True, detokenize=False)
    outs = llm.generate(prompts=prompts, sampling_params=sp,
                        use_tqdm=False)
    v_pool = llm.llm_engine.model_executor.worker.cache_engine.\
        gpu_cache[1].shape[1]
    return [list(o.outputs[0].token_ids) for o in outs], v_pool


def test_full_window_matches_plain_sparse(tiny_ckpt):
    prompts = [{"prompt_token_ids": list(range(3, 60))},
               {"prompt_token_ids": list(range(100, 110))}]
    want, v_plain = _gen(tiny_ckpt, prompts)
    got, v_off = _gen(tiny_ckpt, prompts, v_offload_window=256)
    assert got == want
    # ring = max_num_seqs x (sink + window blocks) + 1 slack
    assert v_off == 8 * (1 + 256 // 16) + 1


def test_small_window_bounded_and_deterministic(tiny_ckpt):
    rng = np.random.RandomState(0)
    long_prompt = {"prompt_token_ids":
                   [int(x) for x in rng.randint(3, 250, size=200)]}
    a, v_off = _gen(tiny_ckpt, [long_prompt], v_offload_window=64)
    b, _ = _gen(tiny_ckpt, [long_prompt], v_offload_window=64)
    assert a == b
    assert all(len(x) == MAX_TOKENS for x in a)
    # ring pool: 8 seqs x (1 sink + 4 window + ...) blocks << 128
    assert v_off <= 8 * 6 + 1
    # and the restricted run differs from the full-V run (the window
    # actually pruned something on a 200-token prompt)
    full, _ = _gen(tiny_ckpt, [long_prompt])
    assert a != full


def test_many_sequences_ring_reuse(tiny_ckpt):
    """More total sequences than rings: rings recycle across waves."""
    rng = np.random.RandomState(1)
    prompts = [{"prompt_token_ids":
                [int(x) for x in rng.randint(3, 250, size=40)]}
               for _ in range(12)]  # > max_num_seqs=8 rings over time
    a, _ = _gen(tiny_ckpt, prompts, v_offload_window=96)
    b, _ = _gen(tiny_ckpt, prompts, v_offload_window=96)
    assert a == b
    assert all(len(x) == MAX_TOKENS for x in a)


def test_validation_errors(tiny_ckpt):
    from vllm_legacy_tpu import LLM, SamplingParams
    with pytest.raises(ValueError, match="sparse"):
        LLM(model=tiny_ckpt, dtype="float32", max_model_len=256,
            num_tpu_blocks_override=64, disable_log_stats=True,
            v_offload_window=64)

    llm = LLM(model=tiny_ckpt, dtype="float32", max_model_len=256,
              num_tpu_blocks_override=128, disable_log_stats=True,
              hip_attention=True, hip_k=32, hip_dense_layers=0,
              max_num_seqs=8, v_offload_window=64)
    with pytest.raises(ValueError, match="copy-on-write"):
        llm.llm_engine.add_request(
            "x", {"prompt_token_ids": [1, 2, 3]},
            SamplingParams(temperature=1.0, best_of=2, max_tokens=4))
