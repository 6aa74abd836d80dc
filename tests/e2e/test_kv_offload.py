"""KV-offload (fork CACHE_ENGINE=offload_kv, KVMapCacheEngine
map_cache_engine.py:369): BOTH K and V live in fixed per-sequence
sink+window ring pools, so no cache scales with context length — the
TPU analogue of the fork's UVM-managed K/V, with the HiP selection
already window-restricted so in-ring K serves the same attention.

- with the window covering the whole context, outputs EQUAL the plain
  sparse run,
- long prompts run with a physical KV pool PROVABLY smaller than the
  context's full block demand, deterministically,
- kv_offload without v_offload_window is rejected."""
import numpy as np
import pytest

MAX_TOKENS = 8


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from tests.models.test_families import save_tiny_tokenizer
    path = tmp_path_factory.mktemp("kvoff")
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
              disable_log_stats=True, hip_attention=True, hip_k=32,
              hip_dense_layers=0, max_num_seqs=8, **kw)
    sp = SamplingParams(temperature=0.0, max_tokens=MAX_TOKENS,
                        ignore_eos=True, detokenize=False)
    outs = llm.generate(prompts=prompts, sampling_params=sp,
                        use_tqdm=False)
    cache = llm.llm_engine.model_executor.worker.cache_engine.gpu_cache
    pools = tuple(c.shape[1] for c in cache)
    return [list(o.outputs[0].token_ids) for o in outs], pools


def test_full_window_matches_plain_sparse(tiny_ckpt):
    prompts = [{"prompt_token_ids": list(range(3, 60))},
               {"prompt_token_ids": list(range(100, 110))}]
    want, _ = _gen(tiny_ckpt, prompts, num_tpu_blocks_override=128)
    got, pools = _gen(tiny_ckpt, prompts, v_offload_window=256,
                      kv_offload=True)
    assert got == want
    # K pool == V pool == the ring (neither scales with block count)
    ring = 8 * (1 + 256 // 16) + 1
    assert pools == (ring, ring)


def test_long_context_exceeds_physical_pool(tiny_ckpt):
    """The whole point: total context KV demand > the physical pool."""
    rng = np.random.RandomState(0)
    prompts = [{"prompt_token_ids":
                [int(x) for x in rng.randint(3, 250, size=200)]}
               for _ in range(4)]
    a, pools = _gen(tiny_ckpt, prompts, v_offload_window=64,
                    kv_offload=True)
    b, _ = _gen(tiny_ckpt, prompts, v_offload_window=64,
                kv_offload=True)
    assert a == b
    assert all(len(x) == MAX_TOKENS for x in a)
    # 4 seqs x 208 tokens = 52+ blocks of demand; the ring pool holds
    # 8 x (1 sink + 4 window) + 1 = 41 slots for BOTH caches
    demand_blocks = sum((200 + MAX_TOKENS + 15) // 16 for _ in prompts)
    assert pools[0] == pools[1] <= 41 < demand_blocks


def test_kv_offload_requires_window(tiny_ckpt):
    from vllm_legacy_tpu import LLM
    with pytest.raises(ValueError, match="v_offload_window"):
        LLM(model=tiny_ckpt, dtype="float32", max_model_len=256,
            disable_log_stats=True, hip_attention=True, hip_k=32,
            max_num_seqs=8, kv_offload=True)
