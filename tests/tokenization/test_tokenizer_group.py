"""TokenizerGroup pool behavior (reference:
tests/tokenization/test_tokenizer_group.py — sync group + pooled
variant; here the pool is a GIL-releasing thread pool instead of Ray
actors)."""
import asyncio

import pytest

from tests.e2e.test_greedy_equality import tiny_llama_path  # fixture


def test_sync_and_async_encode_agree(tiny_llama_path):
    from vllm_legacy_tpu.transformers_utils.tokenizer import \
        TokenizerGroup
    sync_group = TokenizerGroup(tiny_llama_path)
    pooled = TokenizerGroup(tiny_llama_path, tokenizer_pool_size=4)
    prompts = ["the quick brown fox", "jumps", "the the the"]

    async def main():
        for p in prompts:
            want = sync_group.encode(p)
            got_sync = await sync_group.encode_async(p)
            got_pool = await pooled.encode_async(p)
            assert got_sync == want
            assert got_pool == want
        # pooled encodes run concurrently without corrupting results
        outs = await asyncio.gather(
            *[pooled.encode_async(p) for p in prompts * 8])
        for i, out in enumerate(outs):
            assert out == sync_group.encode(prompts[i % len(prompts)])

    asyncio.new_event_loop().run_until_complete(main())


def test_pool_used_by_async_engine(tiny_llama_path):
    """--tokenizer-pool-size plumbs through EngineArgs to the group."""
    from vllm_legacy_tpu.engine.arg_utils import EngineArgs
    args = EngineArgs(model=tiny_llama_path, tokenizer_pool_size=2,
                      dtype="float32", max_model_len=64,
                      num_tpu_blocks_override=16,
                      disable_log_stats=True)
    cfg = args.create_engine_config()
    assert cfg.model_config.tokenizer_pool_size == 2
    from vllm_legacy_tpu.engine.llm_engine import LLMEngine
    engine = LLMEngine(cfg, log_stats=False)
    assert engine.tokenizer._pool is not None
