"""Exact attention over offloaded V history (closes the reference
fork's UVM-paging gap, map_cache_engine.py:268-379, on TPU terms):
completed V blocks write through to a host pool; the in-graph HiP
selection reports which out-of-window blocks it wants and the runner
stages them back into per-sequence device slots one step ahead.

The key property: with enough staged slots, generation EQUALS the
non-offloaded sparse run token-for-token — V residency stays bounded
(ring + staged slots, independent of context length) while attention
over the selected history is exact, not window-truncated."""
import pytest

MAX_TOKENS = 40
WINDOW = 64  # tokens; block_size 16 -> 4 window blocks + sink


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from tests.models.test_families import save_tiny_tokenizer
    path = tmp_path_factory.mktemp("voffx")
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
              hip_dense_layers=0, max_num_seqs=4, **kw)
    sp = SamplingParams(temperature=0.0, max_tokens=MAX_TOKENS,
                        ignore_eos=True, detokenize=False)
    outs = llm.generate(prompts=prompts, sampling_params=sp,
                        use_tqdm=False)
    worker = llm.llm_engine.model_executor.worker
    cache = worker.cache_engine.gpu_cache
    runner = worker.model_runner
    return ([list(o.outputs[0].token_ids) for o in outs], cache,
            runner)


def test_exact_offload_equals_non_offloaded_sparse(tiny_ckpt):
    # prompts fit the window, decode runs far past it: out-of-window
    # blocks appear during decode and must be paged, not dropped
    prompts = [{"prompt_token_ids": list(range(3, 59))},
               {"prompt_token_ids": list(range(100, 140))}]
    want, _, _ = _gen(tiny_ckpt, prompts, num_tpu_blocks_override=128)
    got, cache, runner = _gen(
        tiny_ckpt, prompts, v_offload_window=WINDOW,
        v_offload_exact=True, v_stage_blocks=8,
        enable_chunked_prefill=True, max_num_batched_tokens=WINDOW)
    assert got == want, (got, want)
    # paging actually happened: blocks were written through and staged
    assert runner._v_written and max(runner._v_written.values()) >= 5
    assert runner._v_staged and any(runner._v_staged.values())
    # V residency is bounded: ring + staged slots, NOT context-scaled
    k_pool, v_pool = cache[0].shape[1], cache[1].shape[1]
    ring = 4 * (1 + WINDOW // 16) + 1
    assert v_pool == ring + 4 * 8, v_pool
    assert len(cache) == 3  # wanted-scores accumulator rides the tuple


def test_window_truncated_offload_differs(tiny_ckpt):
    """Control: WITHOUT exact paging the same geometry truncates old V
    (the round-3 behavior this feature replaces) — outputs drift from
    the non-offloaded run, proving the paging is what closes the gap."""
    prompts = [{"prompt_token_ids": list(range(3, 59))}]
    want, _, _ = _gen(tiny_ckpt, prompts, num_tpu_blocks_override=128)
    got, _, _ = _gen(tiny_ckpt, prompts, v_offload_window=WINDOW)
    assert got != want


def test_exact_requires_chunked_prefill(tiny_ckpt):
    with pytest.raises(ValueError, match="chunked"):
        _gen(tiny_ckpt,
             [{"prompt_token_ids": list(range(3, 30))}],
             v_offload_window=WINDOW, v_offload_exact=True)
