"""Engine-level tensor-parallel correctness (reference:
tests/distributed/test_basic_distributed_correctness.py — TP=2 output
must equal TP=1; here on the virtual 8-device CPU mesh instead of two
GPUs, exercising the full shard_map step: sharded params, psum in row
layers, logits gather)."""
import numpy as np
import pytest

PROMPTS = ["Hello, my name is", "The quick brown fox"]
MAX_TOKENS = 10


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    from tests.models.test_families import build_checkpoint
    return build_checkpoint("gpt_neox_seq", tmp_path_factory.mktemp(
        "dist"))[0]


def _generate(path, tp):
    from vllm_legacy_tpu import LLM, SamplingParams
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              num_tpu_blocks_override=64, disable_log_stats=True,
              tensor_parallel_size=tp)
    sp = SamplingParams(temperature=0.0, max_tokens=MAX_TOKENS,
                        ignore_eos=True, detokenize=False)
    outs = llm.generate(PROMPTS, sp, use_tqdm=False)
    return [list(o.outputs[0].token_ids) for o in outs]


def test_tp2_matches_tp1(tiny_ckpt):
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    want = _generate(tiny_ckpt, 1)
    got = _generate(tiny_ckpt, 2)
    assert got == want


def test_tp4_matches_tp1(tiny_ckpt):
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs the multi-device CPU mesh")
    want = _generate(tiny_ckpt, 1)
    got = _generate(tiny_ckpt, 4)
    assert got == want


def test_chunked_prefill_tp2(tiny_ckpt):
    """Chunked prefill under TP == plain run (reference:
    tests/distributed/test_chunked_prefill_distributed.py)."""
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    from vllm_legacy_tpu import LLM, SamplingParams
    long_prompts = ["Hello, my name is " + "the quick brown fox " * 6,
                    "The quick brown fox"]
    sp = SamplingParams(temperature=0.0, max_tokens=MAX_TOKENS,
                        ignore_eos=True, detokenize=False)

    def gen(**kw):
        llm = LLM(model=tiny_ckpt, dtype="float32", max_model_len=128,
                  num_tpu_blocks_override=64, disable_log_stats=True,
                  tensor_parallel_size=2, **kw)
        outs = llm.generate(long_prompts, sp, use_tqdm=False)
        return [list(o.outputs[0].token_ids) for o in outs]

    plain = gen()
    chunked = gen(enable_chunked_prefill=True,
                  max_num_batched_tokens=32, max_num_seqs=16)
    assert chunked == plain
