"""Engine-level equivalence of the KV layouts on CPU interpret:
the fused pair-packed default (head 64) must reproduce the fused
plain and split layouts token-for-token. Kernel-level fused-layout
coverage lives in tests/kernels/test_fused_kv.py."""
import pytest


def test_engine_packed_matches_unpacked(tmp_path, monkeypatch):
    """Full engine on CPU interpret: pair-packed output (the head-64
    default) == unpacked 5-D layout output. gpt_neox_seq's head size
    is 16, which the pair layout cannot pack (2*16 lanes don't fill a
    vreg), so widen the heads to 64 via the checkpoint config."""
    from tests.models.test_families import build_checkpoint
    path, _ = build_checkpoint(
        "gpt_neox_seq", tmp_path,
        overrides={"hidden_size": 128, "num_attention_heads": 2})

    def gen():
        from vllm_legacy_tpu import LLM, SamplingParams
        llm = LLM(model=path, dtype="float32", max_model_len=128,
                  num_tpu_blocks_override=64, disable_log_stats=True)
        sp = SamplingParams(temperature=0.0, max_tokens=10,
                            ignore_eos=True, detokenize=False)
        outs = llm.generate(["Hello, my name is",
                             "The quick brown fox"], sp, use_tqdm=False)
        return [list(o.outputs[0].token_ids) for o in outs]

    monkeypatch.setenv("VLT_PACKED_KV", "0")
    want = gen()
    monkeypatch.setenv("VLT_PACKED_KV", "1")
    got = gen()
    assert got == want
