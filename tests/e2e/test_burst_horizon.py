"""Multi-step burst length under queue pressure.

A waiting request that was refused admission can only progress when a
running decode frees its seat/KV reserve, so the runner shortens a
multi-step burst to the soonest max_tokens finish (quantized onto the
compiled k-ladder) instead of a blanket short cap. Reference burst
semantics: the reference has no on-device multi-step (CUDA-graph decode
is single-step, vllm/worker/model_runner.py); the horizon rule is a
TPU-design consequence of fusing k decode steps into one dispatch.
"""
import os

import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("VLT_PALLAS_INTERPRET", "1")

import jax

jax.config.update("jax_platforms", "cpu")

from vllm_legacy_tpu.engine.llm_engine import LLMEngine
from vllm_legacy_tpu.sampling_params import SamplingParams
from vllm_legacy_tpu.testing_utils import (make_dummy_engine_config,
                                           tiny_llama_hf_config)


@pytest.mark.slow
def test_burst_capped_to_first_free_horizon(monkeypatch):
    hf = tiny_llama_hf_config()
    hf.num_hidden_layers = 2
    hf.hidden_size = 64
    hf.intermediate_size = 128
    hf.num_attention_heads = 4
    hf.num_key_value_heads = 2
    hf.vocab_size = 512
    cfg = make_dummy_engine_config(hf, max_model_len=64, max_num_seqs=2,
                                   num_scheduler_steps=8)
    engine = LLMEngine(cfg, log_stats=False)

    import vllm_legacy_tpu.worker.model_runner as mr
    bursts = []
    orig = mr.ModelRunner.execute_model

    def spy(self, *a, **kw):
        out = orig(self, *a, **kw)
        bursts.append((bool(kw.get("queue_pressure")),
                       kw.get("steps_to_free"), len(out[0])))
        return out

    monkeypatch.setattr(mr.ModelRunner, "execute_model", spy)

    # 4 requests, 2 seats: the queue stays non-empty while the first
    # wave decodes. max_tokens=6 -> horizon <= 5 -> k quantizes to 4.
    for i in range(4):
        engine.add_request(str(i), {"prompt_token_ids": [5, 6, 7]},
                           SamplingParams(temperature=0.0, max_tokens=6,
                                          detokenize=False,
                                          ignore_eos=True))
    done = {}
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                done[o.request_id] = len(o.outputs[0].token_ids)

    assert sorted(done) == ["0", "1", "2", "3"]
    assert all(n == 6 for n in done.values())
    pressured = [b for b in bursts if b[0] and b[2] > 1]
    # Bursts under pressure follow the horizon (soonest finish), not a
    # blanket short cap: with 5 decode tokens to go, that's one k=4
    # burst, never 8.
    assert pressured, f"expected pressured multi-step bursts: {bursts}"
    assert all(b[2] <= 4 for b in pressured), bursts
    assert any(b[2] == 4 for b in pressured), bursts
    # The horizon shipped with the request matches max_tokens remaining.
    assert all(0 < b[1] <= 6 for b in pressured), bursts


@pytest.mark.slow
def test_burst_clamped_when_eos_possible(monkeypatch):
    """Decodes that may stop EARLY (EOS allowed) make the horizon
    unpredictable: the scheduler clamps it to VLT_MAX_PRESSURED_BURST
    so a queued request never waits out a long burst past an
    unpredicted finish."""
    monkeypatch.setenv("VLT_MAX_PRESSURED_BURST", "4")
    hf = tiny_llama_hf_config()
    hf.num_hidden_layers = 2
    hf.hidden_size = 64
    hf.intermediate_size = 128
    hf.num_attention_heads = 4
    hf.num_key_value_heads = 2
    hf.vocab_size = 512
    cfg = make_dummy_engine_config(hf, max_model_len=64, max_num_seqs=2,
                                   num_scheduler_steps=8)
    engine = LLMEngine(cfg, log_stats=False)

    import vllm_legacy_tpu.worker.model_runner as mr
    bursts = []
    orig = mr.ModelRunner.execute_model

    def spy(self, *a, **kw):
        out = orig(self, *a, **kw)
        bursts.append((bool(kw.get("queue_pressure")),
                       kw.get("steps_to_free"), len(out[0])))
        return out

    monkeypatch.setattr(mr.ModelRunner, "execute_model", spy)

    # ignore_eos=False: dummy weights argmax to token 0 (never EOS), so
    # every request still runs to max_tokens — but the SCHEDULER cannot
    # know that, so pressured bursts must clamp to 4, never 8.
    for i in range(4):
        engine.add_request(str(i), {"prompt_token_ids": [5, 6, 7]},
                           SamplingParams(temperature=0.0,
                                          max_tokens=12,
                                          detokenize=False,
                                          ignore_eos=False))
    done = {}
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                done[o.request_id] = len(o.outputs[0].token_ids)

    assert sorted(done) == ["0", "1", "2", "3"]
    pressured = [b for b in bursts if b[0] and b[2] > 1]
    assert pressured, f"expected pressured multi-step bursts: {bursts}"
    assert all(b[2] <= 4 for b in pressured), bursts
    # the shipped horizon is the clamp, not the 11-step max_tokens
    # remainder
    assert all(0 < b[1] <= 4 for b in pressured), bursts
