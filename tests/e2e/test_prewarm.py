"""Decode-bucket prewarm: the TPU analogue of the reference's
CUDA-graph capture at init (reference model_runner.py capture_model).
Drives the engine's own request path per bucket so every
(batch-bucket, multi-step k) pair is compiled before real traffic."""
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
def test_prewarm_drains_and_serves():
    hf = tiny_llama_hf_config()
    hf.num_hidden_layers = 2
    hf.hidden_size = 64
    hf.intermediate_size = 128
    hf.num_attention_heads = 4
    hf.num_key_value_heads = 2
    hf.vocab_size = 512
    cfg = make_dummy_engine_config(hf, max_model_len=64, max_num_seqs=4,
                                   num_scheduler_steps=4)
    engine = LLMEngine(cfg, log_stats=False)
    dt = engine.prewarm_decode_buckets(buckets=[2, 4])
    assert dt > 0
    # fully drained: no leftover requests, seats restored
    assert not engine.has_unfinished_requests()
    assert engine.scheduler_config.max_num_seqs == 4

    # real traffic afterwards behaves normally
    engine.add_request("r0", {"prompt_token_ids": [5, 6, 7]},
                       SamplingParams(temperature=0.0, max_tokens=7,
                                      detokenize=False, ignore_eos=True))
    done = {}
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                done[o.request_id] = len(o.outputs[0].token_ids)
    assert done == {"r0": 7}
