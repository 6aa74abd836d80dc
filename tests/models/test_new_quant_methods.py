"""AQLM / DeepSpeedFP / compressed-tensors w8a8: conversion + apply
math vs dense reference, method dispatch, and engine e2e (reference
strategy: tests/models/test_aqlm.py, test_fp8.py — pinned/approximate
equivalence on tiny models)."""
import json

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_legacy_tpu.layers.linear import _dispatch, linear

K, N = 64, 48


def test_deepspeedfp_roundtrip_and_dispatch():
    from vllm_legacy_tpu.layers.quantization.deepspeedfp import (
        DeepSpeedFPConfig, DeepSpeedFPLinearMethod)
    rng = np.random.RandomState(0)
    w = (rng.randn(K, N) * 0.05).astype(np.float32)
    cfg = DeepSpeedFPConfig(weight_bits=8, group_size=32)
    assert cfg.wants({"weight": w})
    params = cfg.convert_layer_params({"weight": w}, np.float32)
    assert isinstance(_dispatch(params), DeepSpeedFPLinearMethod)

    x = rng.randn(5, K).astype(np.float32)
    got = np.asarray(
        linear(jnp.asarray(x), {k: jnp.asarray(v)
                                for k, v in params.items()}))
    want = x @ w
    # e4m3 groupwise quantization error bound
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.08, rel


def test_w8a8_matches_dense():
    from vllm_legacy_tpu.layers.quantization.compressed_tensors import (
        CompressedTensorsConfig, W8A8LinearMethod)
    rng = np.random.RandomState(1)
    wf = (rng.randn(K, N) * 0.05).astype(np.float32)
    wscale = np.abs(wf).max() / 127.0
    wq = np.clip(np.round(wf / wscale), -128, 127).astype(np.int8)
    in_scale = np.float32(0.02)
    cfg = CompressedTensorsConfig()
    ckpt = {"weight": wq, "weight_scale": np.float32(wscale),
            "input_scale": in_scale,
            "weight_zero_point": np.zeros(1, np.int8)}
    assert cfg.wants(ckpt)
    params = cfg.convert_layer_params(ckpt, np.float32)
    assert isinstance(_dispatch(params), W8A8LinearMethod)

    x = (rng.randn(5, K) * 0.1).astype(np.float32)
    got = np.asarray(
        linear(jnp.asarray(x), {k: jnp.asarray(v)
                                for k, v in params.items()}))
    want = x @ (wq.astype(np.float32) * wscale)
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.08, rel  # activation-quant noise only


def test_aqlm_reconstruction_matches_manual():
    from vllm_legacy_tpu.layers.quantization.aqlm import (
        AQLMConfig, AQLMLinearMethod)
    rng = np.random.RandomState(2)
    ig, cb, nbits = 8, 2, 4
    size = 1 << nbits
    no, ni = N, K // ig
    codes = rng.randint(-size // 2, size // 2,
                        size=(no, ni, cb)).astype(np.int8)
    codebooks = (rng.randn(cb, size, 1, ig) * 0.1).astype(np.float16)
    scales = (rng.rand(no, 1, 1, 1).astype(np.float16) + 0.5)
    cfg = AQLMConfig(in_group_size=ig, nbits_per_codebook=nbits,
                     num_codebooks=cb, out_group_size=1)
    ckpt = {"codes": codes, "codebooks": codebooks, "scales": scales}
    assert cfg.wants(ckpt)
    params = cfg.convert_layer_params(ckpt, np.float32)
    assert isinstance(_dispatch(params), AQLMLinearMethod)

    # manual dense reconstruction (reference dequant semantics)
    w = np.zeros((no, ni, ig), np.float32)
    for o in range(no):
        for i in range(ni):
            for c in range(cb):
                idx = int(codes[o, i, c]) % size
                w[o, i] += codebooks[c, idx, 0].astype(np.float32)
    w = w * scales.reshape(no, 1, 1).astype(np.float32)
    w = w.reshape(no, K)

    x = rng.randn(5, K).astype(np.float32)
    got = np.asarray(
        linear(jnp.asarray(x), {k: jnp.asarray(v)
                                for k, v in params.items()}))
    np.testing.assert_allclose(got, x @ w.T, atol=2e-3, rtol=2e-3)


def test_deepspeedfp_engine_e2e(tmp_path):
    """Dense fp32 checkpoint + deepspeedfp quantization_config: the
    engine quantizes at load, runs, and stays close to the dense run."""
    from tests.models.test_arctic_decilm import (LLAMA_CFG, _llama_state,
                                                 save_checkpoint)
    rng = np.random.default_rng(3)
    state = _llama_state(rng, 2, 64, 128, 4, [4, 4], 256)
    save_checkpoint(tmp_path / "dense", LLAMA_CFG, state)
    dsfp_cfg = dict(LLAMA_CFG)
    dsfp_cfg["quantization_config"] = {
        "quant_method": "deepspeedfp", "bits": 8, "group_size": 64}
    save_checkpoint(tmp_path / "dsfp", dsfp_cfg, state)

    from vllm_legacy_tpu import LLM, SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        detokenize=False, prompt_logprobs=0)

    def run(path):
        llm = LLM(model=str(path), dtype="float32", max_model_len=128,
                  num_tpu_blocks_override=64, disable_log_stats=True)
        return llm.generate(["Hello, my name is"], sp,
                            use_tqdm=False)[0]

    dense = run(tmp_path / "dense")
    q = run(tmp_path / "dsfp")
    # 8-bit minifloat noise: prompt logprobs stay close even if a late
    # greedy tie flips
    for i, entry in enumerate(q.prompt_logprobs or []):
        if not entry:
            continue
        for tid, lp in entry.items():
            ref = dense.prompt_logprobs[i].get(tid)
            if ref is not None:
                assert abs(lp.logprob - ref.logprob) < 0.35, i
    # deterministic
    q2 = run(tmp_path / "dsfp")
    assert list(q.outputs[0].token_ids) == list(q2.outputs[0].token_ids)
