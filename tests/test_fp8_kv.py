"""FP8 KV cache e2e (reference: fp8_e4m3 KV with per-layer scales —
Fp8KVCacheMethod fp8.py:259, kv_cache_scales_loader weight_utils.py:365,
llama.py:477-493).

The accuracy test makes K/V projections LOUD (values ~1500, far past
e4m3's ±448 range): without scales the cache write clips and generation
diverges from the fp32-cache truth; with per-layer scales from a
serialized JSON (the reference's extract_scales.py schema) the stored
values land in range and greedy outputs match token-for-token. This
pins both the scale plumbing (JSON -> params -> attention fold) and the
exactness of the fold itself (q *= s, out *= s — K/V enter linearly).
"""
import json

import numpy as np
import pytest

V_GAIN = 3000.0  # measured: max|V| ~1126 on this seed (e4m3 max 448)
KV_SCALE = 8.0   # stored |V| <= ~141, comfortably in range


def _run(path, kv_dtype, block_size, scales_path=None, logprobs=False):
    from vllm_legacy_tpu.engine.arg_utils import EngineArgs
    from vllm_legacy_tpu.engine.llm_engine import LLMEngine
    from vllm_legacy_tpu.sampling_params import SamplingParams
    args = EngineArgs(model=path, dtype="float32", max_model_len=256,
                      num_tpu_blocks_override=64,
                      kv_cache_dtype=kv_dtype, block_size=block_size,
                      quantization_param_path=scales_path,
                      skip_tokenizer_init=True, disable_log_stats=True)
    engine = LLMEngine.from_engine_args(args)
    p = SamplingParams(temperature=0.0, max_tokens=12, detokenize=False,
                       ignore_eos=True)
    prompts = [[9, 4, 7, 1, 22, 33], [100, 101, 102]]
    for i, t in enumerate(prompts):
        engine.add_request(str(i), {"prompt_token_ids": t}, p)
    outs = {}
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                outs[o.request_id] = list(o.outputs[0].token_ids)
    return [outs[str(i)] for i in range(len(prompts))]


def _make_ckpt(path, v_gain=1.0):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    cfg = LlamaConfig(vocab_size=512, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=512,
                      tie_word_embeddings=False)
    torch.manual_seed(0)
    m = LlamaForCausalLM(cfg).to(torch.float32)
    if v_gain != 1.0:
        # only V: attention output is linear in V, so correctly-scaled
        # e4m3 (~6% relative error) keeps greedy stable, while a loud K
        # would blow up score magnitudes and flip argmax even when
        # scaled correctly.
        with torch.no_grad():
            for layer in m.model.layers:
                layer.self_attn.v_proj.weight.mul_(v_gain)
    m.save_pretrained(path, safe_serialization=True)
    return str(path)


@pytest.fixture(scope="module")
def tiny_llama_path(tmp_path_factory):
    return _make_ckpt(tmp_path_factory.mktemp("tiny_llama_fp8"))


@pytest.fixture(scope="module")
def loud_kv_paths(tmp_path_factory):
    root = tmp_path_factory.mktemp("tiny_llama_fp8_loud")
    ckpt = _make_ckpt(root, v_gain=V_GAIN)
    scales = root / "kv_cache_scales.json"
    scales.write_text(json.dumps({
        "kv_cache": {
            "dtype": "float8_e4m3fn",
            "scaling_factor": {"0": {"0": KV_SCALE, "1": KV_SCALE}},
        }
    }))
    return ckpt, str(scales)


def test_fp8_kv_cache_generates(tiny_llama_path):
    base = _run(tiny_llama_path, "auto", 32)
    fp8 = _run(tiny_llama_path, "fp8", 32)
    # In-range K/V: e4m3's relative precision is scale-invariant, so
    # unscaled fp8 already tracks the fp32 run closely here.
    for b, f in zip(base, fp8):
        assert len(f) == len(b)
        assert f[0] == b[0]


def test_fp8_kv_scales_fix_clipping(loud_kv_paths):
    """K/V magnitudes ~3x past e4m3 max: unscaled fp8 clips and greedy
    output diverges; the serialized per-layer scales restore exact
    greedy agreement with the fp32 cache."""
    ckpt, scales_path = loud_kv_paths
    truth = _run(ckpt, "auto", 32)
    clipped = _run(ckpt, "fp8", 32)
    scaled = _run(ckpt, "fp8", 32, scales_path=scales_path)
    # scaled: first tokens exact, and strictly closer overall (greedy
    # drift late in a 12-token rollout is acceptable for e4m3)
    for s_, t in zip(scaled, truth):
        assert s_[:2] == t[:2], (scaled, truth)
    def mismatches(runs):
        return sum(a != b for r, t in zip(runs, truth)
                   for a, b in zip(r, t))
    assert mismatches(clipped) > mismatches(scaled), (clipped, scaled)
    assert any(c[0] != t[0] or c[1] != t[1]
               for c, t in zip(clipped, truth)), \
        "loud V should clip without scales"


def test_fp8_scales_ignored_for_f32_cache(loud_kv_paths):
    """Scales must be inert when the cache isn't fp8 (the reference
    warns and ignores)."""
    ckpt, scales_path = loud_kv_paths
    truth = _run(ckpt, "auto", 32)
    with_scales = _run(ckpt, "auto", 32, scales_path=scales_path)
    assert with_scales == truth


def test_fp8_requires_block_32(tiny_llama_path):
    from vllm_legacy_tpu.config import CacheConfig
    with pytest.raises(ValueError, match="block_size"):
        CacheConfig(block_size=16, cache_dtype="fp8")


def test_kv_scale_fold_is_exact_algebra():
    """attention() with an fp8 cache + kv_scale must return outputs on
    the SAME scale as the f32-cache truth (q*s cancels k/s in scores;
    out*s undoes v/s). Regression: the out*s half of the fold was
    missing, scaling the whole attention branch by 1/kv_scale."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from vllm_legacy_tpu.models.attention import (AttentionMetadata,
                                                  attention,
                                                  kv_cache_shape)
    B, L, H, D = 1, 4, 2, 128
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32)) * 50
    shape = kv_cache_shape(1, 4, H, 32, D, packed=False, fused=True)
    md = AttentionMetadata(
        slot_mapping=jnp.arange(B * L, dtype=jnp.int32),
        block_tables=jnp.asarray([[1, 2]], jnp.int32),
        context_lens=jnp.asarray([L], jnp.int32),
        query_lens=jnp.asarray([L], jnp.int32))
    truth, _ = attention(q, k, v, (jnp.zeros(shape, jnp.float32), ),
                         md, scale=D**-0.5)
    out8, _ = attention(q, k, v,
                        (jnp.zeros(shape, jnp.float8_e4m3fn), ),
                        md, scale=D**-0.5, kv_scale=jnp.asarray(8.0))
    ratio = jnp.median(out8 / truth)
    assert 0.97 < float(ratio) < 1.03, float(ratio)
