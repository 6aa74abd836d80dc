"""Multi-LoRA serving correctness (reference: tests/lora/): an engine
running with an adapter must equal an engine whose dense weights have
the adapter baked in (W + scale * A@B), and mixed batches must route
each request through its own adapter."""
import json
import os

import numpy as np
import pytest

RANK = 4
ALPHA = 8


@pytest.fixture(scope="module")
def base_model_path(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    path = tmp_path_factory.mktemp("lora_base")
    cfg = LlamaConfig(vocab_size=256, hidden_size=64,
                      intermediate_size=96, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=256,
                      tie_word_embeddings=False)
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).to(torch.float32).save_pretrained(
        path, safe_serialization=True)
    return str(path)


def make_adapter(tmp_path, seed, targets=("q_proj", "v_proj")):
    """peft-format adapter dir with random A/B for 2 layers."""
    import torch
    from safetensors.torch import save_file
    rng = np.random.RandomState(seed)
    tensors = {}
    for layer in range(2):
        for proj in targets:
            out_dim = 64 if proj in ("q_proj", "o_proj") else 32
            in_dim = 64
            a = (rng.randn(RANK, in_dim) * 0.1).astype(np.float32)
            b = (rng.randn(out_dim, RANK) * 0.1).astype(np.float32)
            base = (f"base_model.model.model.layers.{layer}."
                    f"self_attn.{proj}")
            tensors[f"{base}.lora_A.weight"] = torch.from_numpy(a)
            tensors[f"{base}.lora_B.weight"] = torch.from_numpy(b)
    adir = tmp_path / f"adapter{seed}"
    adir.mkdir()
    save_file(tensors, str(adir / "adapter_model.safetensors"))
    with open(adir / "adapter_config.json", "w") as f:
        json.dump({"r": RANK, "lora_alpha": ALPHA,
                   "target_modules": list(targets)}, f)
    return str(adir)


def bake_adapter_into(base_path, adapter_path, out_path):
    """Produce a dense checkpoint with W' = W + scale * (A@B)."""
    import torch
    from safetensors import safe_open
    from transformers import LlamaForCausalLM
    model = LlamaForCausalLM.from_pretrained(base_path,
                                             torch_dtype=torch.float32)
    with safe_open(os.path.join(adapter_path,
                                "adapter_model.safetensors"),
                   framework="pt") as sf:
        raw = {k: sf.get_tensor(k) for k in sf.keys()}
    scale = ALPHA / RANK
    sd = model.state_dict()
    for name in list(raw.keys()):
        if "lora_A" not in name:
            continue
        a = raw[name]
        b = raw[name.replace("lora_A", "lora_B")]
        target = (name.replace("base_model.model.", "")
                  .replace(".lora_A.weight", ".weight"))
        sd[target] = sd[target] + scale * (b @ a)
    model.load_state_dict(sd)
    model.save_pretrained(out_path, safe_serialization=True)
    return str(out_path)


def run_engine(path, prompts, lora_requests=None, max_tokens=8):
    from vllm_legacy_tpu.engine.arg_utils import EngineArgs
    from vllm_legacy_tpu.engine.llm_engine import LLMEngine
    from vllm_legacy_tpu.sampling_params import SamplingParams
    args = EngineArgs(model=path, dtype="float32", max_model_len=128,
                      num_tpu_blocks_override=64,
                      enable_lora=lora_requests is not None,
                      max_loras=2, max_lora_rank=8,
                      skip_tokenizer_init=True, disable_log_stats=True)
    engine = LLMEngine.from_engine_args(args)
    p = SamplingParams(temperature=0.0, max_tokens=max_tokens,
                       detokenize=False, ignore_eos=True)
    for i, t in enumerate(prompts):
        lr = lora_requests[i] if lora_requests else None
        engine.add_request(str(i), {"prompt_token_ids": t}, p,
                           lora_request=lr)
    outs = {}
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                outs[o.request_id] = list(o.outputs[0].token_ids)
    return [outs[str(i)] for i in range(len(prompts))]


def test_lora_matches_baked_weights(base_model_path, tmp_path):
    from vllm_legacy_tpu.lora import LoRARequest
    adapter = make_adapter(tmp_path, seed=7)
    baked = bake_adapter_into(base_model_path, adapter,
                              tmp_path / "baked")
    prompts = [[9, 4, 7, 11], [100, 101, 102]]
    want = run_engine(baked, prompts)
    lr = LoRARequest("a7", 1, adapter)
    got = run_engine(base_model_path, prompts, [lr, lr])
    assert got == want

    # and WITHOUT the adapter the outputs must differ (sanity)
    base = run_engine(base_model_path, prompts)
    assert base != want


def test_mixed_lora_batch(base_model_path, tmp_path):
    """Rows with different adapters (and none) in one batch."""
    from vllm_legacy_tpu.lora import LoRARequest
    a1 = make_adapter(tmp_path, seed=1)
    a2 = make_adapter(tmp_path, seed=2)
    prompts = [[9, 4, 7, 11], [9, 4, 7, 11], [9, 4, 7, 11]]
    lr1 = LoRARequest("a1", 1, a1)
    lr2 = LoRARequest("a2", 2, a2)
    mixed = run_engine(base_model_path, prompts, [lr1, lr2, None])
    only1 = run_engine(base_model_path, [prompts[0]], [lr1])
    only2 = run_engine(base_model_path, [prompts[1]], [lr2])
    none = run_engine(base_model_path, [prompts[2]])
    assert mixed[0] == only1[0]
    assert mixed[1] == only2[0]
    assert mixed[2] == none[0]


def run_engine_tp(path, prompts, lora_requests=None, max_tokens=8,
                  tp=2):
    from vllm_legacy_tpu.engine.arg_utils import EngineArgs
    from vllm_legacy_tpu.engine.llm_engine import LLMEngine
    from vllm_legacy_tpu.sampling_params import SamplingParams
    args = EngineArgs(model=path, dtype="float32", max_model_len=128,
                      num_tpu_blocks_override=64,
                      enable_lora=lora_requests is not None,
                      max_loras=2, max_lora_rank=8,
                      tensor_parallel_size=tp,
                      skip_tokenizer_init=True, disable_log_stats=True)
    engine = LLMEngine.from_engine_args(args)
    p = SamplingParams(temperature=0.0, max_tokens=max_tokens,
                       detokenize=False, ignore_eos=True)
    for i, t in enumerate(prompts):
        lr = lora_requests[i] if lora_requests else None
        engine.add_request(str(i), {"prompt_token_ids": t}, p,
                           lora_request=lr)
    outs = {}
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                outs[o.request_id] = list(o.outputs[0].token_ids)
    return [outs[str(i)] for i in range(len(prompts))]


def test_lora_under_tensor_parallelism(base_model_path, tmp_path):
    """TP=2 with adapters == baked-weights TP=2 == TP=1 with adapters
    (reference: tests/lora 4-GPU job; here the virtual CPU mesh).
    Adapters shard with the base weight: B on the output dim for
    column layers, A on the contraction dim (+psum) for row layers."""
    import jax
    import pytest
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    from vllm_legacy_tpu.lora import LoRARequest
    adapter = make_adapter(tmp_path, seed=11,
                           targets=("q_proj", "v_proj", "o_proj"))
    baked = bake_adapter_into(base_model_path, adapter,
                              tmp_path / "baked_tp")
    prompts = [[9, 4, 7, 11], [100, 101, 102]]
    lr = LoRARequest("a11", 1, adapter)
    want = run_engine_tp(baked, prompts, tp=2)
    got = run_engine_tp(base_model_path, prompts, [lr, lr], tp=2)
    assert got == want
    got_tp1 = run_engine(base_model_path, prompts, [lr, lr])
    assert got_tp1 == want


def test_lora_then_plain_batch_under_tp(base_model_path, tmp_path):
    """Regression: once an adapter is loaded, a later adapter-FREE
    batch must still run under TP (the shard_map specs are built from
    the merged param structure, so the merged tree must be passed even
    when no row uses an adapter)."""
    import jax
    import pytest
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    from vllm_legacy_tpu.engine.arg_utils import EngineArgs
    from vllm_legacy_tpu.engine.llm_engine import LLMEngine
    from vllm_legacy_tpu.lora import LoRARequest
    from vllm_legacy_tpu.sampling_params import SamplingParams
    adapter = make_adapter(tmp_path, seed=13)
    args = EngineArgs(model=base_model_path, dtype="float32",
                      max_model_len=128, num_tpu_blocks_override=64,
                      enable_lora=True, max_loras=2, max_lora_rank=8,
                      tensor_parallel_size=2,
                      skip_tokenizer_init=True, disable_log_stats=True)
    engine = LLMEngine.from_engine_args(args)
    p = SamplingParams(temperature=0.0, max_tokens=4, detokenize=False,
                       ignore_eos=True)

    def drain():
        outs = {}
        while engine.has_unfinished_requests():
            for o in engine.step():
                if o.finished:
                    outs[o.request_id] = list(o.outputs[0].token_ids)
        return outs

    engine.add_request("with", {"prompt_token_ids": [9, 4, 7]}, p,
                       lora_request=LoRARequest("a13", 1, adapter))
    with_lora = drain()
    engine.add_request("plain", {"prompt_token_ids": [9, 4, 7]}, p)
    plain = drain()  # previously: pytree structure mismatch crash
    assert len(plain["plain"]) == 4
    base = run_engine(base_model_path, [[9, 4, 7]], max_tokens=4)
    assert plain["plain"] == base[0]
    assert with_lora["with"] != plain["plain"]


def test_lora_multistep_decode_equality(base_model_path, tmp_path):
    """LoRA requests ride the on-device multi-step decode loop
    (num_scheduler_steps>1): outputs must equal the single-step engine
    (previously LoRA silently forced per-step host round-trips)."""
    from vllm_legacy_tpu.engine.arg_utils import EngineArgs
    from vllm_legacy_tpu.engine.llm_engine import LLMEngine
    from vllm_legacy_tpu.lora import LoRARequest
    from vllm_legacy_tpu.sampling_params import SamplingParams

    adapter = make_adapter(tmp_path, seed=11)
    lr = LoRARequest("a11", 1, adapter)
    prompts = [[9, 4, 7, 11], [100, 101, 102]]
    want = run_engine(base_model_path, prompts, [lr, None],
                      max_tokens=12)

    args = EngineArgs(model=base_model_path, dtype="float32",
                      max_model_len=128, num_tpu_blocks_override=64,
                      enable_lora=True, max_loras=2, max_lora_rank=8,
                      num_scheduler_steps=8,
                      skip_tokenizer_init=True, disable_log_stats=True)
    engine = LLMEngine.from_engine_args(args)
    p = SamplingParams(temperature=0.0, max_tokens=12,
                       detokenize=False, ignore_eos=True)
    engine.add_request("0", {"prompt_token_ids": prompts[0]}, p,
                       lora_request=lr)
    engine.add_request("1", {"prompt_token_ids": prompts[1]}, p)
    outs = {}
    steps = 0
    while engine.has_unfinished_requests():
        steps += 1
        for o in engine.step():
            if o.finished:
                outs[o.request_id] = list(o.outputs[0].token_ids)
    got = [outs["0"], outs["1"]]
    assert got == want
    # multi-step actually engaged: far fewer host steps than tokens
    assert steps < 12, steps
