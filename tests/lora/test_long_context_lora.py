"""Long-context LoRA (reference: LongContextLoRAContext +
LinearScalingRotaryEmbeddingWithLora — adapters trained with linear
rope scaling serve prompts beyond the base model's trained length).

Oracle: an engine running base + long adapter must equal an engine on a
dense checkpoint with the adapter baked in AND the config carrying the
adapter's linear rope scaling — on prompts LONGER than the base
max_position_embeddings."""
import json

import numpy as np
import pytest

from tests.lora.test_lora import RANK, make_adapter, run_engine

BASE_MAX = 32
FACTOR = 2.0


@pytest.fixture(scope="module")
def short_base_path(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    path = tmp_path_factory.mktemp("short_base")
    cfg = LlamaConfig(vocab_size=256, hidden_size=64,
                      intermediate_size=96, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=BASE_MAX,
                      tie_word_embeddings=False)
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).to(torch.float32).save_pretrained(
        path, safe_serialization=True)
    return str(path)


def _make_long_adapter(tmp_path, seed):
    adir = make_adapter(tmp_path, seed=seed)
    cfg_path = f"{adir}/adapter_config.json"
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg["rope_scaling"] = {"type": "linear", "factor": FACTOR}
    cfg["context_length"] = int(BASE_MAX * FACTOR)
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    return adir


def _bake_long(base_path, adapter_path, out_path):
    from tests.lora.test_lora import bake_adapter_into
    baked = bake_adapter_into(base_path, adapter_path, out_path)
    cfg_path = f"{baked}/config.json"
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg["rope_scaling"] = {"type": "linear", "factor": FACTOR}
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    return baked


def run_long_engine(path, prompts, lora_requests=None, max_tokens=6,
                    factors=None):
    from vllm_legacy_tpu.engine.arg_utils import EngineArgs
    from vllm_legacy_tpu.engine.llm_engine import LLMEngine
    from vllm_legacy_tpu.sampling_params import SamplingParams
    args = EngineArgs(model=path, dtype="float32",
                      max_model_len=int(BASE_MAX * FACTOR),
                      num_tpu_blocks_override=64,
                      enable_lora=lora_requests is not None,
                      max_loras=2, max_lora_rank=8,
                      long_lora_scaling_factors=factors,
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


def test_long_lora_matches_baked_scaled(short_base_path, tmp_path):
    from vllm_legacy_tpu.lora import LoRARequest
    adapter = _make_long_adapter(tmp_path, seed=5)
    baked = _bake_long(short_base_path, adapter, tmp_path / "baked")

    # prompt LONGER than the base trained length (32)
    rng = np.random.RandomState(0)
    prompts = [list(rng.randint(5, 250, size=45)),
               list(rng.randint(5, 250, size=40))]
    want = run_long_engine(baked, prompts)
    lr = LoRARequest("long5", 1, adapter)
    got = run_long_engine(short_base_path, prompts, [lr, lr],
                          factors=(FACTOR, ))
    assert got == want

    # without the adapter's scaling segment the outputs differ
    base = run_long_engine(short_base_path, prompts)
    assert base != want


def test_undeclared_factor_rejected(short_base_path, tmp_path):
    from vllm_legacy_tpu.lora import LoRARequest
    adapter = _make_long_adapter(tmp_path, seed=6)
    lr = LoRARequest("long6", 1, adapter)
    with pytest.raises(ValueError, match="long-lora-scaling-factors"):
        run_long_engine(short_base_path, [[1, 2, 3]], [lr],
                        factors=None)


def test_mixed_long_and_base_batch(short_base_path, tmp_path):
    """A long-context row and a base row in one batch: each rides its
    own rope segment."""
    from vllm_legacy_tpu.lora import LoRARequest
    adapter = _make_long_adapter(tmp_path, seed=7)
    lr = LoRARequest("long7", 1, adapter)
    short_prompt = [9, 4, 7, 11]
    long_prompt = list(np.random.RandomState(1).randint(5, 250,
                                                        size=40))
    mixed = run_long_engine(short_base_path,
                            [long_prompt, short_prompt], [lr, None],
                            factors=(FACTOR, ))
    only_long = run_long_engine(short_base_path, [long_prompt], [lr],
                                factors=(FACTOR, ))
    only_base = run_long_engine(short_base_path, [short_prompt])
    assert mixed[0] == only_long[0]
    assert mixed[1] == only_base[0]
