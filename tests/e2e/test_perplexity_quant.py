"""Quantization accuracy, measured as served: corpus perplexity of an
in-test-generated GPTQ INT4 checkpoint vs its fp32 dense twin, both
through the real engine prompt_logprobs path (the mechanism behind
benchmarks/perplexity.py and the BASELINE.md Δppl ≤ 0.1 target).

A 2-layer random-weight model has none of a trained model's redundancy,
so its absolute Δppl does not transfer to the WikiText-2 bound; what
this test pins is (a) the full GPTQ serialization → load → fused
dequant-GEMM → logprobs pipeline measured end-to-end, (b) the
dequantized-dense twin matching the quantized path almost exactly
(plumbing correctness at ppl level), and (c) the raw fp32-vs-int4 gap
staying within the loose sanity band expected of group-32 INT4 noise.
The real-model numbers are recorded in RESULTS.md.
"""
import json
import math

import numpy as np
import pytest


def _engine_ppl(path, windows, quantization=None):
    from vllm_legacy_tpu import LLM, SamplingParams
    llm = LLM(model=path, dtype="float32", quantization=quantization,
              max_model_len=160, disable_log_stats=True)
    params = SamplingParams(temperature=0.0, max_tokens=1,
                            prompt_logprobs=0, detokenize=False)
    outs = llm.generate(prompts=None, sampling_params=params,
                        prompt_token_ids=windows, use_tqdm=False)
    lp = toks = 0
    for out in outs:
        for entry in out.prompt_logprobs or []:
            if entry:
                lp += next(iter(entry.values())).logprob
                toks += 1
    del llm
    return math.exp(-lp / max(toks, 1))


@pytest.fixture(scope="module")
def ckpt_pair(tmp_path_factory):
    """(dense_path, int4_path, dequant_path): one random tiny llama in
    fp32, its GPTQ-int4 serialization, and a dense twin whose weights
    are the exact dequantized int4 values."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from tests.models.test_quantized_llama import quantize_gptq

    base = tmp_path_factory.mktemp("ppl")
    cfg = LlamaConfig(vocab_size=512, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=256,
                      tie_word_embeddings=False)
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg).to(torch.float32)
    dense = base / "dense"
    model.save_pretrained(dense, safe_serialization=True)

    # GPTQ-serialize every attention/mlp linear (group 32)
    rng = np.random.RandomState(0)
    from safetensors.numpy import load_file, save_file
    tensors = load_file(str(dense / "model.safetensors"))
    qt, dq = {}, {}
    for name, w in tensors.items():
        if ("self_attn" in name or "mlp" in name) and name.endswith(
                ".weight"):
            packed, truth = quantize_gptq(
                w.T.astype(np.float32), rng, 32)
            base_name = name[:-len(".weight")]
            for k, v in packed.items():
                qt[base_name + "." + k] = v
            dq[name] = np.ascontiguousarray(truth.T.astype(np.float32))
        else:
            qt[name] = w
            dq[name] = w

    int4 = base / "int4"
    int4.mkdir()
    save_file(qt, str(int4 / "model.safetensors"))
    dequant = base / "dequant"
    dequant.mkdir()
    save_file(dq, str(dequant / "model.safetensors"))
    hf_cfg = json.loads((dense / "config.json").read_text())
    (dequant / "config.json").write_text(json.dumps(hf_cfg))
    hf_cfg["quantization_config"] = {
        "quant_method": "gptq", "bits": 4, "group_size": 32,
        "desc_act": False,
    }
    (int4 / "config.json").write_text(json.dumps(hf_cfg))

    # shared character tokenizer
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        vocab_size=256, special_tokens=["<unk>", "<s>", "</s>"])
    tok.train_from_iterator(["the quick brown fox jumps over lazy dogs "
                             "a b c d e f g h"], trainer)
    fast = PreTrainedTokenizerFast(tokenizer_object=tok,
                                   unk_token="<unk>", bos_token="<s>",
                                   eos_token="</s>")
    for p in (dense, int4, dequant):
        fast.save_pretrained(p)
    return str(dense), str(int4), str(dequant)


def _windows(path, n=6, window=128):
    import random

    from transformers import AutoTokenizer
    words = ("the quick brown fox jumps over lazy dogs a b c d e f g "
             "h").split()
    rng = random.Random(0)
    text = " ".join(rng.choice(words) for _ in range(4000))
    ids = AutoTokenizer.from_pretrained(path).encode(text)
    return [ids[i:i + window]
            for i in range(0, len(ids) - window, window)][:n]


def test_int4_perplexity_vs_dense(ckpt_pair):
    dense, int4, dequant = ckpt_pair
    windows = _windows(dense)
    ppl_dense = _engine_ppl(dense, windows)
    ppl_int4 = _engine_ppl(int4, windows, quantization="gptq")
    ppl_dequant = _engine_ppl(dequant, windows)

    # (b) quantized path == dequantized dense twin (same numbers through
    # both code paths; f32 tolerance)
    assert abs(ppl_int4 - ppl_dequant) / ppl_dequant < 5e-3, (
        ppl_int4, ppl_dequant)
    # (c) raw int4-vs-fp32 noise band for an untrained tiny net
    assert abs(ppl_int4 - ppl_dense) / ppl_dense < 0.05, (
        ppl_int4, ppl_dense)
