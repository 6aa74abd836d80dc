"""Embedding model + pooling vs HF (reference:
tests/models/test_llama_embedding.py intent — e5-mistral-style bare
decoder with last-token pooling)."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    import torch
    from transformers import MistralConfig, MistralModel
    path = tmp_path_factory.mktemp("embed_model")
    cfg = MistralConfig(vocab_size=256, hidden_size=64,
                        intermediate_size=96, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        max_position_embeddings=256)
    torch.manual_seed(0)
    MistralModel(cfg).to(torch.float32).save_pretrained(
        path, safe_serialization=True)
    return str(path)


def hf_embed(path, prompts):
    import torch
    from transformers import MistralModel
    model = MistralModel.from_pretrained(path, torch_dtype=torch.float32)
    outs = []
    with torch.no_grad():
        for p in prompts:
            ids = torch.tensor([p])
            h = model(ids).last_hidden_state[0, -1]
            outs.append((h / h.norm()).numpy())
    return outs


def test_embedding_matches_hf(model_path):
    from vllm_legacy_tpu.entrypoints.llm import LLM
    rng = np.random.RandomState(0)
    prompts = [rng.randint(3, 250, size=n).tolist()
               for n in (5, 17, 33)]
    want = hf_embed(model_path, prompts)

    llm = LLM(model=model_path, dtype="float32", max_model_len=128,
              num_tpu_blocks_override=64, skip_tokenizer_init=True)
    assert llm.llm_engine.model_config.embedding_mode
    outs = llm.encode(prompt_token_ids=prompts, use_tqdm=False)
    assert len(outs) == 3
    for o, w in zip(outs, want):
        got = np.asarray(o.outputs.embedding, np.float32)
        assert got.shape == w.shape
        np.testing.assert_allclose(got, w, rtol=2e-3, atol=2e-3)
        assert abs(np.linalg.norm(got) - 1.0) < 1e-3
