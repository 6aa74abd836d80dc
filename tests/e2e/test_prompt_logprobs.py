"""prompt_logprobs correctness vs HF forward (reference strategy:
tests/samplers/test_logprobs.py — prompt logprobs must equal the
model's own next-token logprobs over the prompt)."""
import numpy as np
import pytest

from tests.e2e.test_greedy_equality import tiny_llama_path  # fixture

PROMPT = "The capital of France is"


def hf_prompt_logprobs(path, prompt):
    import torch
    from transformers import AutoTokenizer, LlamaForCausalLM
    tokenizer = AutoTokenizer.from_pretrained(path)
    model = LlamaForCausalLM.from_pretrained(path,
                                             torch_dtype=torch.float32)
    model.eval()
    ids = tokenizer.encode(prompt)
    with torch.no_grad():
        logits = model(torch.tensor([ids])).logits[0]
    lps = torch.log_softmax(logits.float(), dim=-1)
    # logprob of token i comes from position i-1
    return ids, [float(lps[i - 1, ids[i]]) for i in range(1, len(ids))]


@pytest.mark.parametrize("chunked", [False, True])
def test_prompt_logprobs_match_hf(tiny_llama_path, chunked):
    ids, want = hf_prompt_logprobs(tiny_llama_path, PROMPT)

    from vllm_legacy_tpu import LLM, SamplingParams
    kwargs = dict(model=tiny_llama_path, dtype="float32",
                  max_model_len=128, num_tpu_blocks_override=128,
                  disable_log_stats=True)
    if chunked:
        kwargs.update(enable_chunked_prefill=True,
                      max_num_batched_tokens=16, max_num_seqs=8)
    llm = LLM(**kwargs)
    params = SamplingParams(temperature=0.0, max_tokens=2,
                            prompt_logprobs=3, logprobs=2)
    out = llm.generate([PROMPT], params, use_tqdm=False)[0]

    plp = out.prompt_logprobs
    assert plp is not None and plp[0] is None
    assert len(plp) == len(ids), (len(plp), len(ids))
    for i in range(1, len(ids)):
        entry = plp[i]
        assert ids[i] in entry
        got = entry[ids[i]].logprob
        assert abs(got - want[i - 1]) < 2e-3, (i, got, want[i - 1])
        # top-k entries carry decoded text and are sorted-ish
        assert len(entry) >= 1
        for lp in entry.values():
            assert lp.decoded_token is not None
