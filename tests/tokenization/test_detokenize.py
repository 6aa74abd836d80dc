"""Incremental detokenizer correctness (reference:
tests/tokenization/test_detokenize.py — streaming decode must equal
one-shot decode for every prefix, over tokenizers with tricky
merge/space behavior)."""
import pytest


@pytest.fixture(scope="module")
def tiny_tokenizer(tmp_path_factory):
    from tests.models.test_families import save_tiny_tokenizer
    path = tmp_path_factory.mktemp("tok")
    save_tiny_tokenizer(path)
    from transformers import AutoTokenizer
    return AutoTokenizer.from_pretrained(str(path))


TEXTS = [
    "Hello, my name is Claude and the quick brown fox jumps",
    "the quick quick the fox fox brown",
    "Hello Hello Hello",
]


@pytest.mark.parametrize("text", TEXTS)
@pytest.mark.parametrize("skip_special", [True, False])
def test_incremental_equals_full_decode(tiny_tokenizer, text,
                                        skip_special):
    from vllm_legacy_tpu.transformers_utils.detokenizer import (
        convert_prompt_ids_to_tokens, detokenize_incrementally)
    tok = tiny_tokenizer
    all_ids = tok.encode(text, add_special_tokens=False)
    assert len(all_ids) > 2

    # stream: prompt = first token, then feed one output id at a time
    prompt_ids = all_ids[:1]
    tokens, prefix_offset, read_offset = convert_prompt_ids_to_tokens(
        tok, prompt_ids, skip_special_tokens=skip_special)
    produced = ""
    out_ids = []
    for nid in all_ids[1:]:
        out_ids.append(nid)
        (new_tokens, new_text, prefix_offset,
         read_offset) = detokenize_incrementally(
             tok, all_input_ids=prompt_ids + out_ids,
             prev_tokens=tokens, prefix_offset=prefix_offset,
             read_offset=read_offset,
             skip_special_tokens=skip_special)
        tokens.extend(new_tokens)
        produced += new_text

    want = tok.decode(all_ids, skip_special_tokens=skip_special)
    # streaming starts emitting after the prompt token; compare tails
    assert want.endswith(produced.strip()) or \
        produced.strip() in want, (produced, want)
    # the concatenation of prompt decode + streamed text == full decode
    prompt_text = tok.decode(prompt_ids,
                             skip_special_tokens=skip_special)
    assert (prompt_text + produced).replace(" ", "") == \
        want.replace(" ", "")


def test_special_tokens_skipped(tiny_tokenizer):
    from vllm_legacy_tpu.transformers_utils.detokenizer import (
        convert_prompt_ids_to_tokens, detokenize_incrementally)
    tok = tiny_tokenizer
    base = tok.encode("Hello, my name is", add_special_tokens=False)
    ids = [tok.bos_token_id] + base + [tok.eos_token_id]
    tokens, po, ro = convert_prompt_ids_to_tokens(
        tok, ids[:1], skip_special_tokens=True)
    produced = ""
    for i in range(1, len(ids)):
        new_tokens, new_text, po, ro = detokenize_incrementally(
            tok, all_input_ids=ids[:i + 1], prev_tokens=tokens,
            prefix_offset=po, read_offset=ro,
            skip_special_tokens=True)
        tokens.extend(new_tokens)
        produced += new_text
    assert tok.eos_token not in produced
    assert tok.bos_token not in produced


def test_engine_detokenizes_outputs(tmp_path):
    """e2e: RequestOutput.text is populated and consistent across
    streaming steps (detokenize=True default path). Model vocab must
    match the tokenizer vocab: ids without a tokenizer entry decode to
    replacement chars incrementally but are dropped by one-shot decode,
    so an oversized random model would make the oracle ill-defined."""
    import torch
    from transformers import AutoModelForCausalLM, AutoTokenizer, \
        GPTNeoXConfig

    from tests.models.test_families import save_tiny_tokenizer
    path = tmp_path / "neox"
    path.mkdir()
    save_tiny_tokenizer(path)
    tok_len = len(AutoTokenizer.from_pretrained(str(path)))
    cfg = GPTNeoXConfig(vocab_size=tok_len, hidden_size=64,
                        intermediate_size=128, num_hidden_layers=2,
                        num_attention_heads=4, rotary_pct=0.25,
                        max_position_embeddings=256)
    torch.manual_seed(0)
    AutoModelForCausalLM.from_config(cfg).to(
        torch.float32).save_pretrained(path, safe_serialization=True)
    path = str(path)
    from vllm_legacy_tpu import LLM, SamplingParams
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              num_tpu_blocks_override=64, disable_log_stats=True)
    out = llm.generate(
        ["Hello, my name is"],
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True),
        use_tqdm=False)[0]
    text = out.outputs[0].text
    tok = AutoTokenizer.from_pretrained(path)
    # streaming text continues the prompt, so compare the FULL decode:
    # prompt + streamed == decode(prompt_ids + output_ids)
    full = tok.decode(list(out.prompt_token_ids) +
                      list(out.outputs[0].token_ids),
                      skip_special_tokens=True)
    # the whitespace pre-tokenizer re-spaces punctuation on decode;
    # compare modulo spaces
    assert (out.prompt + text).replace(" ", "") == \
        full.replace(" ", ""), (out.prompt, text, full)
    prompt_dec = tok.decode(out.prompt_token_ids,
                            skip_special_tokens=True)
    assert text.replace(" ", "") == \
        full.replace(prompt_dec, "").replace(" ", "")
