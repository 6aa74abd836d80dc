"""Guided decoding: regex/JSON-schema compiler, token FSM, engine e2e.

Reference test analogue: tests/entrypoints/test_guided_processors.py +
test_openai_server guided cases (which drive outlines); here the whole
stack is in-tree (guided_decoding/), so the compiler gets direct unit
coverage and the engine path is exercised with a real tokenizer.
"""
import json

import numpy as np
import pytest

from vllm_legacy_tpu.guided_decoding import get_guided_fsm
from vllm_legacy_tpu.guided_decoding.json_schema import (
    build_regex_from_schema)
from vllm_legacy_tpu.guided_decoding.regex_compiler import compile_regex
from vllm_legacy_tpu.guided_decoding.token_fsm import TokenFSM, get_token_fsm


def fullmatch(dfa, s: str) -> bool:
    st = dfa.match_prefix(s)
    return st >= 0 and bool(dfa.accepts[st])


# ---------------------------------------------------------------------------
# regex compiler
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("pattern,good,bad", [
    (r"abc", ["abc"], ["ab", "abcd", ""]),
    (r"a*b+c?", ["b", "aab", "abbc"], ["a", "c", "bcc"]),
    (r"(red|green|blue)", ["red", "blue"], ["re", "redblue", "black"]),
    (r"[a-c x]{2,3}", ["ab", "cxa", "a "], ["a", "abcd", "dz"]),
    (r"[^0-9]+", ["abc", "!?"], ["a1", ""]),
    (r"-?(0|[1-9][0-9]*)", ["0", "-7", "42"], ["01", "-", ""]),
    (r"\d{3}-\d{4}", ["555-1234"], ["5551234", "55-1234"]),
    (r"a.c", ["abc", "a?c"], ["a\nc", "ac"]),
    (r"(ab)+", ["ab", "abab"], ["a", "aba"]),
    (r"\w+@\w+\.com", ["a_1@b.com"], ["a@b.org", "@b.com"]),
])
def test_regex_fullmatch(pattern, good, bad):
    dfa = compile_regex(pattern)
    for s in good:
        assert fullmatch(dfa, s), (pattern, s)
    for s in bad:
        assert not fullmatch(dfa, s), (pattern, s)


def test_regex_rejects_unsupported():
    with pytest.raises(ValueError):
        compile_regex(r"a(?=b)")  # lookahead
    with pytest.raises(ValueError):
        compile_regex(r"(a")


# ---------------------------------------------------------------------------
# JSON schema -> regex
# ---------------------------------------------------------------------------
def test_schema_object():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
            "tags": {"type": "array", "items": {"type": "string"},
                     "maxItems": 2},
        },
        "required": ["name", "age"],
    }
    dfa = compile_regex(build_regex_from_schema(schema))
    assert fullmatch(dfa, '{"name": "bob", "age": 3}')
    assert fullmatch(dfa, '{"name":"x","age":-1,"tags":["a"]}')
    assert not fullmatch(dfa, '{"age": 3}')  # missing required
    assert not fullmatch(dfa, '{"name": "b", "age": 3.5}')  # float age
    assert not fullmatch(dfa, '{"name": "b", "age": 1, "tags": '
                         '["a","b","c"]}')  # maxItems


def test_schema_optional_subsets():
    schema = {
        "type": "object",
        "properties": {
            "a": {"type": "integer"},
            "b": {"type": "boolean"},
            "c": {"type": "null"},
        },
        "required": [],
    }
    dfa = compile_regex(build_regex_from_schema(schema))
    for s in ['{}', '{"a": 1}', '{"b": true}', '{"a": 1, "c": null}',
              '{"a": 0, "b": false, "c": null}']:
        assert fullmatch(dfa, s), s
    # wrong order is not part of the language (declaration order)
    assert not fullmatch(dfa, '{"b": true, "a": 1}')


def test_schema_enum_const_anyof_ref():
    schema = {
        "anyOf": [
            {"enum": ["x", 1, None]},
            {"const": {"k": True}},
            {"$ref": "#/$defs/pos"},
        ],
        "$defs": {"pos": {"type": "integer"}},
    }
    dfa = compile_regex(build_regex_from_schema(schema))
    for s in ['"x"', '1', 'null', '{"k": true}', '17']:
        assert fullmatch(dfa, s), s
    assert not fullmatch(dfa, '"y"')


def test_schema_any_json():
    dfa = compile_regex(build_regex_from_schema({}))
    for s in ['true', '3.5', '"s"', '[1, "a", null]',
              '{"a": {"b": [1, {"c": 2}]}}']:
        assert fullmatch(dfa, s), s
    for s in ['{', '[1,]', 'nul']:
        assert not fullmatch(dfa, s), s


def test_schema_string_formats():
    dfa = compile_regex(build_regex_from_schema(
        {"type": "string", "format": "uuid"}))
    assert fullmatch(dfa, '"123e4567-e89b-12d3-a456-426614174000"')
    assert not fullmatch(dfa, '"123e4567"')


# ---------------------------------------------------------------------------
# token FSM over a fake vocab
# ---------------------------------------------------------------------------
class FakeTokenizer:
    """Minimal word-level tokenizer facade for TokenFSM tests."""
    name_or_path = "fake"

    def __init__(self, vocab, eos="</s>"):
        self._vocab = vocab
        self.eos_token_id = vocab[eos]
        self.all_special_ids = [vocab[eos]]
        self.added_tokens_decoder = {}

    def get_vocab(self):
        return dict(self._vocab)

    def __len__(self):
        return len(self._vocab)


def test_token_fsm_masks_and_walk():
    vocab = {"a": 0, "b": 1, "ab": 2, "ba": 3, "c": 4, "</s>": 5}
    tok = FakeTokenizer(vocab)
    fsm = get_token_fsm(r"ab*", tok)

    m0 = fsm.allowed(0)
    # from start: "a" and "ab" begin the language, nothing else
    assert m0[vocab["a"]] and m0[vocab["ab"]]
    assert not m0[vocab["b"]] and not m0[vocab["ba"]] and not m0[vocab["c"]]
    assert not m0[vocab["</s>"]]  # empty string not in language

    s1 = fsm.next_state(0, vocab["a"])
    m1 = fsm.allowed(s1)
    assert m1[vocab["b"]] and m1[vocab["</s>"]]  # "a" accepts
    assert not m1[vocab["a"]] and not m1[vocab["ab"]]

    # full walk "a","b","b" stays legal and accepting
    st = fsm.walk([vocab["a"], vocab["b"], vocab["b"]])
    assert st >= 0 and fsm.allowed(st)[vocab["</s>"]]
    # illegal token kills the walk
    assert fsm.walk([vocab["a"], vocab["c"]]) < 0


def test_token_fsm_choice_and_stuck_recovery():
    vocab = {"re": 0, "d": 1, "green": 2, "x": 3, "</s>": 4}
    tok = FakeTokenizer(vocab)
    fsm = get_guided_fsm(tok, guided_choice=["red", "green"])
    m0 = fsm.allowed(0)
    assert m0[vocab["re"]] and m0[vocab["green"]]
    assert not m0[vocab["x"]]
    s = fsm.next_state(0, vocab["re"])
    m = fsm.allowed(s)
    assert m[vocab["d"]] and not m[vocab["</s>"]]
    s = fsm.next_state(s, vocab["d"])
    assert fsm.allowed(s)[vocab["</s>"]]


def test_get_guided_fsm_validation():
    tok = FakeTokenizer({"a": 0, "</s>": 1})
    with pytest.raises(ValueError):
        get_guided_fsm(tok, guided_regex="a", guided_choice=["a"])
    assert get_guided_fsm(tok) is None


def test_guided_grammar_fsm():
    """EBNF grammar compiles through the regex pipeline: only strings
    the grammar derives are accepted (GBNF + lark syntaxes)."""
    tok = FakeTokenizer({"a": 0, "b": 1, "</s>": 2})
    fsm = get_guided_fsm(tok, guided_grammar="root ::= 'a' 'b'*")
    s = fsm.next_state(0, 0)  # a
    assert s >= 0 and fsm.allowed(s)[2]  # can stop after 'a'
    s2 = fsm.next_state(s, 1)  # ab
    assert s2 >= 0 and fsm.allowed(s2)[1]  # more b's
    assert fsm.next_state(s2, 0) < 0  # 'aba' not derivable


def test_grammar_to_regex():
    import re

    from vllm_legacy_tpu.guided_decoding.grammar import (GrammarError,
                                                         grammar_to_regex)

    # lark style with %ignore + %import
    g = """
    %import common.NUMBER
    %ignore WS
    WS: /[ ]+/
    start: NUMBER (OP NUMBER)*
    OP: "+" | "-"
    """
    rx = grammar_to_regex(g)
    assert re.fullmatch(rx, "1 + 2 - 30")
    assert re.fullmatch(rx, "42")
    assert not re.fullmatch(rx, "1 +")

    # recursion: bounded expansion accepts nesting up to max_depth
    g2 = """
    root ::= item
    item ::= "x" | "(" item ")"
    """
    rx2 = grammar_to_regex(g2, max_depth=3)
    assert re.fullmatch(rx2, "x")
    assert re.fullmatch(rx2, "((x))")
    assert not re.fullmatch(rx2, "((((x))))")

    # unbounded recursion with no escape alternative -> clear error
    with pytest.raises(GrammarError, match="recurses"):
        grammar_to_regex("root ::= '(' root ')'")
    with pytest.raises(GrammarError, match="undefined"):
        grammar_to_regex("root ::= missing")


# ---------------------------------------------------------------------------
# engine e2e: constrained generation with a real tokenizer
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def guided_llm(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    path = tmp_path_factory.mktemp("tiny_llama_guided")
    cfg = LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False)
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).to(torch.float32).save_pretrained(
        path, safe_serialization=True)

    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, \
        trainers
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    # concatenating decoder: guided output must read back exactly as the
    # FSM saw it (the default decoder joins tokens with spaces)
    tok.decoder = decoders.Fuse()
    trainer = trainers.BpeTrainer(
        vocab_size=200, special_tokens=["<unk>", "<s>", "</s>"])
    tok.train_from_iterator(
        ['{"answer": "yes", "count": 0123456789}', '"no" maybe true false',
         "red green blue the quick brown fox"], trainer)
    from transformers import PreTrainedTokenizerFast
    PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>").save_pretrained(path)

    from vllm_legacy_tpu import LLM
    return LLM(model=path, dtype="float32", max_model_len=128,
               num_tpu_blocks_override=128, disable_log_stats=True)


def _generate_guided(llm, fsm, prompt="the", max_tokens=24, seed=7):
    from vllm_legacy_tpu import SamplingParams
    params = SamplingParams(temperature=1.0, seed=seed,
                            max_tokens=max_tokens, guided_fsm=fsm)
    out = llm.generate([prompt], params, use_tqdm=False)[0]
    return out.outputs[0]


def test_engine_guided_choice(guided_llm):
    tok = guided_llm.llm_engine.tokenizer
    fsm = get_guided_fsm(tok, guided_choice=["red", "green", "blue"])
    comp = _generate_guided(guided_llm, fsm)
    assert comp.text in ("red", "green", "blue"), comp.text


def test_engine_guided_regex(guided_llm):
    tok = guided_llm.llm_engine.tokenizer
    fsm = get_guided_fsm(tok, guided_regex=r'(true|false)')
    for seed in (1, 2, 3):
        comp = _generate_guided(guided_llm, fsm, seed=seed)
        assert comp.text in ("true", "false"), comp.text


def test_engine_guided_json_schema(guided_llm):
    tok = guided_llm.llm_engine.tokenizer
    schema = {
        "type": "object",
        "properties": {"answer": {"enum": ["yes", "no"]},
                       "count": {"type": "integer"}},
        "required": ["answer", "count"],
    }
    fsm = get_guided_fsm(tok, guided_json=schema)
    comp = _generate_guided(guided_llm, fsm, max_tokens=40)
    parsed = json.loads(comp.text)
    assert parsed["answer"] in ("yes", "no")
    assert isinstance(parsed["count"], int)


def test_engine_min_tokens_masks_eos(guided_llm):
    """min_tokens must suppress EOS in the sampled distribution
    (reference: sampler.py _apply_min_tokens_penalty :153)."""
    from vllm_legacy_tpu import SamplingParams
    params = SamplingParams(temperature=1.0, seed=3, max_tokens=32,
                            min_tokens=32, detokenize=False)
    out = guided_llm.generate(["the"], params, use_tqdm=False)[0]
    eos = guided_llm.llm_engine.tokenizer.tokenizer.eos_token_id
    toks = list(out.outputs[0].token_ids)
    assert len(toks) == 32
    assert eos not in toks[:-1]


def test_lmfe_backend_any_key_order():
    """The lm-format-enforcer dialect admits object keys in any order;
    outlines pins schema declaration order (reference behavioral
    difference, lm_format_enforcer_decoding.py:70)."""
    import re

    schema = {
        "type": "object",
        "properties": {"a": {"type": "integer"},
                       "b": {"type": "boolean"}},
        "required": ["a", "b"],
    }
    strict = build_regex_from_schema(schema)
    loose = build_regex_from_schema(schema, any_order=True)
    in_order = '{"a": 3, "b": true}'
    swapped = '{"b": true, "a": 3}'
    assert re.fullmatch(strict, in_order)
    assert not re.fullmatch(strict, swapped)
    assert re.fullmatch(loose, in_order)
    assert re.fullmatch(loose, swapped)


def test_custom_whitespace_pattern():
    """guided_whitespace_pattern overrides inter-token whitespace
    (reference: protocol.py guided_whitespace_pattern)."""
    import re

    schema = {"type": "object",
              "properties": {"x": {"type": "integer"}},
              "required": ["x"]}
    no_ws = build_regex_from_schema(schema, whitespace_pattern="")
    assert re.fullmatch(no_ws, '{"x":1}')
    assert not re.fullmatch(no_ws, '{"x": 1}')


def test_backend_validation():
    import pytest as _pytest
    with _pytest.raises(ValueError, match="backend"):
        get_guided_fsm(None, guided_regex="a+", backend="nope")


def test_engine_guided_multistep_equality(guided_llm, tmp_path_factory):
    """Guided decoding rides the on-device multi-step loop
    (num_scheduler_steps>1, dense FSM tables shipped to device):
    seeded outputs must equal the single-step engine's (the FSM mask
    gather and state transition are inside the fori_loop)."""
    from vllm_legacy_tpu import LLM, SamplingParams

    path = guided_llm.llm_engine.model_config.model
    llm_ms = LLM(model=path, dtype="float32", max_model_len=128,
                 num_tpu_blocks_override=128, num_scheduler_steps=8,
                 disable_log_stats=True)
    tok = llm_ms.llm_engine.tokenizer
    fsm = get_guided_fsm(tok, guided_regex=r'(true|false)')
    for seed in (1, 2):
        want = _generate_guided(guided_llm, fsm, seed=seed)
        got = _generate_guided(llm_ms, fsm, seed=seed)
        assert got.text == want.text, (got.text, want.text)
        assert got.text in ("true", "false")
    # steady-state multi-step actually engages for a guided request:
    # whole bursts of tokens arrive per engine step
    params = SamplingParams(temperature=1.0, seed=9, max_tokens=24,
                            guided_fsm=get_guided_fsm(
                                tok, guided_regex=r'[a-z ]{30,40}'))
    engine = llm_ms.llm_engine
    engine.add_request("ms", {"prompt": "the"}, params)
    steps = 0
    n_toks = 0
    while engine.has_unfinished_requests():
        steps += 1
        for o in engine.step():
            if o.finished:
                n_toks = len(o.outputs[0].token_ids)
    assert n_toks >= 16 and steps < n_toks, (steps, n_toks)
