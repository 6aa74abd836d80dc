"""Guided (constrained) decoding — TPU-native design.

Reference: ``vllm/model_executor/guided_decoding/`` dispatches to the
external ``outlines`` / ``lm-format-enforcer`` packages, which apply
per-token Python logits processors on the GPU-synchronized sampling path
(outlines_logits_processors.py). Neither package is available here, and a
host-side per-token callback would serialize the TPU pipeline anyway — so
this subsystem compiles the constraint ONCE into a token-level DFA whose
masks are plain arrays: the hot path is a single gather per step, which
can run inside the jitted sampler with no host round-trip.

Pipeline:
  regex / JSON-schema / choice list
    -> character-interval regex AST          (regex_compiler.py)
    -> NFA -> DFA over codepoint intervals   (regex_compiler.py)
    -> token-level transition + mask tables  (token_fsm.py, vectorized
       numpy walk of every vocab token through the char DFA)

Per sequence the engine tracks only an int state; masks come from
``mask[state]`` lookups.
"""
from __future__ import annotations

import json
from typing import Any, List, Optional

from vllm_legacy_tpu.guided_decoding.json_schema import (
    build_regex_from_schema)
from vllm_legacy_tpu.guided_decoding.token_fsm import (TokenFSM,
                                                       get_token_fsm)


def _escape_literal(s: str) -> str:
    out = []
    for ch in s:
        if ch in r"\.[]{}()*+?|^$/#&~" or ch in "\n\r\t":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def get_guided_fsm(
    tokenizer: Any,
    *,
    guided_regex: Optional[str] = None,
    guided_json: Optional[Any] = None,
    guided_choice: Optional[List[str]] = None,
    guided_grammar: Optional[str] = None,
    json_object: bool = False,
    backend: str = "outlines",
    whitespace_pattern: Optional[str] = None,
) -> Optional[TokenFSM]:
    """Build (or fetch from cache) the token FSM for a request's guided-
    decoding options (reference dispatch: guided_decoding/__init__.py
    get_guided_decoding_logits_processor).

    ``backend`` selects the JSON dialect: "outlines" pins object keys to
    schema declaration order; "lm-format-enforcer" admits any key order
    (the reference packages' observable behavioral difference,
    lm_format_enforcer_decoding.py:70). Both compile to the same token
    DFA machinery here."""
    if backend not in ("outlines", "lm-format-enforcer"):
        raise ValueError(f"unknown guided decoding backend {backend!r}")
    any_order = backend == "lm-format-enforcer"
    n_set = sum(
        x is not None
        for x in (guided_regex, guided_json, guided_choice, guided_grammar))
    if n_set + (1 if json_object else 0) > 1:
        raise ValueError(
            "at most one guided-decoding mode may be set per request")
    if guided_grammar is not None:
        from vllm_legacy_tpu.guided_decoding.grammar import (
            grammar_to_regex)
        pattern = grammar_to_regex(guided_grammar)
    elif guided_regex is not None:
        pattern = guided_regex
    elif guided_choice is not None:
        if not guided_choice:
            raise ValueError("guided_choice must be non-empty")
        pattern = "(" + "|".join(
            _escape_literal(str(c)) for c in guided_choice) + ")"
    elif guided_json is not None:
        schema = guided_json
        if isinstance(schema, str):
            schema = json.loads(schema)
        pattern = build_regex_from_schema(
            schema, whitespace_pattern=whitespace_pattern,
            any_order=any_order)
    elif json_object:
        # OpenAI response_format {"type": "json_object"}: any JSON value
        # (objects nested up to the schema builder's default depth).
        pattern = build_regex_from_schema(
            {}, whitespace_pattern=whitespace_pattern)
    else:
        return None
    return get_token_fsm(pattern, tokenizer)


__all__ = ["get_guided_fsm", "get_token_fsm", "TokenFSM",
           "build_regex_from_schema"]
