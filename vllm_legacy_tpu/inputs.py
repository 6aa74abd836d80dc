"""Typed prompt inputs (reference: vllm/inputs.py:69,82,127)."""
from __future__ import annotations

from typing import List, Optional, TypedDict, Union


class TextPrompt(TypedDict, total=False):
    prompt: str
    multi_modal_data: Optional[object]


class TokensPrompt(TypedDict, total=False):
    prompt_token_ids: List[int]
    multi_modal_data: Optional[object]


class TextTokensPrompt(TypedDict, total=False):
    prompt: str
    prompt_token_ids: List[int]
    multi_modal_data: Optional[object]


PromptStrictInputs = Union[str, TextPrompt, TokensPrompt]
PromptInputs = Union[str, TextPrompt, TokensPrompt, TextTokensPrompt]


class LLMInputs(TypedDict, total=False):
    """Tokenized inputs handed to the engine."""
    prompt_token_ids: List[int]
    prompt: Optional[str]
    multi_modal_data: Optional[object]


def parse_and_batch_prompt(prompt):
    """Normalize legacy prompt APIs into a list of typed prompts."""
    if isinstance(prompt, str):
        return [TextPrompt(prompt=prompt)]
    if isinstance(prompt, dict):
        return [dict(prompt)]
    if isinstance(prompt, list):
        if len(prompt) == 0:
            raise ValueError("please provide at least one prompt")
        if isinstance(prompt[0], dict):  # new-style typed prompts
            return [dict(p) for p in prompt]
        if isinstance(prompt[0], str):
            return [TextPrompt(prompt=p) for p in prompt]
        if isinstance(prompt[0], int):
            return [TokensPrompt(prompt_token_ids=prompt)]
        if isinstance(prompt[0], list):
            if len(prompt[0]) == 0:
                raise ValueError("please provide at least one prompt")
            if isinstance(prompt[0][0], int):
                return [TokensPrompt(prompt_token_ids=p) for p in prompt]
    raise ValueError("prompt must be a string, array of strings, "
                     "array of tokens, or array of token arrays")
