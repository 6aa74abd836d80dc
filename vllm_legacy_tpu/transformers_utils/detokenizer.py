"""Incremental detokenization (reference: vllm/transformers_utils/
detokenizer.py:13 detokenize_incrementally + Detokenizer)."""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from vllm_legacy_tpu.sequence import (Logprob, Sequence, SequenceGroup,
                                      SamplingParams)

INITIAL_INCREMENTAL_DETOKENIZATION_OFFSET = 5


def _ids_to_tokens(tokenizer, ids, skip_special_tokens=False):
    """convert_ids_to_tokens with None (out-of-vocab id) sanitized to
    the replacement character — ids beyond the tokenizer vocab can be
    sampled when the model vocab is larger than the tokenizer's."""
    tokens = tokenizer.convert_ids_to_tokens(
        ids, skip_special_tokens=skip_special_tokens)
    if isinstance(tokens, str):
        return tokens
    if tokens is None:
        return ["�"] * (len(ids) if isinstance(ids, list) else 1)
    return [t if t is not None else "�" for t in tokens]


def _convert_tokens_to_string_with_added_encoders(
    tokenizer,
    output_tokens: List[str],
    skip_special_tokens: bool,
    spaces_between_special_tokens: bool,
) -> str:
    sub_texts: List[str] = []
    current_sub_text: List[str] = []
    all_special_tokens = set(tokenizer.all_special_tokens)
    for token in output_tokens:
        if skip_special_tokens and token in all_special_tokens:
            continue
        if token in tokenizer.get_added_vocab():
            if current_sub_text:
                sub_texts.append(
                    tokenizer.convert_tokens_to_string(current_sub_text))
                current_sub_text = []
            sub_texts.append(token)
        else:
            current_sub_text.append(token)
    if current_sub_text:
        sub_texts.append(
            tokenizer.convert_tokens_to_string(current_sub_text))
    if spaces_between_special_tokens:
        return " ".join(sub_texts)
    return "".join(sub_texts)


def convert_prompt_ids_to_tokens(
    tokenizer,
    prompt_ids: List[int],
    skip_special_tokens: bool = False,
) -> Tuple[List[str], int, int]:
    """Last few prompt tokens as strings + read offsets (reference:
    detokenizer.py convert_prompt_ids_to_tokens)."""
    new_tokens = _ids_to_tokens(
        tokenizer,
        prompt_ids[-INITIAL_INCREMENTAL_DETOKENIZATION_OFFSET - 2:],
        skip_special_tokens=skip_special_tokens)
    read_offset = len(new_tokens)
    prefix_offset = max(
        read_offset - INITIAL_INCREMENTAL_DETOKENIZATION_OFFSET, 0)
    return new_tokens, prefix_offset, read_offset


def detokenize_incrementally(
    tokenizer,
    all_input_ids: List[int],
    prev_tokens: Optional[List[str]],
    prefix_offset: int,
    read_offset: int,
    skip_special_tokens: bool = False,
    spaces_between_special_tokens: bool = True,
) -> Tuple[List[str], str, int, int]:
    """Streaming-safe detokenization of the newest token(s)."""
    new_token_id = all_input_ids[-1]
    if prev_tokens is None:
        new_tokens = _ids_to_tokens(
            tokenizer, all_input_ids,
            skip_special_tokens=skip_special_tokens)
        output_tokens = new_tokens
        prefix_offset = max(
            len(output_tokens) -
            INITIAL_INCREMENTAL_DETOKENIZATION_OFFSET, 0)
        read_offset = max(len(output_tokens) - 1, 0)
    else:
        if skip_special_tokens and new_token_id in (
                tokenizer.all_special_ids or []):
            return [], "", prefix_offset, read_offset
        new_tokens = _ids_to_tokens(
            tokenizer, [new_token_id],
            skip_special_tokens=skip_special_tokens)
        if isinstance(new_tokens, str):
            new_tokens = [new_tokens]
        output_tokens = prev_tokens + new_tokens

    uses_added_encoders = bool(tokenizer.get_added_vocab())
    if not uses_added_encoders:
        prefix_text = tokenizer.convert_tokens_to_string(
            output_tokens[prefix_offset:read_offset])
        new_text = tokenizer.convert_tokens_to_string(
            output_tokens[prefix_offset:])
    else:
        prefix_text = _convert_tokens_to_string_with_added_encoders(
            tokenizer, output_tokens[prefix_offset:read_offset],
            skip_special_tokens, spaces_between_special_tokens)
        new_text = _convert_tokens_to_string_with_added_encoders(
            tokenizer, output_tokens[prefix_offset:],
            skip_special_tokens, spaces_between_special_tokens)

    if len(new_text) > len(prefix_text) and not new_text.endswith("�"):
        new_text = new_text[len(prefix_text):]
        return new_tokens, new_text, read_offset, len(output_tokens)
    return new_tokens, "", prefix_offset, read_offset


class Detokenizer:
    """Per-sequence incremental detokenization state driver (reference:
    detokenizer.py Detokenizer.decode_sequence_inplace)."""

    def __init__(self, tokenizer_group) -> None:
        self.tokenizer_group = tokenizer_group

    def get_tokenizer_for_seq(self, sequence: Sequence):
        return self.tokenizer_group.get_lora_tokenizer(None)

    def decode_sequence_inplace(self, seq: Sequence,
                                prms: SamplingParams) -> int:
        """Decode the newest token; returns #new output chars."""
        all_input_ids = seq.get_token_ids()
        token_id_generated_this_iteration = all_input_ids[-1]
        tokenizer = self.get_tokenizer_for_seq(seq)

        if seq.tokens is None:
            (seq.tokens, seq.prefix_offset,
             seq.read_offset) = convert_prompt_ids_to_tokens(
                 tokenizer, all_input_ids[:-1],
                 skip_special_tokens=prms.skip_special_tokens)

        (new_tokens, new_decoded_token_text, prefix_offset,
         read_offset) = detokenize_incrementally(
             tokenizer,
             all_input_ids=all_input_ids,
             prev_tokens=seq.tokens,
             prefix_offset=seq.prefix_offset,
             read_offset=seq.read_offset,
             skip_special_tokens=prms.skip_special_tokens,
             spaces_between_special_tokens=prms.
             spaces_between_special_tokens,
         )

        # Decode logprob tokens lazily against the same state.
        logprobs = seq.output_logprobs[-1] if seq.output_logprobs else None
        if logprobs:
            previous_tokens = all_input_ids[:-1]
            for token_id, sample_logprob in logprobs.items():
                if (sample_logprob.decoded_token is None
                        and token_id != -1):
                    if token_id == token_id_generated_this_iteration:
                        sample_logprob.decoded_token = \
                            new_decoded_token_text
                        continue
                    alt_ids = previous_tokens + [token_id]
                    (_, alt_text, _, _) = detokenize_incrementally(
                        tokenizer,
                        all_input_ids=alt_ids,
                        prev_tokens=seq.tokens,
                        prefix_offset=seq.prefix_offset,
                        read_offset=seq.read_offset,
                        skip_special_tokens=prms.skip_special_tokens,
                        spaces_between_special_tokens=prms.
                        spaces_between_special_tokens,
                    )
                    sample_logprob.decoded_token = alt_text

        seq.tokens.extend(new_tokens)
        seq.prefix_offset = prefix_offset
        seq.read_offset = read_offset
        seq.output_text += new_decoded_token_text
        return len(new_decoded_token_text)

    def decode_prompt_logprobs_inplace(self, seq_group: SequenceGroup,
                                       prompt_logprobs) -> None:
        """Attach decoded text to each prompt-logprob entry (reference:
        detokenizer.py decode_prompt_logprobs_inplace :13 — the full
        incremental-state replay is unnecessary here: entries are
        decoded independently, which matches what the OpenAI layer
        serializes)."""
        params = seq_group.sampling_params
        if not params or not params.detokenize:
            return
        tokenizer = self.get_tokenizer_for_seq(seq_group.get_seqs()[0])
        for entry in prompt_logprobs:
            if not entry:
                continue
            for tid, logprob in entry.items():
                if logprob.decoded_token is None:
                    logprob.decoded_token = tokenizer.decode([tid])
