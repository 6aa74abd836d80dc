"""Helpers for scheduler/block-manager tests (reference:
tests/core/utils.py:9 create_dummy_prompt)."""
from __future__ import annotations

import time
from typing import List, Optional, Tuple

from vllm_legacy_tpu.sampling_params import SamplingParams
from vllm_legacy_tpu.sequence import Sequence, SequenceGroup


def create_dummy_prompt(
    request_id: str,
    prompt_length: int,
    block_size: Optional[int] = None,
    best_of: int = 1,
    lora_request=None,
) -> Tuple[Sequence, SequenceGroup]:
    if not block_size:
        block_size = prompt_length
    # Tokens 0..n-1 keep block-content hashes deterministic per length.
    prompt_tokens = list(range(prompt_length))
    prompt_str = " ".join([str(t) for t in prompt_tokens])
    try:
        seq_id = int(request_id)
    except ValueError:
        seq_id = abs(hash(request_id)) % (2**31)
    prompt = Sequence(seq_id, prompt_str, prompt_tokens, block_size)
    seq_group = SequenceGroup(
        request_id=request_id,
        seqs=[prompt],
        arrival_time=time.time(),
        sampling_params=SamplingParams(best_of=best_of),
        lora_request=lora_request,
    )
    return prompt, seq_group


def create_seq_group(
    seq_prompt_len: int = 1024,
    seq_output_lens: Tuple[int, ...] = (128, ),
    request_id: str = "0",
    seq_id_start: int = 0,
    sampling_params: Optional[SamplingParams] = None,
    block_size: int = 16,
) -> SequenceGroup:
    assert len(seq_output_lens) > 0
    if sampling_params is None:
        sampling_params = SamplingParams()
    prompt_token_ids = [0] * seq_prompt_len
    seqs = []
    for seq_id_offset, output_len in enumerate(seq_output_lens):
        seq = Sequence(
            seq_id=seq_id_start + seq_id_offset,
            prompt="",
            prompt_token_ids=prompt_token_ids,
            block_size=block_size,
        )
        for i in range(output_len):
            seq.append_token_id(token_id=i,
                                logprobs={i: make_logprob(0.0)})
        seqs.append(seq)
    return SequenceGroup(request_id=request_id,
                         seqs=seqs,
                         sampling_params=sampling_params,
                         arrival_time=time.time())


def make_logprob(value: float):
    from vllm_legacy_tpu.sequence import Logprob
    return Logprob(logprob=value)


def round_up_to_next_block(seq_len: int, block_size: int) -> int:
    return (seq_len + block_size - 1) // block_size
