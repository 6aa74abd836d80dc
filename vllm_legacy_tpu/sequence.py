"""Request/sequence state machine shared by scheduler and model runner.

Capability parity with the reference's ``vllm/sequence.py`` (SequenceData
:107, Sequence :216 incl. hash_of_block :281, SequenceGroup :429,
SequenceGroupMetadata :623, SequenceOutput :709, SamplerOutput :805,
ExecuteModelRequest :879) plus the fork's per-step latency statistics
(SamplerPerformanceStatistics :798). The shapes here are dictated by
that wire protocol; the internals (incremental FNV block hashing,
dataclass layout, arithmetic block append) are this repo's own.
"""
from __future__ import annotations

import copy
import enum
from dataclasses import dataclass, field, replace
from typing import Any, Dict, List, Optional, Tuple, Union

from vllm_legacy_tpu.block import LogicalTokenBlock
from vllm_legacy_tpu.sampling_params import SamplingParams


@dataclass
class Logprob:
    """Log-probability of one token (+ optional rank and decoded text)."""
    logprob: float
    rank: Optional[int] = None
    decoded_token: Optional[str] = None


# {token_id: Logprob} per generated position.
SampleLogprobs = List[Dict[int, Logprob]]
# One entry per prompt position (None for the first token).
PromptLogprobs = List[Optional[Dict[int, Logprob]]]


class SequenceStatus(enum.Enum):
    WAITING = "waiting"
    RUNNING = "running"
    SWAPPED = "swapped"
    FINISHED_STOPPED = "stop"
    FINISHED_LENGTH_CAPPED = "length"
    FINISHED_ABORTED = "abort"
    FINISHED_IGNORED = "length"  # noqa: PIE796 — same reason string

    # FINISHED_IGNORED aliases FINISHED_LENGTH_CAPPED's reason but is a
    # distinct lifecycle state (prompt longer than the model length).
    def __new__(cls, reason):
        obj = object.__new__(cls)
        obj._value_ = len(cls.__members__)
        obj.finish_reason = reason
        return obj

    @staticmethod
    def is_finished(status: "SequenceStatus") -> bool:
        return status.name.startswith("FINISHED")

    @staticmethod
    def get_finished_reason(status: "SequenceStatus") -> Optional[str]:
        return status.finish_reason if SequenceStatus.is_finished(
            status) else None


class SequenceStage(enum.Enum):
    PREFILL = enum.auto()
    DECODE = enum.auto()


@dataclass
class RequestMetrics:
    """Per-request latency breakdown (reference: sequence.py:84)."""
    arrival_time: float
    last_token_time: float
    first_scheduled_time: Optional[float] = None
    first_token_time: Optional[float] = None
    time_in_queue: Optional[float] = None
    finished_time: Optional[float] = None


@dataclass
class StepPerformanceStatistics:
    """Per-step host/device timing attached to SamplerOutput (fork parity:
    SamplerPerformanceStatistics, sequence.py:797-802)."""
    prepare_time_ms: float = 0.0
    model_time_ms: float = 0.0
    sample_time_ms: float = 0.0
    num_batched_tokens: int = 0


@dataclass
class SequenceData:
    """Token-level state of one sequence (reference: sequence.py:107).

    ``computed`` tracks prefill progress for chunked prefill; once it
    covers the whole sequence the stage flips to DECODE.
    """
    prompt_token_ids: List[int]
    output_token_ids: List[int] = field(default_factory=list)
    cumulative_logprob: float = 0.0
    computed: int = field(default=0, repr=False)
    stage: SequenceStage = field(default=SequenceStage.PREFILL, repr=False)

    def __post_init__(self) -> None:
        self.prompt_token_ids = list(self.prompt_token_ids)
        self.output_token_ids = list(self.output_token_ids)

    # -- mutation -----------------------------------------------------
    def append_token_id(self, token_id: int, logprob: float) -> None:
        self.output_token_ids.append(token_id)
        self.cumulative_logprob += logprob

    def update_num_computed_tokens(self, num_new_computed: int) -> None:
        self.computed += num_new_computed
        assert self.computed <= self.get_len(), (self.computed,
                                                 self.get_len())
        if self.get_num_uncomputed_tokens() == 0:
            # Sticky: appending the sampled token afterwards makes one
            # token "uncomputed" again, but the sequence stays in DECODE
            # until a recompute-preemption resets it.
            self.stage = SequenceStage.DECODE

    def reset_state_for_recompute(self) -> None:
        """Preempt-by-recompute: all tokens must be re-prefilled."""
        self.computed = 0
        self.stage = SequenceStage.PREFILL

    # -- views (one-line delegation idiom used repo-wide) ---------------
    def get_len(self) -> int: return (len(self.prompt_token_ids)
                                      + len(self.output_token_ids))  # noqa: E704,E501

    def get_prompt_len(self) -> int: return len(self.prompt_token_ids)  # noqa: E704,E501

    def get_output_len(self) -> int: return len(self.output_token_ids)  # noqa: E704,E501

    def get_token_ids(self) -> List[int]:
        return self.prompt_token_ids + self.output_token_ids

    def get_prefix_token_ids(
            self, num_tokens: int
    ) -> Tuple[Tuple[int, ...], Optional[Tuple[int, ...]]]:
        past_prompt = num_tokens - len(self.prompt_token_ids)
        if past_prompt > 0:
            return (tuple(self.prompt_token_ids),
                    tuple(self.output_token_ids[:past_prompt]))
        return tuple(self.prompt_token_ids[:num_tokens]), None

    def get_num_computed_tokens(self) -> int: return self.computed  # noqa: E704,E501

    def get_num_uncomputed_tokens(self) -> int:
        return self.get_len() - self.computed

    def get_last_token_id(self) -> int:
        return (self.output_token_ids or self.prompt_token_ids)[-1]



class Sequence:
    """One generation stream: token data + logical block map + output text
    (reference: sequence.py:216)."""

    def __init__(
        self,
        seq_id: int,
        prompt: Optional[str],
        prompt_token_ids: List[int],
        block_size: int,
        eos_token_id: Optional[int] = None,
        lora_request: Optional[Any] = None,
    ) -> None:
        self.seq_id = seq_id
        self.prompt = prompt
        self.block_size = block_size
        self.eos_token_id = eos_token_id
        self.lora_request = lora_request

        self.data = SequenceData(prompt_token_ids)
        self.output_logprobs: SampleLogprobs = []
        self.output_text = ""

        self.logical_token_blocks: List[LogicalTokenBlock] = []
        self._grow_blocks(prompt_token_ids)
        self.status = SequenceStatus.WAITING
        self.stop_reason: Union[int, str, None] = None

        # Incremental detokenization cursors.
        self.prefix_offset = 0
        self.read_offset = 0
        self.tokens: Optional[List[str]] = None

    @property
    def lora_int_id(self) -> int:
        return self.lora_request.lora_int_id if self.lora_request else 0

    def get_output_text_to_return(self, buffer_length: int) -> str:
        # Hold back `buffer_length` chars in streaming mode so stop strings
        # never leak (reference: sequence.py:266).
        return (self.output_text[:-buffer_length]
                if buffer_length else self.output_text)

    def hash_of_block(self, logical_idx: int) -> int:
        """Content hash of block prefix [0, logical_idx] for prefix caching
        (reference: Sequence.hash_of_block, sequence.py:281 — which
        re-hashes the whole prefix per block, O(prompt^2); here an
        incremental native FNV chain, O(block) per block and process-
        stable, csrc/vlt_host.cpp)."""
        from vllm_legacy_tpu.native import hash_block_chain, hash_seed
        chain = getattr(self, "_hash_chain", None)
        if chain is None:
            chain = self._hash_chain = [hash_seed(self.lora_int_id)]
        if logical_idx + 1 < len(chain):
            return chain[logical_idx + 1]
        tokens = self.data.get_token_ids()
        bs = self.block_size
        for b in range(len(chain) - 1, logical_idx + 1):
            chain.append(
                hash_block_chain(chain[-1],
                                 tokens[b * bs:(b + 1) * bs]))
        return chain[logical_idx + 1]

    def num_hashed_tokens_of_block(self, logical_idx: int) -> int:
        return (logical_idx + 1) * self.block_size

    def reset_state_for_recompute(self) -> None:
        self.data.reset_state_for_recompute()

    def _grow_blocks(self, token_ids: List[int]) -> None:
        """Extend the logical block map to cover ``token_ids`` more
        tokens. Purely arithmetic: blocks are fixed-capacity counters,
        so no per-token loop is needed."""
        blocks = self.logical_token_blocks
        remaining = len(token_ids)
        consumed = 0
        while remaining > 0:
            if not blocks or blocks[-1].is_full():
                blocks.append(LogicalTokenBlock(
                    block_number=len(blocks),
                    block_size=self.block_size))
            take = min(remaining, blocks[-1].get_num_empty_slots())
            blocks[-1].append_tokens(token_ids[consumed:consumed + take])
            consumed += take
            remaining -= take

    def append_token_id(self, token_id: int,
                        logprobs: Dict[int, Logprob]) -> None:
        assert token_id in logprobs
        self._grow_blocks([token_id])
        self.output_logprobs.append(logprobs)
        self.data.append_token_id(token_id, logprobs[token_id].logprob)

    # -- delegating views (wire-format API parity; one-liner idiom) -----
    def get_len(self) -> int: return self.data.get_len()  # noqa: E704

    def get_prompt_len(self) -> int: return self.data.get_prompt_len()  # noqa: E704,E501

    def get_output_len(self) -> int: return self.data.get_output_len()  # noqa: E704,E501

    def get_token_ids(self) -> List[int]: return self.data.get_token_ids()  # noqa: E704,E501

    def get_prompt_token_ids(self) -> List[int]:
        return self.data.prompt_token_ids

    def get_last_token_id(self) -> int: return self.data.get_last_token_id()  # noqa: E704,E501

    def get_output_token_ids(self) -> List[int]:
        return self.data.output_token_ids

    def get_cumulative_logprob(self) -> float:
        return self.data.cumulative_logprob

    def get_beam_search_score(self, length_penalty: float = 1.0,
                              seq_len: Optional[int] = None,
                              eos_token_id: Optional[int] = None) -> float:
        """Sequence score with HF-compatible length penalty (reference:
        sequence.py:354)."""
        if seq_len is None:
            seq_len = self.get_len()
            # an eos tail does not count toward the penalty
            ends_with_eos = (eos_token_id is not None
                             and self.get_last_token_id() == eos_token_id)
            if ends_with_eos:
                seq_len -= 1
        return self.get_cumulative_logprob() / (seq_len**length_penalty)

    def is_finished(self) -> bool:
        return SequenceStatus.is_finished(self.status)

    def fork(self, new_seq_id: int) -> "Sequence":
        child = copy.deepcopy(self)
        child.seq_id = new_seq_id
        return child

    def get_num_new_tokens(self) -> int:
        """Tokens to compute this step: 1 in decode, else remaining
        uncomputed prompt tokens (chunked prefill may take a slice)."""
        if self.data.stage == SequenceStage.DECODE:
            return 1
        return self.data.get_num_uncomputed_tokens()

    def is_prefill(self) -> bool:
        return self.data.stage == SequenceStage.PREFILL

    def __repr__(self) -> str:
        return (f"Sequence(seq_id={self.seq_id}, status={self.status.name}, "
                f"num_blocks={len(self.logical_token_blocks)})")


@dataclass
class SequenceGroupState:
    """Mutable cross-step state (e.g. spec-decode bookkeeping)."""
    generator_seed_offset: int = 0
    num_steps: int = 0


class SequenceGroup:
    """All sequences born from one request (n / best_of / beam forks)
    (reference: sequence.py:429)."""

    def __init__(
        self,
        request_id: str,
        seqs: List[Sequence],
        arrival_time: float,
        sampling_params: Optional[SamplingParams] = None,
        lora_request: Optional[Any] = None,
        multi_modal_data: Optional[Any] = None,
        embeddings: Optional[List[float]] = None,
        pooling_params: Optional[Any] = None,
    ) -> None:
        self.request_id = request_id
        self.seqs_dict = {seq.seq_id: seq for seq in seqs}
        self.sampling_params = sampling_params
        self.metrics = RequestMetrics(arrival_time=arrival_time,
                                      last_token_time=arrival_time)
        self.lora_request = lora_request
        self.prompt_logprobs: Optional[PromptLogprobs] = None
        self.multi_modal_data = multi_modal_data
        self.embeddings = embeddings
        self.pooling_params = pooling_params
        self.state = SequenceGroupState()

    def _first(self) -> Sequence:
        """All forks share the prompt; any member answers prompt-level
        questions."""
        return next(iter(self.seqs_dict.values()))

    @property
    def prompt(self) -> Optional[str]:
        return self._first().prompt

    @property
    def prompt_token_ids(self) -> List[int]:
        return self._first().data.prompt_token_ids

    @property
    def lora_int_id(self) -> int:
        return self.lora_request.lora_int_id if self.lora_request else 0

    # -- timing hooks (engine metrics) ----------------------------------
    def get_last_latency(self, now: float) -> Optional[float]:
        if self.is_prefill():
            raise ValueError("seq_group.get_last_latency() should not be "
                             "called if the seq_group is in prefill phase.")
        latency = now - self.metrics.last_token_time
        self.metrics.last_token_time = now
        return latency

    def maybe_set_first_token_time(self, time_: float) -> None:
        if (self.metrics.first_token_time is None
                and self._first().get_output_len() == 1):
            self.metrics.first_token_time = time_

    def maybe_set_first_scheduled_time(self, time_: float) -> None:
        m = self.metrics
        if m.first_scheduled_time is None:
            m.first_scheduled_time = time_
            m.time_in_queue = time_ - m.arrival_time

    def set_finished_time(self, time_: Optional[float]) -> None:
        self.metrics.finished_time = time_

    # -- membership -----------------------------------------------------
    def get_max_num_running_seqs(self) -> int:
        """Upper bound of parallel sequences over the request's lifetime
        (reference: sequence.py:512)."""
        sp = self.sampling_params
        if sp and (sp.use_beam_search or sp.best_of > self.num_seqs()):
            # forks not yet materialized still count
            return sp.best_of
        return self.num_unfinished_seqs()

    def get_seqs(
        self,
        status: Optional[SequenceStatus] = None,
    ) -> List[Sequence]:
        members = list(self.seqs_dict.values())
        if status is None:
            return members
        return [s for s in members if s.status == status]

    def is_encoder_decoder(self) -> bool:
        return False

    def get_unfinished_seqs(self) -> List[Sequence]:
        return [s for s in self.seqs_dict.values()
                if not s.is_finished()]

    def get_finished_seqs(self) -> List[Sequence]:
        return [s for s in self.seqs_dict.values()
                if s.is_finished()]

    def update_num_computed_tokens(self, num_new_computed: int) -> None:
        for seq in self.get_unfinished_seqs():
            seq.data.update_num_computed_tokens(num_new_computed)

    def get_num_uncomputed_tokens(self) -> int:
        return sum(s.data.get_num_uncomputed_tokens()
                   for s in self.get_unfinished_seqs())

    def num_seqs(self, status: Optional[SequenceStatus] = None) -> int:
        return len(self.get_seqs(status))

    def num_unfinished_seqs(self) -> int: return len(self.get_unfinished_seqs())  # noqa: E704,E501

    def num_finished_seqs(self) -> int: return len(self.get_finished_seqs())  # noqa: E704,E501

    def find(self, seq_id: int) -> Sequence:
        seq = self.seqs_dict.get(seq_id)
        if seq is None:
            raise ValueError(f"Sequence {seq_id} not found.")
        return seq

    def add(self, seq: Sequence) -> None:
        if seq.seq_id in self.seqs_dict:
            raise ValueError(f"Sequence {seq.seq_id} already exists.")
        self.seqs_dict[seq.seq_id] = seq

    def remove(self, seq_id: int) -> None:
        if self.seqs_dict.pop(seq_id, None) is None:
            raise ValueError(f"Sequence {seq_id} not found.")

    def is_finished(self) -> bool:
        return all(s.is_finished() for s in self.seqs_dict.values())

    def is_prefill(self) -> bool:
        return self._first().is_prefill()

    def __repr__(self) -> str:
        return (f"SequenceGroup(request_id={self.request_id}, "
                f"sampling_params={self.sampling_params}, "
                f"num_seqs={len(self.seqs_dict)})")


@dataclass
class SequenceGroupMetadata:
    """Scheduler → model-runner wire format for one group in one step
    (reference: sequence.py:623)."""

    request_id: str
    is_prompt: bool
    seq_data: Dict[int, SequenceData]
    sampling_params: Optional[SamplingParams]
    block_tables: Dict[int, List[int]]
    do_sample: bool = True
    pooling_params: Optional[Any] = None
    token_chunk_size: Optional[int] = None
    lora_request: Optional[Any] = None
    computed_block_nums: Optional[List[int]] = None
    state: Optional[SequenceGroupState] = None
    multi_modal_data: Optional[Any] = None

    def __post_init__(self) -> None:
        if self.state is None:
            self.state = SequenceGroupState()
        if self.token_chunk_size is None:
            # whole prompt for an unchunked prefill, 1 for decode
            self.token_chunk_size = (next(iter(
                self.seq_data.values())).get_len() if self.is_prompt
                else 1)

    @property
    def lora_int_id(self) -> int:
        return self.lora_request.lora_int_id if self.lora_request else 0


@dataclass(eq=True)
class SequenceOutput:
    """One sampled token for one parent sequence (reference:
    sequence.py:709)."""
    parent_seq_id: int
    output_token: int
    logprobs: Dict[int, Logprob] = field(compare=False)

    def __repr__(self) -> str:
        return (f"SequenceOutput(parent_seq_id={self.parent_seq_id}, "
                f"output_token={self.output_token})")


@dataclass(eq=True)
class CompletionSequenceGroupOutput:
    """Model output for one sequence group at one step (reference:
    sequence.py:756)."""
    samples: List[SequenceOutput]
    prompt_logprobs: Optional[PromptLogprobs] = None


@dataclass
class EmbeddingSequenceGroupOutput:
    embeddings: List[float]


@dataclass
class SamplerOutput:
    """Output of one model+sample step for all scheduled groups (reference:
    sequence.py:805). On TPU, device arrays are fetched once per step; all
    fields here are host data."""
    outputs: List[CompletionSequenceGroupOutput]
    sampled_token_probs: Optional[Any] = None  # device array [B, V]
    sampled_token_ids: Optional[Any] = None  # device array [B]
    spec_decode_worker_metrics: Optional[Any] = None
    performance_statistics: Optional[StepPerformanceStatistics] = None

    def __getitem__(self, idx: int) -> CompletionSequenceGroupOutput:
        return self.outputs[idx]

    def __setitem__(self, idx: int, value) -> None:
        self.outputs[idx] = value

    def __len__(self) -> int:
        return len(self.outputs)


@dataclass
class PoolerOutput:
    outputs: List[EmbeddingSequenceGroupOutput]

    def __getitem__(self, idx: int) -> EmbeddingSequenceGroupOutput:
        return self.outputs[idx]

    def __len__(self) -> int:
        return len(self.outputs)


@dataclass
class ExecuteModelRequest:
    """Engine → model-executor request for one step (reference:
    sequence.py:879). Swap/copy lists drive the KV block-move kernels."""
    seq_group_metadata_list: List[SequenceGroupMetadata]
    blocks_to_swap_in: Dict[int, int] = field(default_factory=dict)
    blocks_to_swap_out: Dict[int, int] = field(default_factory=dict)
    blocks_to_copy: Dict[int, List[int]] = field(default_factory=dict)
    num_lookahead_slots: int = 0
    running_queue_size: int = 0
    waiting_queue_size: int = 0
    # Steps until a scheduled decode can free capacity (max_tokens);
    # bounds how far a multi-step burst may usefully run under queue
    # pressure. 0 = unknown.
    steps_to_first_free: int = 0

    def clone(
        self, seq_group_metadata_list: List[SequenceGroupMetadata]
    ) -> "ExecuteModelRequest":
        return replace(
            self,
            seq_group_metadata_list=seq_group_metadata_list,
            blocks_to_swap_in=dict(self.blocks_to_swap_in),
            blocks_to_swap_out=dict(self.blocks_to_swap_out),
            blocks_to_copy=copy.deepcopy(self.blocks_to_copy))
