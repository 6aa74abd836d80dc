"""Per-request sampling parameters.

Capability parity with the reference's ``vllm/sampling_params.py``
(SamplingParams :31, SamplingType :14): n/best_of, temperature, top-k/p,
min-p, presence/frequency/repetition penalties, beam search, stop
strings/tokens, logprobs, seeds, min/max tokens, logits processors.

Unlike the reference's imperative ``_verify_args`` chain, bounds are a
declarative table (``_BOUNDS``) checked in ``__post_init__``; mode
constraints (beam / greedy) are small predicates over the finished
object.
"""
from __future__ import annotations

import copy
from dataclasses import dataclass, field
from enum import IntEnum
from typing import Any, Callable, List, Optional, Union

_SAMPLING_EPS = 1e-5

LogitsProcessor = Callable[[List[int], Any], Any]
"""Callable (generated_token_ids, logits) -> logits; applied on host."""


class SamplingType(IntEnum):
    GREEDY = 0
    RANDOM = 1
    RANDOM_SEED = 2
    BEAM = 3


# field -> (low, high, low_open, high_open); None bound = unchecked.
# Checked only when the value is not None.
_BOUNDS = {
    "n": (1, None, False, False),
    "presence_penalty": (-2.0, 2.0, False, False),
    "frequency_penalty": (-2.0, 2.0, False, False),
    "repetition_penalty": (0.0, 2.0, True, False),
    "temperature": (0.0, None, False, False),
    "top_p": (0.0, 1.0, True, False),
    "min_p": (0.0, 1.0, False, False),
    "max_tokens": (1, None, False, False),
    "min_tokens": (0, None, False, False),
    "logprobs": (0, None, False, False),
    "prompt_logprobs": (0, None, False, False),
    "truncate_prompt_tokens": (1, None, False, False),
}


@dataclass
class SamplingParams:
    """Sampling controls for one request (OpenAI-API compatible
    semantics)."""

    n: int = 1
    best_of: Optional[int] = None
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1
    min_p: float = 0.0
    seed: Optional[int] = None
    use_beam_search: bool = False
    length_penalty: float = 1.0
    early_stopping: Union[bool, str] = False
    stop: Optional[Union[str, List[str]]] = None
    stop_token_ids: Optional[List[int]] = None
    include_stop_str_in_output: bool = False
    ignore_eos: bool = False
    max_tokens: Optional[int] = 16
    min_tokens: int = 0
    logprobs: Optional[int] = None
    prompt_logprobs: Optional[int] = None
    detokenize: bool = True
    skip_special_tokens: bool = True
    spaces_between_special_tokens: bool = True
    # Per-request user callables over the logits. The jitted TPU
    # sampler cannot run arbitrary Python, so rows carrying processors
    # take a host-callback lane: the step returns that batch's raw
    # logits and the affected rows are re-sampled host-side after the
    # callables run (model_runner._apply_user_logits_processors;
    # reference: model_executor/layers/logits_processor.py:81-126).
    logits_processors: Optional[List[LogitsProcessor]] = None
    truncate_prompt_tokens: Optional[int] = None
    # Token-FSM constraint (guided decoding). The TPU sampler runs
    # jitted, so arbitrary Python logits_processors can't execute on
    # the hot path; constraints are expressed as a TokenFSM
    # (guided_decoding/token_fsm.py) whose per-state [V] masks the
    # runner ships to the device (reference analogue:
    # model_executor/guided_decoding/ logits processors).
    guided_fsm: Optional[Any] = None
    # Scratch length used by the serving layer's incremental text
    # streaming; not a sampling knob.
    output_text_buffer_length: int = field(default=0, repr=False)

    def __post_init__(self) -> None:
        if self.best_of is None:
            self.best_of = self.n
        if self.stop is None:
            self.stop = []
        elif isinstance(self.stop, str):
            self.stop = [self.stop]
        else:
            self.stop = list(self.stop)
        self.stop_token_ids = list(self.stop_token_ids or [])

        for name, (lo, hi, lo_open, hi_open) in _BOUNDS.items():
            val = getattr(self, name)
            if val is None:
                continue
            if lo is not None and (val <= lo if lo_open else val < lo):
                raise ValueError(
                    f"{name} must be {'>' if lo_open else '>='} {lo}, "
                    f"got {val}.")
            if hi is not None and (val >= hi if hi_open else val > hi):
                raise ValueError(
                    f"{name} must be {'<' if hi_open else '<='} {hi}, "
                    f"got {val}.")

        if self.best_of < self.n:
            raise ValueError(f"best_of must be >= n, got n={self.n}, "
                             f"best_of={self.best_of}.")
        if self.top_k < -1 or self.top_k == 0:
            raise ValueError("top_k must be -1 (disable) or at least 1, "
                             f"got {self.top_k}.")
        if (self.max_tokens is not None
                and self.min_tokens > self.max_tokens):
            raise ValueError(
                "min_tokens must be <= max_tokens, got min_tokens="
                f"{self.min_tokens} max_tokens={self.max_tokens}.")
        if any(not s for s in self.stop):
            raise ValueError("stop cannot contain an empty string.")
        if self.stop and not self.detokenize:
            raise ValueError("stop strings are only supported when "
                             "detokenize is True.")

        if self.use_beam_search:
            self._check_beam_mode()
        else:
            self._check_sampling_mode()

    # -- mode predicates ------------------------------------------------
    def _check_beam_mode(self) -> None:
        problems = []
        if self.best_of == 1:
            problems.append(f"best_of must be greater than 1 when using "
                            f"beam search. Got {self.best_of}.")
        if self.temperature > _SAMPLING_EPS:
            problems.append(
                "temperature must be 0 when using beam search.")
        if self.top_p < 1.0 - _SAMPLING_EPS:
            problems.append("top_p must be 1 when using beam search.")
        if self.top_k != -1:
            problems.append("top_k must be -1 when using beam search.")
        if self.early_stopping not in (True, False, "never"):
            problems.append(
                "early_stopping must be True, False, or 'never', "
                f"got {self.early_stopping}.")
        if problems:
            raise ValueError(problems[0])

    def _check_sampling_mode(self) -> None:
        if self.early_stopping is not False:
            raise ValueError("early_stopping is not effective and must "
                             "be False when not using beam search.")
        if abs(self.length_penalty - 1.0) > _SAMPLING_EPS:
            raise ValueError(
                "length_penalty is not effective and must be the "
                "default value of 1.0 when not using beam search.")
        if self.temperature < _SAMPLING_EPS:
            # greedy: neutralize the randomness knobs so downstream
            # batching treats equivalent requests identically
            self.top_p = 1.0
            self.top_k = -1
            self.min_p = 0.0
            if self.best_of > 1:
                raise ValueError("best_of must be 1 when using greedy "
                                 f"sampling. Got {self.best_of}.")

    # -- derived --------------------------------------------------------
    @property
    def sampling_type(self) -> SamplingType:
        if self.use_beam_search:
            return SamplingType.BEAM
        if self.temperature < _SAMPLING_EPS:
            return SamplingType.GREEDY
        return (SamplingType.RANDOM_SEED if self.seed is not None
                else SamplingType.RANDOM)

    def update_from_generation_config(self, generation_config: dict
                                      ) -> None:
        """Absorb model generation_config.json eos tokens into stops."""
        eos_ids = generation_config.get("eos_token_id")
        if eos_ids is None or self.ignore_eos:
            return
        for tid in ([eos_ids] if isinstance(eos_ids, int) else eos_ids):
            if tid not in self.stop_token_ids:
                self.stop_token_ids.append(tid)

    def clone(self) -> "SamplingParams":
        return copy.deepcopy(self)
