"""Single-step output processing: apply sampler output to sequences.

Reference: ``vllm/engine/output_processor/single_step.py`` :18 —
beam-search forking, n>1 sampling forks, detokenization and stop checks.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union

from vllm_legacy_tpu.core.scheduler import Scheduler
from vllm_legacy_tpu.engine.output_processor.stop_checker import StopChecker
from vllm_legacy_tpu.sampling_params import SamplingParams
from vllm_legacy_tpu.sequence import (CompletionSequenceGroupOutput,
                                      Sequence, SequenceGroup,
                                      SequenceOutput, SequenceStatus)
from vllm_legacy_tpu.transformers_utils.detokenizer import Detokenizer
from vllm_legacy_tpu.utils import Counter


class SingleStepOutputProcessor:

    def __init__(self, scheduler_config, detokenizer: Detokenizer,
                 scheduler: Scheduler, seq_counter: Counter,
                 stop_checker: StopChecker) -> None:
        self.scheduler_config = scheduler_config
        self.detokenizer = detokenizer
        self.scheduler = scheduler
        self.seq_counter = seq_counter
        self.stop_checker = stop_checker

    def process_prompt_logprob(self, seq_group: SequenceGroup,
                               outputs: List[CompletionSequenceGroupOutput]) -> None:
        assert len(outputs) == 1
        output = outputs[0]
        prompt_logprobs = getattr(output, "prompt_logprobs", None)
        if prompt_logprobs is not None:
            if seq_group.sampling_params.detokenize and self.detokenizer:
                self.detokenizer.decode_prompt_logprobs_inplace(
                    seq_group, prompt_logprobs)
            if seq_group.prompt_logprobs is None:
                seq_group.prompt_logprobs = []
            seq_group.prompt_logprobs.extend(prompt_logprobs)

    def process_outputs(self, sequence_group: SequenceGroup,
                        outputs: List[CompletionSequenceGroupOutput]) -> None:
        assert len(outputs) == 1, "single-step requires one output/step"
        self._process_sequence_group_outputs(sequence_group, outputs[0])

    def _process_sequence_group_outputs(
            self, seq_group: SequenceGroup,
            outputs: CompletionSequenceGroupOutput) -> None:
        sampling_params = seq_group.sampling_params
        if sampling_params.n == 1 and not sampling_params.use_beam_search:
            if not outputs.samples:
                return
            sample = outputs.samples[0]
            seq = seq_group.get_seqs(status=SequenceStatus.RUNNING)[0]
            seq.append_token_id(sample.output_token, sample.logprobs)
            new_char_count = 0
            if sampling_params.detokenize and self.detokenizer:
                new_char_count = self.detokenizer.decode_sequence_inplace(
                    seq, sampling_params)
            self.stop_checker.maybe_stop_sequence(seq, new_char_count,
                                                  sampling_params)
            if seq.is_finished():
                self.scheduler.free_seq(seq)
            return

        # n > 1 / beam search: fork children from parents per sample
        # (reference: single_step.py:66-220).
        existing_finished = seq_group.get_finished_seqs()
        parents = seq_group.get_seqs(status=SequenceStatus.RUNNING)
        parent_child_dict: Dict[int, List[SequenceOutput]] = {
            p.seq_id: []
            for p in parents
        }
        for sample in outputs.samples:
            parent_child_dict[sample.parent_seq_id].append(sample)

        child_seqs: List[Tuple[Sequence, Sequence]] = []
        for parent in parents:
            child_samples = parent_child_dict[parent.seq_id]
            if not child_samples:
                parent.status = SequenceStatus.FINISHED_ABORTED
                seq_group.remove(parent.seq_id)
                self.scheduler.free_seq(parent)
                continue
            for child_sample in child_samples[:-1]:
                new_child_seq_id = next(self.seq_counter)
                child = parent.fork(new_child_seq_id)
                child.append_token_id(child_sample.output_token,
                                      child_sample.logprobs)
                child_seqs.append((child, parent))
            last = child_samples[-1]
            parent.append_token_id(last.output_token, last.logprobs)
            child_seqs.append((parent, parent))

        for seq, _ in child_seqs:
            new_char_count = 0
            if sampling_params.detokenize and self.detokenizer:
                new_char_count = self.detokenizer.decode_sequence_inplace(
                    seq, sampling_params)
            self.stop_checker.maybe_stop_sequence(seq, new_char_count,
                                                  sampling_params)

        if not sampling_params.use_beam_search:
            for seq, parent in child_seqs:
                if seq is parent and seq.is_finished():
                    self.scheduler.free_seq(seq)
                if seq is not parent:
                    seq_group.add(seq)
                    if not seq.is_finished():
                        self.scheduler.fork_seq(parent, seq)
            return

        # Beam search selection (reference: single_step.py:120-219).
        beam_width = sampling_params.best_of
        length_penalty = sampling_params.length_penalty

        def sort_key(x: Tuple[Sequence, Sequence]):
            return x[0].get_beam_search_score(
                length_penalty=length_penalty,
                eos_token_id=x[0].eos_token_id)

        def score(seq: Sequence) -> float:
            return seq.get_beam_search_score(
                length_penalty=length_penalty,
                eos_token_id=seq.eos_token_id)

        # Finished beams: keep the global top-beam_width; newly finished
        # children ranked below the cut are dropped.
        new_finished = sorted(
            [(s, p) for s, p in child_seqs if s.is_finished()],
            key=sort_key, reverse=True)
        cutoff = sorted((score(s) for s in existing_finished),
                        reverse=True)[:beam_width]
        for rank, (seq, parent) in enumerate(new_finished):
            keep = len(cutoff) < beam_width or (
                rank < beam_width and score(seq) > cutoff[-1])
            if seq is not parent:
                if keep:
                    seq_group.add(seq)
            # forked children were never scheduled; parents are freed below

        # Running beams: keep top beam_width, discard the rest.
        running = sorted(
            [(s, p) for s, p in child_seqs if not s.is_finished()],
            key=sort_key, reverse=True)
        for seq, parent in running[:beam_width]:
            if seq is not parent:
                seq_group.add(seq)
                self.scheduler.fork_seq(parent, seq)
        for seq, parent in running[beam_width:]:
            if seq is parent:
                seq.status = SequenceStatus.FINISHED_ABORTED
                seq_group.remove(seq.seq_id)
                self.scheduler.free_seq(seq)
        for seq, parent in child_seqs:
            if seq is parent and seq.is_finished():
                self.scheduler.free_seq(seq)
