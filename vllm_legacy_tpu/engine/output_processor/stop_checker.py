"""Stop-condition evaluation (reference: vllm/engine/output_processor/
stop_checker.py StopChecker)."""
from __future__ import annotations

from typing import Callable, List, Optional

from vllm_legacy_tpu.sampling_params import SamplingParams
from vllm_legacy_tpu.sequence import Sequence, SequenceStatus


class StopChecker:

    def __init__(self, max_model_len: int,
                 get_tokenizer_for_seq: Callable) -> None:
        self.max_model_len = max_model_len
        self.get_tokenizer_for_seq = get_tokenizer_for_seq

    def maybe_stop_sequence(
        self,
        seq: Sequence,
        new_char_count: int,
        sampling_params: SamplingParams,
    ) -> None:
        """Mutates seq.status if any stop condition is met."""
        # min_tokens gate: never stop before min_tokens are generated.
        if seq.get_output_len() < sampling_params.min_tokens:
            if seq.get_len() >= self.max_model_len or (
                    seq.get_output_len() >= sampling_params.max_tokens):
                seq.status = SequenceStatus.FINISHED_LENGTH_CAPPED
            return

        last_token_id = seq.get_last_token_id()
        # EOS (unless ignored).
        if (not sampling_params.ignore_eos
                and seq.eos_token_id is not None
                and last_token_id == seq.eos_token_id):
            seq.status = SequenceStatus.FINISHED_STOPPED
            return

        # stop_token_ids
        if last_token_id in (sampling_params.stop_token_ids or ()):
            if new_char_count and (
                    not sampling_params.include_stop_str_in_output):
                # strip the text of the stop token
                seq.output_text = seq.output_text[:-new_char_count]
            seq.status = SequenceStatus.FINISHED_STOPPED
            seq.stop_reason = last_token_id
            return

        # stop strings
        stop_str = self._check_stop_strings(seq, new_char_count,
                                            sampling_params)
        if stop_str is not None:
            seq.status = SequenceStatus.FINISHED_STOPPED
            seq.stop_reason = stop_str
            return

        # length limits
        if seq.get_len() >= self.max_model_len:
            seq.status = SequenceStatus.FINISHED_LENGTH_CAPPED
            return
        if seq.get_output_len() >= sampling_params.max_tokens:
            seq.status = SequenceStatus.FINISHED_LENGTH_CAPPED
            return

    @staticmethod
    def _check_stop_strings(seq: Sequence, new_char_count: int,
                            sampling_params: SamplingParams
                            ) -> Optional[str]:
        """Search for stop strings overlapping the newest chars
        (reference: stop_checker.py check_stop_strings)."""
        if not new_char_count or not sampling_params.stop:
            return None
        for stop_str in sampling_params.stop:
            stop_len = len(stop_str)
            if stop_len == 0:
                continue
            # Only the tail window can contain a *new* match: the stop
            # string may straddle the old/new boundary by stop_len - 1.
            window = new_char_count + stop_len - 1
            stop_index = seq.output_text.find(
                stop_str, max(len(seq.output_text) - window, 0))
            if stop_index == -1:
                continue
            if sampling_params.include_stop_str_in_output:
                stop_index += stop_len
            seq.output_text = seq.output_text[:stop_index]
            return stop_str
        return None
