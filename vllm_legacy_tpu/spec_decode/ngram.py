"""Prompt-lookup (n-gram) proposer (reference: vllm/spec_decode/
ngram_worker.py :12 — tensor n-gram match :69-155, here plain numpy on
host: proposal generation is not on the device-critical path)."""
from __future__ import annotations

from typing import List, Optional

import numpy as np


class NGramProposer:

    def __init__(self, ngram_min: int, ngram_max: int,
                 num_speculative_tokens: int) -> None:
        self.ngram_min = max(ngram_min, 1)
        self.ngram_max = ngram_max
        self.k = num_speculative_tokens

    def propose(self, token_ids: List[int]) -> Optional[List[int]]:
        """Return up to k proposed continuation tokens, or None."""
        arr = np.asarray(token_ids, dtype=np.int64)
        n_tokens = len(arr)
        if n_tokens < self.ngram_min + 1:
            return None
        for n in range(min(self.ngram_max, n_tokens - 1),
                       self.ngram_min - 1, -1):
            pattern = arr[-n:]
            # most recent earlier occurrence of the trailing n-gram
            windows = np.lib.stride_tricks.sliding_window_view(
                arr[:-1], n)
            matches = np.all(windows == pattern, axis=1)
            idx = np.flatnonzero(matches)
            if idx.size == 0:
                continue
            start = int(idx[-1]) + n
            proposal = arr[start:start + self.k]
            if proposal.size == 0:
                continue
            return [int(t) for t in proposal]
        return None
