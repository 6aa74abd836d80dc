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
        """Return up to k proposed continuation tokens, or None
        (native scan in csrc/vlt_host.cpp, Python fallback inside)."""
        from vllm_legacy_tpu.native import ngram_propose
        return ngram_propose(token_ids, self.ngram_min, self.ngram_max,
                             self.k)
