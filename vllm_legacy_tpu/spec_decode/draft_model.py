"""Draft-model speculative proposer.

Reference: ``vllm/spec_decode/multi_step_worker.py`` MultiStepWorker +
``top1_proposer.py`` Top1Proposer — a small draft model runs K greedy
steps to propose tokens the target then scores in one ragged call
(worker/model_runner.py execute_spec).

TPU redesign: the draft owns a second stacked KV cache addressed by the
SAME block tables as the target (same block_size / num_blocks), so no
separate block accounting exists; the scheduler's lookahead slots cover
the proposal positions for both caches. Per-sequence draft-cache
validity is tracked host-side (``_state``): on each decode the draft
"catches up" on the tokens accepted since its last call (a ragged
forward) and proposes K tokens in one jitted fori_loop; prompts and any
invalidation (preemption, swap — detected by block-table change) are
handled by re-prefilling the draft via prompt-shaped metadata.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from vllm_legacy_tpu.logger import init_logger
from vllm_legacy_tpu.sequence import SequenceData, SequenceGroupMetadata
from vllm_legacy_tpu.worker.model_runner import ModelRunner

logger = init_logger(__name__)


class DraftModelProposer:

    def __init__(self, spec_config, parallel_config, scheduler_config,
                 cache_config, mesh) -> None:
        self.num_spec = spec_config.num_speculative_tokens
        self.model_config = spec_config.draft_model_config
        self.cache_config = cache_config
        self.parallel_config = parallel_config
        self.runner = ModelRunner(self.model_config, parallel_config,
                                  scheduler_config, cache_config, mesh)
        self.cache_engine = None
        # seq_id -> (kv-valid length, block-table fingerprint)
        self._state: Dict[int, Tuple[int, tuple]] = {}

    # -- bring-up -------------------------------------------------------
    def load_model(self, load_format) -> None:
        self.runner.load_model(load_format)

    def param_bytes(self) -> int:
        return self.runner.param_bytes()

    def initialize_cache(self) -> None:
        from vllm_legacy_tpu.worker.cache_engine import CacheEngine
        self.cache_engine = CacheEngine(self.cache_config,
                                        self.model_config,
                                        self.parallel_config,
                                        self.runner.mesh)
        self.runner.kv_cache_ndim = \
            self.cache_engine.gpu_cache[0].ndim
        self.runner.kv_cache_arity = \
            len(self.cache_engine.gpu_cache)

    # -- draft KV maintenance --------------------------------------------
    def _run_prefill(self, items: List[Tuple[SequenceGroupMetadata, int,
                                             List[int], int]]) -> None:
        """items: (meta, seq_id, tokens_to_prefill, computed)."""
        fake: List[SequenceGroupMetadata] = []
        for meta, seq_id, toks, computed in items:
            sd = SequenceData(list(toks))
            sd._num_computed_tokens = computed
            fake.append(
                SequenceGroupMetadata(
                    request_id=meta.request_id,
                    is_prompt=True,
                    seq_data={seq_id: sd},
                    sampling_params=meta.sampling_params,
                    block_tables={seq_id: meta.block_tables[seq_id]},
                    token_chunk_size=len(toks) - computed,
                ))
        _, cache = self.runner.execute_model(fake,
                                             self.cache_engine.gpu_cache)
        self.cache_engine.gpu_cache = cache

    def _fingerprint(self, table: List[int]) -> tuple:
        return tuple(table)

    def on_prefill(self,
                   metas: List[SequenceGroupMetadata]) -> None:
        """Mirror a target prompt step into the draft cache (chunked
        prefill mirrors chunk by chunk)."""
        items = []
        for meta in metas:
            seq_id = next(iter(meta.seq_data))
            data = meta.seq_data[seq_id]
            computed = data.get_num_computed_tokens()
            chunk = meta.token_chunk_size
            toks = data.get_token_ids()[:computed + chunk]
            items.append((meta, seq_id, toks, computed))
        self._run_prefill(items)
        for meta, seq_id, toks, computed in items:
            self._state[seq_id] = (
                len(toks),
                self._fingerprint(meta.block_tables[seq_id]))

    # -- proposal ---------------------------------------------------------
    def propose(self, metas: List[SequenceGroupMetadata]
                ) -> Optional[List[List[int]]]:
        """Returns proposals per row (scheduler row order), or None when
        this batch cannot be speculated."""
        l_pad = 1
        while l_pad < self.num_spec + 1:
            l_pad *= 2

        # 1) validate / repair draft state
        repair = []
        per_row = []  # (seq_id, data, table)
        for meta in metas:
            for seq_id, data in meta.seq_data.items():
                table = meta.block_tables[seq_id]
                per_row.append((seq_id, data, table))
                length = data.get_len()
                state = self._state.get(seq_id)
                fp = self._fingerprint(table)
                ok = (state is not None and state[0] < length
                      and length - state[0] <= l_pad
                      and fp[:len(state[1])] == state[1])
                if not ok:
                    # re-prefill everything but the last token; the
                    # catch-up pass below supplies the final logits
                    toks = data.get_token_ids()[:-1]
                    repair.append((meta, seq_id, toks, 0))
                    self._state[seq_id] = (len(toks), ())
        if repair:
            self._run_prefill(repair)
            for meta, seq_id, toks, _ in repair:
                self._state[seq_id] = (
                    len(toks),
                    self._fingerprint(meta.block_tables[seq_id])[:max(
                        (len(toks) + self.cache_config.block_size - 1) //
                        self.cache_config.block_size, 1)])

        # 2) ragged catch-up + K-step proposal, one device call
        rows = []
        for seq_id, data, table in per_row:
            length = data.get_len()
            dlen = self._state[seq_id][0]
            toks = data.get_token_ids()[dlen:length]
            rows.append((toks, dlen, length, table))
        proposals, cache = self.runner.execute_propose(
            rows, self.cache_engine.gpu_cache, self.num_spec)
        self.cache_engine.gpu_cache = cache

        for seq_id, data, table in per_row:
            self._state[seq_id] = (data.get_len(),
                                   self._fingerprint(table))
        return [list(map(int, proposals[i])) for i in range(len(rows))]

    def free_finished(self, seq_ids) -> None:
        for sid in seq_ids:
            self._state.pop(sid, None)
