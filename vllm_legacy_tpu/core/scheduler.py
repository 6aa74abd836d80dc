"""Continuous-batching scheduler for the single-controller TPU engine.

Capability parity with the reference scheduler (vllm/core/scheduler.py):
three request pools (waiting / running / swapped), a per-step token+seq
admission budget, the prefill-first default policy (:730) and the
decode-first chunked-prefill policy (:824), preemption by recompute or
by swapping KV to the host tier (:1055), the prompt-delay batching
heuristic (:1140), the artificial-preemption test hook (:21-24), and
wire-format SequenceGroupMetadata assembly (:939-1015).

The structure is not the reference's: because the TPU engine is a
single synchronous controller (no per-GPU worker RPC), one scheduling
step here is three *admission passes* — keep-running, resume-swapped,
admit-waiting — that all write into a single mutable ``_StepPlan``.
The plan is then frozen into ``SchedulerOutputs``. Swap directives
become host<->HBM block DMA lists executed by the cache engine; block
"copies" are copy-on-write forks. Chunk boundaries are block-aligned
(unlike the reference) so the fused Pallas cache-write path always
emits whole-block DMAs.
"""
from __future__ import annotations

import enum
import random
import time
from collections import deque
from dataclasses import dataclass, field
from typing import (Deque, Dict, Iterable, List, Optional, Set, Tuple,
                    Union)

from vllm_legacy_tpu import envs
from vllm_legacy_tpu.config import CacheConfig, LoRAConfig, SchedulerConfig
from vllm_legacy_tpu.core.interfaces import AllocStatus, BlockSpaceManager
from vllm_legacy_tpu.core.policy import Policy, PolicyFactory
from vllm_legacy_tpu.logger import init_logger
from vllm_legacy_tpu.sequence import (Sequence, SequenceData, SequenceGroup,
                                      SequenceGroupMetadata, SequenceStatus)
from vllm_legacy_tpu.utils import cdiv

logger = init_logger(__name__)

# Fault-injection hook used by the preemption tests (reference:
# VLLM_TEST_ENABLE_ARTIFICIAL_PREEMPT, core/scheduler.py:21-24).
ENABLE_ARTIFICIAL_PREEMPT = bool(envs.VLT_TEST_ENABLE_ARTIFICIAL_PREEMPT)
ARTIFICIAL_PREEMPTION_PROB = 0.5
ARTIFICIAL_PREEMPTION_MAX_CNT = 500


class PreemptionMode(enum.Enum):
    """How a victim gives up its KV blocks: SWAP moves them to the host
    tier (multi-seq groups, where regenerating is ambiguous); RECOMPUTE
    drops them and re-prefills later (cheaper for single sequences)."""
    SWAP = enum.auto()
    RECOMPUTE = enum.auto()


class SchedulingBudget:
    """Step-wide admission ledger (reference: scheduler.py:41).

    Tokens and sequence seats are booked per request id, so a group the
    passes visit twice is only counted once, and a booking can be
    released exactly once. ``can_schedule`` is the single gate every
    pass consults before admitting more work.
    """

    def __init__(self, token_budget: int, max_num_seqs: int) -> None:
        self.token_budget = token_budget
        self.max_num_seqs = max_num_seqs
        self._token_bookings: Dict[str, int] = {}
        self._seat_bookings: Dict[str, int] = {}
        self._tokens_booked = 0
        self._seats_booked = 0

    def can_schedule(self, *, num_new_tokens: int,
                     num_new_seqs: int) -> bool:
        assert num_new_tokens != 0 and num_new_seqs != 0
        return (self._tokens_booked + num_new_tokens <= self.token_budget
                and self._seats_booked + num_new_seqs <= self.max_num_seqs)

    def remaining_token_budget(self) -> int:
        return self.token_budget - self._tokens_booked

    def add_num_batched_tokens(self, req_id: str, num_tokens: int) -> None:
        if req_id not in self._token_bookings:
            self._token_bookings[req_id] = num_tokens
            self._tokens_booked += num_tokens

    def subtract_num_batched_tokens(self, req_id: str,
                                    num_tokens: int) -> None:
        if req_id in self._token_bookings:
            self._tokens_booked -= self._token_bookings.pop(req_id)

    def add_num_seqs(self, req_id: str, num_seqs: int) -> None:
        if req_id not in self._seat_bookings:
            self._seat_bookings[req_id] = num_seqs
            self._seats_booked += num_seqs

    def subtract_num_seqs(self, req_id: str, num_seqs: int) -> None:
        if req_id in self._seat_bookings:
            self._seats_booked -= self._seat_bookings.pop(req_id)

    @property
    def num_batched_tokens(self) -> int:
        return self._tokens_booked

    @property
    def num_curr_seqs(self) -> int:
        return self._seats_booked


@dataclass
class ScheduledSequenceGroup:
    seq_group: SequenceGroup
    # How many of the group's tokens the model computes this step
    # (smaller than the remaining prompt under chunked prefill).
    token_chunk_size: int


@dataclass
class SchedulerOutputs:
    """Frozen result of one scheduling step (reference: scheduler.py:112);
    consumed by the engine to build the ExecuteModelRequest."""
    scheduled_seq_groups: List[ScheduledSequenceGroup]
    num_prefill_groups: int
    num_batched_tokens: int
    blocks_to_swap_in: Dict[int, int]
    blocks_to_swap_out: Dict[int, int]
    blocks_to_copy: Dict[int, List[int]]
    ignored_seq_groups: List[SequenceGroup]
    num_lookahead_slots: int
    running_queue_size: int
    preempted: int = 0
    # requests still waiting/swapped after this step was admitted: the
    # runner caps multi-step burst length under queue pressure so a
    # new arrival's TTFT is not one full k-step burst
    waiting_queue_size: int = 0
    # Earliest step at which any scheduled decode is guaranteed to
    # finish (max_tokens / model-len budget) and free its seats/KV
    # reserve. A waiting request that was just REFUSED admission
    # cannot progress until that happens, so the runner only shortens
    # a multi-step burst to this horizon — a blanket short-burst cap
    # under queue pressure polled 8x more often than capacity could
    # change and cost ~25% offline throughput (k=32 -> k=4 for an
    # entire 256-request bench). When a scheduled decode may also stop
    # EARLY (EOS allowed / stop strings), the horizon is pre-clamped
    # to VLT_MAX_PRESSURED_BURST in finalize(). 0 means "unknown";
    # the runner fails CLOSED to its short-burst cap on 0.
    steps_to_first_free: int = 0

    def __post_init__(self) -> None:
        # A step swaps in XOR out; the cache engine issues one direction.
        assert not (self.blocks_to_swap_in and self.blocks_to_swap_out)
        self.num_loras = len(self.lora_requests)
        if self.num_loras > 0:
            # Group batch rows per adapter so the LoRA layer applies one
            # gathered einsum per adapter slot.
            self.scheduled_seq_groups.sort(key=lambda g: (
                g.seq_group.lora_int_id, g.seq_group.request_id))

    def is_empty(self) -> bool:
        return (not self.scheduled_seq_groups and not self.blocks_to_swap_in
                and not self.blocks_to_swap_out and not self.blocks_to_copy)

    @property
    def lora_requests(self) -> Set:
        return {
            g.seq_group.lora_request
            for g in self.scheduled_seq_groups
            if g.seq_group.lora_request is not None
        }


class _StepPlan:
    """Mutable accumulator the three admission passes write into.

    Replaces the reference's per-pass output dataclasses
    (SchedulerRunningOutputs/SwappedInOutputs/PrefillOutputs) + caller
    merge dance: every pass appends directly, and ``finalize`` emits
    the SchedulerOutputs once.
    """

    def __init__(self) -> None:
        self.new_prefills: List[ScheduledSequenceGroup] = []
        # Prefills continuing from RUNNING/SWAPPED under chunking.
        self.carry_prefills: List[ScheduledSequenceGroup] = []
        self.decodes: List[ScheduledSequenceGroup] = []
        self.to_recompute: List[SequenceGroup] = []  # back to waiting
        self.to_host: List[SequenceGroup] = []  # swapped out
        self.rejected: List[SequenceGroup] = []  # ignored / infeasible
        self.swap_in: Dict[int, int] = {}
        self.swap_out: Dict[int, int] = {}
        self.copies: Dict[int, List[int]] = {}
        self.lookahead = 0

    @property
    def num_preempted(self) -> int:
        return len(self.to_recompute) + len(self.to_host)

    def add_copies(self, cows: Dict[int, List[int]]) -> None:
        for src, dsts in cows.items():
            self.copies.setdefault(src, []).extend(dsts)

    def finalize(self, budget: SchedulingBudget,
                 running_queue_size: int,
                 waiting_queue_size: int = 0,
                 max_model_len: int = 1 << 30) -> SchedulerOutputs:
        # Batch layout contract: prefill rows precede decode rows (the
        # model runner splits the batch on this boundary).
        ordered = self.new_prefills + self.carry_prefills + self.decodes
        # Soonest capacity-freeing finish among scheduled decodes (see
        # SchedulerOutputs.steps_to_first_free). The max_tokens /
        # model-len budget is a guaranteed bound; a decode that can
        # also stop EARLY (EOS allowed, or stop strings/tokens set)
        # makes the true horizon unpredictable, so the horizon is then
        # clamped to VLT_MAX_PRESSURED_BURST — a queued request should
        # not wait out a full long burst past an unpredicted finish.
        first_free = 1 << 30
        may_stop_early = False
        for sched in self.decodes:
            group = sched.seq_group
            sp = group.sampling_params
            if sp is None:
                continue
            if (not sp.ignore_eos) or sp.stop or sp.stop_token_ids:
                may_stop_early = True
            for seq in group.get_seqs(status=SequenceStatus.RUNNING):
                remaining = max_model_len - seq.get_len()
                if sp.max_tokens is not None:
                    remaining = min(remaining,
                                    sp.max_tokens - seq.get_output_len())
                first_free = min(first_free, remaining)
        first_free = max(first_free, 1)
        if may_stop_early:
            first_free = min(first_free,
                             max(int(envs.VLT_MAX_PRESSURED_BURST), 1))
        return SchedulerOutputs(
            scheduled_seq_groups=ordered,
            num_prefill_groups=(len(self.new_prefills) +
                                len(self.carry_prefills)),
            num_batched_tokens=budget.num_batched_tokens,
            blocks_to_swap_in=self.swap_in,
            blocks_to_swap_out=self.swap_out,
            blocks_to_copy=self.copies,
            ignored_seq_groups=self.rejected,
            num_lookahead_slots=self.lookahead,
            running_queue_size=running_queue_size,
            preempted=self.num_preempted,
            waiting_queue_size=waiting_queue_size,
            steps_to_first_free=first_free,
        )


class Scheduler:
    """One instance per engine; runs synchronously inside every engine
    step, so everything here stays allocation-light host Python."""

    def __init__(
        self,
        scheduler_config: SchedulerConfig,
        cache_config: CacheConfig,
        lora_config: Optional[LoRAConfig] = None,
    ) -> None:
        self.scheduler_config = scheduler_config
        self.cache_config = cache_config
        self.lora_config = lora_config

        manager_cls = BlockSpaceManager.get_block_space_manager_class(
            "embedding" if scheduler_config.embedding_mode else "v1")
        self.block_manager = manager_cls(
            block_size=cache_config.block_size,
            num_gpu_blocks=cache_config.num_gpu_blocks or 0,
            num_cpu_blocks=cache_config.num_cpu_blocks or 0,
            sliding_window=cache_config.sliding_window,
            enable_caching=cache_config.enable_prefix_caching,
        )

        self.waiting: Deque[SequenceGroup] = deque()
        self.running: Deque[SequenceGroup] = deque()
        self.swapped: Deque[SequenceGroup] = deque()

        # Prompt-delay heuristic state (_passed_delay).
        self.prev_time = 0.0
        self.prev_prompt = False
        self.last_prompt_latency = 0.0

        self.user_specified_preemption_mode = (
            scheduler_config.preemption_mode)
        # "reserve" admission: only admit prompts whose FULL length (to
        # max_tokens) fits alongside everything already admitted — no
        # decode-time preemption thrash (config.py admission_control).
        self.reserve_admission = (
            scheduler_config.admission_control == "reserve")
        self.num_cumulative_preemption = 0
        self.enable_artificial_preemption = ENABLE_ARTIFICIAL_PREEMPT
        self.artificial_preempt_cnt = (ARTIFICIAL_PREEMPTION_MAX_CNT
                                       if ENABLE_ARTIFICIAL_PREEMPT else 0)

    @property
    def lora_enabled(self) -> bool:
        return bool(self.lora_config)

    @property
    def num_decoding_tokens_per_seq(self) -> int:
        return 1

    # ------------------------------------------------------------- intake

    def add_seq_group(self, seq_group: SequenceGroup) -> None:
        self.waiting.append(seq_group)

    def abort_seq_group(
            self, request_id: Union[str, Iterable[str]]) -> None:
        targets = ({request_id} if isinstance(request_id, str)
                   else set(request_id))
        for pool in (self.waiting, self.running, self.swapped):
            if not targets:
                break
            hit = [g for g in pool if g.request_id in targets]
            for group in hit:
                pool.remove(group)
                targets.discard(group.request_id)
                for seq in group.get_seqs():
                    if not seq.is_finished():
                        seq.status = SequenceStatus.FINISHED_ABORTED
                        self.free_seq(seq)

    def has_unfinished_seqs(self) -> bool:
        return bool(self.waiting or self.running or self.swapped)

    def get_num_unfinished_seq_groups(self) -> int:
        return len(self.waiting) + len(self.running) + len(self.swapped)

    # --------------------------------------------------- admission passes

    def _keep_running(self, plan: _StepPlan, budget: SchedulingBudget,
                      active_loras: Optional[Set[int]],
                      policy: Policy, chunking: bool) -> None:
        """Pass 1: keep RUNNING groups on the device.

        Walks the pool highest-priority first; when a group cannot grow
        its KV allocation, victims are preempted lowest-priority first
        (the tail of the FCFS order) until it can — or the group
        preempts itself if it is the last one standing. Groups that
        don't fit the budget stay in the pool untouched.
        """
        now = time.time()
        queue = policy.sort_by_priority(now, self.running)

        while queue:
            group = queue[0]
            step_tokens = self._tokens_this_step(
                group, SequenceStatus.RUNNING, chunking, budget)
            if step_tokens == 0:
                break  # out of token budget; the rest stay running
            queue.popleft()

            survived = True
            while not self._can_append_slots(group):
                # Release whatever this group had booked while we evict.
                budget.subtract_num_batched_tokens(group.request_id,
                                                   step_tokens)
                budget.subtract_num_seqs(
                    group.request_id, group.get_max_num_running_seqs())
                if active_loras is not None and group.lora_int_id > 0:
                    active_loras.discard(group.lora_int_id)
                victim = queue.pop() if queue else group
                mode = self._preempt(victim, plan.swap_out)
                dest = (plan.to_recompute if mode is
                        PreemptionMode.RECOMPUTE else plan.to_host)
                dest.append(victim)
                if victim is group:
                    survived = False
                    break
            if not survived:
                continue

            self._grow_kv(group, plan.copies)
            if group.is_prefill():
                plan.carry_prefills.append(
                    ScheduledSequenceGroup(group, step_tokens))
            else:
                plan.decodes.append(ScheduledSequenceGroup(group, 1))
            budget.add_num_batched_tokens(group.request_id, step_tokens)
            if chunking:
                budget.add_num_seqs(group.request_id,
                                    group.get_max_num_running_seqs())
            if active_loras is not None and group.lora_int_id > 0:
                active_loras.add(group.lora_int_id)

        self.running = queue
        # max, not +=: several admission passes may run in one step and
        # the frozen output must carry the per-step slot count, not a
        # per-pass sum (reference uses running_scheduled's value alone).
        plan.lookahead = max(plan.lookahead,
                             self._lookahead_slots(is_prefill=False))

    def _resume_swapped(self, plan: _StepPlan, budget: SchedulingBudget,
                        active_loras: Optional[Set[int]],
                        policy: Policy, chunking: bool = False) -> None:
        """Pass 2: bring swapped-out groups back from the host tier while
        free blocks and budget allow. Groups whose total KV can never fit
        the pool are failed permanently."""
        queue = policy.sort_by_priority(time.time(), self.swapped)
        lora_deferred: List[SequenceGroup] = []

        while queue:
            group = queue[0]
            verdict = self.block_manager.can_swap_in(
                group,
                # Swap-in re-admits at the current length; lookahead
                # slots are granted by _grow_kv below.
                0)
            if verdict == AllocStatus.LATER:
                break
            if verdict == AllocStatus.NEVER:
                logger.warning(
                    "Request %s needs more KV blocks than the pool has; "
                    "failing it permanently.", group.request_id)
                for seq in group.get_seqs():
                    seq.status = SequenceStatus.FINISHED_IGNORED
                plan.rejected.append(group)
                queue.popleft()
                continue

            if self._defer_for_lora(group, active_loras):
                lora_deferred.append(group)
                queue.popleft()
                continue

            seats = group.get_max_num_running_seqs()
            step_tokens = self._tokens_this_step(
                group, SequenceStatus.SWAPPED, chunking, budget)
            if step_tokens == 0 or not budget.can_schedule(
                    num_new_tokens=step_tokens, num_new_seqs=seats):
                break

            if active_loras is not None and group.lora_int_id > 0:
                active_loras.add(group.lora_int_id)
            queue.popleft()
            self._swap_in(group, plan.swap_in)
            self._grow_kv(group, plan.copies)
            if group.is_prefill():
                plan.carry_prefills.append(
                    ScheduledSequenceGroup(group, step_tokens))
            else:
                plan.decodes.append(ScheduledSequenceGroup(group, 1))
            budget.add_num_batched_tokens(group.request_id, step_tokens)
            budget.add_num_seqs(group.request_id, seats)

        for group in reversed(lora_deferred):
            queue.appendleft(group)  # retry next step, order preserved
        self.swapped = queue
        plan.lookahead = max(plan.lookahead,
                             self._lookahead_slots(is_prefill=False))

    def _full_length_blocks(self, group: SequenceGroup) -> int:
        """KV blocks this group needs if every sequence runs to its
        sampling limit — the reservation unit for "reserve" admission."""
        bs = self.cache_config.block_size
        params = group.sampling_params
        seqs = [s for s in group.get_seqs() if not s.is_finished()]
        if not seqs:
            return 0
        limit = seqs[0].get_prompt_len()
        if params is not None and params.max_tokens:
            limit += params.max_tokens
        limit = min(limit, self.scheduler_config.max_model_len)
        # multi-step / speculative decode appends lookahead slots past
        # the sampled token — they consume blocks too
        limit += self.scheduler_config.num_lookahead_slots
        per_seq = cdiv(limit, bs)
        return per_seq * max(len(seqs), group.get_max_num_running_seqs())

    def _admit_waiting(self, plan: _StepPlan, budget: SchedulingBudget,
                       active_loras: Optional[Set[int]],
                       chunking: bool = False) -> None:
        """Pass 3: admit new prompts FCFS while blocks + budget allow.
        Prompts that can never fit are marked ignored; under chunking
        only a block-aligned slice of the prompt is admitted."""
        queue = deque(self.waiting)
        lora_deferred: List[SequenceGroup] = []
        reserved = usable = 0
        if self.reserve_admission:
            usable = (self.block_manager.num_total_gpu_blocks -
                      self.block_manager.watermark_blocks)
            # Everything holding (or about to re-hold) device blocks:
            # the pools PLUS groups earlier passes already moved into
            # the plan this step (under the chunked policy the running
            # pass runs first and pops them out of self.running).
            holders = [g for pool in (self.running, self.swapped)
                       for g in pool]
            holders += [x.seq_group for x in (plan.decodes +
                                              plan.carry_prefills +
                                              plan.new_prefills)]
            holders += plan.to_host  # will re-reserve on swap-in
            reserved = sum(self._full_length_blocks(g) for g in holders)

        # _passed_delay first: it also updates the delay-heuristic clock.
        while self._passed_delay(time.time()) and queue:
            group = queue[0]
            prompt_seqs = group.get_seqs(status=SequenceStatus.WAITING)
            assert len(prompt_seqs) == 1, (
                "a waiting group carries exactly one prompt sequence")
            step_tokens = self._tokens_this_step(
                group, SequenceStatus.WAITING, chunking, budget)
            if not chunking:
                assert step_tokens == prompt_seqs[0].get_len()

            if step_tokens > self._prompt_limit(group):
                logger.warning(
                    "Prompt of %d tokens exceeds the admission limit %d; "
                    "ignoring request %s.", step_tokens,
                    self._prompt_limit(group), group.request_id)
                prompt_seqs[0].status = SequenceStatus.FINISHED_IGNORED
                plan.rejected.append(group)
                queue.popleft()
                continue

            verdict = self.block_manager.can_allocate(group)
            if verdict == AllocStatus.LATER:
                break
            if verdict == AllocStatus.NEVER:
                logger.warning(
                    "Prompt of %d tokens can never fit the KV pool; "
                    "ignoring request %s.", step_tokens, group.request_id)
                prompt_seqs[0].status = SequenceStatus.FINISHED_IGNORED
                plan.rejected.append(group)
                queue.popleft()
                continue

            if self._defer_for_lora(group, active_loras):
                lora_deferred.append(group)
                queue.popleft()
                continue

            if self.reserve_admission:
                need = self._full_length_blocks(group)
                # Oversized singletons (> whole pool) fall back to
                # optimistic admission; can_allocate rejects the truly
                # impossible ones above.
                if need <= usable and reserved + need > usable:
                    break  # FCFS: hold until reserved capacity frees
                reserved += need

            seats = group.get_max_num_running_seqs()
            if step_tokens == 0 or not budget.can_schedule(
                    num_new_tokens=step_tokens, num_new_seqs=seats):
                break

            if active_loras is not None and group.lora_int_id > 0:
                active_loras.add(group.lora_int_id)
            queue.popleft()
            self.block_manager.allocate(group)
            for seq in group.get_seqs(status=SequenceStatus.WAITING):
                seq.status = SequenceStatus.RUNNING
            plan.new_prefills.append(
                ScheduledSequenceGroup(group, step_tokens))
            budget.add_num_batched_tokens(group.request_id, step_tokens)
            budget.add_num_seqs(group.request_id, seats)

        for group in reversed(lora_deferred):
            queue.appendleft(group)
        self.waiting = queue
        if plan.new_prefills:
            self.prev_prompt = True
        plan.lookahead = max(plan.lookahead,
                             self._lookahead_slots(is_prefill=True))

    def _defer_for_lora(self, group: SequenceGroup,
                        active_loras: Optional[Set[int]]) -> bool:
        """True when admitting this group would exceed the adapter-slot
        capacity; it is parked and retried next step."""
        if not self.lora_enabled or group.lora_int_id <= 0:
            return False
        assert active_loras is not None and self.lora_config is not None
        return (group.lora_int_id not in active_loras
                and len(active_loras) >= self.lora_config.max_loras)

    # ------------------------------------------------------ step policies

    def _plan_prefill_first(self) -> SchedulerOutputs:
        """Default policy: a step is either all-prefill or all-decode
        (reference: scheduler.py:730). New prompts take precedence over
        decodes; swapped groups block new admissions until resumed."""
        budget = SchedulingBudget(
            token_budget=self.scheduler_config.max_num_batched_tokens,
            max_num_seqs=self.scheduler_config.max_num_seqs)
        # Seats of everything already on the device are spoken for.
        for group in self.running:
            budget.add_num_seqs(group.request_id,
                                group.get_max_num_running_seqs())
        active_loras = (set(g.lora_int_id for g in self.running
                            if g.lora_int_id > 0)
                        if self.lora_enabled else None)

        plan = _StepPlan()
        if not self.swapped:
            self._admit_waiting(plan, budget, active_loras,
                                chunking=False)
        if not plan.new_prefills:
            fcfs = PolicyFactory.get_policy(policy_name="fcfs")
            self._keep_running(plan, budget, active_loras, fcfs,
                               chunking=False)
            if plan.num_preempted == 0:
                # Preemption means the pool is already too tight.
                self._resume_swapped(plan, budget, active_loras, fcfs)

        assert (budget.num_batched_tokens <=
                self.scheduler_config.max_num_batched_tokens)
        assert budget.num_curr_seqs <= self.scheduler_config.max_num_seqs

        self._requeue(plan)
        return plan.finalize(budget, len(self.running),
                             len(self.waiting) + len(self.swapped),
                             self.scheduler_config.max_model_len)

    def _plan_chunked(self) -> SchedulerOutputs:
        """Chunked-prefill policy: decodes admitted first (they bound
        inter-token latency), prompt chunks fill the leftover token
        budget (reference: scheduler.py:824)."""
        budget = SchedulingBudget(
            token_budget=self.scheduler_config.max_num_batched_tokens,
            max_num_seqs=self.scheduler_config.max_num_seqs)
        active_loras: Set[int] = set()

        plan = _StepPlan()
        fcfs = PolicyFactory.get_policy(policy_name="fcfs")
        self._keep_running(plan, budget, active_loras, fcfs,
                           chunking=True)
        if plan.num_preempted == 0:
            self._resume_swapped(plan, budget, active_loras, fcfs,
                                 chunking=True)
        self._admit_waiting(plan, budget, active_loras, chunking=True)

        assert (budget.num_batched_tokens <=
                self.scheduler_config.max_num_batched_tokens)
        assert budget.num_curr_seqs <= self.scheduler_config.max_num_seqs

        self._requeue(plan)
        return plan.finalize(budget, len(self.running),
                             len(self.waiting) + len(self.swapped),
                             self.scheduler_config.max_model_len)

    def _requeue(self, plan: _StepPlan) -> None:
        """Put every group the passes touched back into its pool.
        Recompute victims rejoin the FRONT of waiting (they were running,
        so they outrank never-started prompts)."""
        self.waiting.extendleft(plan.to_recompute)
        self.running.extend(s.seq_group for s in plan.new_prefills)
        self.running.extend(s.seq_group for s in plan.carry_prefills)
        self.running.extend(s.seq_group for s in plan.decodes)
        self.swapped.extend(plan.to_host)

    def _schedule(self) -> SchedulerOutputs:
        if self.scheduler_config.enable_chunked_prefill:
            return self._plan_chunked()
        return self._plan_prefill_first()

    def _inject_preemption(self) -> bool:
        """Artificial preemption fault injection (tests only)."""
        if (self.enable_artificial_preemption
                and self.artificial_preempt_cnt > 0
                and random.uniform(0, 1) < ARTIFICIAL_PREEMPTION_PROB):
            self.artificial_preempt_cnt -= 1
            return True
        return False

    # The _can_append_slots name is kept for test monkeypatching parity.
    def _can_append_slots(self, seq_group: SequenceGroup) -> bool:
        if self._inject_preemption():
            return False
        return self.block_manager.can_append_slots(
            seq_group=seq_group,
            num_lookahead_slots=self._lookahead_slots(is_prefill=False))

    # ----------------------------------------------------- wire assembly

    def schedule(
        self
    ) -> Tuple[List[SequenceGroupMetadata], SchedulerOutputs]:
        """Run one scheduling step and build the metadata the model
        runner consumes (reference: scheduler.py:939-1015)."""
        outputs = self._schedule()
        now = time.time()

        metadata_list: List[SequenceGroupMetadata] = []
        for scheduled in outputs.scheduled_seq_groups:
            group = scheduled.seq_group
            group.maybe_set_first_scheduled_time(now)

            seq_data: Dict[int, SequenceData] = {}
            block_tables: Dict[int, List[int]] = {}
            for seq in group.get_seqs(status=SequenceStatus.RUNNING):
                seq_data[seq.seq_id] = seq.data
                block_tables[seq.seq_id] = (
                    self.block_manager.get_block_table(seq))
                self.block_manager.access_all_blocks_in_seq(seq, now)

            prefix_blocks = self.block_manager.get_common_computed_block_ids(
                group.get_seqs(status=SequenceStatus.RUNNING))

            is_prompt = group.is_prefill()
            do_sample = True
            if is_prompt:
                (seq, ) = group.get_seqs()
                # A chunk that leaves prompt tokens uncomputed must not
                # sample — only the final chunk produces a token.
                if (scheduled.token_chunk_size +
                        seq.data.get_num_computed_tokens() <
                        seq.data.get_len()):
                    do_sample = False

            metadata_list.append(
                SequenceGroupMetadata(
                    request_id=group.request_id,
                    is_prompt=is_prompt,
                    seq_data=seq_data,
                    sampling_params=group.sampling_params,
                    block_tables=block_tables,
                    do_sample=do_sample,
                    pooling_params=group.pooling_params,
                    token_chunk_size=scheduled.token_chunk_size,
                    lora_request=group.lora_request,
                    computed_block_nums=prefix_blocks,
                    state=group.state,
                    multi_modal_data=(group.multi_modal_data
                                      if is_prompt else None),
                ))

        # The model step is synchronous and imminent: scheduled blocks
        # can be marked computed now for future prefix-cache hits.
        for scheduled in outputs.scheduled_seq_groups:
            self.block_manager.mark_blocks_as_computed(scheduled.seq_group)

        return metadata_list, outputs

    # ------------------------------------------------------ pool plumbing

    def fork_seq(self, parent_seq: Sequence, child_seq: Sequence) -> None:
        self.block_manager.fork(parent_seq, child_seq)

    def free_seq(self, seq: Sequence) -> None:
        self.block_manager.free(seq)

    def free_finished_seq_groups(self) -> None:
        self.running = deque(g for g in self.running if not g.is_finished())

    def _grow_kv(self, seq_group: SequenceGroup,
                 copies: Dict[int, List[int]]) -> None:
        """Extend each running sequence's block table by one step (plus
        lookahead); records any copy-on-write block splits."""
        lookahead = self._lookahead_slots(is_prefill=False)
        for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
            for src, dsts in self.block_manager.append_slots(
                    seq, lookahead).items():
                copies.setdefault(src, []).extend(dsts)

    # Back-compat alias (used by tests mirroring the reference name).
    def _append_slots(self, seq_group: SequenceGroup,
                      blocks_to_copy: Dict[int, List[int]]) -> None:
        self._grow_kv(seq_group, blocks_to_copy)

    def _preempt(self, seq_group: SequenceGroup,
                 blocks_to_swap_out: Dict[int, int],
                 preemption_mode: Optional[PreemptionMode] = None
                 ) -> PreemptionMode:
        """Pick the eviction flavor (reference: scheduler.py:1055):
        single-seq groups recompute (re-prefill is one cheap batched
        pass on the MXU); multi-seq groups swap (their shared-prefix
        fork state cannot be regenerated deterministically)."""
        if self.user_specified_preemption_mode == "swap":
            preemption_mode = PreemptionMode.SWAP
        elif self.user_specified_preemption_mode == "recompute":
            preemption_mode = PreemptionMode.RECOMPUTE
        elif preemption_mode is None:
            preemption_mode = (PreemptionMode.RECOMPUTE
                               if seq_group.get_max_num_running_seqs() == 1
                               else PreemptionMode.SWAP)

        if self.num_cumulative_preemption % 50 == 0:
            logger.warning(
                "Preempting request %s (%s): KV pool is full. Raise "
                "hbm_utilization or add chips for more KV space. "
                "cumulative_preemptions=%d", seq_group.request_id,
                preemption_mode, self.num_cumulative_preemption + 1)
        self.num_cumulative_preemption += 1

        if preemption_mode is PreemptionMode.RECOMPUTE:
            seqs = seq_group.get_seqs(status=SequenceStatus.RUNNING)
            assert len(seqs) == 1, "recompute only fits single-seq groups"
            seqs[0].status = SequenceStatus.WAITING
            self.free_seq(seqs[0])
            seqs[0].reset_state_for_recompute()
        else:
            self._swap_out(seq_group, blocks_to_swap_out)
        return preemption_mode

    def _swap_in(self, seq_group: SequenceGroup,
                 blocks_to_swap_in: Dict[int, int]) -> None:
        blocks_to_swap_in.update(self.block_manager.swap_in(seq_group))
        for seq in seq_group.get_seqs(status=SequenceStatus.SWAPPED):
            seq.status = SequenceStatus.RUNNING

    def _swap_out(self, seq_group: SequenceGroup,
                  blocks_to_swap_out: Dict[int, int]) -> None:
        if not self.block_manager.can_swap_out(seq_group):
            # Swap space is sized at engine start to absorb preemptions;
            # hitting this means the configuration is inconsistent.
            raise RuntimeError(
                "Out of host swap space; increase swap_space_gb.")
        blocks_to_swap_out.update(self.block_manager.swap_out(seq_group))
        for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
            seq.status = SequenceStatus.SWAPPED

    # ---------------------------------------------------------- heuristics

    def _passed_delay(self, now: float) -> bool:
        """Hold new prompts briefly so arrivals batch into one prefill
        (reference: scheduler.py:1140). The wait scales with the last
        prefill's latency via delay_factor."""
        if self.prev_prompt:
            self.last_prompt_latency = now - self.prev_time
        self.prev_time, self.prev_prompt = now, False
        if self.scheduler_config.delay_factor <= 0 or not self.waiting:
            return True
        oldest_arrival = min(g.metrics.arrival_time for g in self.waiting)
        return (not self.running
                or (now - oldest_arrival) >
                self.scheduler_config.delay_factor *
                self.last_prompt_latency)

    def _prompt_limit(self, seq_group: SequenceGroup) -> int:
        if self.scheduler_config.enable_chunked_prefill:
            limit = self.scheduler_config.max_model_len
        else:
            limit = min(self.scheduler_config.max_model_len,
                        self.scheduler_config.max_num_batched_tokens)
        # A truncate_prompt_tokens request may arrive longer than the
        # limit; it is clipped downstream, so admit it.
        params = seq_group.sampling_params
        if params and params.truncate_prompt_tokens:
            limit = max(limit, params.truncate_prompt_tokens)
        return limit

    # Back-compat alias (reference name, used by subclasses/tests).
    def _get_prompt_limit(self, seq_group: SequenceGroup) -> int:
        return self._prompt_limit(seq_group)

    def _lookahead_slots(self, is_prefill: bool) -> int:
        """KV slots to reserve beyond the sampled token (speculative /
        multi-step decode); prefill steps never need them."""
        return (0 if is_prefill
                else self.scheduler_config.num_lookahead_slots)

    def _get_num_lookahead_slots(self, is_prefill: bool) -> int:
        return self._lookahead_slots(is_prefill)

    def _tokens_this_step(self, seq_group: SequenceGroup,
                          status: SequenceStatus, chunking: bool,
                          budget: SchedulingBudget) -> int:
        """Uncomputed tokens this group would contribute to the batch.
        Under chunking, single-seq prefills clip to the leftover budget
        rounded DOWN to a whole number of KV blocks — the fused Pallas
        cache write emits whole-block DMAs, so chunks must start and
        end on block boundaries (ops/pallas/paged_attention.py)."""
        seqs = seq_group.get_seqs(status=status)
        total = sum(seq.get_num_new_tokens() for seq in seqs)
        if chunking and len(seqs) == 1:
            room = budget.remaining_token_budget()
            if room < total:
                block = self.cache_config.block_size
                total = (room // block) * block
        return total

    # Back-compat alias (reference name).
    def _get_num_new_tokens(self, seq_group: SequenceGroup,
                            status: SequenceStatus, enable_chunking: bool,
                            budget: SchedulingBudget) -> int:
        return self._tokens_this_step(seq_group, status, enable_chunking,
                                      budget)
