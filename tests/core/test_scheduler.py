"""Scheduler unit tests (reference: tests/core/test_scheduler.py:42-750)."""
import time
from typing import List

from vllm_legacy_tpu.config import CacheConfig, SchedulerConfig
from vllm_legacy_tpu.core.interfaces import AllocStatus
from vllm_legacy_tpu.core.scheduler import Scheduler, SchedulingBudget
from vllm_legacy_tpu.sampling_params import SamplingParams
from vllm_legacy_tpu.sequence import Logprob, SequenceGroup, SequenceStatus

from .utils import create_dummy_prompt


def make_scheduler(max_num_seqs=64,
                   max_num_batched_tokens=None,
                   max_model_len=1024,
                   num_gpu_blocks=16,
                   num_cpu_blocks=8,
                   block_size=4,
                   enable_chunked_prefill=False,
                   enable_prefix_caching=False,
                   delay_factor=0.0) -> Scheduler:
    if max_num_batched_tokens is not None:
        max_num_seqs = min(max_num_seqs, max_num_batched_tokens)
    scheduler_config = SchedulerConfig(
        max_num_batched_tokens=max_num_batched_tokens,
        max_num_seqs=max_num_seqs,
        max_model_len=max_model_len,
        enable_chunked_prefill=enable_chunked_prefill,
        delay_factor=delay_factor,
    )
    cache_config = CacheConfig(block_size=block_size,
                               hbm_utilization=0.9,
                               swap_space_gb=1,
                               enable_prefix_caching=enable_prefix_caching)
    cache_config.num_tpu_blocks = num_gpu_blocks
    cache_config.num_cpu_blocks = num_cpu_blocks
    return Scheduler(scheduler_config, cache_config, None)


def append_new_token(seq_group: SequenceGroup, token_id: int):
    for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
        seq.append_token_id(token_id, {token_id: Logprob(0.0)})


def schedule_and_update_computed_tokens(scheduler: Scheduler):
    metas, out = scheduler.schedule()
    for s in out.scheduled_seq_groups:
        s.seq_group.update_num_computed_tokens(s.token_chunk_size)
    return metas, out


def test_add_seq_group():
    scheduler = make_scheduler()
    for i in range(4):
        _, seq_group = create_dummy_prompt(str(i), 4, block_size=4)
        scheduler.add_seq_group(seq_group)
        assert scheduler.get_num_unfinished_seq_groups() == i + 1


def test_abort():
    scheduler = make_scheduler()
    for i in range(4):
        _, seq_group = create_dummy_prompt(str(i), 4, block_size=4)
        scheduler.add_seq_group(seq_group)
    scheduler.abort_seq_group("1")
    scheduler.abort_seq_group("3")
    assert scheduler.get_num_unfinished_seq_groups() == 2


def test_scheduler_schedules_prefills_first():
    scheduler = make_scheduler(block_size=4, num_gpu_blocks=16)
    _, group_a = create_dummy_prompt("a", 8, block_size=4)
    scheduler.add_seq_group(group_a)
    metas, out = schedule_and_update_computed_tokens(scheduler)
    assert out.num_prefill_groups == 1
    assert len(metas) == 1
    assert metas[0].is_prompt
    assert out.num_batched_tokens == 8
    # Now it decodes.
    append_new_token(group_a, 100)
    metas, out = schedule_and_update_computed_tokens(scheduler)
    assert out.num_prefill_groups == 0
    assert len(metas) == 1
    assert not metas[0].is_prompt
    assert out.num_batched_tokens == 1


def test_scheduler_batches_multiple_prefills():
    scheduler = make_scheduler(block_size=4,
                               num_gpu_blocks=64,
                               max_num_batched_tokens=64,
                               max_model_len=64)
    groups = []
    for i in range(3):
        _, g = create_dummy_prompt(str(i), 8, block_size=4)
        scheduler.add_seq_group(g)
        groups.append(g)
    metas, out = schedule_and_update_computed_tokens(scheduler)
    assert out.num_prefill_groups == 3
    assert out.num_batched_tokens == 24


def test_token_budget_defers_prefill():
    scheduler = make_scheduler(block_size=4,
                               num_gpu_blocks=64,
                               max_num_batched_tokens=16,
                               max_model_len=16)
    _, g1 = create_dummy_prompt("1", 12, block_size=4)
    _, g2 = create_dummy_prompt("2", 12, block_size=4)
    scheduler.add_seq_group(g1)
    scheduler.add_seq_group(g2)
    metas, out = schedule_and_update_computed_tokens(scheduler)
    # Only the first prompt fits within the 16-token budget.
    assert out.num_prefill_groups == 1
    assert metas[0].request_id == "1"
    assert len(scheduler.waiting) == 1


def test_seq_budget_limit():
    scheduler = make_scheduler(block_size=4,
                               num_gpu_blocks=64,
                               max_num_seqs=2,
                               max_num_batched_tokens=256,
                               max_model_len=64)
    for i in range(4):
        _, g = create_dummy_prompt(str(i), 4, block_size=4)
        scheduler.add_seq_group(g)
    metas, out = schedule_and_update_computed_tokens(scheduler)
    assert len(metas) == 2
    assert len(scheduler.waiting) == 2


def test_prompt_exceeding_limit_is_ignored():
    scheduler = make_scheduler(block_size=4,
                               num_gpu_blocks=64,
                               max_num_batched_tokens=16,
                               max_model_len=16)
    _, g = create_dummy_prompt("big", 32, block_size=4)
    scheduler.add_seq_group(g)
    metas, out = schedule_and_update_computed_tokens(scheduler)
    assert len(out.ignored_seq_groups) == 1
    assert g.get_seqs()[0].status == SequenceStatus.FINISHED_IGNORED
    assert len(metas) == 0


def test_preemption_by_recompute_when_oom():
    # 8 blocks of 4 tokens = 32 token slots.
    scheduler = make_scheduler(block_size=4,
                               num_gpu_blocks=8,
                               num_cpu_blocks=8,
                               max_num_batched_tokens=64,
                               max_model_len=64)
    # Two prompts of 16 tokens each fill all 8 blocks exactly.
    _, g1 = create_dummy_prompt("1", 16, block_size=4)
    _, g2 = create_dummy_prompt("2", 16, block_size=4)
    scheduler.add_seq_group(g1)
    scheduler.add_seq_group(g2)
    _, out = schedule_and_update_computed_tokens(scheduler)
    assert out.num_prefill_groups == 2
    # Decode step: both need one new block; none are free → the
    # lower-priority group (g2, arrived later) is preempted by recompute.
    append_new_token(g1, 100)
    append_new_token(g2, 100)
    metas, out = schedule_and_update_computed_tokens(scheduler)
    assert out.preempted == 1
    assert len(metas) == 1
    assert metas[0].request_id == "1"
    # g2 went back to waiting (recompute).
    assert len(scheduler.waiting) == 1
    assert g2.get_seqs()[0].status == SequenceStatus.WAITING
    assert g2.get_seqs()[0].data.get_num_computed_tokens() == 0


def test_preemption_by_swap_multi_seq():
    scheduler = make_scheduler(block_size=4,
                               num_gpu_blocks=8,
                               num_cpu_blocks=8,
                               max_num_batched_tokens=64,
                               max_model_len=64)
    _, g1 = create_dummy_prompt("1", 16, block_size=4)
    # best_of=2 → swap-mode preemption.
    _, g2 = create_dummy_prompt("2", 16, block_size=4, best_of=2)
    scheduler.add_seq_group(g1)
    scheduler.add_seq_group(g2)
    _, out = schedule_and_update_computed_tokens(scheduler)
    append_new_token(g1, 100)
    append_new_token(g2, 100)
    metas, out = schedule_and_update_computed_tokens(scheduler)
    assert out.preempted == 1
    assert out.blocks_to_swap_out
    assert g2.get_seqs()[0].status == SequenceStatus.SWAPPED
    assert len(scheduler.swapped) == 1
    # Once g1 finishes, g2 swaps back in.
    for seq in g1.get_seqs():
        seq.status = SequenceStatus.FINISHED_STOPPED
    scheduler.free_finished_seq_groups()
    scheduler.block_manager.free(g1.get_seqs()[0])
    metas, out = schedule_and_update_computed_tokens(scheduler)
    assert out.blocks_to_swap_in
    assert metas[0].request_id == "2"


def test_chunked_prefill_splits_prompt():
    scheduler = make_scheduler(block_size=4,
                               num_gpu_blocks=64,
                               max_num_batched_tokens=16,
                               max_model_len=128,
                               enable_chunked_prefill=True)
    _, g = create_dummy_prompt("1", 48, block_size=4)
    scheduler.add_seq_group(g)
    # First chunk: 16 tokens.
    metas, out = schedule_and_update_computed_tokens(scheduler)
    assert out.num_prefill_groups == 1
    assert metas[0].token_chunk_size == 16
    assert not metas[0].do_sample
    # Second chunk.
    metas, out = schedule_and_update_computed_tokens(scheduler)
    assert metas[0].token_chunk_size == 16
    assert not metas[0].do_sample
    # Third (final) chunk: samples.
    metas, out = schedule_and_update_computed_tokens(scheduler)
    assert metas[0].token_chunk_size == 16
    assert metas[0].do_sample


def test_chunked_prefill_mixes_decode_and_prefill():
    scheduler = make_scheduler(block_size=4,
                               num_gpu_blocks=64,
                               max_num_batched_tokens=16,
                               max_model_len=128,
                               enable_chunked_prefill=True)
    _, g1 = create_dummy_prompt("1", 8, block_size=4)
    scheduler.add_seq_group(g1)
    metas, out = schedule_and_update_computed_tokens(scheduler)
    append_new_token(g1, 100)
    # Add a long prompt; decode of g1 is scheduled first, prefill chunk
    # fills the remaining 15-token budget.
    _, g2 = create_dummy_prompt("2", 30, block_size=4)
    scheduler.add_seq_group(g2)
    metas, out = schedule_and_update_computed_tokens(scheduler)
    assert len(metas) == 2
    assert out.num_prefill_groups == 1
    # Prefill-first layout in the metadata list. Chunk sizes are rounded
    # down to block multiples (fused whole-block cache writes): the
    # 15-token leftover budget becomes a 12-token chunk at block_size 4.
    assert metas[0].request_id == "2"
    assert metas[0].token_chunk_size == 12
    assert metas[1].request_id == "1"
    assert metas[1].token_chunk_size == 1
    assert out.num_batched_tokens == 13


def test_scheduling_budget():
    budget = SchedulingBudget(token_budget=8, max_num_seqs=2)
    assert budget.can_schedule(num_new_tokens=8, num_new_seqs=2)
    assert not budget.can_schedule(num_new_tokens=9, num_new_seqs=2)
    assert not budget.can_schedule(num_new_tokens=8, num_new_seqs=3)
    budget.add_num_batched_tokens("1", 6)
    budget.add_num_seqs("1", 1)
    assert budget.remaining_token_budget() == 2
    # Idempotent per request id.
    budget.add_num_batched_tokens("1", 6)
    assert budget.remaining_token_budget() == 2
    budget.subtract_num_batched_tokens("1", 6)
    assert budget.remaining_token_budget() == 8


def test_fork_seq_shares_blocks():
    scheduler = make_scheduler(block_size=4, num_gpu_blocks=16)
    prompt, group = create_dummy_prompt("1", 8, block_size=4)
    scheduler.add_seq_group(group)
    schedule_and_update_computed_tokens(scheduler)
    child = prompt.fork(1000)
    scheduler.fork_seq(prompt, child)
    assert (scheduler.block_manager.get_block_table(prompt) ==
            scheduler.block_manager.get_block_table(child))


def test_reserve_admission_prevents_preemption():
    """admission_control="reserve": prompts are admitted only when the
    pool can hold them at FULL length (prompt + max_tokens), so decode
    growth never preempts; "optimistic" admits both and must preempt."""
    from vllm_legacy_tpu.sampling_params import SamplingParams

    def build(mode):
        scheduler_config = SchedulerConfig(
            max_num_batched_tokens=64,
            max_num_seqs=8,
            max_model_len=64,
            admission_control=mode,
        )
        cache_config = CacheConfig(block_size=4, hbm_utilization=0.9,
                                   swap_space_gb=1)
        cache_config.num_tpu_blocks = 8  # 32 token slots
        cache_config.num_cpu_blocks = 8
        return Scheduler(scheduler_config, cache_config, None)

    def add(scheduler, rid):
        # 16-token prompt + max_tokens=16 -> full length 32 = the pool
        _, g = create_dummy_prompt(rid, 16, block_size=4)
        g.sampling_params = SamplingParams(max_tokens=16,
                                           ignore_eos=True)
        scheduler.add_seq_group(g)
        return g

    res = build("reserve")
    g1, g2 = add(res, "1"), add(res, "2")
    _, out = schedule_and_update_computed_tokens(res)
    # only g1 fits at full length; g2 held in waiting (not ignored)
    assert [s.seq_group.request_id for s in out.scheduled_seq_groups] \
        == ["1"]
    assert len(res.waiting) == 1 and not out.ignored_seq_groups
    # decode g1 to the end of the pool: no preemption ever
    for _ in range(4):
        append_new_token(g1, 100)
        _, out = schedule_and_update_computed_tokens(res)
        assert out.preempted == 0
    # g1 finishes -> its reservation frees -> g2 admitted
    for seq in g1.get_seqs():
        seq.status = SequenceStatus.FINISHED_STOPPED
    res.free_finished_seq_groups()
    res.block_manager.free(g1.get_seqs()[0])
    _, out = schedule_and_update_computed_tokens(res)
    assert [s.seq_group.request_id for s in out.scheduled_seq_groups] \
        == ["2"]

    opt = build("optimistic")
    o1, o2 = add(opt, "1"), add(opt, "2")
    _, out = schedule_and_update_computed_tokens(opt)
    assert out.num_prefill_groups == 2  # both admitted...
    append_new_token(o1, 100)
    append_new_token(o2, 100)
    _, out = schedule_and_update_computed_tokens(opt)
    assert out.preempted == 1  # ...and growth preempts


def test_reserve_admission_under_chunked_policy():
    """Regression: the chunked policy runs the keep-running pass FIRST,
    which pops scheduled groups out of self.running before the waiting
    pass computes its reservation sum — the sum must also count groups
    already moved into the step plan, or reserve over-admits and decode
    growth preempts anyway."""
    from vllm_legacy_tpu.sampling_params import SamplingParams

    scheduler_config = SchedulerConfig(
        max_num_batched_tokens=256,
        max_num_seqs=16,
        max_model_len=80,
        enable_chunked_prefill=True,
        admission_control="reserve",
    )
    cache_config = CacheConfig(block_size=16, hbm_utilization=0.9,
                               swap_space_gb=1)
    cache_config.num_tpu_blocks = 30  # 6 x 4-block reservations max
    cache_config.num_cpu_blocks = 8
    scheduler = Scheduler(scheduler_config, cache_config, None)

    groups = []
    for i in range(16):
        _, g = create_dummy_prompt(str(i), 32, block_size=16)
        g.sampling_params = SamplingParams(max_tokens=32, ignore_eos=True)
        scheduler.add_seq_group(g)
        groups.append(g)
    need = scheduler._full_length_blocks(groups[0])
    cap = 30 // need

    admitted = set()
    for _ in range(6):  # several steps: admissions happen incrementally
        _, out = schedule_and_update_computed_tokens(scheduler)
        for s in out.scheduled_seq_groups:
            admitted.add(s.seq_group.request_id)
        append_new_token_to_running(scheduler)
        assert len(scheduler.running) <= cap, (
            f"over-admitted: {len(scheduler.running)} running > cap {cap}")
        assert out.preempted == 0


def append_new_token_to_running(scheduler):
    for g in scheduler.running:
        for seq in g.get_seqs(status=SequenceStatus.RUNNING):
            if not seq.is_prefill():
                seq.append_token_id(100, {100: Logprob(0.0)})


def test_steps_to_first_free_horizon():
    """A pure-decode step reports the soonest max_tokens finish so the
    runner can bound its multi-step burst (a waiting request refused
    admission can only progress when a running decode frees capacity)."""
    scheduler = make_scheduler(max_num_seqs=2, num_gpu_blocks=16)
    for i, max_toks in enumerate((7, 50)):
        _, group = create_dummy_prompt(str(i), 4, block_size=4)
        group.sampling_params = SamplingParams(max_tokens=max_toks)
        scheduler.add_seq_group(group)
    # Prefill both.
    _, out = schedule_and_update_computed_tokens(scheduler)
    assert out.num_prefill_groups == 2
    for s in out.scheduled_seq_groups:
        append_new_token(s.seq_group, 100)
    # Third request sits waiting (seat-limited).
    _, blocked = create_dummy_prompt("2", 4, block_size=4)
    scheduler.add_seq_group(blocked)
    # Decode step: horizon = min remaining = 7 - 1 generated = 6.
    _, out = schedule_and_update_computed_tokens(scheduler)
    assert out.num_prefill_groups == 0
    assert out.waiting_queue_size == 1
    assert out.steps_to_first_free == 6


def test_burst_len_ladder():
    """Runner burst quantization: full burst when nothing can free
    capacity mid-burst; otherwise the largest {4,8,16,...} <= horizon."""
    from vllm_legacy_tpu.worker.model_runner import ModelRunner
    bl = ModelRunner._burst_len
    assert bl(32, False, 5) == 32          # no pressure: full burst
    assert bl(32, True, 0) == 4            # unknown horizon: fail closed
    assert bl(32, True, 200) == 32         # nothing frees mid-burst
    assert bl(32, True, 31) == 16
    assert bl(32, True, 11) == 8
    assert bl(32, True, 5) == 4
    assert bl(32, True, 1) == 4            # floor of the ladder
    assert bl(4, True, 1) == 4             # k<=4 never shortened
    assert bl(8, True, 200) == 8
