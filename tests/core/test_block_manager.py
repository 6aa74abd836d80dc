"""Block-manager unit tests (reference: tests/core/test_block_manager.py)."""
import time

import pytest

from vllm_legacy_tpu.block import PhysicalTokenBlock
from vllm_legacy_tpu.core.block_manager import (BlockSpaceManagerV1,
                                                CachedBlockAllocator,
                                                UncachedBlockAllocator)
from vllm_legacy_tpu.core.interfaces import AllocStatus
from vllm_legacy_tpu.sequence import Logprob, SequenceStatus
from vllm_legacy_tpu.utils import Device

from .utils import create_dummy_prompt


def test_uncached_block_allocator_allocate():
    block_size, num_cpu_blocks = 4, 4
    cpu_allocator = UncachedBlockAllocator(Device.CPU, block_size,
                                           num_cpu_blocks)
    # Allocate all available cpu blocks.
    num_free = num_cpu_blocks
    assert cpu_allocator.get_num_free_blocks() == num_free
    seen = set()
    for _ in range(num_cpu_blocks):
        block = cpu_allocator.allocate()
        num_free -= 1
        assert block.block_number not in seen
        seen.add(block.block_number)
        assert cpu_allocator.get_num_free_blocks() == num_free
    with pytest.raises(ValueError):
        cpu_allocator.allocate()


def test_uncached_block_allocator_free():
    block_size, num_cpu_blocks = 4, 4
    cpu_allocator = UncachedBlockAllocator(Device.CPU, block_size,
                                           num_cpu_blocks)
    blocks = [cpu_allocator.allocate() for _ in range(num_cpu_blocks)]
    assert cpu_allocator.get_num_free_blocks() == 0
    for i, block in enumerate(blocks):
        cpu_allocator.free(block)
        assert cpu_allocator.get_num_free_blocks() == i + 1
    # Double free raises.
    with pytest.raises(ValueError):
        cpu_allocator.free(blocks[0])


def test_cached_block_allocator_reuse_by_hash():
    allocator = CachedBlockAllocator(Device.TPU, 16, 4)
    b1 = allocator.allocate(block_hash=123, num_hashed_tokens=16)
    b2 = allocator.allocate(block_hash=123, num_hashed_tokens=16)
    assert b1 is b2
    assert b1.ref_count == 2
    # Only one physical block was consumed.
    assert allocator.get_num_free_blocks() == 3


def test_cached_block_allocator_eviction_lru():
    allocator = CachedBlockAllocator(Device.TPU, 16, 2)
    b1 = allocator.allocate(block_hash=1, num_hashed_tokens=16)
    b2 = allocator.allocate(block_hash=2, num_hashed_tokens=32)
    b1.last_accessed = 1.0
    b2.last_accessed = 2.0
    allocator.free(b1)
    allocator.free(b2)
    # Capacity full; next allocate evicts LRU (b1).
    b3 = allocator.allocate(block_hash=3, num_hashed_tokens=16)
    assert b3.block_number == b1.block_number
    # Hash 2 is still cached and reusable.
    b2_again = allocator.allocate(block_hash=2, num_hashed_tokens=32)
    assert b2_again.block_number == b2.block_number


def test_allocate():
    block_size, num_cpu_blocks, num_gpu_blocks = 4, 4, 4
    block_manager = BlockSpaceManagerV1(block_size,
                                        num_gpu_blocks,
                                        num_cpu_blocks,
                                        watermark=0)
    # Allocate same seq group on all available gpu blocks.
    for i in range(num_gpu_blocks):
        _, seq_group = create_dummy_prompt(str(i), block_size)
        assert block_manager.can_allocate(seq_group) == AllocStatus.OK
        block_manager.allocate(seq_group)
    assert block_manager.can_allocate(seq_group) != AllocStatus.OK

    # With watermark, one block is held back.
    block_manager = BlockSpaceManagerV1(block_size,
                                        num_gpu_blocks,
                                        num_cpu_blocks,
                                        watermark=1 / num_gpu_blocks)
    for i in range(num_gpu_blocks - 1):
        _, seq_group = create_dummy_prompt(str(i), block_size)
        assert block_manager.can_allocate(seq_group) == AllocStatus.OK
        block_manager.allocate(seq_group)
    assert block_manager.can_allocate(seq_group) != AllocStatus.OK


def test_append_slot_single_seq():
    block_size, num_cpu_blocks, num_gpu_blocks = 4, 4, 4
    block_manager = BlockSpaceManagerV1(block_size,
                                        num_gpu_blocks,
                                        num_cpu_blocks,
                                        watermark=0)
    prompt, seq_group = create_dummy_prompt("1", block_size)
    block_manager.allocate(seq_group)

    # Fill the last block: no new block allocated.
    free_blocks = block_manager.get_num_free_gpu_blocks()
    prompt.status = SequenceStatus.RUNNING
    # Prompt of block_size tokens fills the block exactly; appending one
    # token rolls to a new logical block.
    prompt.append_token_id(100, {100: Logprob(0.0)})
    cows = block_manager.append_slots(prompt)
    assert not cows
    assert block_manager.get_num_free_gpu_blocks() == free_blocks - 1


def test_append_slot_cow():
    block_size, num_cpu_blocks, num_gpu_blocks = 4, 4, 4
    block_manager = BlockSpaceManagerV1(block_size,
                                        num_gpu_blocks,
                                        num_cpu_blocks,
                                        watermark=0)
    prompt, seq_group = create_dummy_prompt("1",
                                            prompt_length=block_size - 1,
                                            block_size=block_size)
    block_manager.allocate(seq_group)
    prompt.status = SequenceStatus.RUNNING

    # Fork: child shares the (partially filled) last block.
    child = prompt.fork(2)
    child.append_token_id(100, {100: Logprob(0.0)})
    block_manager.fork(prompt, child)
    free_blocks = block_manager.get_num_free_gpu_blocks()
    cows = block_manager.append_slots(child)
    assert cows, "shared last block must copy-on-write"
    for src, dsts in cows.items():
        assert src not in dsts
    assert block_manager.get_num_free_gpu_blocks() == free_blocks - 1


def test_fork():
    block_size, num_cpu_blocks, num_gpu_blocks = 4, 4, 4
    block_manager = BlockSpaceManagerV1(block_size,
                                        num_gpu_blocks,
                                        num_cpu_blocks,
                                        watermark=0)
    prompt, seq_group = create_dummy_prompt("1",
                                            block_size - 1,
                                            block_size=block_size)
    block_manager.allocate(seq_group)
    child = prompt.fork(2)
    block_manager.fork(prompt, child)
    assert (block_manager.get_block_table(prompt) ==
            block_manager.get_block_table(child))
    # Append a token to the child: its table must CoW-diverge.
    child.status = SequenceStatus.RUNNING
    child.append_token_id(100, {100: Logprob(0.0)})
    block_manager.append_slots(child)
    assert (block_manager.get_block_table(prompt) !=
            block_manager.get_block_table(child))


def test_swap():
    block_size, num_cpu_blocks, num_gpu_blocks = 4, 4, 4
    block_manager = BlockSpaceManagerV1(block_size,
                                        num_gpu_blocks,
                                        num_cpu_blocks,
                                        watermark=0)
    prompt, seq_group = create_dummy_prompt("1", prompt_length=block_size -
                                            1, block_size=block_size)
    prompt.status = SequenceStatus.WAITING
    block_manager.allocate(seq_group)
    prompt.status = SequenceStatus.RUNNING

    gpu_table_before = block_manager.get_block_table(prompt)

    # Swap out.
    assert block_manager.can_swap_out(seq_group)
    before_cpu_free = block_manager.get_num_free_cpu_blocks()
    before_gpu_free = block_manager.get_num_free_gpu_blocks()
    mapping = block_manager.swap_out(seq_group)
    assert list(mapping.keys()) == gpu_table_before
    prompt.status = SequenceStatus.SWAPPED
    assert block_manager.get_num_free_cpu_blocks() == before_cpu_free - 1
    assert block_manager.get_num_free_gpu_blocks() == before_gpu_free + 1

    # Swap back in.
    assert block_manager.can_swap_in(seq_group) == AllocStatus.OK
    mapping = block_manager.swap_in(seq_group)
    prompt.status = SequenceStatus.RUNNING
    assert block_manager.get_num_free_cpu_blocks() == before_cpu_free
    assert block_manager.get_num_free_gpu_blocks() == before_gpu_free


def test_free():
    block_size, num_cpu_blocks, num_gpu_blocks = 4, 4, 4
    block_manager = BlockSpaceManagerV1(block_size,
                                        num_gpu_blocks,
                                        num_cpu_blocks,
                                        watermark=0)
    prompt, seq_group = create_dummy_prompt("1", block_size)
    block_manager.allocate(seq_group)
    prompt_blocks = len(block_manager.get_block_table(prompt))
    before_free = block_manager.get_num_free_gpu_blocks()
    block_manager.free(prompt)
    assert (block_manager.get_num_free_gpu_blocks() ==
            before_free + prompt_blocks)
    # Double-free is a silent no-op, and the table is gone.
    block_manager.free(prompt)
    with pytest.raises(KeyError):
        block_manager.get_block_table(prompt)


def test_reset():
    block_size, num_cpu_blocks, num_gpu_blocks = 4, 4, 4
    block_manager = BlockSpaceManagerV1(block_size,
                                        num_gpu_blocks,
                                        num_cpu_blocks,
                                        watermark=0)
    for i in range(num_gpu_blocks):
        _, seq_group = create_dummy_prompt(str(i), block_size)
        block_manager.allocate(seq_group)
    assert block_manager.get_num_free_gpu_blocks() == 0
    block_manager.reset()
    assert block_manager.get_num_free_gpu_blocks() == num_gpu_blocks


def test_prefix_cache_hit_shares_blocks():
    """Two sequences with the same prompt share full blocks."""
    block_size = 4
    block_manager = BlockSpaceManagerV1(block_size,
                                        num_gpu_blocks=8,
                                        num_cpu_blocks=0,
                                        watermark=0,
                                        enable_caching=True)
    # Prompt of exactly 2 full blocks.
    prompt1, group1 = create_dummy_prompt("1",
                                          prompt_length=2 * block_size,
                                          block_size=block_size)
    block_manager.allocate(group1)
    free_after_first = block_manager.get_num_free_gpu_blocks()
    assert free_after_first == 8 - 2

    prompt2, group2 = create_dummy_prompt("2",
                                          prompt_length=2 * block_size,
                                          block_size=block_size)
    prompt2.seq_id = 100
    block_manager.allocate(group2)
    # Same content → same physical blocks, no new allocation.
    assert block_manager.get_num_free_gpu_blocks() == free_after_first
    assert (block_manager.get_block_table(prompt1) ==
            block_manager.get_block_table(prompt2))


def test_computed_blocks_tracking():
    block_size = 4
    block_manager = BlockSpaceManagerV1(block_size,
                                        num_gpu_blocks=8,
                                        num_cpu_blocks=0,
                                        watermark=0,
                                        enable_caching=True)
    prompt, group = create_dummy_prompt("1",
                                        prompt_length=3 * block_size,
                                        block_size=block_size)
    block_manager.allocate(group)
    prompt.status = SequenceStatus.RUNNING
    # Nothing computed yet.
    assert block_manager.get_common_computed_block_ids([prompt]) == []
    block_manager.mark_blocks_as_computed(group)
    # All full blocks except the last are reported (reference excludes the
    # final block so at least one token is always computed).
    ids = block_manager.get_common_computed_block_ids([prompt])
    table = block_manager.get_block_table(prompt)
    assert ids == table[:-1]


def test_sliding_window_ring():
    block_size = 4
    sliding_window = 8  # 2 blocks
    block_manager = BlockSpaceManagerV1(block_size,
                                        num_gpu_blocks=8,
                                        num_cpu_blocks=0,
                                        watermark=0,
                                        sliding_window=sliding_window)
    prompt, group = create_dummy_prompt("1",
                                        prompt_length=4 * block_size,
                                        block_size=block_size)
    block_manager.allocate(group)
    table = block_manager.get_block_table(prompt)
    # 4 logical blocks but only 2 physical: ring reuse.
    assert len(table) == 4
    assert len(set(table)) == 2
    assert table[0] == table[2]
    assert table[1] == table[3]
