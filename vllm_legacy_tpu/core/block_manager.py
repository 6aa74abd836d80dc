"""Paged KV-cache block manager.

Behavioral parity with the reference's BlockSpaceManagerV1
(vllm/core/block_manager_v1.py:213): refcounted physical blocks,
prefix-caching allocator with content-hash reuse + LRU eviction (:64),
copy-on-write on a shared last block (:426-470), sliding-window block ring
(:305-307), per-block TPU↔host swap maps (:544-597), watermark to avoid
allocation thrashing (:239-244), and computed-block tracking for
prefix-cache hit trimming (:666-706).

The physical block numbers index directly into the paged KV arrays that
live in TPU HBM (see worker/cache_engine.py); the "CPU" device is the
host-DRAM swap tier.
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from itertools import count, takewhile
from os.path import commonprefix
from typing import Dict, List, Optional, Set

from vllm_legacy_tpu.block import BlockTable, PhysicalTokenBlock
from vllm_legacy_tpu.core.evictor import (EvictionPolicy, Evictor,
                                          make_evictor)
from vllm_legacy_tpu.core.interfaces import AllocStatus, BlockSpaceManager
from vllm_legacy_tpu.logger import init_logger
from vllm_legacy_tpu.sequence import Sequence, SequenceGroup, SequenceStatus
from vllm_legacy_tpu.utils import Device, cdiv

logger = init_logger(__name__)


class BlockAllocatorBase(ABC):

    @abstractmethod
    def allocate(self,
                 block_hash: Optional[int] = None,
                 num_hashed_tokens: int = 0) -> PhysicalTokenBlock:
        ...

    @abstractmethod
    def free(self, block: PhysicalTokenBlock) -> None:
        ...

    @abstractmethod
    def get_num_free_blocks(self) -> int:
        ...

    @abstractmethod
    def get_num_total_blocks(self) -> int:
        ...

    @abstractmethod
    def contains_block(self, block_hash: int) -> bool:
        ...

    @abstractmethod
    def update_hash(self, block_hash: int,
                    block: PhysicalTokenBlock) -> None:
        ...


class CachedBlockAllocator(BlockAllocatorBase):
    """Content-hash-addressed allocator with LRU eviction for prefix
    caching (reference: block_manager_v1.py:64)."""

    def __init__(self,
                 device: Device,
                 block_size: int,
                 num_blocks: int,
                 eviction_policy: EvictionPolicy = EvictionPolicy.LRU):
        self.device = device
        self.block_size = block_size
        self.num_blocks = num_blocks
        self.current_num_blocks = 0
        self.cached_blocks: Dict[int, PhysicalTokenBlock] = {}
        self.evictor: Evictor = make_evictor(eviction_policy)
        self.default_hash_ctr = count(start=-1, step=-1)

    def allocate_block(self, block_hash: int,
                       num_hashed_tokens: int) -> PhysicalTokenBlock:
        if self.current_num_blocks == self.num_blocks:
            block = self.evictor.evict()
            block.block_hash = block_hash
            block.num_hashed_tokens = num_hashed_tokens
            return block
        block = PhysicalTokenBlock(device=self.device,
                                   block_number=self.current_num_blocks,
                                   block_size=self.block_size,
                                   block_hash=block_hash,
                                   num_hashed_tokens=num_hashed_tokens)
        self.current_num_blocks += 1
        return block

    def allocate(self,
                 block_hash: Optional[int] = None,
                 num_hashed_tokens: int = 0) -> PhysicalTokenBlock:
        if block_hash is None:
            # Mutable (not-yet-full) block: unique negative placeholder
            # hash; promoted to its content hash when it fills.
            block_hash = next(self.default_hash_ctr)
        if block_hash in self.evictor:
            assert block_hash not in self.cached_blocks
            block = self.evictor.remove(block_hash)
            assert block.ref_count == 0
            self.cached_blocks[block_hash] = block
        if block_hash not in self.cached_blocks:
            self.cached_blocks[block_hash] = self.allocate_block(
                block_hash, num_hashed_tokens)
        block = self.cached_blocks[block_hash]
        assert block.block_hash == block_hash
        block.ref_count += 1
        return block

    def free(self, block: PhysicalTokenBlock) -> None:
        if block.ref_count == 0:
            raise ValueError(f"Double free! {block} is already freed.")
        block.ref_count -= 1
        if block.ref_count == 0:
            assert block.block_hash not in self.evictor
            self.evictor.add(block)
            del self.cached_blocks[block.block_hash]

    def get_num_free_blocks(self) -> int:
        return (self.num_blocks - self.current_num_blocks +
                self.evictor.num_blocks)

    def get_num_total_blocks(self) -> int:
        return self.num_blocks

    def contains_block(self, block_hash: int) -> bool:
        return block_hash in self.cached_blocks or block_hash in self.evictor

    def update_hash(self, block_hash: int,
                    block: PhysicalTokenBlock) -> None:
        assert not self.contains_block(block_hash)
        old_hash = block.block_hash
        block.block_hash = block_hash
        del self.cached_blocks[old_hash]
        self.cached_blocks[block_hash] = block


class UncachedBlockAllocator(BlockAllocatorBase):
    """Simple free-list allocator (reference: block_manager_v1.py:154)."""

    def __init__(self, device: Device, block_size: int,
                 num_blocks: int) -> None:
        self.device = device
        self.block_size = block_size
        self.num_blocks = num_blocks
        self.free_blocks: List[PhysicalTokenBlock] = [
            PhysicalTokenBlock(device=device,
                               block_number=i,
                               block_size=block_size,
                               block_hash=-1,
                               num_hashed_tokens=0)
            for i in range(num_blocks)
        ]

    def allocate(self,
                 block_hash: Optional[int] = None,
                 num_hashed_tokens: int = 0) -> PhysicalTokenBlock:
        if not self.free_blocks:
            raise ValueError("Out of memory! No free blocks are available.")
        block = self.free_blocks.pop()
        block.ref_count = 1
        return block

    def free(self, block: PhysicalTokenBlock) -> None:
        if block.ref_count == 0:
            raise ValueError(f"Double free! {block} is already freed.")
        block.ref_count -= 1
        if block.ref_count == 0:
            self.free_blocks.append(block)

    def get_num_free_blocks(self) -> int:
        return len(self.free_blocks)

    def get_num_total_blocks(self) -> int:
        return self.num_blocks

    def contains_block(self, block_hash: int) -> bool:
        return False

    def update_hash(self, block_hash: int,
                    block: PhysicalTokenBlock) -> None:
        raise NotImplementedError(
            "Invalid codepath for uncached block allocator.")


class BlockSpaceManagerV1(BlockSpaceManager):
    """Maps sequences to physical KV blocks in device HBM / host swap."""

    def __init__(
        self,
        block_size: int,
        num_gpu_blocks: int,
        num_cpu_blocks: int,
        watermark: float = 0.01,
        sliding_window: Optional[int] = None,
        enable_caching: bool = False,
    ) -> None:
        self.block_size = block_size
        self.num_total_gpu_blocks = num_gpu_blocks
        self.num_total_cpu_blocks = num_cpu_blocks

        if enable_caching and sliding_window is not None:
            raise NotImplementedError(
                "Sliding window is not allowed with prefix caching enabled!")

        self.block_sliding_window: Optional[int] = None
        if sliding_window is not None:
            # Round up to keep all referenced tokens addressable.
            self.block_sliding_window = (
                (sliding_window + block_size - 1) // block_size)

        self.watermark = watermark
        assert watermark >= 0.0
        self.enable_caching = enable_caching
        self.watermark_blocks = int(watermark * num_gpu_blocks)

        if self.enable_caching:
            logger.info("Prefix caching is enabled.")
            self.gpu_allocator: BlockAllocatorBase = CachedBlockAllocator(
                Device.TPU, block_size, num_gpu_blocks)
            self.cpu_allocator: BlockAllocatorBase = CachedBlockAllocator(
                Device.CPU, block_size, num_cpu_blocks)
        else:
            self.gpu_allocator = UncachedBlockAllocator(
                Device.TPU, block_size, num_gpu_blocks)
            self.cpu_allocator = UncachedBlockAllocator(
                Device.CPU, block_size, num_cpu_blocks)
        # seq_id -> BlockTable
        self.block_tables: Dict[int, BlockTable] = {}

    # ------------------------------------------------------------ allocate

    def _get_seq_num_required_blocks(self, seq: Optional[Sequence]) -> int:
        return 0 if seq is None else len(seq.logical_token_blocks)

    def can_allocate(self, seq_group: SequenceGroup) -> AllocStatus:
        seq = seq_group.get_seqs(status=SequenceStatus.WAITING)[0]
        num_required_blocks = self._get_seq_num_required_blocks(seq)
        if self.block_sliding_window is not None:
            num_required_blocks = min(num_required_blocks,
                                      self.block_sliding_window)
        num_free_gpu_blocks = self.gpu_allocator.get_num_free_blocks()
        if (self.num_total_gpu_blocks - num_required_blocks <
                self.watermark_blocks):
            return AllocStatus.NEVER
        if num_free_gpu_blocks - num_required_blocks >= \
                self.watermark_blocks:
            return AllocStatus.OK
        return AllocStatus.LATER

    def allocate(self, seq_group: SequenceGroup) -> None:
        # All waiting seqs in a group share one prompt → one block table.
        wait_seqs = seq_group.get_seqs(status=SequenceStatus.WAITING)
        seq = wait_seqs[0]
        num_prompt_blocks = len(seq.logical_token_blocks)

        block_table = BlockTable()
        for logical_idx in range(num_prompt_blocks):
            if (self.block_sliding_window is not None
                    and logical_idx >= self.block_sliding_window):
                block = block_table[logical_idx % self.block_sliding_window]
                # Re-reference the ring block for this logical slot.
                block.ref_count += seq_group.num_seqs()
            elif self.enable_caching:
                block = self.gpu_allocator.allocate(
                    seq.hash_of_block(logical_idx),
                    seq.num_hashed_tokens_of_block(logical_idx))
                block.ref_count += seq_group.num_seqs() - 1
            else:
                block = self.gpu_allocator.allocate()
                block.ref_count = seq_group.num_seqs()
            block_table.append(block)

        for s in wait_seqs:
            self.block_tables[s.seq_id] = block_table.copy()

    # -------------------------------------------------------- append slots

    def can_append_slots(self, seq_group: SequenceGroup,
                         num_lookahead_slots: int = 0) -> bool:
        # Worst case: every running seq needs one new block plus blocks
        # covering the lookahead window (multi-step decode / spec decode
        # — capability the reference only has in block manager v2,
        # block_manager_v2.py:178-223).
        blocks_per_seq = 1 + cdiv(num_lookahead_slots, self.block_size)
        num_free = self.gpu_allocator.get_num_free_blocks()
        num_seqs = seq_group.num_seqs(status=SequenceStatus.RUNNING)
        return num_seqs * blocks_per_seq <= num_free

    def _promote_last_block(self, seq: Sequence,
                            last_block: PhysicalTokenBlock
                            ) -> PhysicalTokenBlock:
        assert self.enable_caching
        new_hash = seq.hash_of_block(len(seq.logical_token_blocks) - 1)
        if self.gpu_allocator.contains_block(new_hash):
            # Identical content already cached: dedupe onto it.
            self.gpu_allocator.free(last_block)
            return self.gpu_allocator.allocate(new_hash)
        self.gpu_allocator.update_hash(new_hash, last_block)
        return last_block

    def _is_last_block_full(self, seq: Sequence) -> bool:
        token_ids_len = seq.data.get_len()
        return token_ids_len > 0 and token_ids_len % seq.block_size == 0

    def _maybe_promote_last_block(
            self, seq: Sequence,
            last_block: PhysicalTokenBlock) -> PhysicalTokenBlock:
        if self._is_last_block_full(seq):
            return self._promote_last_block(seq, last_block)
        return last_block

    def _allocate_last_physical_block(self,
                                      seq: Sequence) -> PhysicalTokenBlock:
        if not self.enable_caching:
            return self.gpu_allocator.allocate()
        block_hash: Optional[int] = None
        n_blocks = len(seq.logical_token_blocks)
        if self._is_last_block_full(seq):
            block_hash = seq.hash_of_block(n_blocks - 1)
        num_hashed_tokens = seq.num_hashed_tokens_of_block(n_blocks - 1)
        new_block = self.gpu_allocator.allocate(block_hash,
                                                num_hashed_tokens)
        if block_hash is None:
            assert new_block.ref_count == 1
        return new_block

    def append_slots(self,
                     seq: Sequence,
                     num_lookahead_slots: int = 0) -> Dict[int, List[int]]:
        """Ensure physical capacity for the token just appended plus
        ``num_lookahead_slots`` future tokens (multi-step decode / spec
        decode). Returns {src_block: [dst_block]} copy-on-write
        instructions (reference: block_manager_v1.py:426-470; lookahead
        parity with block_manager_v2.py:178-223)."""
        logical_blocks = seq.logical_token_blocks
        block_table = self.block_tables[seq.seq_id]
        # Blocks needed to cover current tokens + the lookahead window.
        needed = len(logical_blocks) + cdiv(
            num_lookahead_slots -
            (len(logical_blocks) * self.block_size - seq.data.get_len()),
            self.block_size) if num_lookahead_slots else len(
                logical_blocks)
        needed = max(needed, len(logical_blocks))

        if len(block_table) < needed:
            if (self.block_sliding_window
                    and len(block_table) >= self.block_sliding_window):
                assert num_lookahead_slots == 0, (
                    "multi-step decode is not supported with sliding "
                    "window yet")
                # Ring reuse: oldest block cycles back in.
                block_table.append(
                    block_table[len(block_table) %
                                self.block_sliding_window])
                return {}
            while len(block_table) < needed:
                new_block = self._allocate_last_physical_block(seq)
                block_table.append(new_block)
            return {}

        # Appending into the existing last REAL block (lookahead blocks
        # past the logical tail are never shared).
        last_block = block_table[len(logical_blocks) - 1]
        assert last_block.device == Device.TPU
        if last_block.ref_count == 1:
            if self.enable_caching:
                maybe_new = self._maybe_promote_last_block(seq, last_block)
                block_table[len(logical_blocks) - 1] = maybe_new
            return {}
        # Shared last block → copy-on-write.
        new_block = self._allocate_last_physical_block(seq)
        block_table[len(logical_blocks) - 1] = new_block
        self.gpu_allocator.free(last_block)
        return {last_block.block_number: [new_block.block_number]}

    # ---------------------------------------------------------------- fork

    def fork(self, parent_seq: Sequence, child_seq: Sequence) -> None:
        if parent_seq.seq_id not in self.block_tables:
            return
        src_block_table = self.block_tables[parent_seq.seq_id]
        self.block_tables[child_seq.seq_id] = src_block_table.copy()
        # A sliding-window ring may repeat blocks; count each once.
        for block in set(src_block_table):
            block.ref_count += 1

    # ---------------------------------------------------------------- swap

    def _get_physical_blocks(
            self, seq_group: SequenceGroup) -> List[PhysicalTokenBlock]:
        blocks: Set[PhysicalTokenBlock] = set()
        for seq in seq_group.get_seqs():
            if seq.is_finished():
                continue
            if seq.seq_id in self.block_tables:
                blocks.update(self.block_tables[seq.seq_id])
        return list(blocks)

    def can_swap_in(self,
                    seq_group: SequenceGroup,
                    num_lookahead_slots: int = 0) -> AllocStatus:
        assert num_lookahead_slots == 0
        blocks = self._get_physical_blocks(seq_group)
        num_swapped_seqs = seq_group.num_seqs(status=SequenceStatus.SWAPPED)
        num_free_blocks = self.gpu_allocator.get_num_free_blocks()
        # Each swapped seq may also need one new block this step.
        num_required_blocks = len(blocks) + num_swapped_seqs
        if self.gpu_allocator.get_num_total_blocks() < num_required_blocks:
            return AllocStatus.NEVER
        if num_free_blocks - num_required_blocks >= self.watermark_blocks:
            return AllocStatus.OK
        return AllocStatus.LATER

    def swap_in(self,
                seq_group: SequenceGroup,
                num_lookahead_slots: int = 0) -> Dict[int, int]:
        assert num_lookahead_slots == 0
        mapping: Dict[PhysicalTokenBlock, PhysicalTokenBlock] = {}
        for seq in seq_group.get_seqs(status=SequenceStatus.SWAPPED):
            new_block_table = BlockTable()
            for cpu_block in self.block_tables[seq.seq_id]:
                if cpu_block in mapping:
                    gpu_block = mapping[cpu_block]
                    gpu_block.ref_count += 1
                else:
                    gpu_block = self.gpu_allocator.allocate(
                        cpu_block.block_hash, cpu_block.num_hashed_tokens)
                    mapping[cpu_block] = gpu_block
                new_block_table.append(gpu_block)
                self.cpu_allocator.free(cpu_block)
            self.block_tables[seq.seq_id] = new_block_table
        return {
            cpu.block_number: gpu.block_number
            for cpu, gpu in mapping.items()
        }

    def can_swap_out(self, seq_group: SequenceGroup) -> bool:
        blocks = self._get_physical_blocks(seq_group)
        return len(blocks) <= self.cpu_allocator.get_num_free_blocks()

    def swap_out(self, seq_group: SequenceGroup) -> Dict[int, int]:
        mapping: Dict[PhysicalTokenBlock, PhysicalTokenBlock] = {}
        for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
            new_block_table = BlockTable()
            for gpu_block in self.block_tables[seq.seq_id]:
                if gpu_block in mapping:
                    cpu_block = mapping[gpu_block]
                    cpu_block.ref_count += 1
                else:
                    cpu_block = self.cpu_allocator.allocate(
                        gpu_block.block_hash, gpu_block.num_hashed_tokens)
                    mapping[gpu_block] = cpu_block
                new_block_table.append(cpu_block)
                self.gpu_allocator.free(gpu_block)
            self.block_tables[seq.seq_id] = new_block_table
        return {
            gpu.block_number: cpu.block_number
            for gpu, cpu in mapping.items()
        }

    # ---------------------------------------------------------------- free

    def _free_block_table(self, block_table: BlockTable) -> None:
        # Sliding-window rings repeat blocks beyond the window; free the
        # tail window's unique blocks only.
        blocks_to_free = (list(block_table)[-self.block_sliding_window:]
                          if self.block_sliding_window is not None else
                          list(block_table))
        for block in set(blocks_to_free):
            if block.device == Device.TPU:
                self.gpu_allocator.free(block)
            else:
                self.cpu_allocator.free(block)

    def free(self, seq: Sequence) -> None:
        if seq.seq_id not in self.block_tables:
            return  # Already freed or never allocated.
        block_table = self.block_tables[seq.seq_id]
        self._free_block_table(block_table)
        del self.block_tables[seq.seq_id]

    def reset(self) -> None:
        for block_table in self.block_tables.values():
            self._free_block_table(block_table)
        self.block_tables.clear()

    # ------------------------------------------------------------- queries

    def get_block_table(self, seq: Sequence) -> List[int]:
        return self.block_tables[seq.seq_id].ids()

    def get_num_free_gpu_blocks(self) -> int:
        return self.gpu_allocator.get_num_free_blocks()

    def get_num_free_cpu_blocks(self) -> int:
        return self.cpu_allocator.get_num_free_blocks()

    # ----------------------------------------------------- prefix caching

    def access_all_blocks_in_seq(self, seq: Sequence, now: float) -> None:
        if not self.enable_caching:
            return
        if seq.seq_id not in self.block_tables:
            return
        for block in self.block_tables[seq.seq_id]:
            block.last_accessed = now

    def compute_full_blocks_in_seq(self, seq: Sequence) -> None:
        if seq.seq_id not in self.block_tables:
            return
        max_full_block = seq.get_len() // self.block_size - 1
        block_table = self.block_tables[seq.seq_id]
        if max_full_block == -1:
            return
        for i in reversed(range(max_full_block + 1)):
            if block_table[i].computed:
                break
            block_table[i].computed = True

    def get_all_computed_blocks(self, seq: Sequence) -> List[int]:
        if seq.seq_id not in self.block_tables:
            return []
        block_table = self.block_tables[seq.seq_id]
        # Never trim the last block: at least one token must be computed
        # this step (reference: block_manager_v1.py:683).
        return [
            b.block_number
            for b in takewhile(lambda b: b.computed, list(block_table)[:-1])
        ]

    def get_common_computed_block_ids(
            self, seqs: List[Sequence]) -> List[int]:
        if not self.enable_caching:
            return []
        ids_list = [self.get_all_computed_blocks(seq) for seq in seqs]
        ids_list = [ids for ids in ids_list if ids]
        if not ids_list:
            return []
        return commonprefix(ids_list)

    def mark_blocks_as_computed(self, seq_group: SequenceGroup) -> None:
        if not self.enable_caching:
            return
        for seq in seq_group.get_seqs():
            self.compute_full_blocks_in_seq(seq)
