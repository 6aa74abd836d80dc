"""Paged KV-cache block manager.

Capability parity with the reference's BlockSpaceManagerV1
(vllm/core/block_manager_v1.py:213): refcounted physical blocks, a
content-hash allocator with LRU eviction for prefix caching (:64),
copy-on-write when a forked group appends into a shared last block
(:426-470), a sliding-window block ring (:305-307), per-block swap maps
between HBM and the host tier (:544-597), an admission watermark that
prevents allocate/preempt thrashing (:239-244), and computed-block
tracking that lets prefix-cache hits skip recomputation (:666-706).

Block numbers returned here index directly into the paged KV arrays in
TPU HBM (worker/cache_engine.py). The "CPU" device is host DRAM acting
as the swap tier; swap directives become async host<->HBM DMAs.

The two swap directions share one migration routine here (``_migrate``)
instead of the reference's mirrored swap_in/swap_out bodies.
"""
from __future__ import annotations

from itertools import count, takewhile
from os.path import commonprefix
from typing import Dict, List, Optional, Set, Tuple

from vllm_legacy_tpu.block import BlockTable, PhysicalTokenBlock
from vllm_legacy_tpu.core.evictor import (EvictionPolicy, Evictor,
                                          make_evictor)
from vllm_legacy_tpu.core.interfaces import AllocStatus, BlockSpaceManager
from vllm_legacy_tpu.logger import init_logger
from vllm_legacy_tpu.sequence import Sequence, SequenceGroup, SequenceStatus
from vllm_legacy_tpu.utils import Device, cdiv

logger = init_logger(__name__)


class UncachedBlockAllocator:
    """Plain free-stack allocator used when prefix caching is off
    (reference: block_manager_v1.py:154). Blocks are pre-created once;
    allocate/free are O(1) stack ops on the hot scheduling path."""

    def __init__(self, device: Device, block_size: int,
                 num_blocks: int) -> None:
        self.device = device
        self.block_size = block_size
        self.num_blocks = num_blocks
        self._free_stack = [
            PhysicalTokenBlock(device=device, block_number=i,
                               block_size=block_size, block_hash=-1,
                               num_hashed_tokens=0)
            for i in range(num_blocks)
        ]

    def allocate(self, block_hash: Optional[int] = None,
                 num_hashed_tokens: int = 0) -> PhysicalTokenBlock:
        if not self._free_stack:
            raise ValueError("KV block pool exhausted.")
        block = self._free_stack.pop()
        block.ref_count = 1
        return block

    def free(self, block: PhysicalTokenBlock) -> None:
        if block.ref_count == 0:
            raise ValueError(f"Double free! {block} is already freed.")
        block.ref_count -= 1
        if block.ref_count == 0:
            self._free_stack.append(block)

    def get_num_free_blocks(self) -> int:
        return len(self._free_stack)

    def get_num_total_blocks(self) -> int:
        return self.num_blocks

    def contains_block(self, block_hash: int) -> bool:
        return False  # nothing is content-addressed here

    def update_hash(self, block_hash: int,
                    block: PhysicalTokenBlock) -> None:
        raise NotImplementedError(
            "hash promotion requires the caching allocator")


class CachedBlockAllocator:
    """Content-hash-addressed allocator backing prefix caching
    (reference: block_manager_v1.py:64).

    Live blocks sit in ``active`` keyed by hash; refcount-zero blocks
    move into the evictor, where they stay addressable (a later
    allocate with the same hash revives them — that IS the prefix
    cache) until capacity pressure evicts the LRU victim. Blocks still
    filling up carry a unique placeholder hash (negative counter) and
    are promoted to their content hash when full.
    """

    def __init__(self, device: Device, block_size: int, num_blocks: int,
                 eviction_policy: EvictionPolicy = EvictionPolicy.LRU):
        self.device = device
        self.block_size = block_size
        self.num_blocks = num_blocks
        self.current_num_blocks = 0  # blocks materialized so far
        self.active: Dict[int, PhysicalTokenBlock] = {}
        self.evictor: Evictor = make_evictor(eviction_policy)
        self._placeholder_hashes = count(start=-1, step=-1)

    # kept as an alias: older tests/code call this `cached_blocks`
    @property
    def cached_blocks(self) -> Dict[int, PhysicalTokenBlock]:
        return self.active

    def _materialize(self, block_hash: int,
                     num_hashed_tokens: int) -> PhysicalTokenBlock:
        """Hand out a never-used block number, or recycle the LRU victim
        once all ``num_blocks`` numbers exist."""
        if self.current_num_blocks < self.num_blocks:
            block = PhysicalTokenBlock(
                device=self.device,
                block_number=self.current_num_blocks,
                block_size=self.block_size,
                block_hash=block_hash,
                num_hashed_tokens=num_hashed_tokens)
            self.current_num_blocks += 1
            return block
        victim = self.evictor.evict()
        victim.block_hash = block_hash
        victim.num_hashed_tokens = num_hashed_tokens
        return victim

    def allocate(self, block_hash: Optional[int] = None,
                 num_hashed_tokens: int = 0) -> PhysicalTokenBlock:
        if block_hash is None:
            block_hash = next(self._placeholder_hashes)
        if block_hash in self.evictor:
            # Prefix-cache hit on a retired block: revive it.
            assert block_hash not in self.active
            block = self.evictor.remove(block_hash)
            assert block.ref_count == 0
            self.active[block_hash] = block
        elif block_hash not in self.active:
            self.active[block_hash] = self._materialize(
                block_hash, num_hashed_tokens)
        block = self.active[block_hash]
        assert block.block_hash == block_hash
        block.ref_count += 1
        return block

    def free(self, block: PhysicalTokenBlock) -> None:
        if block.ref_count == 0:
            raise ValueError(f"Double free! {block} is already freed.")
        block.ref_count -= 1
        if block.ref_count == 0:
            # Retire, but keep addressable for future hash hits.
            assert block.block_hash not in self.evictor
            self.evictor.add(block)
            del self.active[block.block_hash]

    def get_num_free_blocks(self) -> int:
        return (self.num_blocks - self.current_num_blocks +
                self.evictor.num_blocks)

    def get_num_total_blocks(self) -> int:
        return self.num_blocks

    def contains_block(self, block_hash: int) -> bool:
        return block_hash in self.active or block_hash in self.evictor

    def update_hash(self, block_hash: int,
                    block: PhysicalTokenBlock) -> None:
        """Promote a just-filled block from its placeholder hash to its
        content hash."""
        assert not self.contains_block(block_hash)
        del self.active[block.block_hash]
        block.block_hash = block_hash
        self.active[block_hash] = block


class BlockSpaceManagerV1(BlockSpaceManager):
    """Maps sequences to physical KV blocks across HBM and host swap."""

    def __init__(
        self,
        block_size: int,
        num_gpu_blocks: int,
        num_cpu_blocks: int,
        watermark: float = 0.01,
        sliding_window: Optional[int] = None,
        enable_caching: bool = False,
    ) -> None:
        if enable_caching and sliding_window is not None:
            raise NotImplementedError(
                "Sliding window is not allowed with prefix caching "
                "enabled!")

        self.block_size = block_size
        self.num_total_gpu_blocks = num_gpu_blocks
        self.num_total_cpu_blocks = num_cpu_blocks
        self.enable_caching = enable_caching

        # Window expressed in whole blocks, rounded up so every token
        # the window can reference stays addressable.
        self.block_sliding_window: Optional[int] = (
            cdiv(sliding_window, block_size)
            if sliding_window is not None else None)

        assert watermark >= 0.0
        self.watermark = watermark
        self.watermark_blocks = int(watermark * num_gpu_blocks)

        alloc_cls = (CachedBlockAllocator
                     if enable_caching else UncachedBlockAllocator)
        if enable_caching:
            logger.info("Prefix caching is enabled.")
        self.gpu_allocator = alloc_cls(Device.TPU, block_size,
                                       num_gpu_blocks)
        self.cpu_allocator = alloc_cls(Device.CPU, block_size,
                                       num_cpu_blocks)
        self.block_tables: Dict[int, BlockTable] = {}  # seq_id -> table

    # ----------------------------------------------------- prompt intake

    def _blocks_needed_for(self, seq: Optional[Sequence]) -> int:
        if seq is None:
            return 0
        n = len(seq.logical_token_blocks)
        if self.block_sliding_window is not None:
            n = min(n, self.block_sliding_window)
        return n

    def can_allocate(self, seq_group: SequenceGroup) -> AllocStatus:
        prompt_seq = seq_group.get_seqs(status=SequenceStatus.WAITING)[0]
        needed = self._blocks_needed_for(prompt_seq)
        # NEVER: even an empty pool couldn't hold it above the watermark.
        if self.num_total_gpu_blocks - needed < self.watermark_blocks:
            return AllocStatus.NEVER
        free_now = self.gpu_allocator.get_num_free_blocks()
        if free_now - needed >= self.watermark_blocks:
            return AllocStatus.OK
        return AllocStatus.LATER

    def allocate(self, seq_group: SequenceGroup) -> None:
        # Every waiting seq in the group shares the one prompt, so they
        # start from copies of a single physical table.
        wait_seqs = seq_group.get_seqs(status=SequenceStatus.WAITING)
        seq = wait_seqs[0]
        fanout = seq_group.num_seqs()

        table = BlockTable()
        for idx in range(len(seq.logical_token_blocks)):
            if (self.block_sliding_window is not None
                    and idx >= self.block_sliding_window):
                # Past the window: the ring wraps onto its own blocks.
                block = table[idx % self.block_sliding_window]
                block.ref_count += fanout
            elif self.enable_caching:
                block = self.gpu_allocator.allocate(
                    seq.hash_of_block(idx),
                    seq.num_hashed_tokens_of_block(idx))
                block.ref_count += fanout - 1  # allocate() booked one
            else:
                block = self.gpu_allocator.allocate()
                block.ref_count = fanout
            table.append(block)

        for s in wait_seqs:
            self.block_tables[s.seq_id] = table.copy()

    # ----------------------------------------------------- decode growth

    def can_append_slots(self, seq_group: SequenceGroup,
                         num_lookahead_slots: int = 0) -> bool:
        # Worst case, every live seq opens one new block now plus the
        # blocks spanned by the lookahead window (multi-step/spec decode
        # — the reference only grew this in block manager v2,
        # block_manager_v2.py:178-223).
        per_seq = 1 + cdiv(num_lookahead_slots, self.block_size)
        live = seq_group.num_seqs(status=SequenceStatus.RUNNING)
        return live * per_seq <= self.gpu_allocator.get_num_free_blocks()

    def _last_block_is_full(self, seq: Sequence) -> bool:
        n = seq.data.get_len()
        return n > 0 and n % seq.block_size == 0

    def _open_new_block(self, seq: Sequence) -> PhysicalTokenBlock:
        """Allocate the block that will hold the sequence tail. Under
        caching, a tail that happens to be full gets its content hash
        immediately (possible dedupe); otherwise a placeholder."""
        if not self.enable_caching:
            return self.gpu_allocator.allocate()
        tail = len(seq.logical_token_blocks) - 1
        content_hash = (seq.hash_of_block(tail)
                        if self._last_block_is_full(seq) else None)
        block = self.gpu_allocator.allocate(
            content_hash, seq.num_hashed_tokens_of_block(tail))
        if content_hash is None:
            assert block.ref_count == 1
        return block

    def _promote_if_full(self, seq: Sequence,
                         tail_block: PhysicalTokenBlock
                         ) -> PhysicalTokenBlock:
        """When the tail block just filled, swap its placeholder hash
        for the content hash — deduping onto an existing cached block
        when one matches."""
        if not self._last_block_is_full(seq):
            return tail_block
        content_hash = seq.hash_of_block(
            len(seq.logical_token_blocks) - 1)
        if self.gpu_allocator.contains_block(content_hash):
            self.gpu_allocator.free(tail_block)
            return self.gpu_allocator.allocate(content_hash)
        self.gpu_allocator.update_hash(content_hash, tail_block)
        return tail_block

    def append_slots(self, seq: Sequence,
                     num_lookahead_slots: int = 0) -> Dict[int, List[int]]:
        """Guarantee physical room for the newly appended token plus
        ``num_lookahead_slots`` future ones. Returns copy-on-write
        directives {src_block: [dst_blocks]} for the cache engine
        (reference: block_manager_v1.py:426-470)."""
        logical = seq.logical_token_blocks
        table = self.block_tables[seq.seq_id]

        want = len(logical)
        if num_lookahead_slots:
            # Lookahead tokens beyond the free space in the tail block.
            spill = num_lookahead_slots - (
                len(logical) * self.block_size - seq.data.get_len())
            want = max(want, len(logical) + cdiv(spill, self.block_size))

        if len(table) < want:
            if (self.block_sliding_window
                    and len(table) >= self.block_sliding_window):
                assert num_lookahead_slots == 0, (
                    "sliding window + lookahead not supported")
                # The ring turns over: reuse the block that fell out of
                # the window for the new logical slot.
                table.append(table[len(table) % self.block_sliding_window])
                return {}
            while len(table) < want:
                table.append(self._open_new_block(seq))
            return {}

        # The token landed in the existing tail block. (Lookahead blocks
        # beyond the logical tail are private, never CoW candidates.)
        tail_idx = len(logical) - 1
        tail_block = table[tail_idx]
        assert tail_block.device == Device.TPU
        if tail_block.ref_count == 1:
            if self.enable_caching:
                table[tail_idx] = self._promote_if_full(seq, tail_block)
            return {}
        # Shared with a forked sibling: copy-on-write.
        private = self._open_new_block(seq)
        table[tail_idx] = private
        self.gpu_allocator.free(tail_block)
        return {tail_block.block_number: [private.block_number]}

    def fork(self, parent_seq: Sequence, child_seq: Sequence) -> None:
        if parent_seq.seq_id not in self.block_tables:
            return
        parent_table = self.block_tables[parent_seq.seq_id]
        self.block_tables[child_seq.seq_id] = parent_table.copy()
        # A window ring repeats entries; each physical block refs once.
        for block in set(parent_table):
            block.ref_count += 1

    # -------------------------------------------------------------- swap

    def _resident_blocks(
            self, seq_group: SequenceGroup) -> List[PhysicalTokenBlock]:
        found: Set[PhysicalTokenBlock] = set()
        for seq in seq_group.get_seqs():
            if not seq.is_finished() and seq.seq_id in self.block_tables:
                found.update(self.block_tables[seq.seq_id])
        return list(found)

    def can_swap_in(self, seq_group: SequenceGroup,
                    num_lookahead_slots: int = 0) -> AllocStatus:
        assert num_lookahead_slots == 0
        # Everything the group owns, plus one fresh block per seq for
        # the step it resumes on.
        needed = (len(self._resident_blocks(seq_group)) +
                  seq_group.num_seqs(status=SequenceStatus.SWAPPED))
        if self.gpu_allocator.get_num_total_blocks() < needed:
            return AllocStatus.NEVER
        free_now = self.gpu_allocator.get_num_free_blocks()
        if free_now - needed >= self.watermark_blocks:
            return AllocStatus.OK
        return AllocStatus.LATER

    def can_swap_out(self, seq_group: SequenceGroup) -> bool:
        return (len(self._resident_blocks(seq_group)) <=
                self.cpu_allocator.get_num_free_blocks())

    def _migrate(self, seq_group: SequenceGroup, status: SequenceStatus,
                 src_allocator, dst_allocator) -> Dict[int, int]:
        """Move every block of the group's ``status`` sequences from one
        tier to the other; a block shared across seqs migrates once and
        re-shares. Returns {src_block_number: dst_block_number} for the
        DMA engine. One routine serves both directions (the reference
        mirrors the body in swap_in/swap_out)."""
        moved: Dict[PhysicalTokenBlock, PhysicalTokenBlock] = {}
        for seq in seq_group.get_seqs(status=status):
            relocated = BlockTable()
            for src in self.block_tables[seq.seq_id]:
                if src in moved:
                    dst = moved[src]
                    dst.ref_count += 1
                else:
                    dst = dst_allocator.allocate(src.block_hash,
                                                 src.num_hashed_tokens)
                    moved[src] = dst
                relocated.append(dst)
                src_allocator.free(src)
            self.block_tables[seq.seq_id] = relocated
        return {s.block_number: d.block_number for s, d in moved.items()}

    def swap_in(self, seq_group: SequenceGroup,
                num_lookahead_slots: int = 0) -> Dict[int, int]:
        assert num_lookahead_slots == 0
        return self._migrate(seq_group, SequenceStatus.SWAPPED,
                             self.cpu_allocator, self.gpu_allocator)

    def swap_out(self, seq_group: SequenceGroup) -> Dict[int, int]:
        return self._migrate(seq_group, SequenceStatus.RUNNING,
                             self.gpu_allocator, self.cpu_allocator)

    # -------------------------------------------------------------- free

    def _release_table(self, table: BlockTable) -> None:
        # A window ring aliases earlier entries; free unique blocks of
        # the live window only.
        live = (list(table)[-self.block_sliding_window:]
                if self.block_sliding_window is not None else list(table))
        for block in set(live):
            allocator = (self.gpu_allocator if block.device == Device.TPU
                         else self.cpu_allocator)
            allocator.free(block)

    def free(self, seq: Sequence) -> None:
        table = self.block_tables.pop(seq.seq_id, None)
        if table is not None:
            self._release_table(table)

    def reset(self) -> None:
        for table in self.block_tables.values():
            self._release_table(table)
        self.block_tables.clear()

    # ----------------------------------------------------------- queries

    def get_block_table(self, seq: Sequence) -> List[int]:
        return self.block_tables[seq.seq_id].ids()

    def get_num_free_gpu_blocks(self) -> int:
        return self.gpu_allocator.get_num_free_blocks()

    def get_num_free_cpu_blocks(self) -> int:
        return self.cpu_allocator.get_num_free_blocks()

    # ---------------------------------------------------- prefix caching

    def access_all_blocks_in_seq(self, seq: Sequence, now: float) -> None:
        if self.enable_caching and seq.seq_id in self.block_tables:
            for block in self.block_tables[seq.seq_id]:
                block.last_accessed = now

    def compute_full_blocks_in_seq(self, seq: Sequence) -> None:
        """Flag every full block as computed, sweeping backwards and
        stopping at the first already-computed one (everything before it
        was flagged on an earlier step)."""
        table = self.block_tables.get(seq.seq_id)
        if table is None:
            return
        full_blocks = seq.get_len() // self.block_size
        for i in reversed(range(full_blocks)):
            if table[i].computed:
                break
            table[i].computed = True

    def get_all_computed_blocks(self, seq: Sequence) -> List[int]:
        table = self.block_tables.get(seq.seq_id)
        if table is None:
            return []
        # The last block is excluded even if computed: the model must
        # see at least one token this step (reference:
        # block_manager_v1.py:683).
        return [
            b.block_number
            for b in takewhile(lambda b: b.computed, list(table)[:-1])
        ]

    def get_common_computed_block_ids(
            self, seqs: List[Sequence]) -> List[int]:
        """Longest computed-block prefix shared by all seqs in the group
        — the part a prefix-cache hit lets the prefill skip."""
        if not self.enable_caching:
            return []
        per_seq = [ids for ids in
                   (self.get_all_computed_blocks(s) for s in seqs) if ids]
        return commonprefix(per_seq) if per_seq else []

    def mark_blocks_as_computed(self, seq_group: SequenceGroup) -> None:
        if self.enable_caching:
            for seq in seq_group.get_seqs():
                self.compute_full_blocks_in_seq(seq)
