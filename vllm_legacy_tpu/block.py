"""KV-cache block primitives (reference: vllm/block.py:11,52).

A *logical* block is a fixed-size window of a sequence's tokens; a
*physical* block is a slot index into the paged KV-cache arrays resident in
TPU HBM (or the host-DRAM swap tier).
"""
from __future__ import annotations

from typing import List, Optional

from vllm_legacy_tpu.utils import Device

_BLANK_TOKEN_ID = -1

DEFAULT_LAST_ACCESSED_TIME = -1


class LogicalTokenBlock:
    """Host-side record of one block's worth of a sequence's tokens."""

    def __init__(self, block_number: int, block_size: int) -> None:
        self.block_number = block_number
        self.block_size = block_size
        self.token_ids: List[int] = []

    def is_empty(self) -> bool:
        return len(self.token_ids) == 0

    def get_num_empty_slots(self) -> int:
        return self.block_size - len(self.token_ids)

    def is_full(self) -> bool:
        return len(self.token_ids) == self.block_size

    def append_tokens(self, token_ids: List[int]) -> None:
        assert len(token_ids) <= self.get_num_empty_slots()
        self.token_ids.extend(token_ids)

    def get_token_ids(self) -> List[int]:
        return list(self.token_ids)

    def get_last_token_id(self) -> int:
        assert self.token_ids
        return self.token_ids[-1]


class PhysicalTokenBlock:
    """One slot of the device (or swap) KV cache, with refcount + prefix
    hash (reference: vllm/block.py:52)."""

    def __init__(
        self,
        device: Device,
        block_number: int,
        block_size: int,
        block_hash: int,
        num_hashed_tokens: int,
    ) -> None:
        self.device = device
        self.block_number = block_number
        self.block_size = block_size
        self.block_hash = block_hash
        self.num_hashed_tokens = num_hashed_tokens

        self.ref_count = 0
        self.last_accessed = DEFAULT_LAST_ACCESSED_TIME
        self.computed = False

    def __repr__(self) -> str:
        return (f"PhysicalTokenBlock(device={self.device}, "
                f"block_number={self.block_number}, "
                f"num_hashed_tokens={self.num_hashed_tokens}, "
                f"ref_count={self.ref_count}, "
                f"last_accessed={self.last_accessed}, "
                f"computed={self.computed})")


class BlockTable:
    """An ordered list of physical blocks owned by one sequence."""

    def __init__(self, blocks: Optional[List[PhysicalTokenBlock]] = None):
        self._blocks: List[PhysicalTokenBlock] = blocks or []

    def append(self, block: PhysicalTokenBlock) -> None:
        self._blocks.append(block)

    def __len__(self) -> int:
        return len(self._blocks)

    def __getitem__(self, key):
        return self._blocks[key]

    def __setitem__(self, key, value) -> None:
        self._blocks[key] = value

    def __iter__(self):
        return iter(self._blocks)

    def reset(self) -> None:
        self._blocks = []

    def copy(self) -> "BlockTable":
        return BlockTable(list(self._blocks))

    def ids(self) -> List[int]:
        return [b.block_number for b in self._blocks]
