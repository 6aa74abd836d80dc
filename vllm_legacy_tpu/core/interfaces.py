"""Block-space-manager ABC (reference: vllm/core/interfaces.py:10,24)."""
from __future__ import annotations

import enum
from abc import ABC, abstractmethod
from typing import Dict, List

from vllm_legacy_tpu.sequence import Sequence, SequenceGroup


class AllocStatus(enum.Enum):
    """Result of a can_allocate / can_swap_in query.

    OK: allocation fits now. LATER: may fit after other requests free
    memory. NEVER: can never fit — the request must be rejected.
    """
    OK = enum.auto()
    LATER = enum.auto()
    NEVER = enum.auto()


class BlockSpaceManager(ABC):

    @staticmethod
    def get_block_space_manager_class(version: str):
        if version == "v1":
            from vllm_legacy_tpu.core.block_manager import (
                BlockSpaceManagerV1)
            return BlockSpaceManagerV1
        if version == "embedding":
            from vllm_legacy_tpu.core.embedding_model_block_manager import (
                EmbeddingModelBlockSpaceManager)
            return EmbeddingModelBlockSpaceManager
        raise ValueError(f"Unknown block manager version {version}")

    @abstractmethod
    def can_allocate(self, seq_group: SequenceGroup) -> AllocStatus:
        ...

    @abstractmethod
    def allocate(self, seq_group: SequenceGroup) -> None:
        ...

    @abstractmethod
    def can_append_slots(self, seq_group: SequenceGroup,
                         num_lookahead_slots: int) -> bool:
        ...

    @abstractmethod
    def append_slots(self, seq: Sequence,
                     num_lookahead_slots: int) -> Dict[int, List[int]]:
        ...

    @abstractmethod
    def fork(self, parent_seq: Sequence, child_seq: Sequence) -> None:
        ...

    @abstractmethod
    def can_swap_in(self, seq_group: SequenceGroup,
                    num_lookahead_slots: int) -> AllocStatus:
        ...

    @abstractmethod
    def swap_in(self, seq_group: SequenceGroup,
                num_lookahead_slots: int) -> Dict[int, int]:
        ...

    @abstractmethod
    def can_swap_out(self, seq_group: SequenceGroup) -> bool:
        ...

    @abstractmethod
    def swap_out(self, seq_group: SequenceGroup) -> Dict[int, int]:
        ...

    @abstractmethod
    def free(self, seq: Sequence) -> None:
        ...

    @abstractmethod
    def get_block_table(self, seq: Sequence) -> List[int]:
        ...

    @abstractmethod
    def get_num_free_gpu_blocks(self) -> int:
        ...

    @abstractmethod
    def get_num_free_cpu_blocks(self) -> int:
        ...

    @abstractmethod
    def access_all_blocks_in_seq(self, seq: Sequence, now: float) -> None:
        ...

    @abstractmethod
    def get_common_computed_block_ids(
            self, seqs: List[Sequence]) -> List[int]:
        ...

    @abstractmethod
    def mark_blocks_as_computed(self, seq_group: SequenceGroup) -> None:
        ...
