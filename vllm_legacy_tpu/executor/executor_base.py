"""Executor ABC (reference: vllm/executor/executor_base.py :11,107)."""
from __future__ import annotations

import asyncio
from abc import ABC, abstractmethod
from typing import List, Tuple

from vllm_legacy_tpu.config import EngineConfig
from vllm_legacy_tpu.sequence import ExecuteModelRequest, SamplerOutput


class ExecutorBase(ABC):

    def __init__(self, engine_config: EngineConfig) -> None:
        self.engine_config = engine_config
        self._init_executor()

    @abstractmethod
    def _init_executor(self) -> None:
        ...

    @abstractmethod
    def determine_num_available_blocks(self) -> Tuple[int, int]:
        ...

    @abstractmethod
    def initialize_cache(self, num_tpu_blocks: int,
                         num_cpu_blocks: int) -> None:
        ...

    @abstractmethod
    def execute_model(
            self,
            request: ExecuteModelRequest) -> List[SamplerOutput]:
        ...

    @abstractmethod
    def check_health(self) -> None:
        ...


class ExecutorAsyncBase(ExecutorBase):
    """Async facade: the jitted step releases the GIL while the TPU runs,
    so a thread offload suffices (reference wraps Ray/mp RPC instead,
    executor_base.py:107)."""

    async def execute_model_async(
            self,
            request: ExecuteModelRequest) -> List[SamplerOutput]:
        return await asyncio.get_running_loop().run_in_executor(
            None, self.execute_model, request)

    async def check_health_async(self) -> None:
        self.check_health()
