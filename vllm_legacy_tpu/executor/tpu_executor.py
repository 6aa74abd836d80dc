"""Single-controller TPU executor.

Replaces the reference's GPUExecutor/RayGPUExecutor/Multiprocessing
executors (vllm/executor/ — SURVEY.md §2.4): one process drives every
chip in the slice through the jitted SPMD step; there is no RPC fan-out,
no placement groups and no worker monitor — multi-host scaling uses
``jax.distributed`` with the same code.
"""
from __future__ import annotations

from typing import List, Tuple

from vllm_legacy_tpu.executor.executor_base import ExecutorAsyncBase
from vllm_legacy_tpu.logger import init_logger
from vllm_legacy_tpu.sequence import ExecuteModelRequest, SamplerOutput
from vllm_legacy_tpu.worker.worker import Worker

logger = init_logger(__name__)


class TPUExecutor(ExecutorAsyncBase):

    def _init_executor(self) -> None:
        self.worker = Worker(self.engine_config)
        self.worker.load_model()

    def determine_num_available_blocks(self) -> Tuple[int, int]:
        return self.worker.determine_num_available_blocks()

    def initialize_cache(self, num_tpu_blocks: int,
                         num_cpu_blocks: int) -> None:
        logger.info("# TPU blocks: %d, # CPU blocks: %d", num_tpu_blocks,
                    num_cpu_blocks)
        self.worker.initialize_cache(num_tpu_blocks, num_cpu_blocks)

    def execute_model(
            self,
            request: ExecuteModelRequest) -> List[SamplerOutput]:
        return self.worker.execute_model(request)

    def check_health(self) -> None:
        self.worker.check_health()
