"""Multi-host (multi-process) engine support.

Reference analogue: the Ray multi-node executor
(vllm/executor/ray_gpu_executor.py:63) with its driver/worker RPC and
NCCL groups. The TPU design is different: JAX multi-controller SPMD.
Every host process runs the SAME jitted step over one global mesh that
spans all hosts; XLA inserts the cross-host collectives (ICI within a
slice, DCN across slices). What remains host-side is control flow —
which requests to run this step — and only the primary host (process 0)
has the scheduler, tokenizer and API server. The primary therefore
broadcasts each step's ``ExecuteModelRequest`` (a small pickled control
message, NOT tensors) to the followers, which replay it into their
local ``Worker``. Device data never leaves the chips.

Protocol (one ``(op, payload)`` message per broadcast):
    ("init_cache", (num_tpu_blocks, num_cpu_blocks))  once at bring-up
    ("execute",    ExecuteModelRequest)               every engine step
    ("stop",       None)                              shutdown

Constraints in multi-host mode:
  * every process must create the engine with identical configs; the
    first broadcast carries a config fingerprint and mismatches abort.

Host swap works multi-host: the swap mapping rides the ``execute``
broadcast and every process moves only its ADDRESSABLE cache shards
to/from its local host pool (CacheEngine.swap_out/swap_in per-host
shard paths) — the analogue of the reference's per-GPU Ray worker swap
(vllm/worker/worker.py:214-226).
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Optional, Tuple

import jax
import numpy as np

from vllm_legacy_tpu.logger import init_logger

logger = init_logger(__name__)


def init_multihost(coordinator_address: str, num_processes: int,
                   process_id: int,
                   local_device_count: Optional[int] = None) -> None:
    """Join the multi-process runtime. Must run before any other JAX
    call in the process. On real TPU pods the three arguments come from
    the deployment environment; tests drive localhost CPU processes."""
    if local_device_count is not None:
        # CPU test path: carve N virtual devices out of this process.
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count="
                f"{local_device_count}").strip()
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    logger.info("multihost: process %d/%d up, %d global / %d local devices",
                jax.process_index(), jax.process_count(),
                len(jax.devices()), len(jax.local_devices()))


def is_primary() -> bool:
    return jax.process_index() == 0


def _broadcast_bytes(payload: Optional[bytes]) -> bytes:
    """One-to-all byte broadcast (source = process 0). Two collectives:
    length, then the padded payload."""
    from jax.experimental import multihost_utils as mhu
    n = mhu.broadcast_one_to_all(
        np.asarray([len(payload) if payload is not None else 0], np.int64))
    size = int(n[0])
    if payload is not None:
        body = np.frombuffer(payload, np.uint8)
    else:
        body = np.zeros(size, np.uint8)
    if size == 0:
        return b""
    return mhu.broadcast_one_to_all(body).tobytes()


def broadcast_msg(msg: Optional[Tuple[str, Any]] = None) -> Tuple[str, Any]:
    """Primary passes the message; followers pass None and receive it."""
    blob = pickle.dumps(msg) if msg is not None else None
    return pickle.loads(_broadcast_bytes(blob))


def config_fingerprint(engine_config) -> str:
    """Cheap cross-host config consistency check."""
    m = engine_config.model_config
    p = engine_config.parallel_config
    c = engine_config.cache_config
    return (f"{m.model}|{m.dtype}|{m.max_model_len}|"
            f"tp{p.tensor_parallel_size}|dp{p.data_parallel_size}|"
            f"bs{c.block_size}")


class MultihostTPUExecutor:
    """Primary-side executor: every engine call is mirrored to the
    followers by broadcast before running locally, so all processes
    enter the same jitted computation in the same order."""

    def __init__(self, engine_config) -> None:
        assert is_primary(), "followers run follower_serve(), not the engine"
        self.engine_config = engine_config
        broadcast_msg(("hello", config_fingerprint(engine_config)))
        from vllm_legacy_tpu.worker.worker import Worker
        self.worker = Worker(engine_config)
        self.worker.load_model()

    def determine_num_available_blocks(self) -> Tuple[int, int]:
        # Budgeting is deterministic (same config, same math) but the
        # broadcast in initialize_cache is the source of truth.
        return self.worker.determine_num_available_blocks()

    def initialize_cache(self, num_tpu_blocks: int,
                         num_cpu_blocks: int) -> None:
        logger.info("# TPU blocks: %d, # CPU blocks: %d", num_tpu_blocks,
                    num_cpu_blocks)
        broadcast_msg(("init_cache", (num_tpu_blocks, num_cpu_blocks)))
        self.worker.initialize_cache(num_tpu_blocks, num_cpu_blocks)

    def execute_model(self, request):
        broadcast_msg(("execute", request))
        return self.worker.execute_model(request)

    async def execute_model_async(self, request):
        return self.execute_model(request)

    def stop_followers(self) -> None:
        broadcast_msg(("stop", None))

    def check_health(self) -> None:
        return


def follower_serve(engine_config) -> None:
    """Follower main loop: mirror the primary's worker calls forever.
    Blocks until the primary broadcasts ("stop", None)."""
    assert not is_primary()
    from vllm_legacy_tpu.worker.worker import Worker

    op, payload = broadcast_msg()
    assert op == "hello", f"unexpected first message {op!r}"
    want = config_fingerprint(engine_config)
    if payload != want:
        raise ValueError(f"config mismatch across hosts: primary "
                         f"{payload!r} != local {want!r}")

    worker = Worker(engine_config)
    worker.load_model()
    # mirror the deterministic budgeting the primary runs pre-broadcast
    worker.determine_num_available_blocks()

    while True:
        op, payload = broadcast_msg()
        if op == "stop":
            logger.info("multihost follower %d: stop", jax.process_index())
            return
        if op == "init_cache":
            worker.initialize_cache(*payload)
        elif op == "execute":
            worker.execute_model(payload)
        else:  # pragma: no cover - protocol drift guard
            raise ValueError(f"unknown multihost op {op!r}")
