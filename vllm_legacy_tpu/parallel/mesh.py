"""Mesh construction + device introspection.

TPU-native replacement for the reference's process-group bring-up
(``vllm/distributed/parallel_state.py`` init_distributed_environment :80,
initialize_model_parallel :128): one single-controller process sees all
local chips through ``jax.devices()``; multi-host slices join via
``jax.distributed.initialize`` before calling :func:`build_mesh`.

Axis semantics (Megatron-compatible, reference :128-224):
  "model" — tensor parallel, contiguous devices so TP collectives ride
            the fastest ICI links;
  "data"  — replica/data parallel across the remaining devices.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from vllm_legacy_tpu.logger import init_logger

logger = init_logger(__name__)

# Conservative default when the runtime doesn't report memory stats
# (e.g. CPU test platform): v5e chip HBM.
_DEFAULT_HBM_BYTES = 16 * (1 << 30)


def get_device_hbm_bytes(device: Optional[jax.Device] = None) -> int:
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:  # pragma: no cover - platform dependent
        pass
    return _DEFAULT_HBM_BYTES


def build_mesh(
    tensor_parallel_size: int = 1,
    data_parallel_size: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the ("data", "model") mesh.

    The "model" axis is innermost so TP ranks are ICI neighbours
    (equivalent of the reference's contiguous-TP rank layout,
    parallel_state.py:160-183).
    """
    devices = list(devices if devices is not None else jax.devices())
    world = tensor_parallel_size * data_parallel_size
    if world > len(devices):
        raise ValueError(
            f"Requested {world} devices (tp={tensor_parallel_size} x "
            f"dp={data_parallel_size}) but only {len(devices)} available")
    grid = np.asarray(devices[:world]).reshape(data_parallel_size,
                                               tensor_parallel_size)
    return Mesh(grid, axis_names=("data", "model"))
