"""Device-mesh parallelism (replaces vllm/distributed/ — SURVEY.md §2.10).

There are no process groups, NCCL communicators or driver→worker
broadcast loops here: parallelism is a ``jax.sharding.Mesh`` with axes
``("data", "model")`` and collectives are XLA ops (psum/all_gather)
emitted inside ``shard_map``-wrapped model code.
"""
from vllm_legacy_tpu.parallel.mesh import (build_mesh,
                                           get_device_hbm_bytes)

__all__ = ["build_mesh", "get_device_hbm_bytes"]
