"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so multi-chip sharding logic
is exercised without TPU hardware (capability the reference lacks —
SURVEY.md §4 implication (d)).
"""
import os

# Must be set before jax is imported anywhere. Force-assign: the host
# environment may export JAX_PLATFORMS=<tpu plugin> already.
os.environ["JAX_PLATFORMS"] = "cpu"
# The axon TPU plugin ignores the env var — force via config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Pallas kernels run in interpret mode on CPU.
os.environ.setdefault("VLT_PALLAS_INTERPRET", "1")
