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


def pytest_collection_modifyitems(config, items):
    """Two test tiers (pytest.ini): everything that builds an engine,
    runs interpret-mode kernels, or loads HF models is ``slow``; the
    smoke tier (-m "not slow") keeps the pure-Python layers —
    scheduler, block manager, sequences, sampling params, config,
    tokenization, outputs — under ~90s."""
    import pytest as _pytest
    slow_dirs = ("tests/e2e", "tests/models", "tests/lora",
                 "tests/spec_decode", "tests/entrypoints",
                 "tests/async_engine", "tests/metrics", "tests/kernels")
    slow_files = ("test_fp8_kv.py", "test_guided_decoding.py",
                  "test_usage_and_tensorizer.py")
    for item in items:
        p = str(item.fspath)
        if any(d in p for d in slow_dirs) or p.endswith(slow_files):
            item.add_marker(_pytest.mark.slow)
