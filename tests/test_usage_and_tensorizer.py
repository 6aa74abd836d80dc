"""Usage telemetry (usage/usage_lib.py) and tensorizer gate."""
import importlib
import json
import os
import time

import numpy as np
import pytest


def test_usage_stats_disabled_by_default():
    from vllm_legacy_tpu.usage import is_usage_stats_enabled
    assert is_usage_stats_enabled() is False  # VLT_NO_USAGE_STATS=1


def test_usage_stats_opt_in_writes_local_record(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path))
    monkeypatch.setenv("VLT_NO_USAGE_STATS", "0")
    monkeypatch.delenv("DO_NOT_TRACK", raising=False)
    import vllm_legacy_tpu.usage.usage_lib as ul
    ul = importlib.reload(ul)
    assert ul.is_usage_stats_enabled() is True

    msg = ul.UsageMessage()
    msg.report_usage("LlamaForCausalLM", ul.UsageContext.LLM_CLASS,
                     extra_kvs={"dtype": "bfloat16"})
    assert msg._thread is not None, "report_usage did not start"
    path = os.path.join(str(tmp_path), "vllm_legacy_tpu",
                        "usage_stats.json")
    for _ in range(600):  # generous under full-suite CPU contention
        if os.path.exists(path):
            break
        time.sleep(0.05)
    with open(path) as f:
        rec = json.load(f)
    assert rec["model_architecture"] == "LlamaForCausalLM"
    assert rec["context"] == "LLM_CLASS"
    assert rec["dtype"] == "bfloat16"
    assert "num_devices" in rec or "platform" in rec


def test_usage_stats_do_not_track_marker(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path))
    monkeypatch.setenv("VLT_NO_USAGE_STATS", "0")
    marker = tmp_path / "vllm_legacy_tpu" / "do_not_track"
    marker.parent.mkdir(parents=True)
    marker.touch()
    import vllm_legacy_tpu.usage.usage_lib as ul
    ul = importlib.reload(ul)
    assert ul.is_usage_stats_enabled() is False


def test_tensorizer_gate_message():
    pytest.importorskip  # doc: tensorizer is NOT in the image
    from vllm_legacy_tpu.model_loader.tensorizer import (
        load_tensorized_params)
    with pytest.raises(ImportError, match="tensorizer"):
        list(load_tensorized_params("/nonexistent"))


def test_tensorizer_load_format_plumbs(tmp_path):
    """LoadFormat.TENSORIZER reaches the gated loader (not AUTO)."""
    from vllm_legacy_tpu.config import LoadFormat
    assert LoadFormat("tensorizer") is LoadFormat.TENSORIZER
