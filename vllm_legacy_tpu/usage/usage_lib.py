"""Opt-out anonymous usage telemetry (reference:
vllm/usage/usage_lib.py:97 — UsageMessage with hw/model info posted in
a background thread, with a daily continuation heartbeat).

TPU build: defaults OFF (``VLT_NO_USAGE_STATS=1``) and the collected
message is written to a local JSON (``~/.config/vllm_legacy_tpu/
usage_stats.json``) rather than posted — serving clusters often run
with zero egress, and the local file gives operators the same
inventory signal. Opt-in by setting VLT_NO_USAGE_STATS=0; honoring
``DO_NOT_TRACK`` / the do-not-track marker file like the reference
(:28-47).
"""
from __future__ import annotations

import datetime
import json
import os
import platform
import threading
import time
from enum import Enum
from pathlib import Path
from typing import Any, Dict, Optional

from vllm_legacy_tpu import envs

_config_home = os.getenv("XDG_CONFIG_HOME",
                         os.path.expanduser("~/.config"))
_USAGE_STATS_JSON_PATH = os.path.join(_config_home, "vllm_legacy_tpu",
                                      "usage_stats.json")
_DO_NOT_TRACK_PATH = os.path.join(_config_home, "vllm_legacy_tpu",
                                  "do_not_track")

_USAGE_STATS_ENABLED: Optional[bool] = None


def is_usage_stats_enabled() -> bool:
    """Disabled by any of: VLT_NO_USAGE_STATS=1 (the default here),
    DO_NOT_TRACK=1, or the do-not-track marker file."""
    global _USAGE_STATS_ENABLED
    if _USAGE_STATS_ENABLED is None:
        do_not_track = os.getenv("DO_NOT_TRACK", "0") == "1"
        no_usage = bool(envs.VLT_NO_USAGE_STATS)
        marker = os.path.exists(_DO_NOT_TRACK_PATH)
        _USAGE_STATS_ENABLED = not (do_not_track or no_usage or marker)
    return _USAGE_STATS_ENABLED


class UsageContext(str, Enum):
    UNKNOWN_CONTEXT = "UNKNOWN_CONTEXT"
    LLM_CLASS = "LLM_CLASS"
    API_SERVER = "API_SERVER"
    OPENAI_API_SERVER = "OPENAI_API_SERVER"
    ENGINE_CONTEXT = "ENGINE_CONTEXT"


def _hw_info() -> Dict[str, Any]:
    info: Dict[str, Any] = {
        "platform": platform.platform(),
        "architecture": platform.machine(),
        "cpu_count": os.cpu_count(),
    }
    try:
        import jax
        devs = jax.devices()
        info["device_kind"] = devs[0].device_kind if devs else None
        info["num_devices"] = len(devs)
    except Exception:
        pass
    return info


class UsageMessage:
    """Collects one record per engine start + a daily heartbeat
    (reference :97-210)."""

    def __init__(self) -> None:
        self._record: Dict[str, Any] = {}
        self._thread: Optional[threading.Thread] = None

    def report_usage(self, model_architecture: str,
                     usage_context: UsageContext,
                     extra_kvs: Optional[Dict[str, Any]] = None) -> None:
        if not is_usage_stats_enabled():
            return
        t = threading.Thread(target=self._report_worker,
                             args=(model_architecture, usage_context,
                                   extra_kvs or {}),
                             daemon=True)
        self._thread = t
        t.start()

    def _report_worker(self, arch: str, ctx: UsageContext,
                       extra: Dict[str, Any]) -> None:
        self._record = {
            "uuid": None,  # anonymous: no stable id collected
            "provider": "tpu",
            "timestamp": datetime.datetime.now(
                datetime.timezone.utc).isoformat(),
            "model_architecture": arch,
            "context": ctx.value,
            **_hw_info(),
            **extra,
        }
        self._write_local()
        # daily continuation heartbeat (reference
        # _report_continous_usage :182)
        while True:
            time.sleep(86400)
            self._record["timestamp"] = datetime.datetime.now(
                datetime.timezone.utc).isoformat()
            self._record["heartbeat"] = True
            self._write_local()

    def _write_local(self) -> None:
        try:
            path = Path(_USAGE_STATS_JSON_PATH)
            path.parent.mkdir(parents=True, exist_ok=True)
            with open(path, "w") as f:
                json.dump(self._record, f)
        except OSError:
            pass


usage_message = UsageMessage()
