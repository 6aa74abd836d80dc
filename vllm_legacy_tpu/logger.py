"""Logging setup (reference: vllm/logger.py)."""
from __future__ import annotations

import logging
import os
import sys

_FORMAT = "%(levelname)s %(asctime)s %(filename)s:%(lineno)d] %(message)s"
_DATE_FORMAT = "%m-%d %H:%M:%S"

_root_logger = logging.getLogger("vllm_legacy_tpu")
_default_handler = None


class NewLineFormatter(logging.Formatter):
    """Indent continuation lines under the log prefix."""

    def format(self, record: logging.LogRecord) -> str:
        msg = super().format(record)
        if record.message != "":
            parts = msg.split(record.message)
            msg = msg.replace("\n", "\r\n" + parts[0])
        return msg


def _setup_logger() -> None:
    global _default_handler
    level = os.getenv("VLT_LOGGING_LEVEL", "INFO").upper()
    _root_logger.setLevel(level)
    if _default_handler is None:
        _default_handler = logging.StreamHandler(sys.stdout)
        _default_handler.flush = sys.stdout.flush  # type: ignore
        _default_handler.setLevel(level)
        _root_logger.addHandler(_default_handler)
    _default_handler.setFormatter(NewLineFormatter(_FORMAT, _DATE_FORMAT))
    _root_logger.propagate = False


if int(os.getenv("VLT_CONFIGURE_LOGGING", "1")):
    _setup_logger()


def init_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(_root_logger.level)
    if _default_handler is not None and not logger.handlers:
        logger.addHandler(_default_handler)
    logger.propagate = False
    return logger


def enable_trace_function_call(log_file_path: str,
                               root_dir: str = None) -> None:
    """Per-thread call/return tracer (reference: vllm/logger.py:100-154
    VLLM_TRACE_FUNCTION): logs every Python call/return under the
    package tree to ``log_file_path``. Heavy — debugging hangs/crashes
    only; enable with VLT_TRACE_FUNCTION=1 (worker init)."""
    import datetime
    import sys

    if root_dir is None:
        root_dir = os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))

    log_f = open(log_file_path, "a", buffering=1)
    log_f.write(
        f"# trace started {datetime.datetime.now().isoformat()} "
        f"root={root_dir}\n")

    def _trace(frame, event, arg):
        if event not in ("call", "return"):
            return _trace
        filename = frame.f_code.co_filename
        if not filename.startswith(root_dir):
            return _trace
        ts = datetime.datetime.now().strftime("%H:%M:%S.%f")
        name = frame.f_code.co_name
        lineno = frame.f_lineno
        log_f.write(f"{ts} {event} {filename}:{lineno} {name}\n")
        return _trace

    sys.settrace(_trace)


def get_trace_file_path(process_kind: str = "worker") -> str:
    """Default trace destination under a temp dir, one file per pid."""
    import tempfile
    trace_dir = os.path.join(tempfile.gettempdir(), "vlt_traces")
    os.makedirs(trace_dir, exist_ok=True)
    return os.path.join(trace_dir, f"{process_kind}_{os.getpid()}.log")
