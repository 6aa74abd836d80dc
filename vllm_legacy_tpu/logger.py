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
