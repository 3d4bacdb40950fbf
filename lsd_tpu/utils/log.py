"""Logging setup (ref: util/log.py:12-29 — colorlog with process/thread ids;
we use stdlib logging with the same record fields, no extra deps)."""
from __future__ import annotations

import logging
import os
import sys

_FMT = "%(asctime)s %(levelname).1s [%(process)d:%(threadName)s] %(name)s: %(message)s"
_configured = False


def get_logger(name: str = "lsd_tpu", level: str = "INFO") -> logging.Logger:
    global _configured
    if not _configured:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(_FMT))
        root = logging.getLogger("lsd_tpu")
        root.addHandler(h)
        root.setLevel(os.environ.get("LSD_TPU_LOG_LEVEL", level))
        root.propagate = False
        _configured = True
    return logging.getLogger(name if name.startswith("lsd_tpu") else f"lsd_tpu.{name}")


def set_logger_level(level: str) -> None:
    logging.getLogger("lsd_tpu").setLevel(level.upper())
