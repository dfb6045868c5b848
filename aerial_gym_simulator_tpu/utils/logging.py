"""Per-component colored console logger.

Equivalent of the reference's CustomLogger (aerial_gym/utils/logging.py):
every module creates its own named logger with colored level output.
"""

from __future__ import annotations

import logging
import sys

_COLORS = {
    "DEBUG": "\033[36m",
    "INFO": "\033[32m",
    "WARNING": "\033[33m",
    "ERROR": "\033[31m",
    "CRITICAL": "\033[35m",
}
_RESET = "\033[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        color = _COLORS.get(record.levelname, "")
        record.levelname = f"{color}{record.levelname}{_RESET}"
        record.name = f"\033[34m{record.name}{_RESET}"
        return super().format(record)


def CustomLogger(name: str, level: str = "INFO") -> logging.Logger:
    logger = logging.getLogger(f"aerial_gym_tpu.{name}")
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(
            _ColorFormatter("[%(asctime)s] %(name)s %(levelname)s: %(message)s", "%H:%M:%S")
        )
        logger.addHandler(handler)
        logger.propagate = False
    logger.setLevel(level)
    return logger
