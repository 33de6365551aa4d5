"""Rank-aware logger (the reference's nemo_logging analog,
SPIRAL/nemo/utils/nemo_logging.py + formatters/): one configured logger,
colored level names on TTYs, a `[rank N]` prefix under multi-process runs,
and non-primary processes demoted to warnings-only by default (the
reference's logging.set_verbosity on non-zero ranks)."""

from __future__ import annotations

import logging
import sys

_COLORS = {
    "DEBUG": "\033[36m",
    "INFO": "\033[32m",
    "WARNING": "\033[33m",
    "ERROR": "\033[31m",
    "CRITICAL": "\033[1;31m",
}
_RESET = "\033[0m"


class _Formatter(logging.Formatter):
    def __init__(self, color: bool, rank: int, world: int):
        fmt = "[%(asctime)s %(levelname)s] %(message)s"
        if world > 1:
            fmt = f"[rank {rank}] " + fmt
        super().__init__(fmt, datefmt="%H:%M:%S")
        self.color = color

    def format(self, record):
        if self.color and record.levelname in _COLORS:
            record = logging.makeLogRecord(record.__dict__)
            record.levelname = (
                _COLORS[record.levelname] + record.levelname + _RESET
            )
        return super().format(record)


_logger = None


def get_logger(name: str = "tpu_speech") -> logging.Logger:
    """Process-wide configured logger; safe to call before/after
    jax.distributed initialization (rank is read lazily at first call)."""
    global _logger
    if _logger is not None:
        return _logger
    try:
        import jax

        rank, world = jax.process_index(), jax.process_count()
    except Exception:
        rank, world = 0, 1
    logger = logging.getLogger(name)
    logger.propagate = False
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(
        _Formatter(sys.stderr.isatty(), rank, world)
    )
    logger.addHandler(handler)
    logger.setLevel(logging.INFO if rank == 0 else logging.WARNING)
    _logger = logger
    return logger
