"""Rank-aware logger.

Mirrors the reference's ``Logger`` singleton (C++ ``toast_sys_environment.cpp``
+ python wrapper ``src/toast/utils.py:63-130``): level from the
``TOAST_LOGLEVEL`` environment variable, plus ``*_rank`` collective variants
that print on one JAX process only, with optional timer reporting.
"""

from __future__ import annotations

import logging
import os
import sys

_LEVELS = {
    "VERBOSE": 5,
    "DEBUG": logging.DEBUG,
    "INFO": logging.INFO,
    "WARNING": logging.WARNING,
    "ERROR": logging.ERROR,
    "CRITICAL": logging.CRITICAL,
    "NONE": logging.CRITICAL + 10,
}

logging.addLevelName(5, "VERBOSE")

_logger = None


def _process_index():
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


class Logger:
    """Singleton logger with rank-aware collective helpers."""

    @staticmethod
    def get():
        global _logger
        if _logger is None:
            _logger = Logger()
        return _logger

    def __init__(self):
        level_name = os.environ.get("TOAST_LOGLEVEL", "INFO").upper()
        self._log = logging.getLogger("toast_tpu")
        if not self._log.handlers:
            handler = logging.StreamHandler(sys.stdout)
            handler.setFormatter(
                logging.Formatter("TOAST %(levelname)s: %(message)s")
            )
            self._log.addHandler(handler)
        self._log.setLevel(_LEVELS.get(level_name, logging.INFO))
        self._log.propagate = False

    def set_level(self, name):
        self._log.setLevel(_LEVELS.get(name.upper(), logging.INFO))

    def verbose(self, msg):
        self._log.log(5, msg)

    def debug(self, msg):
        self._log.debug(msg)

    def info(self, msg):
        self._log.info(msg)

    def warning(self, msg):
        self._log.warning(msg)

    def error(self, msg):
        self._log.error(msg)

    def critical(self, msg):
        self._log.critical(msg)

    def _rank(self, fn, msg, comm=None, rank=0, timer=None):
        my_rank = _process_index() if comm is None else getattr(comm, "rank", 0)
        if timer is not None and timer.is_running():
            timer.stop()
            msg = f"{msg} {timer.seconds():.2f} s"
            timer.clear()
            timer.start()
        if my_rank == rank:
            fn(msg)

    def verbose_rank(self, msg, comm=None, rank=0, timer=None):
        self._rank(self.verbose, msg, comm, rank, timer)

    def debug_rank(self, msg, comm=None, rank=0, timer=None):
        self._rank(self.debug, msg, comm, rank, timer)

    def info_rank(self, msg, comm=None, rank=0, timer=None):
        self._rank(self.info, msg, comm, rank, timer)

    def warning_rank(self, msg, comm=None, rank=0, timer=None):
        self._rank(self.warning, msg, comm, rank, timer)

    def error_rank(self, msg, comm=None, rank=0, timer=None):
        self._rank(self.error, msg, comm, rank, timer)
