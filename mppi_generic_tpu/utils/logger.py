"""Leveled, ANSI-colored logger — parity with ``MPPILogger``
(utils/logger.hpp:15-181): DEBUG/INFO/WARNING/ERROR levels, colored output,
injectable into every component. Built on the stdlib so host-side runtime
code (plant loop, autotuner) shares one sink; device code never logs
(jax.debug.print exists for kernel debugging).
"""

from __future__ import annotations

import logging
import sys
from enum import IntEnum


class LogLevel(IntEnum):
    DEBUG = logging.DEBUG
    INFO = logging.INFO
    WARNING = logging.WARNING
    ERROR = logging.ERROR
    NONE = logging.CRITICAL + 10


_COLORS = {
    logging.DEBUG: "\033[36m",     # cyan
    logging.INFO: "\033[32m",      # green
    logging.WARNING: "\033[33m",   # yellow
    logging.ERROR: "\033[31m",     # red
}
_RESET = "\033[0m"


class _ColorFormatter(logging.Formatter):
    def __init__(self, use_color: bool, display_name: str):
        super().__init__(f"{display_name} %(levelname)s: %(message)s")
        self.use_color = use_color

    def format(self, record):
        msg = super().format(record)
        if self.use_color and record.levelno in _COLORS:
            return f"{_COLORS[record.levelno]}{msg}{_RESET}"
        return msg


class MPPILogger:
    """API mirror of mppi::util::MPPILogger: ``debug/info/warning/error`` +
    ``set_log_level``. One instance can be shared across components the way
    the reference propagates its logger (controller.cuh:903-929)."""

    def __init__(self, name: str = "mppi", level: LogLevel = LogLevel.INFO,
                 stream=None, use_color: bool = True):
        # unique underlying logger per instance so each injected logger owns
        # its level/sink (shared names would alias logging.Logger state);
        # the display name stays ``name``
        self._logger = logging.getLogger(f"{name}.{id(self)}")
        self._logger.propagate = False
        self._logger.handlers.clear()
        handler = logging.StreamHandler(stream or sys.stderr)
        handler.setFormatter(_ColorFormatter(use_color, name))
        self._logger.addHandler(handler)
        self.set_log_level(level)

    def set_log_level(self, level: LogLevel):
        self._logger.setLevel(int(level))

    @property
    def level(self) -> LogLevel:
        return LogLevel(self._logger.level)

    def debug(self, msg, *args):
        self._logger.debug(msg, *args)

    def info(self, msg, *args):
        self._logger.info(msg, *args)

    def warning(self, msg, *args):
        self._logger.warning(msg, *args)

    def error(self, msg, *args):
        self._logger.error(msg, *args)
