"""Logging (reference core/utils/logger.py:14-133, loguru-based).

Rebuilt on stdlib logging (loguru is not available in this environment):
custom SUCCESS(25) and TIMER(22) levels, console excludes TIMER, optional
main log file plus a dedicated ``<log>.timer.txt`` sink, and a
``LAMBDAPIC_LOG_LEVEL`` env override.
"""
from __future__ import annotations

import logging
import os
import sys
from pathlib import Path
from typing import Optional

SUCCESS = 25
TIMER = 22
logging.addLevelName(SUCCESS, "SUCCESS")
logging.addLevelName(TIMER, "TIMER")

logger = logging.getLogger("lambdapic_tpu")
logger.setLevel(logging.DEBUG)
logger.propagate = False


def _success(self, msg, *args, **kw):
    if self.isEnabledFor(SUCCESS):
        self._log(SUCCESS, msg, args, **kw)


def _timer(self, msg, *args, **kw):
    if self.isEnabledFor(TIMER):
        self._log(TIMER, msg, args, **kw)


logging.Logger.success = _success  # type: ignore[attr-defined]
logging.Logger.timer = _timer      # type: ignore[attr-defined]

_FMT = "%(asctime)s | %(levelname)-8s | %(message)s"

_timer_sink_path: Optional[str] = None


class _NoTimerFilter(logging.Filter):
    def filter(self, record):
        return record.levelno != TIMER


class _TimerOnlyFilter(logging.Filter):
    def filter(self, record):
        return record.levelno == TIMER


def configure_logger(sink: Optional[str] = None, truncate_existing: bool = True,
                     enable_timer: bool = False) -> None:
    """Configure console/file/timer sinks (reference logger.py:27-126)."""
    global _timer_sink_path
    for h in list(logger.handlers):
        logger.removeHandler(h)

    level_name = os.environ.get("LAMBDAPIC_LOG_LEVEL", "INFO").upper()
    level = {"SUCCESS": SUCCESS, "TIMER": TIMER}.get(
        level_name, getattr(logging, level_name, logging.INFO))

    console = logging.StreamHandler(sys.stderr)
    console.setLevel(level)
    console.setFormatter(logging.Formatter(_FMT))
    console.addFilter(_NoTimerFilter())
    logger.addHandler(console)

    if sink is not None:
        mode = "w" if truncate_existing else "a"
        Path(sink).parent.mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(sink, mode=mode)
        fh.setLevel(min(level, logging.DEBUG))
        fh.setFormatter(logging.Formatter(_FMT))
        fh.addFilter(_NoTimerFilter())
        logger.addHandler(fh)

        if enable_timer:
            p = Path(sink)
            _timer_sink_path = str(p.with_suffix(".timer.txt")) \
                if p.suffix else str(p) + ".timer.txt"
            th = logging.FileHandler(_timer_sink_path, mode=mode)
            th.setLevel(TIMER)
            th.setFormatter(logging.Formatter(_FMT))
            th.addFilter(_TimerOnlyFilter())
            logger.addHandler(th)
    elif enable_timer:
        _timer_sink_path = "lambdapic_tpu.timer.txt"
        th = logging.FileHandler(_timer_sink_path, mode="w")
        th.setLevel(TIMER)
        th.setFormatter(logging.Formatter(_FMT))
        th.addFilter(_TimerOnlyFilter())
        logger.addHandler(th)


def timer_sink_path() -> Optional[str]:
    return _timer_sink_path


def rank_log(message: str, level: int = logging.INFO) -> None:
    """Single-controller analog of the reference rank_log
    (logger.py:128-133)."""
    logger.log(level, message)
