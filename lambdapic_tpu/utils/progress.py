"""Progress bar (reference core/utils/progress_bar.py:13-346).

tqdm when attached to a terminal, logged progress otherwise; optional SLURM
job-comment updates (reference _update_slurm_comment) when running under a
scheduler.
"""
from __future__ import annotations

import os
import subprocess
import sys
import time
from typing import Optional

from .logger import logger


def is_terminal() -> bool:
    """(reference core/utils/terminal.py:6-16)"""
    return sys.stderr.isatty()


class ProgressBar:
    def __init__(self, total: int, initial: int = 0, desc: str = "Progress",
                 disable: bool = False, position: int = 0,
                 log_every_percent: float = 5.0):
        self.total = max(total, 1)
        self.n = initial
        self.desc = desc
        self.disable = disable
        self._tqdm = None
        self._last_logged = -1.0
        self._log_every = log_every_percent
        self._slurm_job = os.environ.get("SLURM_JOB_ID")
        self._t0 = time.time()
        if not disable and is_terminal():
            try:
                from tqdm.auto import tqdm
                self._tqdm = tqdm(total=total, initial=initial, desc=desc,
                                  position=position)
            except Exception:
                self._tqdm = None

    def update(self, n: int = 1):
        self.n += n
        if self.disable:
            return
        if self._tqdm is not None:
            self._tqdm.update(n)
            return
        pct = 100.0 * self.n / self.total
        if pct - self._last_logged >= self._log_every or self.n >= self.total:
            rate = self.n / max(time.time() - self._t0, 1e-9)
            logger.info(f"{self.desc}: {self.n}/{self.total} "
                        f"({pct:.1f}%, {rate:.1f} steps/s)")
            self._last_logged = pct
            self._update_slurm_comment(pct)

    def _update_slurm_comment(self, pct: float):
        if not self._slurm_job:
            return
        try:
            subprocess.run(
                ["scontrol", "update", f"job={self._slurm_job}",
                 f"comment={pct:.0f}%"],
                capture_output=True, timeout=5)
        except Exception:
            self._slurm_job = None  # stop trying

    def close(self):
        if self._tqdm is not None:
            self._tqdm.close()
            self._tqdm = None
