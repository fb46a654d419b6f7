"""Live-edit supervisor for simulation scripts.

Feature parity target: the reference's ``lambdapic autoreload``
(cli/auto_reload.py:11-90 — re-import the user script when it changes
and restart ``sim.run``). This implementation is built around a
different core: a *file-snapshot watcher* plus a *supervisor state
machine*, rather than a single-mtime poll inside the run loop.

Differences from (and improvements over) the reference behavior:

- watches the script AND any sibling ``.py`` files it imports (a helper
  module edit triggers a reload too);
- snapshots are (mtime_ns, size) pairs, so zero-delta editor saves and
  clock-skewed filesystems are still detected;
- crash restarts use exponential backoff (1 s .. 30 s) instead of a
  fixed sleep, and a crashed script is only re-run after it (or a
  watched sibling) actually changes — re-running an unmodified crashing
  script in a tight loop is never useful;
- the supervisor's decisions are logged with explicit state names so a
  cluster log shows *why* a restart happened.

Used by ``lambdapic-tpu autoreload`` (cli/main.py).
"""
from __future__ import annotations

import importlib
import sys
import time
from pathlib import Path
from typing import Dict, Optional, Tuple

from ..utils.logger import logger

Snapshot = Dict[Path, Tuple[int, int]]

# supervisor states (logged, not user-facing API)
_RUNNING = "running"
_FINISHED = "finished"
_CRASHED = "crashed"


def _stat_key(p: Path) -> Optional[Tuple[int, int]]:
    try:
        st = p.stat()
    except OSError:
        return None
    return (st.st_mtime_ns, st.st_size)


def take_snapshot(paths) -> Snapshot:
    """(mtime_ns, size) per existing path."""
    out: Snapshot = {}
    for p in paths:
        k = _stat_key(p)
        if k is not None:
            out[p] = k
    return out


def changed_paths(before: Snapshot, after: Snapshot):
    """Paths whose stat key differs between two snapshots (either
    direction: edited, replaced, deleted or created)."""
    keys = set(before) | set(after)
    return sorted(p for p in keys if before.get(p) != after.get(p))


class ScriptSupervisor:
    """Run a simulation script, restarting it when watched files change.

    The script is imported as a module; it must leave a ``Simulation``
    (or ``Simulation3D``) instance and, optionally, a ``callbacks``
    list in its globals. The supervisor then drives ``sim.run`` with a
    stop hook that fires as soon as a watched file changes.
    """

    def __init__(self, script: Path, exit_on_error: bool = False,
                 exit_on_finish: bool = False, poll_seconds: float = 1.0,
                 max_backoff: float = 30.0):
        self.script = Path(script).resolve()
        if not self.script.exists():
            raise FileNotFoundError(self.script)
        self.exit_on_error = exit_on_error
        self.exit_on_finish = exit_on_finish
        self.poll_seconds = poll_seconds
        self.max_backoff = max_backoff
        self._module = None
        self._snap: Snapshot = {}
        sys.path.insert(0, str(self.script.parent))

    # -- watched-file set ------------------------------------------------
    def _watch_set(self):
        files = {self.script}
        mod = self._module
        if mod is not None:
            root = self.script.parent
            for m in list(sys.modules.values()):
                f = getattr(m, "__file__", None)
                if not f:
                    continue
                p = Path(f)
                # only sibling files of the script count as "user code"
                if p.suffix == ".py" and p.parent == root:
                    files.add(p)
        return files

    def _rearm(self):
        self._snap = take_snapshot(self._watch_set())

    def _edits(self):
        return changed_paths(self._snap, take_snapshot(self._watch_set()))

    def stop_requested(self) -> bool:
        """Stop hook handed to sim.run: True once any watched file
        changed since the last (re)load."""
        return bool(self._edits())

    # -- module + sim access ----------------------------------------------
    def _load(self) -> bool:
        """(Re)import the script; returns True on success."""
        name = self.script.stem
        try:
            if self._module is None:
                self._module = importlib.import_module(name)
            else:
                self._module = importlib.reload(self._module)
        except Exception:
            logger.exception(f"autoreload: import of {name} failed")
            return False
        self._rearm()
        return True

    def _find_sim(self):
        from ..simulation.simulation import Simulation
        cands = [v for v in vars(self._module).values()
                 if isinstance(v, Simulation)]
        if not cands:
            raise ValueError(
                f"{self.script.name} defines no Simulation instance")
        if len(cands) > 1:
            logger.warning(f"autoreload: {len(cands)} Simulation instances "
                           "in script; driving the first")
        return cands[0]

    def _find_callbacks(self):
        cbs = getattr(self._module, "callbacks", None)
        if cbs is None:
            logger.warning("autoreload: script has no 'callbacks' list; "
                           "running without callbacks")
            return []
        return cbs

    # -- supervisor loop ---------------------------------------------------
    def _wait_for_edit(self, backoff: float = 0.0):
        """Block until a watched file changes (with optional initial
        backoff pause)."""
        if backoff:
            time.sleep(min(backoff, self.max_backoff))
        while not self._edits():
            time.sleep(self.poll_seconds)

    def run_forever(self) -> int:
        """Drive the script until exit_on_finish/exit_on_error applies.
        Returns a process exit code."""
        backoff = 1.0
        if not self._load():
            if self.exit_on_error:
                return 1
            self._wait_for_edit(backoff)
            return self.run_forever()

        while True:
            state = _RUNNING
            try:
                sim = self._find_sim()
                sim.initialized = False   # re-init after each (re)load
                ret = sim.run(callbacks=self._find_callbacks(),
                              stop_callback=self.stop_requested)
                state = _FINISHED if ret is None else _RUNNING
                backoff = 1.0
            except Exception:
                logger.exception("autoreload: simulation crashed")
                if self.exit_on_error:
                    return 1
                state = _CRASHED

            if state == _FINISHED:
                if self.exit_on_finish:
                    logger.info("autoreload: run finished; exiting")
                    return 0
                logger.info("autoreload: run finished; watching for edits")
                self._wait_for_edit()
            elif state == _CRASHED:
                logger.info(f"autoreload: waiting for an edit before "
                            f"retrying (backoff {backoff:.0f}s)")
                self._wait_for_edit(backoff)
                backoff = min(backoff * 2, self.max_backoff)
            else:
                # stop hook fired mid-run: fall through to reload below
                logger.info("autoreload: edit detected; reloading script")

            if not self._load():
                if self.exit_on_error:
                    return 1
                self._wait_for_edit()


# Backwards-compatible alias: cli/main.py and user code may refer to the
# class by the reference's command name.
class AutoReload(ScriptSupervisor):
    def run(self) -> int:
        return self.run_forever()
