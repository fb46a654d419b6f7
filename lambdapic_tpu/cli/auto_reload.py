"""Hot-reload driver (reference cli/auto_reload.py:11-90): re-imports the
user script when its mtime changes and restarts sim.run with a
stop_callback, so running simulations can be edited live on clusters."""
from __future__ import annotations

import importlib
import os
import sys
import time
from pathlib import Path

from ..simulation.simulation import Simulation
from ..utils.logger import logger


class AutoReload:
    def __init__(self, script: Path, exit_on_error: bool = False,
                 exit_on_finish: bool = False):
        self.script_path = script
        self.script = script.stem
        self.last_modified = os.path.getmtime(self.script_path)
        self.modified = False
        sys.path.insert(0, str(script.parent.resolve()))
        self.module = importlib.import_module(self.script)
        self.exit_on_error = exit_on_error
        self.exit_on_finish = exit_on_finish

    @property
    def sim(self) -> Simulation:
        for local in dir(self.module):
            if isinstance(getattr(self.module, local), Simulation):
                return getattr(self.module, local)
        raise ValueError("No Simulation instance found in the input file.")

    @property
    def callbacks(self):
        if hasattr(self.module, "callbacks"):
            return self.module.callbacks
        logger.warning("No 'callbacks' attribute found in the module.")
        return []

    def reload(self):
        try:
            importlib.reload(self.module)
            logger.info(f"Reloaded {self.script}")
        except Exception as e:
            logger.error(f"Error reloading {self.script}: {e}")

    def check_modification(self) -> bool:
        current = os.path.getmtime(self.script_path)
        if current > self.last_modified:
            self.modified = True
            self.last_modified = current
            return True
        return False

    def run(self):
        finished = False
        while True:
            if self.modified:
                self.reload()
                self.modified = False
                finished = False
            try:
                if not finished:
                    self.sim.initialized = False
                    ret = self.sim.run(callbacks=self.callbacks,
                                       stop_callback=self.check_modification)
                    if ret is None:
                        finished = True
                        if self.exit_on_finish:
                            break
                    elif ret == "stop by callback":
                        logger.info("Modification detected. Restarting...")
                        finished = False
            except Exception as e:
                if not self.exit_on_error:
                    logger.info(f"Error: {e}. Restarting...")
                    time.sleep(3)
                    self.modified = True
                else:
                    raise
            self.check_modification()
            time.sleep(3)
