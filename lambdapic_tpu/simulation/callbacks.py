"""Callback / stage dispatch system.

Port of the reference callback layer (callback/callback.py:11-141,
simulation/simulation.py:170-184, 1435-1509): every callback has a ``stage``
(one of 14 STAGES) and an ``interval`` (int = every N steps, float = every T
seconds of simulation time, callable(sim) -> bool); plain functions are
wrapped with the default stage "end".

TPU-native split: callbacks run **on host between jitted segments**. The
step is compiled in segments bounded by the stages that host callbacks
actually occupy; when no inner-stage callback is due, the fully fused step
runs (the analog of the reference's unified-pusher auto-selection,
simulation.py:896-911). Callbacks that are pure jax transforms of the state
can instead subclass ``JaxCallback`` and are traced into the step (lasers do
this, models/laser.py).
"""
from __future__ import annotations

import math
from typing import Callable as TCallable, Dict, List, Optional, Sequence, Union

from ..utils.logger import logger

STAGES: List[str] = [
    "init",
    "start",
    "maxwell_1",
    "_push_position_1",
    "_interpolator",
    "_qed",
    "_push_momentum",
    "_push_position_2",
    "current_deposition",
    "qed_create_particles",
    "_laser",
    "maxwell_2",
    "end",
    "final",
]
DEFAULT_STAGE = "end"

# stages at which host callbacks can run without splitting the fused
# per-species block (segment boundaries of the TPU step)
HOST_STAGES = {"init", "start", "maxwell_1", "current_deposition",
               "qed_create_particles", "maxwell_2", "end", "final"}
# inner stages (inside the fused particle block); host callbacks here
# force the split species path (one jitted sub-segment per stage).
# (sub-segment key, callback stage) in execution order; the final
# "deposit" sub-segment has no inner callback stage of its own
# (current_deposition is a boundary stage run right after it).
INNER_SUBSTAGES = (("p1", "_push_position_1"), ("interp", "_interpolator"),
                   ("qed", "_qed"), ("mom", "_push_momentum"),
                   ("p2", "_push_position_2"), ("deposit", None))
INNER_STAGES = {st for _, st in INNER_SUBSTAGES if st is not None}

Interval = Union[int, float, TCallable, None]


class Callback:
    """Base class (reference callback/callback.py:48-141)."""

    stage: str = DEFAULT_STAGE
    interval: Interval = 1
    # provably does not read sim rho (deposit_rho="auto" skips the
    # every-step rho deposit only when ALL callbacks set this)
    rho_free: bool = False

    def __init__(self, interval: Interval = 1,
                 stage: Optional[str] = None) -> None:
        self.interval = interval
        if stage is not None:
            self.stage = stage
        if self.stage not in STAGES:
            raise ValueError(f"stage must be one of {STAGES}, got {self.stage}")

    def _interval_triggered(self, sim) -> bool:
        interval = self.interval
        if interval is None:
            return True
        if callable(interval):
            return bool(interval(sim))
        if isinstance(interval, bool):
            return interval
        if isinstance(interval, int):
            return interval > 0 and sim.itime % interval == 0
        if isinstance(interval, float):
            t = sim.time
            return math.floor(t / interval) != math.floor((t - sim.dt) / interval)
        raise TypeError(f"invalid interval {interval!r}")

    def __call__(self, sim) -> None:
        if self._interval_triggered(sim):
            self._call(sim)

    def _call(self, sim) -> None:
        raise NotImplementedError


class _FunctionCallback(Callback):
    def __init__(self, func, stage: str = DEFAULT_STAGE, interval: Interval = 1):
        super().__init__(interval=interval, stage=stage)
        self.func = func
        self.__name__ = getattr(func, "__name__", repr(func))

    def _call(self, sim):
        self.func(sim)


def callback(stage: str = DEFAULT_STAGE, interval: Interval = 1):
    """Decorator turning a plain function into a staged callback
    (reference callback.py:48-99). Usable as ``@callback`` or
    ``@callback(stage=..., interval=...)``."""
    if callable(stage):  # bare @callback
        return _FunctionCallback(stage)

    def deco(func):
        return _FunctionCallback(func, stage=stage, interval=interval)

    return deco


def as_callback(obj) -> Callback:
    if isinstance(obj, Callback):
        return obj
    if callable(obj):
        stage = getattr(obj, "stage", DEFAULT_STAGE)
        interval = getattr(obj, "interval", 1)
        return _FunctionCallback(obj, stage=stage, interval=interval)
    raise TypeError(f"not a callback: {obj!r}")


class SimulationCallbacks:
    """Bucket callbacks by stage (reference simulation.py:1435-1509)."""

    def __init__(self, callbacks: Sequence, sim) -> None:
        self.by_stage: Dict[str, List[Callback]] = {s: [] for s in STAGES}
        self.sim = sim
        for cb in callbacks or []:
            # traced (jax) callbacks are handled by the step builder
            if getattr(cb, "is_jax_callback", False):
                continue
            cb = as_callback(cb)
            # host callbacks at inner stages force the split particle
            # path (simulation.run), the analog of the reference
            # disabling the unified pusher (simulation.py:896-911)
            self.by_stage[cb.stage].append(cb)

    def run(self, stage: str) -> None:
        for cb in self.by_stage.get(stage, []):
            try:
                cb(self.sim)
            except Exception:
                logger.exception(f"callback {cb!r} failed at stage {stage}")
                raise

    def has(self, stage: str) -> bool:
        return bool(self.by_stage.get(stage))

    def due(self, stage: str) -> bool:
        return any(cb._interval_triggered(self.sim)
                   for cb in self.by_stage.get(stage, []))


class JaxCallback:
    """A callback traced into the jitted step: a pure transform
    ``(state, scalars) -> state`` at a given stage. Scalars are host-computed
    per step via ``host_scalars(sim)`` (e.g. laser phase, time envelope)."""

    is_jax_callback = True
    stage: str = "_laser"
    rho_free = True          # lasers touch B fields only

    def host_scalars(self, sim) -> dict:
        return {}

    def apply(self, state, grid, dt, scalars):  # pure, traced
        raise NotImplementedError
