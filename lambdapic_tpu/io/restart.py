"""Checkpoint / restart.

Port of the reference RestartDump (callback/restart.py:13-161): interval- or
signal-triggered dumps with keep=N garbage collection and a ``load``
classmethod. The TPU-native checkpoint is a host pickle of the numpy-ified
SimulationState pytree plus the host-side counters — no MPI comm re-dup is
needed (single controller); rebuild happens through Simulation.initialize()
followed by a state overwrite, so device placement/sharding is recreated
from the mesh rather than pickled.
"""
from __future__ import annotations

import pickle
import signal
from pathlib import Path
from typing import Callable, Optional, Union

import numpy as np

from ..simulation.callbacks import Callback
from ..utils.logger import logger


def _state_to_numpy(state):
    import jax

    from ..parallel import distributed as dist
    return jax.tree.map(dist.to_host, state)


class RestartDump(Callback):
    """Dump checkpoints to out_dir/ckpt_{itime:06d}/state.pkl.

    Args:
        out_dir: checkpoint root directory
        interval: steps/seconds/callable trigger (reference semantics)
        keep: number of checkpoints to retain (older ones deleted)
        catch_signals: install SIGINT/SIGTERM handlers that request a dump
            at the next step boundary (SLURM preemption,
            reference restart.py:65-79)
    """

    stage = "end"
    # pickles whatever rho holds; a resumed run recomputes rho on
    # demand in the same deposit_rho mode, so no reader sees stale rho
    rho_free = True

    def __init__(self, out_dir: Union[str, Path] = "checkpoints",
                 interval: Union[int, float, Callable] = 1000,
                 keep: int = 2, catch_signals: bool = True) -> None:
        super().__init__(interval=interval)
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.keep = keep
        self._dump_requested = False
        if catch_signals:
            try:
                signal.signal(signal.SIGTERM, self._signal_handler)
                signal.signal(signal.SIGINT, self._signal_handler)
            except ValueError:
                pass  # not in main thread

    def _signal_handler(self, signum, frame):
        logger.warning(f"signal {signum} received: checkpoint requested")
        self._dump_requested = True

    def __call__(self, sim):
        if self._dump_requested or self._interval_triggered(sim):
            self._call(sim)
            self._dump_requested = False

    def _call(self, sim) -> None:
        from ..parallel import distributed as dist
        payload_state = _state_to_numpy(sim.state)
        if not dist.is_main_process():
            return
        ckpt_dir = self.out_dir / f"ckpt_{sim.itime:06d}"
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        payload = {
            "itime": sim.itime,
            "time": sim.time,
            "window_offset": sim._window_offset,
            "xmin_pml_removed": sim._xmin_pml_removed,
            "state": payload_state,
            "species_caps": [s.cap for s in sim._species_static],
        }
        with open(ckpt_dir / "state.pkl", "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
        logger.info(f"checkpoint written to {ckpt_dir}")
        self._gc()

    def _gc(self):
        ckpts = sorted(self.out_dir.glob("ckpt_*"))
        for old in ckpts[:-self.keep] if self.keep > 0 else []:
            for p in old.glob("*"):
                p.unlink()
            old.rmdir()

    @classmethod
    def load(cls, sim, path: Union[str, Path]) -> None:
        """Restore a simulation from a checkpoint directory (or its parent,
        in which case the latest is used). ``sim`` must be constructed with
        the same physical/config parameters; it will be initialized if
        needed and its state replaced."""
        import jax

        from ..parallel import distributed as dist
        from ..parallel import mesh as pmesh

        path = Path(path)
        if not (path / "state.pkl").exists():
            ckpts = sorted(path.glob("ckpt_*"))
            if not ckpts:
                raise FileNotFoundError(f"no checkpoints under {path}")
            path = ckpts[-1]
        with open(path / "state.pkl", "rb") as f:
            payload = pickle.load(f)
        if not sim.initialized:
            sim.initialize()
        state_np = payload["state"]

        fsh = pmesh.field_sharding(sim.mesh)
        psh = pmesh.particle_sharding(sim.mesh)
        ssh = pmesh.scalar_sharding(sim.mesh)

        def put(a):
            if a.ndim >= sim.grid.dimension and a.shape[: sim.grid.dimension] \
                    == sim.grid.mesh_shape and a.ndim == sim.grid.dimension + 1:
                return dist.put_global(a, psh)
            if a.shape == sim.grid.mesh_shape:
                return dist.put_global(a, ssh)
            if a.shape == sim.grid.shape:
                return dist.put_global(a, fsh)
            # slab-restricted CPML psi arrays: replicate the (tiny)
            # slab axis instead of sharding it (mirror
            # Simulation.initialize's _field_put)
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as _P
            names = [n if k < a.ndim and a.shape[k] == sim.grid.shape[k]
                     else None
                     for k, n in enumerate(sim.mesh.axis_names)]
            return dist.put_global(a, NamedSharding(sim.mesh, _P(*names)))

        sim.state = jax.tree.map(put, state_np)
        # capacities from the checkpoint override the freshly-initialized ones
        import dataclasses
        for i, cap in enumerate(payload["species_caps"]):
            st = sim._species_static[i]
            if st.cap != cap:
                sim._species_static[i] = dataclasses.replace(
                    st, cap=cap, migration_buf=min(st.migration_buf, cap))
        # the dump runs at stage "end" *before* itime/time increment
        # (reference simulation.py:1120-1130), so the checkpointed state is
        # post-step: resume at the next step (reference restart.py bumps
        # itime on load)
        sim.itime = payload["itime"] + 1
        sim.time = payload["time"] + sim.dt
        sim._window_offset = payload["window_offset"]
        sim._xmin_pml_removed = payload["xmin_pml_removed"]
        logger.info(f"restored checkpoint {path} at step {sim.itime}")
