"""HDF5 diagnostics callbacks.

Port of the reference HDF5 writers (callback/hdf5.py:14-701). File layout,
dataset names, and root attrs are kept identical so downstream analysis
scripts work unchanged:

- SaveFieldsToHDF5        -> prefix/{itime:06d}.h5 with /ex../rho datasets
- SaveSpeciesDensityToHDF5-> prefix/{name}_{itime:06d}.h5 with /density
- SaveParticlesToHDF5     -> prefix/{name}_particles_{itime:06d}.h5

Single-controller TPU note: the global field arrays are materialized on host
via np.asarray (JAX gathers shards); there is no per-rank MPI writer — the
reference's ``mpi=True`` parallel-HDF5 path is accepted and ignored.
"""
from __future__ import annotations

from pathlib import Path
from typing import Callable, List, Optional, Union

import numpy as np

from ..parallel import distributed as dist
from ..simulation.callbacks import Callback
from ..utils.logger import logger

try:
    import h5py
except ImportError:          # gated: h5py is an optional dependency
    h5py = None


def _require_h5py():
    if h5py is None:
        raise ImportError("h5py is required for HDF5 output callbacks")


def _normalize_slice(sim_dim: int, user_slice, dims) -> tuple:
    """Normalize an np.s_-style tuple of ints/slices to explicit slices
    (reference hdf5.py:14-100). Ints become length-1 slices."""
    if user_slice is None:
        return None
    if not isinstance(user_slice, tuple):
        user_slice = (user_slice,)
    if len(user_slice) > sim_dim:
        raise ValueError(
            f"slice has {len(user_slice)} dims for a {sim_dim}D simulation")
    user_slice = user_slice + (slice(None),) * (sim_dim - len(user_slice))
    out = []
    for s, n in zip(user_slice, dims):
        if isinstance(s, (int, np.integer)):
            idx = int(s)
            if idx < 0:
                idx += n
            if not 0 <= idx < n:
                raise IndexError(f"index {s} out of bounds for axis size {n}")
            out.append(slice(idx, idx + 1, 1))
        elif isinstance(s, slice):
            start, stop, step = s.indices(n)
            if step <= 0:
                raise ValueError("negative slice steps are not supported")
            out.append(slice(start, stop, step))
        else:
            raise TypeError(f"invalid slice entry {s!r}")
    return tuple(out)


def _serialize_slice(normalized_slice, dims) -> str:
    """(reference hdf5.py:136-161)"""
    parts = []
    for s, n in zip(normalized_slice, dims):
        parts.append(f"{s.start}:{s.stop}:{s.step}")
    return ",".join(parts)


def _write_domain_attrs(f, sim):
    f.attrs["nx"] = sim.nx
    f.attrs["ny"] = sim.ny
    f.attrs["dx"] = sim.dx
    f.attrs["dy"] = sim.dy
    f.attrs["Lx"] = sim.Lx
    f.attrs["Ly"] = sim.Ly
    if sim.dimension == 3:
        f.attrs["nz"] = sim.nz
        f.attrs["dz"] = sim.dz
        f.attrs["Lz"] = sim.Lz
    f.attrs["time"] = sim.time
    f.attrs["itime"] = sim.itime


class SaveFieldsToHDF5(Callback):
    """Save field components each interval (reference hdf5.py:282-399)."""

    ALL_COMPONENTS = {"ex", "ey", "ez", "bx", "by", "bz",
                      "jx", "jy", "jz", "rho"}
    stage = "end"
    # reads via sim.get_field, which recomputes rho on demand when the
    # hot loop runs with deposit_rho off — never sees stale rho
    rho_free = True

    def __init__(self, prefix: Union[str, Path] = "",
                 interval: Union[int, float, Callable] = 100,
                 components: Optional[List[str]] = None,
                 mpi: bool = False,
                 slice=None) -> None:
        _require_h5py()
        super().__init__(interval=interval)
        self.prefix = Path(prefix)
        self.prefix.mkdir(parents=True, exist_ok=True)
        if components is None:
            self.components = sorted(self.ALL_COMPONENTS)
        else:
            invalid = set(components) - self.ALL_COMPONENTS
            if invalid:
                raise ValueError(f"Invalid field components: {invalid}")
            self.components = list(components)
        self.slice = slice

    def _call(self, sim):
        dims = (sim.nx, sim.ny) if sim.dimension == 2 else \
            (sim.nx, sim.ny, sim.nz)
        nslice = _normalize_slice(sim.dimension, self.slice, dims)
        # gather on every process (collective), write on main only
        gathered = {}
        for comp in self.components:
            data = sim.get_field(comp)
            if nslice is not None:
                data = data[nslice]
            gathered[comp] = data
        if not dist.is_main_process():
            return
        filename = self.prefix / f"{sim.itime:06d}.h5"
        with h5py.File(filename, "w") as f:
            for comp, data in gathered.items():
                f.create_dataset(comp, data=np.asarray(data, dtype="f8"))
            _write_domain_attrs(f, sim)
            if nslice is not None:
                f.attrs["slice"] = _serialize_slice(nslice, dims)


class SaveSpeciesDensityToHDF5(Callback):
    """Save species-resolved number density (reference hdf5.py:402-613)."""

    stage = "current_deposition"
    rho_free = True      # uses its own per-species deposit

    def __init__(self, species, prefix: Union[str, Path] = "",
                 interval: Union[int, float, Callable] = 100,
                 mpi: bool = False, slice=None) -> None:
        _require_h5py()
        super().__init__(interval=interval)
        self.species = species
        self.prefix = Path(prefix)
        self.prefix.mkdir(parents=True, exist_ok=True)
        self.slice = slice

    def _density(self, sim) -> np.ndarray:
        dims = (sim.nx, sim.ny) if sim.dimension == 2 else \
            (sim.nx, sim.ny, sim.nz)
        nslice = _normalize_slice(sim.dimension, self.slice, dims)
        dens = sim.species_density(self.species.ispec)
        if nslice is not None:
            dens = dens[nslice]
        return dens

    def _call(self, sim):
        dens = self._density(sim)
        if not dist.is_main_process():
            return
        filename = self.prefix / f"{self.species.name}_{sim.itime:06d}.h5"
        dims = (sim.nx, sim.ny) if sim.dimension == 2 else \
            (sim.nx, sim.ny, sim.nz)
        nslice = _normalize_slice(sim.dimension, self.slice, dims)
        with h5py.File(filename, "w") as f:
            f.create_dataset("density", data=np.asarray(dens, dtype="f8"))
            _write_domain_attrs(f, sim)
            f.attrs["species"] = self.species.name
            if nslice is not None:
                f.attrs["slice"] = _serialize_slice(nslice, dims)


class ExtractSpeciesDensity(SaveSpeciesDensityToHDF5):
    """In-memory species density for plotting (reference
    callback/utils.py:240-464): updates ``self.density`` in place each
    interval so PlotFields can reference it."""

    stage = "current_deposition"

    def __init__(self, sim, species,
                 interval: Union[int, float, Callable] = 100,
                 slice=None) -> None:
        Callback.__init__(self, interval=interval)
        self.species = species
        self.slice = slice
        dims = (sim.nx, sim.ny) if sim.dimension == 2 else \
            (sim.nx, sim.ny, sim.nz)
        nslice = _normalize_slice(sim.dimension, slice, dims)
        if nslice is None:
            self.density = np.zeros(dims)
        else:
            shape = tuple(len(range(s.start, s.stop, s.step))
                          for s in nslice)
            self.density = np.zeros(shape)

    def _call(self, sim):
        self.density[...] = self._density(sim)


class SaveParticlesToHDF5(Callback):
    """Save particle dumps (reference hdf5.py:616-701)."""

    stage = "end"
    rho_free = True

    def __init__(self, species, prefix: Union[str, Path] = "",
                 interval: Union[int, float, Callable] = 100,
                 attrs: Optional[List[str]] = None) -> None:
        _require_h5py()
        super().__init__(interval=interval)
        self.species = species
        self.prefix = Path(prefix)
        self.prefix.mkdir(parents=True, exist_ok=True)
        self.attrs = attrs
        if self.attrs is None:
            logger.warning("No attributes specified, saving all attributes.")
        elif "id" in self.attrs:
            self.attrs.remove("id")

    def _call(self, sim):
        parts = sim.get_particles(self.species.ispec)
        if not dist.is_main_process():
            return
        attrs = self.attrs
        if attrs is None:
            attrs = [k for k in parts if k not in ("id_lo", "id_hi")]
        filename = (self.prefix /
                    f"{self.species.name}_particles_{sim.itime:06d}.h5")
        with h5py.File(filename, "w") as f:
            # 64-bit id recomposed from the uint32 pair
            ids = (parts["id_hi"].astype(np.uint64) << np.uint64(32)) | \
                parts["id_lo"].astype(np.uint64)
            f.create_dataset("id", data=ids)
            for attr in attrs:
                f.create_dataset(attr, data=np.asarray(parts[attr],
                                                       dtype="f8"))
            _write_domain_attrs(f, sim)
            f.attrs["species"] = self.species.name
            f.attrs["npart"] = len(ids)
