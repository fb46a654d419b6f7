"""Static grid / domain-decomposition geometry.

The reference decomposes the domain into many small patches scheduled over
OpenMP threads and MPI ranks (reference core/patch/patch.py:24-907). On TPU
the analogous unit is the *device*: the global Yee grid is sharded over a
``jax.sharding.Mesh`` with axes ('px','py'[,'pz']), one shard per chip, and
guard-cell exchange rides ICI via ppermute (see parallel/halo.py). There is
no METIS/load-balancer analog: static uniform sharding is the deliberate
TPU-native divergence (SURVEY.md §5.8).

Coordinate conventions (identical to the reference):
- cell centers of the global grid are at ``i*dx`` for i in [0, nx); the
  domain spans [-dx/2, Lx-dx/2) (reference simulation.py:425-430).
- particle positions are stored **in units of the cell size, relative to the
  local shard origin**: local cell centers at 0..nx_loc-1, domain
  [-0.5, nx_loc-0.5). This keeps float32 positions accurate to ~1e-4 cells
  regardless of the SI magnitude of dx.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Literal, Tuple

import numpy as np

BoundaryName = Literal["xmin", "xmax", "ymin", "ymax", "zmin", "zmax"]


@dataclass(frozen=True)
class Grid:
    """Static geometry shared by all operators. Hashable (jit-static)."""

    dimension: int
    nx: int
    ny: int
    dx: float
    dy: float
    npatch_x: int
    npatch_y: int
    n_guard: int
    cpml_thickness: int
    boundary_conditions: Tuple[Tuple[str, str], ...]  # (name, 'pml'|'periodic')
    nz: int = 1
    dz: float = 1.0
    npatch_z: int = 1

    @property
    def bc(self) -> Dict[str, str]:
        return dict(self.boundary_conditions)

    # local (per-device) interior sizes
    @property
    def nx_loc(self) -> int:
        return self.nx // self.npatch_x

    @property
    def ny_loc(self) -> int:
        return self.ny // self.npatch_y

    @property
    def nz_loc(self) -> int:
        return self.nz // self.npatch_z

    @property
    def Lx(self) -> float:
        return self.nx * self.dx

    @property
    def Ly(self) -> float:
        return self.ny * self.dy

    @property
    def Lz(self) -> float:
        return self.nz * self.dz

    def periodic(self, axis: str) -> bool:
        return self.bc.get(axis + "min", "pml") == "periodic"

    @property
    def shape(self) -> Tuple[int, ...]:
        if self.dimension == 2:
            return (self.nx, self.ny)
        return (self.nx, self.ny, self.nz)

    @property
    def mesh_shape(self) -> Tuple[int, ...]:
        if self.dimension == 2:
            return (self.npatch_x, self.npatch_y)
        return (self.npatch_x, self.npatch_y, self.npatch_z)

    @property
    def axis_names(self) -> Tuple[str, ...]:
        return ("px", "py", "pz")[: self.dimension]

    def axes_si(self):
        """Global cell-center coordinate axes in SI meters (1D arrays)."""
        xs = np.arange(self.nx, dtype=np.float64) * self.dx
        ys = np.arange(self.ny, dtype=np.float64) * self.dy
        if self.dimension == 2:
            return xs, ys
        zs = np.arange(self.nz, dtype=np.float64) * self.dz
        return xs, ys, zs

    def validate(self):
        if self.nx % self.npatch_x:
            raise ValueError(
                f"nx ({self.nx}) must be divisible by npatch_x ({self.npatch_x})")
        if self.ny % self.npatch_y:
            raise ValueError(
                f"ny ({self.ny}) must be divisible by npatch_y ({self.npatch_y})")
        if self.dimension == 3 and self.nz % self.npatch_z:
            raise ValueError(
                f"nz ({self.nz}) must be divisible by npatch_z ({self.npatch_z})")
        for n_loc, npatch, name in (
            (self.nx_loc, self.npatch_x, "x"),
            (self.ny_loc, self.npatch_y, "y"),
        ) + (((self.nz_loc, self.npatch_z, "z"),) if self.dimension == 3 else ()):
            if n_loc < self.n_guard:
                raise ValueError(
                    f"per-device n{name} ({n_loc}) must be >= n_guard "
                    f"({self.n_guard})")
        for (bname, kind) in self.boundary_conditions:
            if kind not in ("pml", "periodic"):
                raise ValueError(f"unsupported boundary {bname}={kind}")
        for ax in "xy" + ("z" if self.dimension == 3 else ""):
            kinds = {self.bc.get(ax + "min"), self.bc.get(ax + "max")}
            if "periodic" in kinds and len(kinds) > 1:
                raise ValueError(
                    f"{ax}: periodic boundary must be set on both sides")
