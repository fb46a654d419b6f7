"""Device mesh construction and sharding helpers.

The reference scales by assigning patches to MPI ranks with METIS
partitioning and dynamic load balancing (core/patch/metis.py:7-42,
core/mpi/load_balancer.py:14-269). The TPU rebuild replaces this with a
static uniform ``jax.sharding.Mesh`` over ICI — the deliberate divergence
documented in SURVEY.md §5.8: XLA's SPMD model favors regular sharding, and
load-imbalance is surfaced as a metric instead of being rebalanced.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.grid import Grid


def make_mesh(grid: Grid, devices: Optional[Sequence] = None) -> Mesh:
    """Build the ('px','py'[,'pz']) mesh using the first prod(mesh_shape)
    devices."""
    shape = grid.mesh_shape
    n = int(np.prod(shape))
    if devices is None:
        devices = jax.devices()
    if len(devices) < n:
        raise ValueError(
            f"need {n} devices for patch mesh {shape}, have {len(devices)}")
    dev = np.asarray(devices[:n], dtype=object).reshape(shape)
    return Mesh(dev, grid.axis_names)


def auto_patches(nx: int, ny: int, nz: Optional[int] = None,
                 n_devices: Optional[int] = None) -> Tuple[int, ...]:
    """Pick a patch (device) grid for the available devices.

    Analog of the reference auto_patch_2d/3d (simulation/utils.py:80-139),
    but targeting exactly one patch per device: factor n_devices to minimize
    halo surface given the cell aspect ratio.
    """
    if n_devices is None:
        n_devices = len(jax.devices())
    dims = 2 if nz is None else 3
    best = None
    for px in range(1, n_devices + 1):
        if n_devices % px:
            continue
        rest = n_devices // px
        if dims == 2:
            candidates = [(px, rest)]
        else:
            candidates = [(px, py, rest // py)
                          for py in range(1, rest + 1) if rest % py == 0]
        for cand in candidates:
            ns = (nx, ny) if dims == 2 else (nx, ny, nz)
            if any(n % p or n // p < 8 for n, p in zip(ns, cand)):
                continue
            # halo surface ~ sum over axes of (cells orthogonal to axis) * (p-1)
            locs = [n // p for n, p in zip(ns, cand)]
            surface = 0.0
            for ax in range(dims):
                cross = 1.0
                for k in range(dims):
                    if k != ax:
                        cross *= locs[k]
                surface += cross * (cand[ax] - 1)
            if best is None or surface < best[0]:
                best = (surface, cand)
    if best is None:
        return (1, 1) if dims == 2 else (1, 1, 1)
    return best[1]


def field_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(*mesh.axis_names))


def particle_sharding(mesh: Mesh) -> NamedSharding:
    # leading mesh axes sharded, trailing capacity axis replicated
    return NamedSharding(mesh, P(*mesh.axis_names, None))


def scalar_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(*mesh.axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
