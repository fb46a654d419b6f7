"""Yee FDTD Maxwell solver on the globally sharded grid.

TPU-native equivalent of the reference numba kernels
(core/maxwell/cpu.py:8-158) and their CPML variants
(core/boundary/cpml.py:342-529): one vectorized update over the whole
sharded array; XLA SPMD inserts the guard-cell halo exchanges that the
reference performs explicitly via sync_guard_fields
(core/patch/sync_fields2d.c:43-257, core/mpi/sync_fields2d.c).

Leapfrog staggering and the E/B half-step pattern follow the reference main
loop (simulation/simulation.py:946-960, 1097-1118): each call advances by
``dt`` as passed in (the driver passes dt/2 twice per step).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..constants import c as c_light, epsilon_0
from ..core.grid import Grid
from ..core.state import FieldsState
from .cpml import CPMLCoeffs
from .shifts import diff_hi, diff_lo


def _bcast(arr_1d, axis: int, ndim: int, dtype):
    shape = [1] * ndim
    shape[axis] = len(arr_1d)
    return jnp.asarray(arr_1d, dtype=dtype).reshape(shape)


def _kappa_factors(grid: Grid, cpml: Optional[CPMLCoeffs], which: str, dtype):
    """Per-axis 1/kappa broadcastables (1.0 where axis has no PML)."""
    ndim = grid.dimension
    out = []
    for axis, name in enumerate(grid.axis_names):
        ax = name[-1] if name.startswith("p") else name  # 'px' -> 'x'
        prof = cpml.axis(ax) if cpml is not None else None
        if prof is None:
            out.append(jnp.asarray(1.0, dtype=dtype))
        else:
            out.append(_bcast(1.0 / prof["kappa_" + which], axis, ndim, dtype))
    return out


def update_efield(fields: FieldsState, grid: Grid, dt: float,
                  cpml: Optional[CPMLCoeffs] = None) -> FieldsState:
    """Advance E by dt (reference cpu.py:8-22, 82-97; cpml.py:342-360,
    430-452), then advance the CPML psi_e recursion (cpml.py:531-548,
    569-586, 607-626, 649-708)."""
    dtype = fields.ex.dtype
    ndim = grid.dimension
    per = [grid.periodic(a) for a in ("x", "y", "z")[:ndim]]
    ex, ey, ez = fields.e
    bx, by, bz = fields.b
    jx, jy, jz = fields.j
    bf = jnp.asarray(dt * c_light**2, dtype)
    jf = jnp.asarray(dt / epsilon_0, dtype)
    inv_kx, inv_ky, *rest = _kappa_factors(grid, cpml, "e", dtype)
    inv_kz = rest[0] if rest else None
    dx, dy = grid.dx, grid.dy

    dbz_y = diff_lo(bz, 1, per[1]) / dy
    dbz_x = diff_lo(bz, 0, per[0]) / dx
    dby_x = diff_lo(by, 0, per[0]) / dx
    dbx_y = diff_lo(bx, 1, per[1]) / dy
    if ndim == 2:
        ex = ex + bf * inv_ky * dbz_y - jf * jx
        ey = ey - bf * inv_kx * dbz_x - jf * jy
        ez = ez + bf * (inv_kx * dby_x - inv_ky * dbx_y) - jf * jz
    else:
        dz = grid.dz
        dby_z = diff_lo(by, 2, per[2]) / dz
        dbx_z = diff_lo(bx, 2, per[2]) / dz
        ex = ex + bf * (inv_ky * dbz_y - inv_kz * dby_z) - jf * jx
        ey = ey + bf * (inv_kz * dbx_z - inv_kx * dbz_x) - jf * jy
        ez = ez + bf * (inv_kx * dby_x - inv_ky * dbx_y) - jf * jz

    psi = dict(fields.psi)
    if cpml is not None:
        fac = bf
        if (prof := cpml.axis("x")) is not None:
            b = _bcast(prof["b_e"], 0, ndim, dtype)
            cc = _bcast(prof["c_e"], 0, ndim, dtype)
            psi["psi_ey_x"] = b * psi["psi_ey_x"] + cc * diff_lo(bz, 0, per[0])
            psi["psi_ez_x"] = b * psi["psi_ez_x"] + cc * diff_lo(by, 0, per[0])
            ey = ey - fac * psi["psi_ey_x"]
            ez = ez + fac * psi["psi_ez_x"]
        if (prof := cpml.axis("y")) is not None:
            b = _bcast(prof["b_e"], 1, ndim, dtype)
            cc = _bcast(prof["c_e"], 1, ndim, dtype)
            psi["psi_ex_y"] = b * psi["psi_ex_y"] + cc * diff_lo(bz, 1, per[1])
            psi["psi_ez_y"] = b * psi["psi_ez_y"] + cc * diff_lo(bx, 1, per[1])
            ex = ex + fac * psi["psi_ex_y"]
            ez = ez - fac * psi["psi_ez_y"]
        if ndim == 3 and (prof := cpml.axis("z")) is not None:
            b = _bcast(prof["b_e"], 2, ndim, dtype)
            cc = _bcast(prof["c_e"], 2, ndim, dtype)
            psi["psi_ex_z"] = b * psi["psi_ex_z"] + cc * diff_lo(by, 2, per[2])
            psi["psi_ey_z"] = b * psi["psi_ey_z"] + cc * diff_lo(bx, 2, per[2])
            ex = ex - fac * psi["psi_ex_z"]
            ey = ey + fac * psi["psi_ey_z"]

    return fields.replace(ex=ex, ey=ey, ez=ez, psi=psi)


def update_bfield(fields: FieldsState, grid: Grid, dt: float,
                  cpml: Optional[CPMLCoeffs] = None) -> FieldsState:
    """Advance B by dt (reference cpu.py:24-35, 100-112; cpml.py:362-377,
    454-473), then the CPML psi_b recursion (cpml.py:550-567, 588-605,
    628-647, 669-729)."""
    dtype = fields.bx.dtype
    ndim = grid.dimension
    per = [grid.periodic(a) for a in ("x", "y", "z")[:ndim]]
    ex, ey, ez = fields.e
    bx, by, bz = fields.b
    dtc = jnp.asarray(dt, dtype)
    inv_kx, inv_ky, *rest = _kappa_factors(grid, cpml, "b", dtype)
    inv_kz = rest[0] if rest else None
    dx, dy = grid.dx, grid.dy

    dez_y = diff_hi(ez, 1, per[1]) / dy
    dez_x = diff_hi(ez, 0, per[0]) / dx
    dey_x = diff_hi(ey, 0, per[0]) / dx
    dex_y = diff_hi(ex, 1, per[1]) / dy
    if ndim == 2:
        bx = bx - dtc * inv_ky * dez_y
        by = by + dtc * inv_kx * dez_x
        bz = bz - (dtc * inv_kx * dey_x - dtc * inv_ky * dex_y)
    else:
        dz = grid.dz
        dey_z = diff_hi(ey, 2, per[2]) / dz
        dex_z = diff_hi(ex, 2, per[2]) / dz
        bx = bx - (dtc * inv_ky * dez_y - dtc * inv_kz * dey_z)
        by = by - (dtc * inv_kz * dex_z - dtc * inv_kx * dez_x)
        bz = bz - (dtc * inv_kx * dey_x - dtc * inv_ky * dex_y)

    psi = dict(fields.psi)
    if cpml is not None:
        if (prof := cpml.axis("x")) is not None:
            b = _bcast(prof["b_b"], 0, ndim, dtype)
            cc = _bcast(prof["c_b"], 0, ndim, dtype)
            psi["psi_by_x"] = b * psi["psi_by_x"] + cc * diff_hi(ez, 0, per[0])
            psi["psi_bz_x"] = b * psi["psi_bz_x"] + cc * diff_hi(ey, 0, per[0])
            by = by + dtc * psi["psi_by_x"]
            bz = bz - dtc * psi["psi_bz_x"]
        if (prof := cpml.axis("y")) is not None:
            b = _bcast(prof["b_b"], 1, ndim, dtype)
            cc = _bcast(prof["c_b"], 1, ndim, dtype)
            psi["psi_bx_y"] = b * psi["psi_bx_y"] + cc * diff_hi(ez, 1, per[1])
            psi["psi_bz_y"] = b * psi["psi_bz_y"] + cc * diff_hi(ex, 1, per[1])
            bx = bx - dtc * psi["psi_bx_y"]
            bz = bz + dtc * psi["psi_bz_y"]
        if ndim == 3 and (prof := cpml.axis("z")) is not None:
            b = _bcast(prof["b_b"], 2, ndim, dtype)
            cc = _bcast(prof["c_b"], 2, ndim, dtype)
            psi["psi_bx_z"] = b * psi["psi_bx_z"] + cc * diff_hi(ey, 2, per[2])
            psi["psi_by_z"] = b * psi["psi_by_z"] + cc * diff_hi(ex, 2, per[2])
            bx = bx + dtc * psi["psi_bx_z"]
            by = by - dtc * psi["psi_by_z"]

    return fields.replace(bx=bx, by=by, bz=bz, psi=psi)
