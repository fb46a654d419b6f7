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


def _slice_ax(arr, axis: int, start: int, stop: int):
    idx = [slice(None)] * arr.ndim
    idx[axis] = slice(start, stop)
    return arr[tuple(idx)]


def _diff_region(f, axis: int, start: int, width: int, periodic: bool,
                 hi: bool):
    """Rows [start, start+width) of diff_lo(f) (hi=False) or diff_hi(f)
    (hi=True) along ``axis``, computed on a (width+1)-row slice only.
    Out-of-range neighbor rows wrap when periodic, else read zero —
    identical to shifts.diff_lo/diff_hi on the full array."""
    n = f.shape[axis]
    if hi:
        if start + width < n:
            sl = _slice_ax(f, axis, start, start + width + 1)
        else:
            last = _slice_ax(f, axis, 0, 1) if periodic else \
                jnp.zeros_like(_slice_ax(f, axis, 0, 1))
            sl = jnp.concatenate(
                [_slice_ax(f, axis, start, n), last], axis=axis)
    else:
        if start > 0:
            sl = _slice_ax(f, axis, start - 1, start + width)
        else:
            prev = _slice_ax(f, axis, n - 1, n) if periodic else \
                jnp.zeros_like(_slice_ax(f, axis, 0, 1))
            sl = jnp.concatenate(
                [prev, _slice_ax(f, axis, 0, width)], axis=axis)
    return (_slice_ax(sl, axis, 1, width + 1)
            - _slice_ax(sl, axis, 0, width))


def _psi_axis_update(psi, fields_by_name, cpml: CPMLCoeffs, ax: str,
                     axis: int, which: str, fac, periodic: bool, dtype,
                     pairs):
    """One axis's psi recursion + field correction, on either full-size
    or slab-restricted psi arrays (detected from the stored shape).

    pairs = ((psi_key, src_name, tgt_name, sign), ...): for each psi
    array on this axis, the curl source field (diff'd along ``axis``),
    the corrected target field, and the sign of the ``fac * psi``
    correction. Mutates ``psi`` and ``fields_by_name`` in place.
    """
    prof = cpml.axis(ax)
    ndim = fields_by_name[pairs[0][1]].ndim
    coef = "b_" + which, "c_" + which
    full_n = fields_by_name[pairs[0][1]].shape[axis]
    slab = psi[pairs[0][0]].shape[axis] != full_n
    if not slab:
        b = _bcast(prof[coef[0]], axis, ndim, dtype)
        cc = _bcast(prof[coef[1]], axis, ndim, dtype)
        d = diff_hi if which == "b" else diff_lo
        for key, src, tgt, sign in pairs:
            p = b * psi[key] + cc * d(fields_by_name[src], axis, periodic)
            psi[key] = p
            fields_by_name[tgt] = fields_by_name[tgt] + sign * fac * p
        return

    regions = cpml.regions(ax)
    off = 0
    new_parts = {key: [] for key, *_ in pairs}
    for start, width in regions:
        b = _bcast(prof[coef[0]][start:start + width], axis, ndim, dtype)
        cc = _bcast(prof[coef[1]][start:start + width], axis, ndim, dtype)
        for key, src, tgt, sign in pairs:
            p_old = _slice_ax(psi[key], axis, off, off + width)
            d = _diff_region(fields_by_name[src], axis, start, width,
                             periodic, hi=(which == "b"))
            p = b * p_old + cc * d
            new_parts[key].append(p)
            idx = [slice(None)] * ndim
            idx[axis] = slice(start, start + width)
            fields_by_name[tgt] = fields_by_name[tgt].at[tuple(idx)].add(
                sign * fac * p)
        off += width
    for key, parts in new_parts.items():
        psi[key] = parts[0] if len(parts) == 1 else \
            jnp.concatenate(parts, axis=axis)


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
        fb = {"ex": ex, "ey": ey, "ez": ez, "bx": bx, "by": by, "bz": bz}
        if cpml.axis("x") is not None:
            _psi_axis_update(psi, fb, cpml, "x", 0, "e", bf, per[0], dtype,
                             (("psi_ey_x", "bz", "ey", -1),
                              ("psi_ez_x", "by", "ez", +1)))
        if cpml.axis("y") is not None:
            _psi_axis_update(psi, fb, cpml, "y", 1, "e", bf, per[1], dtype,
                             (("psi_ex_y", "bz", "ex", +1),
                              ("psi_ez_y", "bx", "ez", -1)))
        if ndim == 3 and cpml.axis("z") is not None:
            _psi_axis_update(psi, fb, cpml, "z", 2, "e", bf, per[2], dtype,
                             (("psi_ex_z", "by", "ex", -1),
                              ("psi_ey_z", "bx", "ey", +1)))
        ex, ey, ez = fb["ex"], fb["ey"], fb["ez"]

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
        fb = {"ex": ex, "ey": ey, "ez": ez, "bx": bx, "by": by, "bz": bz}
        if cpml.axis("x") is not None:
            _psi_axis_update(psi, fb, cpml, "x", 0, "b", dtc, per[0], dtype,
                             (("psi_by_x", "ez", "by", +1),
                              ("psi_bz_x", "ey", "bz", -1)))
        if cpml.axis("y") is not None:
            _psi_axis_update(psi, fb, cpml, "y", 1, "b", dtc, per[1], dtype,
                             (("psi_bx_y", "ez", "bx", -1),
                              ("psi_bz_y", "ex", "bz", +1)))
        if ndim == 3 and cpml.axis("z") is not None:
            _psi_axis_update(psi, fb, cpml, "z", 2, "b", dtc, per[2], dtype,
                             (("psi_bx_z", "ey", "bx", +1),
                              ("psi_by_z", "ex", "by", -1)))
        bx, by, bz = fb["bx"], fb["by"], fb["bz"]

    return fields.replace(bx=bx, by=by, bz=bz, psi=psi)
