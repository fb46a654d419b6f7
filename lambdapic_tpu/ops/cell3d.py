"""Cell-binned particle kernels (3D) — the static-stencil VPU engine.

3D extension of ops/cell2d.py: particles live in per-cell slots, shape
(cap_c, nx_loc, ny_loc, nz_loc), slots on the leading axis, cells on the
array axes. Invariant: slot (s, i, j, k) holds a particle whose home cell
is (i, j, k) (floor(pos + 0.5) == cell index per axis).

Gather/deposit are static loops over stencil offsets — pure elementwise
VPU work against statically shifted field slices, no random access (TPUs
have no hardware gather/scatter). Numerical contract identical to
ops/interpolation.py::gather_eb_3d and ops/deposition.py::deposit_3d
(reference interpolation/cpu3d.c, current_deposit.h:275-440).

BINNING CONTRACT (see ops/cell2d.py): particles are re-binned at the
MID-step position, so gather deltas lie in [-0.5, 0.5) (3/4-tap
stencils exact) and the deposit's segment endpoints stay within the
5-tap {-2,...,2} stencil per axis (n_guard >= 2).

The per-offset loop hoists the (oy, oz) pair products out of the ox
loop so each of the 125 offsets costs one multiply + one slot-reduce per
channel instead of a full triple product.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import c as c_light
from ..parallel.halo import HaloSpec
from .tiled2d import _roll_with_edge_exchange

_GOFF = (-1, 0, 1)           # integer-staggered taps
_HOFF = (-2, -1, 0, 1)       # half-staggered taps (<=3 nonzero)
_DOFF = (-2, -1, 0, 1, 2)    # deposit (post-re-bin)


def _m2(d):
    ad = jnp.abs(d)
    return jnp.where(ad <= 0.5, 0.75 - d * d,
                     jnp.where(ad < 1.5, 0.5 * (1.5 - ad) ** 2,
                               jnp.zeros_like(d)))


def _deltas(x, y, z):
    dtype = x.dtype
    ix = jnp.arange(x.shape[1], dtype=dtype)[None, :, None, None]
    iy = jnp.arange(x.shape[2], dtype=dtype)[None, None, :, None]
    iz = jnp.arange(x.shape[3], dtype=dtype)[None, None, None, :]
    return x - ix, y - iy, z - iz


def _plane(fpad, c, ox, oy, oz, g, nx, ny, nz):
    return lax.slice(fpad[c], (g + ox, g + oy, g + oz),
                     (g + ox + nx, g + oy + ny, g + oz + nz))


def gather_cell_3d(eb_pad: jnp.ndarray, x, y, z, g: int):
    """eb_pad (6, nx+2g, ny+2g, nz+2g); x, y, z (cap_c, nx, ny, nz)
    device-local coords. Returns 6 gathered components.

    Yee staggering (reference interpolation/cpu3d.c):
        ex: (hx,gy,gz)  ey: (gx,hy,gz)  ez: (gx,gy,hz)
        bx: (gx,hy,hz)  by: (hx,gy,hz)  bz: (hx,hy,gz)
    """
    cap, nx, ny, nz = x.shape
    dx, dy, dz = _deltas(x, y, z)
    gx = {o: _m2(o - dx) for o in _GOFF}
    hx = {o: _m2(o + 0.5 - dx) for o in _HOFF}
    gy = {o: _m2(o - dy) for o in _GOFF}
    hy = {o: _m2(o + 0.5 - dy) for o in _HOFF}
    gz = {o: _m2(o - dz) for o in _GOFF}
    hz = {o: _m2(o + 0.5 - dz) for o in _HOFF}

    comps = ((0, hx, gy, gz), (1, gx, hy, gz), (2, gx, gy, hz),
             (3, gx, hy, hz), (4, hx, gy, hz), (5, hx, hy, gz))
    out = []
    for c, wx, wy, wz in comps:
        acc = jnp.zeros_like(x)
        for oy, tyo in wy.items():
            for oz, tzo in wz.items():
                tyz = tyo * tzo
                for ox, txo in wx.items():
                    f = _plane(eb_pad, c, ox, oy, oz, g, nx, ny, nz)
                    acc = acc + txo * tyz * f[None]
        out.append(acc)
    return tuple(out)


def deposit_cell_3d(x, y, z, ux, uy, uz, inv_gamma, w, *, q: float,
                    dx: float, dy: float, dz: float, dt: float,
                    g: int) -> jnp.ndarray:
    """Esirkepov deposit from the 3D cell layout into the padded
    (4, nx+2g, ny+2g, nz+2g) J — scatter-free. Closed forms as in
    ops/deposition.py::deposit_3d (reference current_deposit.h:288-330):

        jx = -q w/(dy dz dt) cumsum_ox(DSx) (ay S0z + cy DSz)
        jy = -q w/(dx dz dt) cumsum_oy(DSy) (ax S0z + cx DSz)
        jz = -q w/(dx dy dt) cumsum_oz(DSz) (ax S0y + cx DSy)
        rho = q w/(dx dy dz) S1x S1y S1z
        a = S0 + DS/2,  c = S0/2 + DS/3
    """
    cap, nx, ny, nz = x.shape
    dtype = x.dtype
    dxl, dyl, dzl = _deltas(x, y, z)
    vx_c = ux * inv_gamma * jnp.asarray(c_light * dt / dx, dtype)
    vy_c = uy * inv_gamma * jnp.asarray(c_light * dt / dy, dtype)
    vz_c = uz * inv_gamma * jnp.asarray(c_light * dt / dz, dtype)

    def axis_taps(d, v):
        s0 = {o: _m2(o - (d - 0.5 * v)) for o in _DOFF}
        s1 = {o: _m2(o - (d + 0.5 * v)) for o in _DOFF}
        ds = {o: s1[o] - s0[o] for o in _DOFF}
        a = {o: s0[o] + 0.5 * ds[o] for o in _DOFF}
        cc = {o: 0.5 * s0[o] + ds[o] / 3.0 for o in _DOFF}
        run = {}
        acc = jnp.zeros_like(d)
        for o in _DOFF:
            acc = acc + ds[o]
            run[o] = acc
        return s0, s1, ds, a, cc, run

    s0x, s1x, dsx, ax, cx, runx = axis_taps(dxl, vx_c)
    s0y, s1y, dsy, ay, cy, runy = axis_taps(dyl, vy_c)
    s0z, s1z, dsz, az, cz, runz = axis_taps(dzl, vz_c)

    cd = jnp.asarray(q / (dx * dy * dz), dtype) * w
    fdx = jnp.asarray(q / (dy * dz * dt), dtype) * w
    fdy = jnp.asarray(q / (dx * dz * dt), dtype) * w
    fdz = jnp.asarray(q / (dx * dy * dt), dtype) * w

    jpad = jnp.zeros((4, nx + 2 * g, ny + 2 * g, nz + 2 * g), dtype)

    def acc_channel(jpad, ch, outer1, outer2, inner, pair, inner_tap):
        """One channel's 125-offset accumulation. The channel-specific
        pair product (with the w-scaled prefactor folded in) is hoisted
        out of the inner-axis loop, so each offset costs one multiply +
        one slot-reduce + one slice-add."""
        for o1 in _DOFF:
            for o2 in _DOFF:
                p = pair(o1, o2)
                for oi in _DOFF:
                    cell = (inner_tap(oi) * p).sum(0)
                    off = {outer1: o1, outer2: o2, inner: oi}
                    pos = (ch, g + off["x"], g + off["y"], g + off["z"])
                    jpad = lax.dynamic_update_slice(
                        jpad, lax.dynamic_slice(
                            jpad, pos, (1, nx, ny, nz)) + cell[None],
                        pos)
        return jpad

    jpad = acc_channel(
        jpad, 0, "y", "z", "x",
        lambda oy, oz: -fdx * (ay[oy] * s0z[oz] + cy[oy] * dsz[oz]),
        lambda ox: runx[ox])
    jpad = acc_channel(
        jpad, 1, "x", "z", "y",
        lambda ox, oz: -fdy * (ax[ox] * s0z[oz] + cx[ox] * dsz[oz]),
        lambda oy: runy[oy])
    jpad = acc_channel(
        jpad, 2, "x", "y", "z",
        lambda ox, oy: -fdz * (ax[ox] * s0y[oy] + cx[ox] * dsy[oy]),
        lambda oz: runz[oz])
    jpad = acc_channel(
        jpad, 3, "y", "z", "x",
        lambda oy, oz: cd * (s1y[oy] * s1z[oz]),
        lambda ox: s1x[ox])
    return jpad


def migrate_cell_3d(data: Dict[str, jnp.ndarray], alive: jnp.ndarray,
                    specs: Tuple[HaloSpec, HaloSpec, HaloSpec],
                    nx_loc: int, ny_loc: int, nz_loc: int, *,
                    recompute_ig: bool = False, exact: bool = False,
                    sort_fn=None):
    """3D overwrite-merge re-binning (see cell2d.migrate_cells)."""
    from .cell2d import migrate_cells
    return migrate_cells(
        data, alive,
        ((nx_loc, specs[0], "x"), (ny_loc, specs[1], "y"),
         (nz_loc, specs[2], "z")),
        recompute_ig=recompute_ig, exact=exact, sort_fn=sort_fn)
