"""Quadratic (order-2) field gather on the staggered Yee grid.

Vectorized equivalent of the reference C gather
(core/interpolation/cpu2d.c:7-69, cpu3d.c; same math inlined in
unified_pusher_2d.c:64-154): 3-tap quadratic shape functions per axis, with
integer-position taps (gx) for node-centered components and half-integer taps
(hx) for edge/face-centered ones. Yee staggering per component (cpu2d.c:62-68):

    ex: (hx, gy)   ey: (gx, hy)   ez: (gx, gy)
    bx: (gx, hy)   by: (hx, gy)   bz: (hx, hy)

Inputs are *local* per-device arrays: fields padded with ``g`` guard cells on
every side (parallel/halo.py), particle positions in local cell units.
Dead particles must carry in-range positions (the migration/kill paths set
them to 0); gathers use clipped indexing for safety.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def shape3(delta: jnp.ndarray) -> jnp.ndarray:
    """3-tap quadratic shape factors, delta = i_center - x in [-0.5, 0.5].

    Reference get_gx (interpolation/cpu2d.c:7-12).
    Returns shape (..., 3) for taps at offsets (-1, 0, +1).
    """
    d2 = delta * delta
    return jnp.stack(
        [0.5 * (0.25 + d2 + delta), 0.75 - d2, 0.5 * (0.25 + d2 - delta)],
        axis=-1,
    )


def _stencil_1d(x: jnp.ndarray):
    """Integer and half-integer stencil bases + taps for one axis."""
    i1 = jnp.floor(x + 0.5).astype(jnp.int32)   # node-centered base
    g = shape3(i1.astype(x.dtype) - x)
    i2 = jnp.floor(x).astype(jnp.int32)         # half-staggered base
    h = shape3(i2.astype(x.dtype) - x + 0.5)
    return i1, g, i2, h


def _interp2d(fpad: jnp.ndarray, ix, iy, fx, fy, g: int):
    """Sum_{m,n} fx[m] fy[n] fpad[ix+m-1+g, iy+n-1+g]  (cpu2d.c:18-30)."""
    nyp = fpad.shape[1]
    flat = fpad.reshape(-1)
    base = (ix + (g - 1)) * nyp + (iy + (g - 1))
    acc = jnp.zeros_like(fx[..., 0])
    for m in range(3):
        for n in range(3):
            idx = base + m * nyp + n
            acc = acc + fx[..., m] * fy[..., n] * jnp.take(flat, idx, mode="clip")
    return acc


def gather_eb_2d(ex, ey, ez, bx, by, bz, x, y, g: int
                 ) -> Tuple[jnp.ndarray, ...]:
    """Gather all six field components to particle positions (2D).

    Fields are local padded arrays (nx_loc+2g, ny_loc+2g); x, y in local
    cell units.
    """
    ix1, gx, ix2, hx = _stencil_1d(x)
    iy1, gy, iy2, hy = _stencil_1d(y)
    ex_p = _interp2d(ex, ix2, iy1, hx, gy, g)
    ey_p = _interp2d(ey, ix1, iy2, gx, hy, g)
    ez_p = _interp2d(ez, ix1, iy1, gx, gy, g)
    bx_p = _interp2d(bx, ix1, iy2, gx, hy, g)
    by_p = _interp2d(by, ix2, iy1, hx, gy, g)
    bz_p = _interp2d(bz, ix2, iy2, hx, hy, g)
    return ex_p, ey_p, ez_p, bx_p, by_p, bz_p


def _interp3d(fpad: jnp.ndarray, ix, iy, iz, fx, fy, fz, g: int):
    nyp, nzp = fpad.shape[1], fpad.shape[2]
    flat = fpad.reshape(-1)
    base = ((ix + (g - 1)) * nyp + (iy + (g - 1))) * nzp + (iz + (g - 1))
    acc = jnp.zeros_like(fx[..., 0])
    for m in range(3):
        for n in range(3):
            for p in range(3):
                idx = base + (m * nyp + n) * nzp + p
                acc = acc + (fx[..., m] * fy[..., n] * fz[..., p]
                             * jnp.take(flat, idx, mode="clip"))
    return acc


def gather_eb_3d(ex, ey, ez, bx, by, bz, x, y, z, g: int
                 ) -> Tuple[jnp.ndarray, ...]:
    """3D staggered gather (reference interpolation/cpu3d.c):

        ex: (hx,gy,gz)  ey: (gx,hy,gz)  ez: (gx,gy,hz)
        bx: (gx,hy,hz)  by: (hx,gy,hz)  bz: (hx,hy,gz)
    """
    ix1, gx, ix2, hx = _stencil_1d(x)
    iy1, gy, iy2, hy = _stencil_1d(y)
    iz1, gz, iz2, hz = _stencil_1d(z)
    ex_p = _interp3d(ex, ix2, iy1, iz1, hx, gy, gz, g)
    ey_p = _interp3d(ey, ix1, iy2, iz1, gx, hy, gz, g)
    ez_p = _interp3d(ez, ix1, iy1, iz2, gx, gy, hz, g)
    bx_p = _interp3d(bx, ix1, iy2, iz2, gx, hy, hz, g)
    by_p = _interp3d(by, ix2, iy1, iz2, hx, gy, hz, g)
    bz_p = _interp3d(bz, ix2, iy2, iz1, hx, hy, gz, g)
    return ex_p, ey_p, ez_p, bx_p, by_p, bz_p
