"""Particle pushers (Boris rotation, photon, position push).

Vectorized equivalents of the reference kernels:
- Boris momentum push: reference core/pusher/boris.py:6-38 (relativistic
  E half-kick / B rotation / E half-kick).
- Photon push: only inv_gamma is recomputed (reference core/pusher/photon.py).
- Position push: x += c dt u inv_gamma (reference core/pusher/cpu.py
  push_position_patches_*), expressed in local cell units here.

All functions are elementwise over the fixed-capacity particle arrays; dead
slots are harmless no-ops (zero momentum / zero fields).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..constants import c as c_light


def boris_push(ux, uy, uz, ex_p, ey_p, ez_p, bx_p, by_p, bz_p,
               q: float, m: float, dt: float
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Relativistic Boris rotation (reference boris.py:6-38).

    Returns (ux, uy, uz, inv_gamma) after a full-dt momentum update.
    """
    dtype = ux.dtype
    efactor = jnp.asarray(q * dt / (2 * m * c_light), dtype)
    bfactor = jnp.asarray(q * dt / (2 * m), dtype)

    # E half kick
    um_x = ux + efactor * ex_p
    um_y = uy + efactor * ey_p
    um_z = uz + efactor * ez_p
    # B rotation
    inv_gamma_m = 1.0 / jnp.sqrt(1.0 + um_x**2 + um_y**2 + um_z**2)
    tx = bfactor * bx_p * inv_gamma_m
    ty = bfactor * by_p * inv_gamma_m
    tz = bfactor * bz_p * inv_gamma_m
    up_x = um_x + um_y * tz - um_z * ty
    up_y = um_y + um_z * tx - um_x * tz
    up_z = um_z + um_x * ty - um_y * tx
    tfac = 2.0 / (1.0 + tx**2 + ty**2 + tz**2)
    sx = tfac * tx
    sy = tfac * ty
    sz = tfac * tz
    uplus_x = um_x + up_y * sz - up_z * sy
    uplus_y = um_y + up_z * sx - up_x * sz
    uplus_z = um_z + up_x * sy - up_y * sx
    # E half kick
    ux_new = uplus_x + efactor * ex_p
    uy_new = uplus_y + efactor * ey_p
    uz_new = uplus_z + efactor * ez_p
    inv_gamma_new = 1.0 / jnp.sqrt(1.0 + ux_new**2 + uy_new**2 + uz_new**2)
    return ux_new, uy_new, uz_new, inv_gamma_new


def photon_push(ux, uy, uz):
    """Photon 'momentum push': recompute inv_gamma = 1/|u| only
    (reference core/pusher/photon.py:5-11). Dead slots (u=0) get 1."""
    u2 = ux**2 + uy**2 + uz**2
    return jnp.where(u2 > 0, 1.0 / jnp.sqrt(jnp.maximum(u2, 1e-30)),
                     jnp.ones_like(u2))


def push_position_2d(x, y, ux, uy, inv_gamma, cdt_dx: float, cdt_dy: float):
    """x += u inv_gamma c dt, in local cell units (cdt_dx = c*dt/dx)."""
    dtype = x.dtype
    x = x + ux * inv_gamma * jnp.asarray(cdt_dx, dtype)
    y = y + uy * inv_gamma * jnp.asarray(cdt_dy, dtype)
    return x, y


def push_position_3d(x, y, z, ux, uy, uz, inv_gamma,
                     cdt_dx: float, cdt_dy: float, cdt_dz: float):
    dtype = x.dtype
    x = x + ux * inv_gamma * jnp.asarray(cdt_dx, dtype)
    y = y + uy * inv_gamma * jnp.asarray(cdt_dy, dtype)
    z = z + uz * inv_gamma * jnp.asarray(cdt_dz, dtype)
    return x, y, z
