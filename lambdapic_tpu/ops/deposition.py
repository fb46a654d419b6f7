"""Esirkepov charge-conserving current deposition.

TPU-native reformulation of the reference C kernel
(core/current/current_deposit.h:7-440, cpu2d.c:9-203). The per-particle
recurrences of the reference inner loops have closed forms that make the
5x5(x5) stencil values *separable outer products*, so the whole deposition is
expressed as dense vectorized math over all particles followed by one fused
scatter-add into the locally padded grid — race-free by construction
(SURVEY.md §5.2). Derivation from current_deposit.h:124-144:

    jx[i,j] = Fx[i] * b[j],    Fx = -q w/(dy dt) * cumsum_i(DSx)
    jy[i,j] = a[i] * Gy[j],    Gy = -q w/(dx dt) * cumsum_j(DSy)
    jz[i,j] = q w vz/(dx dy) * (a[i] b[j] + DSx[i] DSy[j] / 12)
    rho[i,j] = q w/(dx dy) * S1x[i] * S1y[j]
    with a = S0x + DSx/2, b = S0y + DSy/2, DS = S1 - S0.

The deposited segment brackets the stored (post-push) position:
x_old = x - v dt/2, x_adv = x + v dt/2 (current_deposit.h:58-64), with the
usual |dcell| <= 1 CFL assumption (current_deposit.h:112-116).

Inputs are local per-device arrays; positions in local cell units. Outputs
are padded local grids (n_loc + 2g per axis); the guard rims are folded onto
neighbor devices by parallel/halo.py::halo_reduce (the reference's
sync_currents, patch/sync_fields2d.c:77-84).

Dead particles must have w == 0 — every deposited value scales with w.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..constants import c as c_light


def shape5_s0(delta: jnp.ndarray) -> jnp.ndarray:
    """5-tap shape for the no-shift case (reference calculate_S0,
    current_deposit.h:28-35). delta = i0 - x, |delta| <= 0.5."""
    d2 = delta * delta
    zero = jnp.zeros_like(delta)
    return jnp.stack([
        zero,
        0.5 * (d2 + delta + 0.25),
        0.75 - d2,
        0.5 * (d2 - delta + 0.25),
        zero,
    ], axis=-1)


def shape5_shifted(delta: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """5-tap shape with cell-crossing shift in {-1, 0, 1}
    (reference calculate_S, current_deposit.h:7-23)."""
    d2 = delta * delta
    dm = 0.5 * (d2 + delta + 0.25)
    dmid = 0.75 - d2
    dp = 0.5 * (d2 - delta + 0.25)
    minus = (shift == -1).astype(delta.dtype)
    mid = (shift == 0).astype(delta.dtype)
    plus = (shift == 1).astype(delta.dtype)
    return jnp.stack([
        minus * dm,
        minus * dmid + mid * dm,
        minus * dp + mid * dmid + plus * dm,
        mid * dp + plus * dmid,
        plus * dp,
    ], axis=-1)


def _axis_shapes(x: jnp.ndarray, v_c: jnp.ndarray):
    """S0, S1, DS (each (..., 5)) and base index i0 for one axis.

    x: position in cell units, v_c: velocity in cell units per dt.

    S0 and S1 are evaluated through ONE stacked call so XLA applies the
    identical fused expression to both: S1-S0 is then bitwise zero for
    stationary particles. Evaluating them through different expression
    trees lets fusion (FMA contraction) produce eps-level differences that
    the q w/(d dt) factor amplifies into spurious currents — the same
    bitwise-identity concern the reference engineered around
    (current_deposit.h:26-27).
    """
    x0 = x - 0.5 * v_c
    x1 = x + 0.5 * v_c
    i0 = jnp.floor(x0 + 0.5).astype(jnp.int32)
    i1 = jnp.floor(x1 + 0.5).astype(jnp.int32)
    dd = jnp.stack([i0.astype(x.dtype) - x0, i1.astype(x.dtype) - x1])
    sh = jnp.stack([jnp.zeros_like(i0), i1 - i0])
    s = shape5_shifted(dd, sh)
    return s[0], s[1], s[1] - s[0], i0


# Particles per scan chunk: bounds the (chunk, 5, 5[,5]) stencil
# intermediates to ~tens of MB regardless of capacity (a 6M-particle
# unchunked 2D deposit would materialize >25 GB of temporaries).
CHUNK_2D = 131072
CHUNK_3D = 32768


def _chunked(deposit_fn, args, nvals: int, grid_size: int, chunk: int, dtype):
    """Scan deposit_fn over particle chunks, accumulating into a flat
    (grid_size, 4) buffer."""
    n = args[0].shape[0]
    nchunk = -(-n // chunk)
    pad = nchunk * chunk - n
    if pad:
        # padded particles carry w=0 (last arg) and deposit nothing
        args = [jnp.pad(a, (0, pad)) for a in args]
    args = [a.reshape(nchunk, chunk) for a in args]

    def body(acc, chunk_args):
        idx, vals = deposit_fn(*chunk_args)
        return acc.at[idx].add(vals), None

    acc0 = jnp.zeros((grid_size, 4), dtype=dtype)
    acc, _ = jax.lax.scan(body, acc0, tuple(args))
    return acc


def deposit_2d(x, y, ux, uy, uz, inv_gamma, w, *,
               q: float, dx: float, dy: float, dt: float,
               nx_loc: int, ny_loc: int, g: int,
               chunk: int = CHUNK_2D,
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Deposit jx, jy, jz, rho (SI) onto the padded local grid.

    Returns four arrays of shape (nx_loc + 2g, ny_loc + 2g).
    """
    dtype = x.dtype
    nxp, nyp = nx_loc + 2 * g, ny_loc + 2 * g

    def per_chunk(x, y, ux, uy, uz, inv_gamma, w):
        cdt_dx = jnp.asarray(c_light * dt / dx, dtype)
        cdt_dy = jnp.asarray(c_light * dt / dy, dtype)
        vx_c = ux * inv_gamma * cdt_dx              # cells per dt
        vy_c = uy * inv_gamma * cdt_dy
        vz = uz * inv_gamma * jnp.asarray(c_light, dtype)   # SI

        s0x, s1x, dsx, ix0 = _axis_shapes(x, vx_c)
        s0y, s1y, dsy, iy0 = _axis_shapes(y, vy_c)

        charge_density = jnp.asarray(q / (dx * dy), dtype) * w
        factor_dx = jnp.asarray(q / (dy * dt), dtype) * w
        factor_dy = jnp.asarray(q / (dx * dt), dtype) * w

        a = s0x + 0.5 * dsx                          # (N, 5)
        b = s0y + 0.5 * dsy
        fx = -factor_dx[..., None] * jnp.cumsum(dsx, axis=-1)
        gy = -factor_dy[..., None] * jnp.cumsum(dsy, axis=-1)

        jx_v = fx[..., :, None] * b[..., None, :]
        jy_v = a[..., :, None] * gy[..., None, :]
        jz_v = (charge_density * vz)[..., None, None] * (
            a[..., :, None] * b[..., None, :]
            + (1.0 / 12.0) * dsx[..., :, None] * dsy[..., None, :])
        rho_v = charge_density[..., None, None] * (
            s1x[..., :, None] * s1y[..., None, :])

        offs = jnp.arange(-2, 3, dtype=jnp.int32)
        ixs = jnp.clip(ix0[..., None] + offs + g, 0, nxp - 1)   # (N, 5)
        iys = jnp.clip(iy0[..., None] + offs + g, 0, nyp - 1)
        idx = (ixs[..., :, None] * nyp + iys[..., None, :]).reshape(-1)
        vals = jnp.stack([jx_v, jy_v, jz_v, rho_v], axis=-1).reshape(-1, 4)
        return idx, vals

    out = _chunked(per_chunk, [x, y, ux, uy, uz, inv_gamma, w], 4,
                   nxp * nyp, chunk, dtype)
    out = out.reshape(nxp, nyp, 4)
    return out[..., 0], out[..., 1], out[..., 2], out[..., 3]


def deposit_3d(x, y, z, ux, uy, uz, inv_gamma, w, *,
               q: float, dx: float, dy: float, dz: float, dt: float,
               nx_loc: int, ny_loc: int, nz_loc: int, g: int,
               chunk: int = CHUNK_3D,
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """3D Esirkepov deposit (reference current_deposit.h:275-440).

    Closed forms of the reference loop recurrences
    (current_deposit.h:288-330):
        jx[i,j,k] = -qw/(dy dz dt) cumsum_i(DSx)[i] (ay[j] S0z[k] + cy[j] DSz[k])
        jy[i,j,k] = -qw/(dx dz dt) cumsum_j(DSy)[j] (ax[i] S0z[k] + cx[i] DSz[k])
        jz[i,j,k] = -qw/(dx dy dt) cumsum_k(DSz)[k] (ax[i] S0y[j] + cx[i] DSy[j])
        rho = qw/(dx dy dz) S1x S1y S1z
        with  a = S0 + DS/2,  c = S0/2 + DS/3.
    """
    dtype = x.dtype
    nxp, nyp, nzp = nx_loc + 2 * g, ny_loc + 2 * g, nz_loc + 2 * g

    def per_chunk(x, y, z, ux, uy, uz, inv_gamma, w):
        vx_c = ux * inv_gamma * jnp.asarray(c_light * dt / dx, dtype)
        vy_c = uy * inv_gamma * jnp.asarray(c_light * dt / dy, dtype)
        vz_c = uz * inv_gamma * jnp.asarray(c_light * dt / dz, dtype)

        s0x, s1x, dsx, ix0 = _axis_shapes(x, vx_c)
        s0y, s1y, dsy, iy0 = _axis_shapes(y, vy_c)
        s0z, s1z, dsz, iz0 = _axis_shapes(z, vz_c)

        cd = jnp.asarray(q / (dx * dy * dz), dtype) * w
        fdx = jnp.asarray(q / (dy * dz * dt), dtype) * w
        fdy = jnp.asarray(q / (dx * dz * dt), dtype) * w
        fdz = jnp.asarray(q / (dx * dy * dt), dtype) * w

        ax = s0x + 0.5 * dsx
        cx = 0.5 * s0x + dsx / 3.0
        ay = s0y + 0.5 * dsy
        cy = 0.5 * s0y + dsy / 3.0
        csx = jnp.cumsum(dsx, axis=-1)
        csy = jnp.cumsum(dsy, axis=-1)
        csz = jnp.cumsum(dsz, axis=-1)

        def outer3(u, v, w3):
            return (u[..., :, None, None] * v[..., None, :, None]
                    * w3[..., None, None, :])

        jx_v = outer3(-fdx[..., None] * csx, ay, s0z) + outer3(
            -fdx[..., None] * csx, cy, dsz)
        jy_v = outer3(ax, -fdy[..., None] * csy, s0z) + outer3(
            cx, -fdy[..., None] * csy, dsz)
        jz_v = outer3(ax, s0y, -fdz[..., None] * csz) + outer3(
            cx, dsy, -fdz[..., None] * csz)
        rho_v = outer3(cd[..., None] * s1x, s1y, s1z)

        offs = jnp.arange(-2, 3, dtype=jnp.int32)
        ixs = jnp.clip(ix0[..., None] + offs + g, 0, nxp - 1)
        iys = jnp.clip(iy0[..., None] + offs + g, 0, nyp - 1)
        izs = jnp.clip(iz0[..., None] + offs + g, 0, nzp - 1)
        idx = ((ixs[..., :, None, None] * nyp + iys[..., None, :, None]) * nzp
               + izs[..., None, None, :]).reshape(-1)
        vals = jnp.stack([jx_v, jy_v, jz_v, rho_v], axis=-1).reshape(-1, 4)
        return idx, vals

    out = _chunked(per_chunk, [x, y, z, ux, uy, uz, inv_gamma, w], 4,
                   nxp * nyp * nzp, chunk, dtype)
    out = out.reshape(nxp, nyp, nzp, 4)
    return out[..., 0], out[..., 1], out[..., 2], out[..., 3]
