"""Esirkepov deposition kernel tests.

Ports the reference acceptance criteria
(tests/core/current/test_current_deposition.py): charge conservation
(continuity equation to machine precision), total charge, dead-particle
exclusion, and zero current for zero charge.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from lambdapic_tpu.constants import c, e as qe
from lambdapic_tpu.ops.deposition import deposit_2d, deposit_3d


@pytest.fixture
def particles_2d():
    rng = np.random.default_rng(1)
    n = 500
    x = rng.uniform(-0.4, 15.4, n)
    y = rng.uniform(-0.4, 11.4, n)
    u = rng.normal(size=(3, n)) * 2
    ig = 1.0 / np.sqrt(1 + (u**2).sum(axis=0))
    w = rng.uniform(0.5, 2.0, n) * 1e6
    return x, y, u, ig, w


def _deposit2d(x, y, u, ig, w, q=-qe):
    nx, ny, g = 16, 12, 3
    dx, dy = 1e-6, 1.2e-6
    dt = 0.95 / (c * np.sqrt(dx**-2 + dy**-2))
    args = [jnp.asarray(a) for a in (x, y, u[0], u[1], u[2], ig, w)]
    out = deposit_2d(*args, q=q, dx=dx, dy=dy, dt=dt,
                     nx_loc=nx, ny_loc=ny, g=g)
    return [np.asarray(o) for o in out], (dx, dy, dt)


def test_charge_conservation_2d(particles_2d):
    """d(rho)/dt + div J == 0 discretely (reference
    test_current_deposition.py charge-conservation analog)."""
    x, y, u, ig, w = particles_2d
    (jx, jy, jz, rho1), (dx, dy, dt) = _deposit2d(x, y, u, ig, w)
    xp = x - u[0] * ig * c * dt / dx
    yp = y - u[1] * ig * c * dt / dy
    (_, _, _, rho0), _ = _deposit2d(xp, yp, u, ig, w)
    drho = (rho1 - rho0) / dt
    divj = (jx - np.roll(jx, 1, 0)) / dx + (jy - np.roll(jy, 1, 1)) / dy
    scale = np.abs(divj).max()
    assert np.abs(drho + divj).max() < 1e-9 * scale


def test_total_charge_and_current_2d(particles_2d):
    x, y, u, ig, w = particles_2d
    (jx, jy, jz, rho), (dx, dy, dt) = _deposit2d(x, y, u, ig, w)
    np.testing.assert_allclose(rho.sum() * dx * dy, (-qe * w).sum(),
                               rtol=1e-12)
    np.testing.assert_allclose(jz.sum() * dx * dy,
                               (-qe * w * u[2] * ig * c).sum(), rtol=1e-12)


def test_dead_particles_excluded(particles_2d):
    """Dead particles (w=0) deposit nothing (reference
    test_current_deposition.py dead-particle test)."""
    x, y, u, ig, w = particles_2d
    w2 = w.copy()
    w2[::2] = 0.0
    (jx, jy, jz, rho), (dx, dy, _) = _deposit2d(x, y, u, ig, w2)
    wk = np.zeros_like(w)
    wk[1::2] = w[1::2]
    (jx2, jy2, jz2, rho2), _ = _deposit2d(x, y, u, ig, wk)
    np.testing.assert_allclose(rho, rho2, rtol=1e-12, atol=1e-20)
    np.testing.assert_allclose(jx, jx2, rtol=1e-12, atol=1e-20)


def test_charge_conservation_3d():
    rng = np.random.default_rng(2)
    n = 300
    nx, ny, nz, g = 12, 10, 8, 3
    dx = dy = dz = 1e-6
    dt = 0.95 / (c * np.sqrt(3) / dx)
    x = rng.uniform(-0.4, nx - 0.6, n)
    y = rng.uniform(-0.4, ny - 0.6, n)
    z = rng.uniform(-0.4, nz - 0.6, n)
    u = rng.normal(size=(3, n)) * 2
    ig = 1.0 / np.sqrt(1 + (u**2).sum(axis=0))
    w = rng.uniform(0.5, 2.0, n) * 1e6

    def dep(x_, y_, z_):
        args = [jnp.asarray(a) for a in (x_, y_, z_, u[0], u[1], u[2], ig, w)]
        out = deposit_3d(*args, q=qe, dx=dx, dy=dy, dz=dz, dt=dt,
                         nx_loc=nx, ny_loc=ny, nz_loc=nz, g=g)
        return [np.asarray(o) for o in out]

    jx, jy, jz, rho1 = dep(x, y, z)
    rho0 = dep(x - u[0] * ig * c * dt / dx,
               y - u[1] * ig * c * dt / dy,
               z - u[2] * ig * c * dt / dz)[3]
    drho = (rho1 - rho0) / dt
    divj = ((jx - np.roll(jx, 1, 0)) / dx + (jy - np.roll(jy, 1, 1)) / dy
            + (jz - np.roll(jz, 1, 2)) / dz)
    assert np.abs(drho + divj).max() < 1e-9 * np.abs(divj).max()
    np.testing.assert_allclose(rho1.sum() * dx * dy * dz, (qe * w).sum(),
                               rtol=1e-12)
