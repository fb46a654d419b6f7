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


def test_stationary_particle_exact_shape_2d():
    """A stationary particle at a cell center deposits the exact M2
    tensor-product weights into rho and zero current (reference
    test_current_deposition.py single-particle values)."""
    x = np.array([5.0])
    y = np.array([7.0])
    u = np.zeros((3, 1))
    ig = np.ones(1)
    w = np.array([2.0e6])
    (jx, jy, jz, rho), (dx, dy, dt) = _deposit2d(x, y, u, ig, w)
    assert np.abs(jx).max() == 0
    assert np.abs(jy).max() == 0
    assert np.abs(jz).max() == 0
    # arrays come back padded with g=3 guard cells: cell (i, j) sits at
    # (g + i, g + j)
    m2 = np.array([0.125, 0.75, 0.125])
    expected = np.zeros_like(rho)
    expected[7:10, 9:12] = (-qe) * w[0] / (dx * dy) * np.outer(m2, m2)
    np.testing.assert_allclose(rho, expected, rtol=1e-12, atol=1e-25)


def test_axis_aligned_motion_2d():
    """Motion along x only: jy == 0 everywhere, jx rows sum to q w vx/dy
    per unit length (Esirkepov 1D behavior; reference current_deposit.h
    x-sweep)."""
    x = np.array([5.2])
    y = np.array([7.0])
    u = np.array([[1.0], [0.0], [0.0]])
    ig = np.array([1.0 / np.sqrt(2.0)])
    w = np.array([1.0e6])
    (jx, jy, jz, rho), (dx, dy, dt) = _deposit2d(x, y, u, ig, w)
    assert np.abs(jy).max() == 0
    assert np.abs(jz).max() == 0
    # integral of jx over x equals q w vx / (dy) (charge flux)
    vx = u[0, 0] * ig[0] * c
    np.testing.assert_allclose(jx.sum() * dx * dy, (-qe) * w[0] * vx,
                               rtol=1e-12)


def test_charge_sign_antisymmetry_2d(particles_2d):
    x, y, u, ig, w = particles_2d
    (jx1, jy1, jz1, rho1), _ = _deposit2d(x, y, u, ig, w, q=-qe)
    (jx2, jy2, jz2, rho2), _ = _deposit2d(x, y, u, ig, w, q=qe)
    np.testing.assert_allclose(jx1, -jx2, rtol=1e-12, atol=1e-25)
    np.testing.assert_allclose(rho1, -rho2, rtol=1e-12, atol=1e-25)


def test_zero_charge_deposits_nothing(particles_2d):
    x, y, u, ig, w = particles_2d
    (jx, jy, jz, rho), _ = _deposit2d(x, y, u, ig, w, q=0.0)
    for a in (jx, jy, jz, rho):
        assert np.abs(a).max() == 0


def test_velocity_reversal_antisymmetry_2d():
    """Swapping start/end positions and reversing velocity flips the
    conduction current exactly (Esirkepov time-reversal symmetry)."""
    rng = np.random.default_rng(3)
    n = 100
    x = rng.uniform(2.0, 13.0, n)
    y = rng.uniform(2.0, 9.0, n)
    u = rng.normal(size=(3, n))
    u[2] = 0.0
    ig = 1.0 / np.sqrt(1 + (u**2).sum(axis=0))
    w = rng.uniform(0.5, 2.0, n) * 1e6
    dx, dy = 1e-6, 1.2e-6
    dt = 0.95 / (c * np.sqrt(dx**-2 + dy**-2))
    # forward: mid-position x, displacement v*dt
    (jx1, jy1, _, _), _ = _deposit2d(x, y, u, ig, w)
    (jx2, jy2, _, _), _ = _deposit2d(x, y, -u, ig, w)
    np.testing.assert_allclose(jx1, -jx2, rtol=1e-11,
                               atol=1e-12 * np.abs(jx1).max())
    np.testing.assert_allclose(jy1, -jy2, rtol=1e-11,
                               atol=1e-12 * np.abs(jy1).max())


def test_single_particle_continuity_every_octant_3d():
    """Continuity holds per-particle for displacements in all 8 octants
    (reference test_current_deposition.py direction sweep)."""
    nx, ny, nz, g = 10, 10, 10, 3
    dx = dy = dz = 1e-6
    dt = 0.9 / (c * np.sqrt(3) / dx)
    for sx in (-1, 1):
        for sy in (-1, 1):
            for sz in (-1, 1):
                u = np.array([[2.0 * sx], [1.5 * sy], [1.0 * sz]])
                ig = 1.0 / np.sqrt(1 + (u**2).sum(axis=0))
                w = np.array([1.0e6])
                x = np.array([5.3])
                y = np.array([4.8])
                z = np.array([5.1])

                def dep(x_, y_, z_):
                    args = [jnp.asarray(a) for a in
                            (x_, y_, z_, u[0], u[1], u[2], ig, w)]
                    out = deposit_3d(*args, q=qe, dx=dx, dy=dy, dz=dz,
                                     dt=dt, nx_loc=nx, ny_loc=ny,
                                     nz_loc=nz, g=g)
                    return [np.asarray(o) for o in out]

                jx, jy, jz, rho1 = dep(x, y, z)
                rho0 = dep(x - u[0] * ig * c * dt / dx,
                           y - u[1] * ig * c * dt / dy,
                           z - u[2] * ig * c * dt / dz)[3]
                drho = (rho1 - rho0) / dt
                divj = ((jx - np.roll(jx, 1, 0)) / dx
                        + (jy - np.roll(jy, 1, 1)) / dy
                        + (jz - np.roll(jz, 1, 2)) / dz)
                scale = np.abs(divj).max() + 1e-300
                assert np.abs(drho + divj).max() < 1e-9 * scale, \
                    (sx, sy, sz)
