"""GaussianLaser source tests (reference tests/test_gaussian_laser.py
analogs): beam parameters, LG modes, amplitude at the boundary."""
import numpy as np
import pytest
from numpy.testing import assert_allclose

from lambdapic_tpu import GaussianLaser2D, GaussianLaser3D, Simulation
from lambdapic_tpu.constants import c, e, m_e, pi
from lambdapic_tpu.core.species import _ALL_SPECIES

um = 1e-6
l0 = 0.8 * um
omega0 = 2 * np.pi * c / l0


@pytest.fixture(autouse=True)
def clear_species_registry():
    _ALL_SPECIES.clear()
    yield
    _ALL_SPECIES.clear()


def make_sim():
    sim = Simulation(nx=64, ny=64, dx=l0 / 20, dy=l0 / 20,
                     npatch_x=2, npatch_y=2, precision="double")
    sim.initialize()
    return sim


def sources_at(laser, sim, time):
    sim.time = time
    sc = laser.host_scalars(sim)
    ey, ez = laser._sources(sim.grid, sc, np.float64)
    return np.asarray(ey), np.asarray(ez)


def test_beam_params():
    """w(z), R(z), Gouy phase (reference laser.py:488-502)."""
    laser = GaussianLaser2D(a0=1, l0=l0, w0=2 * um, ctau=3 * um)
    zR = pi * (2 * um)**2 / l0
    assert laser.zR == pytest.approx(zR)
    w, R, psi = laser._gaussian_beam_params(zR)
    assert w == pytest.approx(2 * um * np.sqrt(2))
    assert R == pytest.approx(2 * zR)
    assert psi == pytest.approx(np.arctan(1.0))
    w0_, R0, psi0 = laser._gaussian_beam_params(0.0)
    assert w0_ == pytest.approx(2 * um)
    assert R0 == np.inf
    assert psi0 == 0.0


def test_gaussian_envelope_peak():
    """Peak source amplitude at t = x0/c approaches E0 * w0/w(boundary)."""
    sim = make_sim()
    w0 = 2 * um
    laser = GaussianLaser2D(a0=2.0, l0=l0, w0=w0, ctau=2 * um, x0=2 * um,
                            focus_position=0.0)
    E0 = 2.0 * m_e * c * omega0 / e
    x_rel = sim.cpml_thickness * sim.dx
    bw, _, _ = laser._gaussian_beam_params(x_rel)
    # envelope peak: scan one optical cycle at the pulse maximum t = x0/c
    T = l0 / c
    peak = 0.0
    ez_max = 0.0
    for k in range(16):
        ey, ez = sources_at(laser, sim, 2 * um / c + k * T / 16)
        peak = max(peak, np.abs(ey).max())
        ez_max = max(ez_max, np.abs(ez).max())
    assert peak == pytest.approx(E0 * w0 / bw, rel=0.02)
    assert ez_max < 1e-10 * E0


def test_lg_mode_has_null_on_axis():
    """Laguerre-Gaussian l=1 mode vanishes on axis (reference
    laser.py:479-487, 521-528)."""
    sim = make_sim()
    laser = GaussianLaser2D(a0=1.0, l0=l0, w0=2 * um, ctau=2 * um,
                            x0=2 * um, l=1)
    ey, ez = sources_at(laser, sim, 2 * um / c)
    ny = sim.ny
    # boundary coordinate grid: axis at y = Ly/2 + dy/2 offset; find min
    y = np.arange(ny) * sim.dy - sim.dy / 2 - sim.Ly / 2
    iaxis = np.argmin(np.abs(y))
    assert np.abs(ey[iaxis]) < 0.05 * np.abs(ey).max()
    # off-axis lobes exist
    assert np.abs(ey).max() > 0


def test_gaussian_laser_3d_sources_shape():
    sim = None
    from lambdapic_tpu import Simulation3D
    sim = Simulation3D(nx=32, ny=16, nz=16, dx=l0 / 10, dy=l0 / 5,
                       dz=l0 / 5, npatch_x=2, npatch_y=2, npatch_z=2,
                       precision="double")
    sim.initialize()
    laser = GaussianLaser3D(a0=1.0, l0=l0, w0=2 * um, ctau=2 * um, x0=2 * um)
    ey, ez = sources_at(laser, sim, 2 * um / c)
    assert ey.shape == (16, 16)
    assert np.isfinite(ey).all()


def test_combined_laser():
    """laser1 + laser2 sums sources (reference laser.py:139-151, 242-271)."""
    sim = make_sim()
    l1 = GaussianLaser2D(a0=1.0, l0=l0, w0=2 * um, ctau=2 * um, x0=2 * um)
    l2 = GaussianLaser2D(a0=0.5, l0=l0, w0=2 * um, ctau=2 * um, x0=2 * um)
    combo = l1 + l2
    t = 2 * um / c
    sim.time = t
    sc = combo.host_scalars(sim)
    ey_c, _ = combo._sources(sim.grid, sc, np.float64)
    ey1, _ = sources_at(l1, sim, t)
    ey2, _ = sources_at(l2, sim, t)
    assert_allclose(np.asarray(ey_c), ey1 + ey2, rtol=1e-12)
