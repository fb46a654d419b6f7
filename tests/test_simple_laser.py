"""SimpleLaser source/polarization tests (port of reference
tests/test_simple_laser.py:35-177) plus a propagation amplitude check."""
import numpy as np
import pytest
from numpy.testing import assert_allclose

from lambdapic_tpu import Simulation, SimpleLaser2D
from lambdapic_tpu.constants import c, e, m_e
from lambdapic_tpu.core.species import _ALL_SPECIES

um = 1e-6
l0 = 0.8 * um
omega0 = 2 * np.pi * c / l0


@pytest.fixture(autouse=True)
def clear_species_registry():
    _ALL_SPECIES.clear()
    yield
    _ALL_SPECIES.clear()


@pytest.fixture
def small_sim():
    sim = Simulation(nx=64, ny=64, dx=l0 / 20, dy=l0 / 20,
                     npatch_x=2, npatch_y=2, precision="double")
    sim.initialize()
    return sim


def sources_at(laser, sim, time):
    sim.time = time
    sc = laser.host_scalars(sim)
    ey, ez = laser._sources(sim.grid, sc, np.float64)
    return np.asarray(ey), np.asarray(ez)


class TestSimpleLaserEllipticity:
    def test_linear_polarization_default(self, small_sim):
        laser = SimpleLaser2D(a0=1.0, w0=2e-6, ctau=5e-6, l0=l0, pol_angle=0.0)
        ey, ez = sources_at(laser, small_sim, laser.ctau / c)
        assert_allclose(ez, 0.0, atol=1e-15)
        assert np.abs(ey[len(ey) // 2]) > 0.0

    def test_linear_polarization_rotated(self, small_sim):
        pol = np.pi / 4
        laser = SimpleLaser2D(a0=1.0, w0=2e-6, ctau=5e-6, l0=l0, pol_angle=pol)
        ey, ez = sources_at(laser, small_sim, laser.ctau / c)
        mask = np.abs(ey) > 1e-15
        assert mask.any()
        assert_allclose(ez[mask] / ey[mask], np.tan(pol), rtol=1e-6)

    def test_circular_polarization(self, small_sim):
        ctau = 5e-6
        cep = np.pi / 4 - omega0 * ctau / c
        laser = SimpleLaser2D(a0=1.0, w0=2e-6, ctau=ctau, l0=l0,
                              pol_angle=0.0, ellipticity=1.0, cep=cep)
        ey, ez = sources_at(laser, small_sim, ctau / c)
        assert np.abs(ey).max() > 0.0
        assert np.abs(ez).max() > 0.0
        assert_allclose(np.abs(ey), np.abs(ez), rtol=1e-5, atol=1e-12)

    def test_circular_intensity_conservation(self, small_sim):
        a0, ctau = 2.0, 5e-6
        cep = np.pi / 4 - omega0 * ctau / c
        lin = SimpleLaser2D(a0=a0, w0=2e-6, ctau=ctau, l0=l0, ellipticity=0.0,
                            cep=cep)
        circ = SimpleLaser2D(a0=a0, w0=2e-6, ctau=ctau, l0=l0, ellipticity=1.0,
                             cep=cep)
        ey_l, _ = sources_at(lin, small_sim, ctau / c)
        ey_c, _ = sources_at(circ, small_sim, ctau / c)
        assert_allclose(np.abs(ey_c).max(), np.abs(ey_l).max() / np.sqrt(2),
                        rtol=1e-6)

    def test_ellipticity_invalid_range(self):
        with pytest.raises(ValueError, match="Ellipticity"):
            SimpleLaser2D(a0=1.0, w0=2e-6, ctau=5e-6, l0=l0, ellipticity=1.5)
        with pytest.raises(ValueError, match="Ellipticity"):
            SimpleLaser2D(a0=1.0, w0=2e-6, ctau=5e-6, l0=l0, ellipticity=-1.5)

    def test_handedness_sign(self, small_sim):
        ctau = 5e-6
        pos = SimpleLaser2D(a0=1.0, w0=2e-6, ctau=ctau, l0=l0, ellipticity=0.5)
        neg = SimpleLaser2D(a0=1.0, w0=2e-6, ctau=ctau, l0=l0, ellipticity=-0.5)
        t = 0.93 * ctau / c
        _, ez_p = sources_at(pos, small_sim, t)
        _, ez_n = sources_at(neg, small_sim, t)
        assert_allclose(ez_p, -ez_n, rtol=1e-6, atol=1e-12)


@pytest.mark.slow
def test_laser_propagation_amplitude():
    """Inject a0=1 pulse into vacuum; peak Ey in the domain approaches
    E0 = a0 m_e c omega0 / e (integration test, reference
    test_simple_laser.py full-propagation analog)."""
    ctau = 2.5 * um
    sim = Simulation(nx=192, ny=96, dx=l0 / 16, dy=l0 / 8,
                     npatch_x=4, npatch_y=2, precision="double")
    sim.initialize()
    laser = SimpleLaser2D(a0=1.0, w0=5e-6, ctau=ctau, l0=l0)
    # run until pulse center is inside the domain
    T = 2.2 * ctau / c
    sim.run(nsteps=int(T / sim.dt), callbacks=[laser])
    e0 = m_e * c * omega0 / e
    peak = np.abs(sim.get_field("ey")).max()
    assert peak == pytest.approx(e0, rel=0.08)
    # linear polarization: ez stays negligible
    assert np.abs(sim.get_field("ez")).max() < 1e-3 * e0
