"""deposit_rho modes: the hot loop may skip the every-step rho deposit
(rho never feeds the Maxwell update; reference current/current_deposit.h
deposits it unconditionally) and recompute rho on demand in
Simulation.get_field. Asserts: J and fields are bitwise identical between
modes, on-demand rho matches the every-step deposit, and the "auto"
resolution is conservative for plain user callbacks."""
import numpy as np
import pytest

from lambdapic_tpu import Electron, Proton, Simulation, SimpleLaser2D
from lambdapic_tpu.core.species import _ALL_SPECIES

um = 1e-6


@pytest.fixture(autouse=True)
def clear_species_registry():
    _ALL_SPECIES.clear()
    yield
    _ALL_SPECIES.clear()


def _build(drho, extra_cbs=()):
    _ALL_SPECIES.clear()

    def density(x, y):
        return np.where(x > 1.0 * um, 2e27, 0.0)

    ele = Electron(density=density, ppc=4)
    pro = Proton(density=density, ppc=4)
    sim = Simulation(nx=64, ny=64, dx=4e-8, dy=4e-8, npatch_x=4,
                     npatch_y=2, tiling="cell", deposit_rho=drho,
                     random_seed=7, recap_interval=0, precision="double")
    sim.add_species([ele, pro])
    laser = SimpleLaser2D(a0=5, w0=1 * um, ctau=1 * um)
    sim.run(nsteps=5, callbacks=[laser, *extra_cbs])
    return sim


@pytest.mark.integration
def test_on_demand_rho_matches_every_step_deposit():
    a = _build("auto")
    b = _build(True)
    assert a._with_rho is False       # laser is rho-free -> auto skips
    assert b._with_rho is True
    rb = b.get_field("rho")
    ra = a.get_field("rho")
    assert np.abs(rb).max() > 0
    np.testing.assert_allclose(ra, rb, rtol=0,
                               atol=1e-12 * np.abs(rb).max())
    # the J deposit and the field evolution are bitwise unaffected
    for name in ("jx", "jy", "jz", "ex", "ey", "ez", "bz"):
        np.testing.assert_array_equal(a.get_field(name),
                                      b.get_field(name))


def test_auto_is_conservative_for_plain_callbacks():
    seen = []

    def user_cb(sim):
        seen.append(sim.itime)

    sim = _build("auto", extra_cbs=[user_cb])
    # a plain function may read sim.state.fields.rho directly -> auto
    # must keep the every-step deposit
    assert sim._with_rho is True
    assert seen
    assert np.abs(sim.get_field("rho")).max() > 0


def test_force_off_still_serves_rho():
    sim = _build(False)
    assert sim._with_rho is False
    rho = sim.get_field("rho")
    assert rho.shape == (64, 64)
    assert np.abs(rho).max() > 0      # recomputed from particles
