"""Backward moving window (negative velocity): the reference _shift_left
(callback/utils.py:570-572) recycles the right edge and fills new cells on
the left from the density profile. All three particle layouts must agree."""
import numpy as np
import pytest

from lambdapic_tpu import Electron, MovingWindow, Simulation
from lambdapic_tpu.constants import c
from lambdapic_tpu.core.species import _ALL_SPECIES

um = 1e-6
l0 = 0.8 * um
nc = 1.742e27


@pytest.fixture(autouse=True)
def clear_species_registry():
    _ALL_SPECIES.clear()
    yield
    _ALL_SPECIES.clear()


def run_case(tiling, nsteps=40, **kw):
    _ALL_SPECIES.clear()

    def density(x, y):
        # plasma everywhere left of 6 um: the backward window uncovers
        # x < 0 columns, which must be filled (x is the global coord)
        return np.where(x < 6 * um, 0.1 * nc, 0.0)

    ele = Electron(density=density, ppc=2)
    sim = Simulation(nx=128, ny=32, dx=l0 / 8, dy=l0 / 4,
                     npatch_x=4, npatch_y=2, random_seed=0,
                     precision="double", tiling=tiling, **kw)
    sim.add_species([ele])
    window = MovingWindow(velocity=-c, start_time=3e-15)
    sim.run(nsteps=nsteps, callbacks=[window])
    fields = {n: sim.get_field(n) for n in ("ex", "ey", "rho", "jx")}
    return sim, fields, sim.get_particles(0)


def test_backward_window_shifts_and_injects():
    sim, fields, parts = run_case(None)
    assert sim._window_offset < 0
    # uncovered left columns carry plasma: particles exist with global
    # x below the original domain start
    x_glob = parts["x"]
    assert (x_glob < 0).any()
    assert np.isfinite(fields["ey"]).all()
    # the density profile cuts off at 6 um: rho in the (shifted) window
    # interior right of the cutoff stays empty of injected plasma
    assert parts["w"].min() > 0


def test_cell_backward_window_matches_untiled():
    sim_r, f_ref, p_ref = run_case(None)
    sim_c, f_cel, p_cel = run_case("cell", cell_migration="exact")
    assert sim_c._window_offset == sim_r._window_offset < 0
    for name in f_ref:
        scale = np.abs(f_ref[name]).max() + 1e-30
        np.testing.assert_allclose(f_cel[name], f_ref[name],
                                   atol=1e-9 * scale, err_msg=name)
    assert len(p_cel["x"]) == len(p_ref["x"])
    for k in ("x", "y", "w"):
        np.testing.assert_allclose(np.sort(p_cel[k]), np.sort(p_ref[k]),
                                   rtol=1e-9, atol=1e-12, err_msg=k)


def test_tiled_backward_window_matches_untiled():
    sim_r, f_ref, p_ref = run_case(None)
    sim_t, f_til, p_til = run_case((16, 8))
    assert sim_t._window_offset == sim_r._window_offset < 0
    for name in f_ref:
        scale = np.abs(f_ref[name]).max() + 1e-30
        np.testing.assert_allclose(f_til[name], f_ref[name],
                                   atol=1e-9 * scale, err_msg=name)
    assert len(p_til["x"]) == len(p_ref["x"])
