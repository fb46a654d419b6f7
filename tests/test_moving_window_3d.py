"""3D moving window (reference tests/test_moving_window.py:120-126): the
window advances, recycled boundary planes are refilled from the density
profile, and the cell engine matches the scatter engine."""
import numpy as np
import pytest

from lambdapic_tpu import Electron, MovingWindow, Simulation3D
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


def run_case(tiling, nsteps=25, **kw):
    _ALL_SPECIES.clear()

    def density(x, y, z):
        return np.where(x > 4 * um, 0.1 * nc, 0.0)

    ele = Electron(density=density, ppc=2)
    sim = Simulation3D(nx=64, ny=16, nz=16, dx=l0 / 8, dy=l0 / 4,
                       dz=l0 / 4, npatch_x=2, npatch_y=2, npatch_z=2,
                       random_seed=0, precision="double", tiling=tiling,
                       **kw)
    sim.add_species([ele])
    window = MovingWindow(velocity=c, start_time=2e-15)
    sim.run(nsteps=nsteps, callbacks=[window])
    fields = {n: sim.get_field(n) for n in ("ex", "ey", "rho", "jx")}
    return sim, fields, sim.get_particles(0)


def test_moving_window_3d():
    sim, fields, parts = run_case(None)
    assert sim._window_offset > 0
    for n, f in fields.items():
        assert np.isfinite(f).all(), n
    # plasma refilled from the profile at the injected (right) side: the
    # window moved by offset cells, so cells near xmax carry fresh plasma
    x = parts["x"]
    Lx_win = sim.nx * sim.dx + sim._window_offset * sim.dx
    assert x.max() > Lx_win - 2 * sim.dx
    # uniform density in y/z for injected plasma
    assert len(x) > 0


def test_moving_window_3d_cell_matches_scatter():
    sim_r, f_ref, p_ref = run_case(None)
    sim_c, f_cel, p_cel = run_case("cell", cell_migration="exact")
    assert sim_c._window_offset == sim_r._window_offset > 0
    for name in f_ref:
        scale = np.abs(f_ref[name]).max() + 1e-30
        np.testing.assert_allclose(f_cel[name], f_ref[name],
                                   atol=1e-9 * scale, err_msg=name)
    assert len(p_cel["x"]) == len(p_ref["x"])
    for k in ("x", "y", "z", "w"):
        np.testing.assert_allclose(np.sort(p_cel[k]), np.sort(p_ref[k]),
                                   rtol=1e-9, atol=1e-12, err_msg=k)
