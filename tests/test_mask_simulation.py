"""Masked irregular-domain tests (reference test_mask_simulation.py /
example/ring.py analog)."""
import numpy as np
import pytest

from lambdapic_tpu import Electron
from lambdapic_tpu.core.species import _ALL_SPECIES
from lambdapic_tpu.simulation.mask_simulation import MaskSimulation2D

um = 1e-6
nc = 1.742e27


@pytest.fixture(autouse=True)
def clear_species_registry():
    _ALL_SPECIES.clear()
    yield
    _ALL_SPECIES.clear()


@pytest.mark.parametrize("tiling", [None, "cell"])
def test_mask_simulation_ring(tiling):
    """Ring-shaped domain: fields damped and particles absent outside the
    mask; outputs NaN-masked like the reference domain_mask. Runs under
    both the scatter path and the cell engine (the per-particle mask
    kill works on any layout)."""
    L = 6.4 * um

    def ring(x, y):
        r = np.hypot(x - L / 2, y - L / 2)
        return 1.2 * um < r < 3.2 * um

    ele = Electron(density=lambda x, y: 2 * nc, ppc=2)
    sim = MaskSimulation2D(nx=64, ny=64, dx=0.1 * um, dy=0.1 * um,
                           npatch_x=8, npatch_y=8,      # mask tiling
                           mask_device_mesh=(2, 2), tiling=tiling,
                           mask=ring, random_seed=0, precision="double")
    sim.add_species([ele])
    sim.initialize()

    # particles only inside the mask
    p = sim.get_particles(0)
    ix = (p["x"] / sim.dx + 0.5).astype(int)
    iy = (p["y"] / sim.dy + 0.5).astype(int)
    assert sim.domain_mask[ix, iy].all()

    # seed a field everywhere and run: outside-mask fields decay
    inner = sim.domain_mask
    raw = np.ones((64, 64))
    sim.set_field("ez", raw)
    sim.run(nsteps=30)
    ez = sim.get_field("ez")
    assert np.isnan(ez[~inner]).all()          # NaN-masked output
    ez_raw = np.asarray(sim.state.fields.ez)
    # sponge has absorbed the masked-region field
    assert np.abs(ez_raw[~inner]).max() < 0.7
    assert np.isfinite(ez_raw).all()


def test_mask_rejects_empty():
    with pytest.raises(ValueError, match="no patches"):
        sim = MaskSimulation2D(nx=32, ny=32, dx=1e-7, dy=1e-7,
                               npatch_x=4, npatch_y=4,
                               mask=lambda x, y: False, random_seed=0)
        sim.initialize()
