"""End-to-end zero-loss invariant at DEFAULT settings (VERDICT r3 item
10): the cell engine's fast overwrite-merge re-binning must conserve
total charge (sum of particle weights) exactly even while capacity
pressure forces merges — the reference never loses a particle
(core/particles.py:141-193 extend/prune); we never lose *weight*.

Periodic boundaries so no particle legitimately leaves the domain.
"""
import jax
import numpy as np
import pytest

from lambdapic_tpu import Electron, Proton, Simulation
from lambdapic_tpu.core.species import _ALL_SPECIES
from lambdapic_tpu.io.utils import SetTemperature


@pytest.fixture(autouse=True)
def clear_registry():
    _ALL_SPECIES.clear()
    yield
    _ALL_SPECIES.clear()


def total_weight(sim, ispec):
    p = sim.state.particles[ispec]
    w = np.asarray(p.data["w"], dtype=np.float64)
    alive = np.asarray(p.alive)
    return float(w[alive].sum())


@pytest.mark.integration
def test_fast_migration_conserves_total_weight():
    nc = 1.742e27
    ele = Electron(density=lambda x, y: 5 * nc, ppc=8)
    pro = Proton(density=lambda x, y: 5 * nc, ppc=8)
    bc = {k: "periodic" for k in ("xmin", "xmax", "ymin", "ymax")}
    sim = Simulation(nx=16, ny=16, dx=1e-7, dy=1e-7,
                     npatch_x=1, npatch_y=1, boundary_conditions=bc,
                     random_seed=0, precision="double", tiling="cell",
                     cell_migration="fast",      # the DEFAULT scheme
                     particle_capacity_factor=1.05,   # force merges
                     recap_interval=0, n_guard=2)
    sim.add_species([ele, pro])
    # hot electrons drive rapid cell-to-cell traffic and local compression
    sim.run(nsteps=1, callbacks=[SetTemperature(ele, 5e8)])
    w0 = [total_weight(sim, i) for i in range(2)]
    sim.run(nsteps=30)
    jax.block_until_ready(sim.state)
    w1 = [total_weight(sim, i) for i in range(2)]
    merges = int(np.asarray(sim.state.particles[0].overflow).sum())
    # the point of the test: merges DID happen and weight is conserved
    assert merges > 0, "capacity pressure produced no merges; tighten cap"
    for a, b in zip(w0, w1):
        np.testing.assert_allclose(b, a, rtol=1e-12)
