"""Maxwell solver tests: vacuum standing wave against the exact Yee
dispersion relation, and CPML absorption (reference test strategy:
vacuum wave propagation / numerical dispersion sanity, SURVEY.md §7 phase 2)."""
import numpy as np
import pytest

from lambdapic_tpu import Simulation
from lambdapic_tpu.constants import c
from lambdapic_tpu.core.species import _ALL_SPECIES


@pytest.fixture(autouse=True)
def clear_species_registry():
    _ALL_SPECIES.clear()
    yield
    _ALL_SPECIES.clear()


def make_sim(bc, nx=32, ny=16, npx=2, npy=2, **kw):
    sim = Simulation(nx=nx, ny=ny, dx=1e-6, dy=1e-6,
                     npatch_x=npx, npatch_y=npy,
                     boundary_conditions=bc, precision="double",
                     random_seed=0, **kw)
    sim.initialize()
    return sim


def test_vacuum_standing_wave_dispersion():
    """E-only sinusoidal init evolves as cos(omega_yee t) exactly."""
    bc = {"xmin": "periodic", "xmax": "periodic",
          "ymin": "periodic", "ymax": "periodic"}
    sim = make_sim(bc)
    nx, dx, dt = sim.nx, sim.dx, sim.dt
    k = 2 * np.pi * 2 / (nx * dx)           # two wavelengths in the box
    x = np.arange(nx) * dx
    ey0 = np.sin(k * x)[:, None] * np.ones((1, sim.ny))
    sim.set_field("ey", ey0)

    nsteps = 37
    sim.run(nsteps=nsteps)
    # Yee dispersion: sin(w dt/2) = c dt/dx sin(k dx/2)
    w_yee = 2 / dt * np.arcsin(np.clip(c * dt / dx * np.sin(k * dx / 2),
                                       -1, 1))
    expected = ey0 * np.cos(w_yee * nsteps * dt)
    got = sim.get_field("ey")
    np.testing.assert_allclose(got, expected, atol=1e-9 * np.abs(ey0).max())


def test_vacuum_energy_conservation_periodic():
    bc = {"xmin": "periodic", "xmax": "periodic",
          "ymin": "periodic", "ymax": "periodic"}
    sim = make_sim(bc)
    rng = np.random.default_rng(0)
    # smooth random field
    f = np.zeros((sim.nx, sim.ny))
    for kx in range(1, 4):
        for ky in range(1, 4):
            f += rng.normal() * np.sin(
                2 * np.pi * kx * np.arange(sim.nx)[:, None] / sim.nx) * \
                np.sin(2 * np.pi * ky * np.arange(sim.ny)[None, :] / sim.ny)
    sim.set_field("ez", f)

    def energy(s):
        from lambdapic_tpu.constants import epsilon_0, mu_0
        E2 = sum(s.get_field(n)**2 for n in ("ex", "ey", "ez"))
        B2 = sum(s.get_field(n)**2 for n in ("bx", "by", "bz"))
        return (0.5 * epsilon_0 * E2 + 0.5 / mu_0 * B2).sum()

    # Leapfrog conserves a time-centered energy; the naive integer-time
    # E^2+B^2 oscillates at O(omega dt) but must stay bounded with zero
    # secular drift.
    sim.run(nsteps=1)
    e1 = energy(sim)
    es = []
    for _ in range(60):
        sim.run(nsteps=1)
        es.append(energy(sim))
    es = np.asarray(es)
    assert np.abs(es / e1 - 1).max() < 0.12       # bounded oscillation
    # no growth: late-window mean equals early-window mean
    assert abs(es[40:].mean() - es[:20].mean()) / e1 < 5e-3


def test_cpml_absorbs_outgoing_wave():
    """A localized pulse is absorbed by the PML instead of reflecting
    (reference CPML behavior, core/boundary/cpml.py)."""
    bc = {"xmin": "pml", "xmax": "pml", "ymin": "periodic", "ymax": "periodic"}
    sim = make_sim(bc, nx=96, ny=8, npx=2, npy=2)
    x = np.arange(sim.nx) * sim.dx
    x0 = sim.Lx / 2
    blob = np.exp(-((x - x0) / (6 * sim.dx))**2)
    sim.set_field("ez", blob[:, None] * np.ones((1, sim.ny)))
    e0 = (sim.get_field("ez")**2).sum()
    # long enough for both split pulses to reach and die in the PML
    sim.run(nsteps=400)
    e1 = sum((sim.get_field(n)**2).sum() for n in
             ("ex", "ey", "ez")) + c**2 * sum(
        (sim.get_field(n)**2).sum() for n in ("bx", "by", "bz"))
    assert e1 < 1e-4 * e0
