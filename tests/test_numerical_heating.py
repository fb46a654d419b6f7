"""Energy conservation / numerical heating of a thermal plasma
(port of reference tests/test_numerical_heating.py:1-150)."""
import numpy as np
import pytest

from lambdapic_tpu import Electron, SetTemperature, Simulation, Species
from lambdapic_tpu.constants import c, e, epsilon_0, m_e, m_p, mu_0, pi
from lambdapic_tpu.core.species import _ALL_SPECIES

l0 = 0.8e-6
omega0 = 2 * pi * c / l0
nc = epsilon_0 * m_e * omega0**2 / e**2


@pytest.fixture(autouse=True)
def clear_species_registry():
    _ALL_SPECIES.clear()
    yield
    _ALL_SPECIES.clear()


def total_energy(sim) -> float:
    e_tot = 0.0
    for ispec, s in enumerate(sim.species):
        p = sim.get_particles(ispec)
        gamma = 1.0 / p["inv_gamma"]
        e_tot += (p["w"] * (gamma - 1) * s.m * c**2).sum()
    E2 = sum(sim.get_field(n)**2 for n in ("ex", "ey", "ez"))
    B2 = sum(sim.get_field(n)**2 for n in ("bx", "by", "bz"))
    e_tot += ((0.5 * epsilon_0 * E2 + 0.5 / mu_0 * B2).sum()
              * sim.dx * sim.dy)
    return float(e_tot)


@pytest.mark.integration
@pytest.mark.parametrize("tiling", [None, "cell"])
def test_energy_conservation_thermal_plasma(tiling):
    """Total (kinetic + field) energy of a 1 keV quasi-neutral plasma is
    conserved to a few percent over ~9 plasma steps (reference
    test_numerical_heating.py:103-150) — under both the scatter path and
    the default cell engine."""
    ne = 1 * nc
    ele = Electron(density=lambda x, y: ne, ppc=10)
    deut = Species(name="D", charge=1, mass=2 * m_p / m_e,
                   density=lambda x, y: ne, ppc=10)
    sim = Simulation(
        nx=64, ny=64, dx=l0 / 20, dy=l0 / 20, npatch_x=2, npatch_y=2,
        boundary_conditions={k: "periodic" for k in
                             ("xmin", "xmax", "ymin", "ymax")},
        random_seed=3, precision="double", tiling=tiling)
    sim.add_species([ele, deut])
    sim.initialize()

    kT_eV = 1e3
    SetTemperature(ele, kT_eV)(sim)
    SetTemperature(deut, kT_eV)(sim)

    e0 = total_energy(sim)
    sim.run(sim_time=1e-15)
    e1 = total_energy(sim)
    assert abs(e1 - e0) / e0 < 0.02, (e0, e1)
