"""Species-resolved currents (port of reference
example/species-resolved-ex.py): extract each species' own (jx, jy, jz, rho)
at the current_deposition stage.

NOTE: this script is DELIBERATELY the reference's user script, kept
nearly verbatim (TPU kwargs added): the reference examples are the
de-facto acceptance suite (SURVEY.md 2.29), and the framework's
contract is that reference user scripts port unchanged. The
framework internals underneath share no code with the reference.
"""
import numpy as np

from lambdapic_tpu import (Callback, Electron, Proton, SaveFieldsToHDF5,
                           SetMomentum, Simulation, c, e, epsilon_0, m_e, pi)

um = 1e-6
l0 = 0.8 * um
omega0 = 2 * pi * c / l0
nc = epsilon_0 * m_e * omega0**2 / e**2

nx = ny = 256
dx = dy = l0 / 20
Lx, Ly = nx * dx, ny * dy


class SaveSpeciesCurrent(Callback):
    """Save one species' deposited current each interval."""

    stage = "current_deposition"

    def __init__(self, species, which: str, prefix: str, interval=100):
        super().__init__(interval=interval)
        self.species = species
        self.which = which
        import pathlib
        self.prefix = pathlib.Path(prefix)
        self.prefix.mkdir(parents=True, exist_ok=True)

    def _call(self, sim):
        jx, jy, jz, rho = sim.species_current(self.species.ispec)
        comp = {"jx": jx, "jy": jy, "jz": jz, "rho": rho}[self.which]
        np.savez(self.prefix / f"{self.species.name}_{self.which}_"
                               f"{sim.itime:06d}.npz", data=comp)


def density(x, y):
    return np.where(np.hypot(x - Lx / 2, y - Ly / 2) < 3 * um, 0.1 * nc, 0.0)


ele = Electron(density=density, ppc=4)
pro = Proton(density=density, ppc=4)

sim = Simulation(
    tiling="cell",          # cell-binned TPU engine (pallas kernels)
    nx=nx, ny=ny, dx=dx, dy=dy, nsteps=501,
    log_file="species-resolved.log")
sim.add_species([ele, pro])

if __name__ == "__main__":
    sim.run(callbacks=[
        SetMomentum(ele, [0.2, 0, 0]),
        SaveSpeciesCurrent(ele, "jx", "species-resolved/ele", 100),
        SaveSpeciesCurrent(pro, "jx", "species-resolved/pro", 100),
        SaveFieldsToHDF5("species-resolved/fields", 100, ["jx", "rho"]),
    ])
