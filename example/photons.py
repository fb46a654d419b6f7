"""QED photon emission in an ultra-intense laser-plasma interaction
(port of reference example/photons.py:50-103).

NOTE: this script is DELIBERATELY the reference's user script, kept
nearly verbatim (TPU kwargs added): the reference examples are the
de-facto acceptance suite (SURVEY.md 2.29), and the framework's
contract is that reference user scripts port unchanged. The
framework internals underneath share no code with the reference.
"""
import numpy as np

from lambdapic_tpu import (
    Electron,
    ExtractSpeciesDensity,
    Photon,
    PlotFields,
    Proton,
    SimpleLaser2D,
    Simulation,
    c,
    callback,
    e,
    epsilon_0,
    m_e,
    pi,
)
from lambdapic_tpu.utils.logger import logger

um = 1e-6
l0 = 0.8 * um
omega0 = 2 * pi * c / l0
nc = epsilon_0 * m_e * omega0**2 / e**2

nx = 512
ny = 512
dx = l0 / 20
dy = l0 / 20


def density(n0):
    def _density(x, y):
        ne = 0.0
        if x > 2 * um:
            ne = n0
        return ne
    return _density


laser = SimpleLaser2D(a0=300, w0=2e-6, l0=0.8e-6, ctau=5e-6)

sim = Simulation(
    tiling="cell",          # cell-binned TPU engine (pallas kernels)
    nx=nx,
    ny=ny,
    dx=dx,
    dy=dy,
    sim_time=100e-15,
    log_file="photons.log",
)

ele = Electron(density=density(5 * nc), ppc=10, radiation="photons")
pho = Photon(capacity=1 << 20)
ele.set_photon(pho)

proton = Proton(density=density(5 * nc), ppc=10)

sim.add_species([ele, proton, pho])

interval = 10e-15


@callback(interval=interval)
def npho(sim: Simulation):
    logger.info(f"nphoton = {sim.npart_alive[pho.ispec]}")


if __name__ == "__main__":
    sim.run(
        callbacks=[
            laser,
            n_ele := ExtractSpeciesDensity(sim, ele, interval),
            PlotFields(
                [
                    dict(field=n_ele.density, scale=1 / nc, cmap="Grays",
                         vmin=0, vmax=10),
                    dict(field="ey", scale=e / (m_e * c * omega0),
                         cmap="bwr_alpha", vmin=-laser.a0, vmax=laser.a0),
                ],
                prefix="photons", interval=interval,
            ),
            npho,
        ]
    )
