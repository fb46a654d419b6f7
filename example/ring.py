"""Ring (annulus) masked-domain simulation
(port of reference example/ring.py).

NOTE: this script is DELIBERATELY the reference's user script, kept
nearly verbatim (TPU kwargs added): the reference examples are the
de-facto acceptance suite (SURVEY.md 2.29), and the framework's
contract is that reference user scripts port unchanged. The
framework internals underneath share no code with the reference.
"""
import numpy as np

from lambdapic_tpu import (Electron, GaussianLaser2D, PlotFields, Proton,
                           SaveFieldsToHDF5, c, e, epsilon_0, m_e, pi)
from lambdapic_tpu.simulation.mask_simulation import MaskSimulation2D

um = 1e-6
l0 = 0.8 * um
omega0 = 2 * pi * c / l0
nc = epsilon_0 * m_e * omega0**2 / e**2

nx = ny = 512
dx = dy = l0 / 20
Lx, Ly = nx * dx, ny * dy

r_inner, r_outer = 5 * um, 9 * um
cx, cy = Lx / 2, Ly / 2


def ring_mask(x, y):
    r = np.hypot(x - cx, y - cy)
    return r_inner < r < r_outer


def density(x, y):
    r = np.hypot(x - cx, y - cy)
    inside = (r > r_inner + 1 * um) & (r < r_outer - 1 * um)
    return np.where(inside, 2 * nc, 0.0)


sim = MaskSimulation2D(
    nx=nx, ny=ny, dx=dx, dy=dy,
    npatch_x=16, npatch_y=16,        # mask tiling (reference patch grid)
    mask_device_mesh=(1, 1),
    mask=ring_mask,
    nsteps=1001,
    log_file="ring.log",
)

ele = Electron(density=density, ppc=4)
pro = Proton(density=density, ppc=4)
sim.add_species([ele, pro])

if __name__ == "__main__":
    sim.run(callbacks=[
        SaveFieldsToHDF5("ring/fields", 200, ["ez", "rho"]),
        PlotFields([dict(field="rho", cmap="RdBu", vmin=-1, vmax=1)],
                   prefix="ring", interval=200),
    ])
