"""3D laser-solid target (port of reference example/laser-target-3d.py).

NOTE: this script is DELIBERATELY the reference's user script, kept
nearly verbatim (TPU kwargs added): the reference examples are the
de-facto acceptance suite (SURVEY.md 2.29), and the framework's
contract is that reference user scripts port unchanged. The
framework internals underneath share no code with the reference.
"""
import numpy as np

from lambdapic_tpu import (
    Electron,
    GaussianLaser3D,
    PlotFields,
    Proton,
    SaveFieldsToHDF5,
    SaveSpeciesDensityToHDF5,
    Simulation3D,
    c,
    callback,
    e,
    epsilon_0,
    m_e,
    pi,
)

um = 1e-6
l0 = 0.8 * um
t0 = l0 / c
omega0 = 2 * pi * c / l0
nc = epsilon_0 * m_e * omega0**2 / e**2

nx = 512
ny = 256
nz = 256
dx = l0 / 20
dy = l0 / 10
dz = l0 / 10

Lx = nx * dx
Ly = ny * dy
Lz = nz * dz


def density(n0):
    def _density(x, y, z):
        if x > 1 * um:
            return n0
        return 0.0
    return _density


laser = GaussianLaser3D(
    a0=10,
    w0=2e-6,
    l0=0.8e-6,
    ctau=5e-6,
    focus_position=Lx / 2,
    x0=10e-6,
)

sim = Simulation3D(
    tiling="cell",          # cell-binned TPU engine (pallas kernels)
    nx=nx, ny=ny, nz=nz,
    dx=dx, dy=dy, dz=dz,
    nsteps=1001,
    log_file="laser-target-3d.log",
)

ele = Electron(density=density(1 * nc), ppc=2)
proton = Proton(density=density(1 * nc), ppc=2)

sim.add_species([ele, proton])


@callback(interval=100)
def midplane_slice(sim: Simulation3D):
    """z-midplane ey slice to npz (the reference gathers a z-slice to
    rank 0; here the global array is directly available)."""
    ey = sim.get_field("ey")[:, :, sim.nz // 2]
    np.savez(f"laser-target-3d-ey-{sim.itime:06d}.npz", ey=ey)


if __name__ == "__main__":
    sim.run(
        callbacks=[
            laser,
            midplane_slice,
            SaveFieldsToHDF5("laser-target-3d/fields", 500,
                             ["ey", "rho"], slice=np.s_[:, :, nz // 2]),
            SaveSpeciesDensityToHDF5(ele, "laser-target-3d/density", 500),
        ]
    )
