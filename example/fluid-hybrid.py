"""Hybrid fluid-PIC: relativistic electron beam transport in a dense
background plasma (port of reference example/fluid-hybrid.py).

The background electrons are a cold fluid (no macro-particles) evolved by
the relativistic momentum equation (Boris push with the grid E/B) and an
upwind continuity equation with sub-cycling; the fluid current
J = -e n_e v_e is injected at the current_deposition stage. The beam
electrons and background protons are kinetic PIC species.

TPU-native note: in the single-controller design the fluid lives on the
host as plain numpy over the *global* grid (the reference threads
per-patch typed.Lists); the injection adds into the global J via
sim.get_field/set_field between jitted segments.

NOTE: this script is DELIBERATELY the reference's user script, kept
nearly verbatim (TPU kwargs added): the reference examples are the
de-facto acceptance suite (SURVEY.md 2.29), and the framework's
contract is that reference user scripts port unchanged. The
framework internals underneath share no code with the reference.
"""
import numpy as np

from lambdapic_tpu import (Callback, Electron, Proton, SaveFieldsToHDF5,
                           SaveSpeciesDensityToHDF5, SetMomentum, Simulation,
                           c, e, epsilon_0, m_e, pi)

um = 1e-6
l0 = 0.8 * um
omega0 = 2 * pi * c / l0
nc = epsilon_0 * m_e * omega0**2 / e**2

nx, ny = 512, 256
dx = dy = l0 / 20
Lx, Ly = nx * dx, ny * dy

n_bg = 10 * nc        # fluid background density
n_beam = 0.1 * nc     # kinetic beam density
u_beam = 10.0         # beam momentum (gamma*beta)


def fluid_boris(ux, uy, uz, ex, ey, ez, bx, by, bz, dt):
    """Vectorized relativistic Boris push of the fluid momentum field
    (reference example/fluid-hybrid.py boris_fluid_2d)."""
    q, m = -e, m_e
    ef = q * dt / (2 * m * c)
    bf = q * dt / (2 * m)
    umx, umy, umz = ux + ef * ex, uy + ef * ey, uz + ef * ez
    ig = 1.0 / np.sqrt(1 + umx**2 + umy**2 + umz**2)
    tx, ty, tz = bf * bx * ig, bf * by * ig, bf * bz * ig
    upx = umx + umy * tz - umz * ty
    upy = umy + umz * tx - umx * tz
    upz = umz + umx * ty - umy * tx
    tf = 2.0 / (1 + tx**2 + ty**2 + tz**2)
    sx, sy, sz = tf * tx, tf * ty, tf * tz
    ux = umx + upy * sz - upz * sy + ef * ex
    uy = umy + upz * sx - upx * sz + ef * ey
    uz = umz + upx * sy - upy * sx + ef * ez
    return ux, uy, uz


def continuity_upwind(ne, vx, vy, dt, dx, dy):
    """First-order upwind continuity with sub-cycling and outflow
    boundaries (reference update_fluid_density_subcycle)."""
    vmax = max(np.abs(vx).max(), np.abs(vy).max())
    if vmax == 0:
        return ne
    n_sub = min(int(vmax * dt / min(dx, dy) / 0.5) + 1, 1000)
    dts = dt / n_sub
    for _ in range(n_sub):
        Fx = ne * vx
        Fy = ne * vy
        # upwind fluxes at faces
        F_im = np.where(vx >= 0, np.roll(Fx, 1, 0), Fx)
        F_im[0] = Fx[0]
        F_ip = np.where(vx >= 0, Fx, np.roll(Fx, -1, 0))
        F_ip[-1] = Fx[-1]
        G_jm = np.where(vy >= 0, np.roll(Fy, 1, 1), Fy)
        G_jm[:, 0] = Fy[:, 0]
        G_jp = np.where(vy >= 0, Fy, np.roll(Fy, -1, 1))
        G_jp[:, -1] = Fy[:, -1]
        ne = ne - dts * ((F_ip - F_im) / dx + (G_jp - G_jm) / dy)
        np.maximum(ne, 0.0, out=ne)
    return ne


class FluidBackground(Callback):
    """Cold-fluid electrons coupled to PIC via current injection at the
    current_deposition stage (reference FluidBackground)."""

    stage = "current_deposition"

    def __init__(self, n0):
        super().__init__(interval=1)
        self.n0 = n0
        self.ne = None
        self.u = None

    def _init_fluid(self, sim):
        self.ne = np.full((sim.nx, sim.ny), self.n0)
        self.u = [np.zeros((sim.nx, sim.ny)) for _ in range(3)]

    def _call(self, sim):
        if self.ne is None:
            self._init_fluid(sim)
        E = [sim.get_field(n) for n in ("ex", "ey", "ez")]
        B = [sim.get_field(n) for n in ("bx", "by", "bz")]
        ux, uy, uz = fluid_boris(*self.u, *E, *B, sim.dt)
        self.u = [ux, uy, uz]
        ig = 1.0 / np.sqrt(1 + ux**2 + uy**2 + uz**2)
        vx, vy, vz = ux * ig * c, uy * ig * c, uz * ig * c
        self.ne = continuity_upwind(self.ne, vx, vy, sim.dt, sim.dx, sim.dy)
        # inject fluid current
        sim.set_field("jx", sim.get_field("jx") + (-e) * self.ne * vx)
        sim.set_field("jy", sim.get_field("jy") + (-e) * self.ne * vy)
        sim.set_field("jz", sim.get_field("jz") + (-e) * self.ne * vz)


def beam_density(x, y):
    r2 = ((x - 5 * um) / (2 * um))**2 + ((y - Ly / 2) / (2 * um))**2
    return np.where(r2 < 1, n_beam, 0.0)


beam = Electron(name="beam", density=beam_density, ppc=10)
ions = Proton(density=lambda x, y: n_bg + beam_density(x, y), ppc=2)

sim = Simulation(
    tiling="cell",          # cell-binned TPU engine (pallas kernels)
    nx=nx, ny=ny, dx=dx, dy=dy, nsteps=1001,
    log_file="fluid-hybrid.log")
sim.add_species([beam, ions])

if __name__ == "__main__":
    sim.run(callbacks=[
        SetMomentum(beam, [u_beam, 0, 0]),
        fluid := FluidBackground(n_bg),
        SaveFieldsToHDF5("data/fields", 100, ["ex", "ey", "bz", "jx"]),
        SaveSpeciesDensityToHDF5(beam, "data/beam_density", 100),
    ])
