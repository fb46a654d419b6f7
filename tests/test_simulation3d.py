"""3D simulation tests (reference example/laser-target-3d.py smoke and 3D
kernel correctness through the full driver)."""
import numpy as np
import pytest

from lambdapic_tpu import Electron, Proton, Simulation3D, SimpleLaser3D
from lambdapic_tpu.core.species import _ALL_SPECIES

um = 1e-6
l0 = 0.8 * um
nc = 1.742e27


@pytest.fixture(autouse=True)
def clear_species_registry():
    _ALL_SPECIES.clear()
    yield
    _ALL_SPECIES.clear()


@pytest.mark.integration
def test_laser_target_3d_smoke():
    def density(x, y, z):
        return np.where(x > 1.2 * um, 2 * nc, 0.0)

    ele = Electron(density=density, ppc=2)
    pro = Proton(density=density, ppc=2)
    sim = Simulation3D(nx=32, ny=16, nz=16, dx=l0 / 10, dy=l0 / 5,
                       dz=l0 / 5, npatch_x=2, npatch_y=2, npatch_z=2,
                       random_seed=0, precision="double")
    sim.add_species([ele, pro])
    laser = SimpleLaser3D(a0=5, w0=1 * um, ctau=1 * um)
    sim.run(nsteps=5, callbacks=[laser])
    for name in ("ex", "ey", "ez", "bx", "by", "bz", "jx", "rho"):
        f = sim.get_field(name)
        assert f.shape == (32, 16, 16)
        assert np.isfinite(f).all(), name
    assert np.abs(sim.get_field("ey")).max() > 0
    assert all(n > 0 for n in sim.npart_alive)


def test_charge_conservation_3d_sim():
    def density(x, y, z):
        return 1 * nc

    ele = Electron(density=density, ppc=1)
    pro = Proton(density=density, ppc=1)
    bc = {k: "periodic" for k in ("xmin", "xmax", "ymin", "ymax",
                                  "zmin", "zmax")}
    sim = Simulation3D(nx=16, ny=16, nz=16, dx=1e-7, dy=1e-7, dz=1e-7,
                       npatch_x=2, npatch_y=2, npatch_z=2,
                       boundary_conditions=bc, random_seed=1,
                       precision="double")
    sim.add_species([ele, pro])
    from lambdapic_tpu.io.utils import SetTemperature
    sim.run(nsteps=3, callbacks=[SetTemperature(ele, 5000.0)])
    rho_tot = sim.get_field("rho").sum() * sim.dx * sim.dy * sim.dz
    q_abs = 0.0
    q_net = 0.0
    for ispec, sp in enumerate(sim.species):
        w = sim.get_particles(ispec)["w"].sum()
        q_net += sp.q * w
        q_abs += abs(sp.q) * w
    assert abs(rho_tot - q_net) < 1e-9 * q_abs
    assert sim.npart_alive[0] == 16**3


def test_3d_migration_periodic():
    """Ballistic particle crosses z-shard boundaries and wraps."""
    from lambdapic_tpu import Species
    from lambdapic_tpu.constants import c
    ele = Species(name="e", charge=-1, mass=1.0)
    bc = {k: "periodic" for k in ("xmin", "xmax", "ymin", "ymax",
                                  "zmin", "zmax")}
    sim = Simulation3D(nx=16, ny=16, nz=16, dx=1e-6, dy=1e-6, dz=1e-6,
                       npatch_x=2, npatch_y=2, npatch_z=2,
                       boundary_conditions=bc, random_seed=0,
                       precision="double")
    sim.add_species([ele])
    sim.initialize()
    n = 8
    coords = {"x": np.full(n, 7.6e-6), "y": np.full(n, 7.6e-6),
              "z": np.full(n, 7.6e-6)}
    uz = np.full(n, 5.0)
    ig = 1 / np.sqrt(26.0)
    attrs = {"w": np.ones(n), "ux": np.zeros(n), "uy": np.zeros(n),
             "uz": uz, "inv_gamma": np.full(n, ig)}
    sim.set_particles_global(0, coords, attrs)
    z0 = sim.get_particles(0)["z"].copy()
    nsteps = 15
    sim.run(nsteps=nsteps)
    # domain convention: cell centers at 0..nz-1 -> z in [-dz/2, Lz-dz/2)
    expected = ((z0 + uz * ig * c * sim.dt * nsteps + sim.dz / 2)
                % sim.Lz) - sim.dz / 2
    got = np.sort(sim.get_particles(0)["z"])
    np.testing.assert_allclose(np.sort(expected), got, rtol=1e-9, atol=1e-12)
    assert sim.npart_alive[0] == n
