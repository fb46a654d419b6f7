"""IO / init-state / restart / moving-window callback tests (reference
test_hdf5_callback.py, test_restart.py, test_moving_window.py analogs)."""
import numpy as np
import pytest

from lambdapic_tpu import (Electron, ExtractSpeciesDensity, LoadParticles,
                           MovingWindow, Proton, RestartDump,
                           SaveFieldsToHDF5, SaveParticlesToHDF5,
                           SaveSpeciesDensityToHDF5, SetMomentum,
                           SetMomentumAndTemperature, SetTemperature,
                           Simulation)
from lambdapic_tpu.constants import c, e, m_e
from lambdapic_tpu.core.species import _ALL_SPECIES

um = 1e-6
l0 = 0.8 * um
nc = 1.742e27


@pytest.fixture(autouse=True)
def clear_species_registry():
    _ALL_SPECIES.clear()
    yield
    _ALL_SPECIES.clear()


def make_sim(**kw):
    def density(x, y):
        return np.where(x > 2 * um, 2 * nc, 0.0)

    ele = Electron(density=density, ppc=2)
    sim = Simulation(nx=64, ny=32, dx=l0 / 10, dy=l0 / 10,
                     npatch_x=2, npatch_y=2, random_seed=0,
                     precision="double", **kw)
    sim.add_species([ele])
    return sim


def test_save_fields_hdf5(tmp_path):
    import h5py
    sim = make_sim()
    cb = SaveFieldsToHDF5(prefix=tmp_path / "fields", interval=2,
                          components=["ey", "rho"])
    sim.run(nsteps=4, callbacks=[cb])
    files = sorted((tmp_path / "fields").glob("*.h5"))
    assert [f.name for f in files] == ["000000.h5", "000002.h5"]
    with h5py.File(files[1], "r") as f:
        assert set(f.keys()) == {"ey", "rho"}
        assert f["ey"].shape == (64, 32)
        assert f.attrs["nx"] == 64
        assert f.attrs["itime"] == 2


def test_save_fields_hdf5_slice(tmp_path):
    import h5py
    sim = make_sim()
    cb = SaveFieldsToHDF5(prefix=tmp_path / "s", interval=1,
                          components=["ex"], slice=np.s_[10:30:2, 5])
    sim.run(nsteps=1, callbacks=[cb])
    with h5py.File(tmp_path / "s" / "000000.h5", "r") as f:
        assert f["ex"].shape == (10, 1)
        assert "slice" in f.attrs


def test_species_density_and_hdf5(tmp_path):
    import h5py
    sim = make_sim()
    extract = ExtractSpeciesDensity(sim, sim.species[0], interval=1)
    save = SaveSpeciesDensityToHDF5(sim.species[0], prefix=tmp_path / "d",
                                    interval=1)
    sim.run(nsteps=1, callbacks=[extract, save])
    dens = extract.density
    assert dens.shape == (64, 32)
    # density approximately the profile value inside the target
    assert dens[40:60, 10:20].mean() == pytest.approx(2 * nc, rel=0.15)
    assert dens[:20].max() < 0.2 * nc
    with h5py.File(tmp_path / "d" / "electron_000000.h5", "r") as f:
        np.testing.assert_allclose(f["density"][...], dens, rtol=1e-12)


def test_save_particles_hdf5(tmp_path):
    import h5py
    sim = make_sim()
    cb = SaveParticlesToHDF5(sim.species[0], prefix=tmp_path / "p",
                             interval=1, attrs=["x", "y", "w"])
    sim.run(nsteps=1, callbacks=[cb])
    with h5py.File(tmp_path / "p" / "electron_particles_000000.h5", "r") as f:
        n = f.attrs["npart"]
        assert n == sim.npart_alive[0]
        assert f["x"].shape == (n,)
        assert len(np.unique(f["id"][...])) == n


def test_set_momentum_and_temperature():
    sim = make_sim()
    cb1 = SetMomentum(sim.species[0], [0.5, 0.0, 0.0])
    sim.run(nsteps=1, callbacks=[cb1])
    p = sim.get_particles(0)
    np.testing.assert_allclose(p["ux"], 0.5)
    np.testing.assert_allclose(p["inv_gamma"], 1 / np.sqrt(1.25), rtol=1e-12)


def test_set_temperature_distribution():
    """MJ sampler: non-relativistic limit <u^2> approx 3 theta
    (reference test setup, callback/utils.py:973-1049)."""
    sim = make_sim()
    T_eV = 1000.0
    cb = SetTemperature(sim.species[0], T_eV)
    sim.run(nsteps=1, callbacks=[cb])
    p = sim.get_particles(0)
    theta = T_eV * e / (m_e * c**2)
    u2 = p["ux"]**2 + p["uy"]**2 + p["uz"]**2
    assert u2.mean() == pytest.approx(3 * theta, rel=0.1)
    # isotropy
    assert p["ux"].mean() == pytest.approx(0.0, abs=3 * np.sqrt(
        theta / len(p["ux"])))


def test_set_momentum_and_temperature_combo():
    sim = make_sim()
    cb = SetMomentumAndTemperature(sim.species[0], [2.0, 0, 0], 100.0)
    sim.run(nsteps=1, callbacks=[cb])
    p = sim.get_particles(0)
    assert p["ux"].mean() == pytest.approx(2.0, rel=0.05)


def test_load_particles():
    sim = make_sim()
    n = 50
    rng = np.random.default_rng(0)
    coords = {"x": rng.uniform(1e-6, 4e-6, n), "y": rng.uniform(1e-6, 2e-6, n)}
    cb = LoadParticles(sim.species[0], coords=coords,
                       attrs={"w": np.ones(n), "ux": np.full(n, 0.3)})
    sim.run(nsteps=1, callbacks=[cb])
    assert sim.npart_alive[0] == n
    p = sim.get_particles(0)
    np.testing.assert_allclose(np.sort(p["w"]), 1.0)


def test_restart_roundtrip(tmp_path):
    sim = make_sim()
    dump = RestartDump(out_dir=tmp_path / "ck", interval=3, keep=2,
                       catch_signals=False)
    sim.run(nsteps=4, callbacks=[dump])
    ey_ref = sim.get_field("ey")

    # restore into a fresh simulation and continue
    sim2 = make_sim()
    RestartDump.load(sim2, tmp_path / "ck")
    assert sim2.itime == 4
    # the restored state must let the run continue to the same result
    sim.run(nsteps=2)
    sim2.run(nsteps=6 - sim2.itime)
    np.testing.assert_allclose(sim2.get_field("ey"), sim.get_field("ey"),
                               rtol=1e-12, atol=1e-20)


@pytest.mark.slow
def test_moving_window_lwfa():
    """Moving window: plasma fills the domain as the window advances; field
    energy stays finite (reference test_moving_window.py:120-126)."""
    def density(x, y):
        return np.where(x > 20 * um, 0.1 * nc, 0.0)

    ele = Electron(density=density, ppc=2)
    # kept light (2x2 mesh, 45 steps): the full-suite XLA:CPU runtime is
    # close to its collective-rendezvous limits on this 1-core host, and
    # this (heaviest) test is where the process used to die
    sim = Simulation(nx=128, ny=32, dx=l0 / 8, dy=l0 / 4,
                     npatch_x=2, npatch_y=2, random_seed=0,
                     precision="double")
    sim.add_species([ele])
    window = MovingWindow(velocity=c, start_time=3e-15)
    sim.run(nsteps=45, callbacks=[window])
    assert sim._window_offset > 0
    assert sim._xmin_pml_removed
    # new plasma injected on the right as the window advanced into the slab
    dens = sim.species_density(0)
    assert np.isfinite(sim.get_field("ey")).all()
    x_glob = (np.arange(sim.nx) + sim._window_offset) * sim.dx
    inside = x_glob > 21 * um
    if inside.any():
        assert dens[inside, 16].mean() == pytest.approx(0.1 * nc, rel=0.3)
    # particle x coordinates reported in the lab frame
    p = sim.get_particles(0)
    if len(p["x"]):
        assert p["x"].min() > 19 * um


SLICE_CASES_2D = [
    np.s_[:, 5],
    np.s_[5],
    np.s_[::2, ::3],
    np.s_[10:30:2, 5],
    np.s_[-10:, :],
    np.s_[:, -5],
    np.s_[63, 31],
    np.s_[::7, ::5],
    np.s_[5:5, :],          # empty slice
    np.s_[-20:-4:3, 1:-1],
]


def test_save_fields_hdf5_slice_matrix(tmp_path):
    """The reference exercises 20+ slice cases (test_hdf5_callback.py);
    each saved dataset must equal numpy slicing of the full field."""
    import h5py
    sim = make_sim()
    cbs = [SaveFieldsToHDF5(prefix=tmp_path / f"s{i}", interval=1,
                            components=["ey"], slice=s)
           for i, s in enumerate(SLICE_CASES_2D)]
    cbs.append(SaveFieldsToHDF5(prefix=tmp_path / "full", interval=1,
                                components=["ey"]))
    sim.run(nsteps=1, callbacks=cbs)
    with h5py.File(tmp_path / "full" / "000000.h5", "r") as f:
        full = f["ey"][...]
        assert "slice" not in f.attrs
    for i, s in enumerate(SLICE_CASES_2D):
        with h5py.File(tmp_path / f"s{i}" / "000000.h5", "r") as f:
            got = f["ey"][...]
            assert "slice" in f.attrs
        exp = full[_as_explicit(s)]
        assert got.shape == exp.shape, (i, s, got.shape, exp.shape)
        np.testing.assert_array_equal(got, exp)


def _as_explicit(s):
    """Mirror the writer's int->length-1-slice normalization for numpy."""
    if not isinstance(s, tuple):
        s = (s,)
    out = []
    for e in s:
        if isinstance(e, (int, np.integer)):
            out.append(slice(e, e + 1 if e != -1 else None))
        else:
            out.append(e)
    return tuple(out)


def test_save_fields_hdf5_slice_errors(tmp_path):
    sim = make_sim()
    sim.initialize()
    cb = SaveFieldsToHDF5(prefix=tmp_path / "bad", interval=1,
                          components=["ey"], slice=np.s_[::-1, :])
    with pytest.raises(ValueError):
        cb._call(sim)
    cb = SaveFieldsToHDF5(prefix=tmp_path / "bad2", interval=1,
                          components=["ey"], slice=np.s_[0, 0, 0])
    with pytest.raises(ValueError):
        cb._call(sim)
    cb = SaveFieldsToHDF5(prefix=tmp_path / "bad3", interval=1,
                          components=["ey"], slice=np.s_[200, 0])
    with pytest.raises(IndexError):
        cb._call(sim)


def test_save_density_hdf5_slice_3d(tmp_path):
    """3D slice matrix for density + fields writers."""
    import h5py
    from lambdapic_tpu import Simulation3D
    _ALL_SPECIES.clear()

    def density(x, y, z):
        return np.where(x > 0.5 * um, 2 * nc, 0.0)

    ele = Electron(density=density, ppc=1)
    bc = {k: "periodic" for k in ("xmin", "xmax", "ymin", "ymax",
                                  "zmin", "zmax")}
    sim = Simulation3D(nx=16, ny=16, nz=16, dx=0.1 * um, dy=0.1 * um,
                       dz=0.1 * um, npatch_x=2, npatch_y=2, npatch_z=2,
                       boundary_conditions=bc, random_seed=1)
    sim.add_species([ele])
    cases = [np.s_[:, :, 10], np.s_[::2, ::2, ::5], np.s_[4, :, :],
             np.s_[:, 5], np.s_[1:-1, ::3, -4:]]
    cbs = [SaveSpeciesDensityToHDF5(ele, prefix=tmp_path / f"d{i}",
                                    interval=1, slice=s)
           for i, s in enumerate(cases)]
    cbs.append(SaveSpeciesDensityToHDF5(ele, prefix=tmp_path / "dfull",
                                        interval=1))
    cbs.append(SaveFieldsToHDF5(prefix=tmp_path / "f0", interval=1,
                                components=["rho"], slice=np.s_[:, :, 10]))
    sim.run(nsteps=1, callbacks=cbs)
    with h5py.File(tmp_path / "dfull" / "electron_000000.h5", "r") as f:
        full = f["density"][...]
    assert full.shape == (16, 16, 16)
    for i, s in enumerate(cases):
        with h5py.File(tmp_path / f"d{i}" / "electron_000000.h5", "r") as f:
            got = f["density"][...]
        np.testing.assert_array_equal(got, full[_as_explicit(s)])
    with h5py.File(tmp_path / "f0" / "000000.h5", "r") as f:
        assert f["rho"].shape == (16, 16, 1)
