"""Bitwise reproducibility with a fixed ``random_seed`` — and divergence
without one (reference tests/test_random_seed.py:10-107). Counter-based
jax.random keyed on (seed, step, species, device) is a stated design goal
(SURVEY.md §7 hard part 5); these tests pin it.
"""
import numpy as np
import pytest

from lambdapic_tpu import Electron, Photon, Proton, Simulation, Simulation3D
from lambdapic_tpu.core.species import _ALL_SPECIES

um = 1e-6
nc = 1.742e27

FIELDS = ("ex", "ey", "ez", "bx", "by", "bz", "jx", "jy", "jz", "rho")


@pytest.fixture(autouse=True)
def clear_species_registry():
    _ALL_SPECIES.clear()
    yield
    _ALL_SPECIES.clear()


def _run_2d(seed, nsteps=4, qed=False, tiling=None):
    _ALL_SPECIES.clear()
    if qed:
        pho = Photon(capacity=2048)
        ele = Electron(density=lambda x, y: np.where(x > 1 * um, 5 * nc, 0.0),
                       ppc=4, radiation="photons")
        ele.set_photon(pho)
        species = [ele, pho]
    else:
        ele = Electron(density=lambda x, y: np.where(x > 1 * um, 5 * nc, 0.0),
                       ppc=4)
        pro = Proton(density=lambda x, y: np.where(x > 1 * um, 5 * nc, 0.0),
                     ppc=2)
        species = [ele, pro]
    bc = {k: "periodic" for k in ("xmin", "xmax", "ymin", "ymax")}
    sim = Simulation(nx=32, ny=32, dx=0.1 * um, dy=0.1 * um,
                     npatch_x=2, npatch_y=2, boundary_conditions=bc,
                     random_seed=seed, tiling=tiling)
    sim.add_species(species)
    sim.initialize()
    if qed:
        # relativistic drift so chi is large enough for emissions
        from lambdapic_tpu.io.utils import SetMomentum
        sim.run(nsteps=nsteps, callbacks=[SetMomentum(species[0],
                                                      [2000.0, 0, 0])])
    else:
        sim.run(nsteps=nsteps)
    fields = {n: sim.get_field(n) for n in FIELDS}
    parts = [sim.get_particles(i) for i in range(len(species))]
    return fields, parts


def _sorted_phase(p):
    keys = [k for k in ("x", "y", "z", "ux", "uy", "uz", "w") if k in p]
    arr = np.stack([p[k] for k in keys])
    order = np.lexsort(arr[::-1])
    return arr[:, order]


def _assert_same(run_a, run_b):
    fa, pa = run_a
    fb, pb = run_b
    for name in FIELDS:
        np.testing.assert_array_equal(fa[name], fb[name], err_msg=name)
    for a, b in zip(pa, pb):
        np.testing.assert_array_equal(_sorted_phase(a), _sorted_phase(b))


def _assert_differ(run_a, run_b):
    fa, pa = run_a
    fb, pb = run_b
    if any(not np.array_equal(fa[n], fb[n]) for n in FIELDS):
        return
    for a, b in zip(pa, pb):
        ka, kb = _sorted_phase(a), _sorted_phase(b)
        if ka.shape != kb.shape or not np.array_equal(ka, kb):
            return
    raise AssertionError("runs with different seeds are identical")


def test_same_seed_bitwise_2d():
    _assert_same(_run_2d(42), _run_2d(42))


def test_same_seed_bitwise_2d_cell_engine():
    _assert_same(_run_2d(42, tiling="cell"), _run_2d(42, tiling="cell"))


def test_different_seed_diverges_2d():
    _assert_differ(_run_2d(42), _run_2d(43))


def test_no_seed_diverges_2d():
    _assert_differ(_run_2d(None, nsteps=2), _run_2d(None, nsteps=2))


def test_same_seed_bitwise_2d_qed():
    _assert_same(_run_2d(7, qed=True), _run_2d(7, qed=True))


def test_different_seed_diverges_2d_qed():
    _assert_differ(_run_2d(7, qed=True), _run_2d(8, qed=True))


def _run_3d(seed, nsteps=3):
    _ALL_SPECIES.clear()
    ele = Electron(density=lambda x, y, z: np.where(x > 0.5 * um,
                                                    2 * nc, 0.0), ppc=2)
    bc = {k: "periodic" for k in ("xmin", "xmax", "ymin", "ymax",
                                  "zmin", "zmax")}
    sim = Simulation3D(nx=16, ny=16, nz=16, dx=0.1 * um, dy=0.1 * um,
                       dz=0.1 * um, npatch_x=2, npatch_y=2, npatch_z=2,
                       boundary_conditions=bc, random_seed=seed)
    sim.add_species([ele])
    sim.initialize()
    sim.run(nsteps=nsteps)
    fields = {n: sim.get_field(n) for n in FIELDS}
    return fields, [sim.get_particles(0)]


def test_same_seed_bitwise_3d():
    _assert_same(_run_3d(11), _run_3d(11))


def test_different_seed_diverges_3d():
    _assert_differ(_run_3d(11), _run_3d(12))
