"""Multi-device == single-device parity.

The reference's strongest parallel-correctness criterion: multi-patch
deposition/sync must match a single-patch run
(reference tests/core/current/test_current_deposition.py:318-321 and
tests/mpi semantics). Here: the full step (gather, push, Esirkepov,
halo reduce, migration) on a 2x2 / 4x2 device mesh must reproduce the 1x1
run bit-for-near-bit from identical global initial conditions.
"""
import numpy as np
import pytest

from lambdapic_tpu import Simulation, Species
from lambdapic_tpu.core.species import _ALL_SPECIES


@pytest.fixture(autouse=True)
def clear_species_registry():
    _ALL_SPECIES.clear()
    yield
    _ALL_SPECIES.clear()


def build_sim(npx, npy, periodic=True):
    if periodic:
        bc = {k: "periodic" for k in ("xmin", "xmax", "ymin", "ymax")}
    else:
        bc = {k: "pml" for k in ("xmin", "xmax", "ymin", "ymax")}
    ele = Species(name="e", charge=-1, mass=1.0)
    sim = Simulation(nx=32, ny=32, dx=1e-6, dy=1e-6,
                     npatch_x=npx, npatch_y=npy, boundary_conditions=bc,
                     precision="double", random_seed=7)
    sim.add_species([ele])
    sim.initialize()
    return sim


def global_particles(n=400, seed=5):
    rng = np.random.default_rng(seed)
    L = 32e-6
    coords = {"x": rng.uniform(0, L * 0.999, n) - 0.49e-6,
              "y": rng.uniform(0, L * 0.999, n) - 0.49e-6}
    attrs = {"w": rng.uniform(0.5, 2.0, n) * 1e6,
             "ux": rng.normal(size=n) * 2,
             "uy": rng.normal(size=n) * 2,
             "uz": rng.normal(size=n)}
    ig = 1 / np.sqrt(1 + attrs["ux"]**2 + attrs["uy"]**2 + attrs["uz"]**2)
    attrs["inv_gamma"] = ig
    return coords, attrs


def init_fields(sim, seed=9):
    rng = np.random.default_rng(seed)
    for name in ("ex", "ey", "ez"):
        f = np.zeros((sim.nx, sim.ny))
        for kx in range(1, 3):
            for ky in range(1, 3):
                f += rng.normal() * 1e11 * np.sin(
                    2 * np.pi * kx * np.arange(sim.nx)[:, None] / sim.nx
                ) * np.cos(2 * np.pi * ky * np.arange(sim.ny)[None, :] / sim.ny)
        sim.set_field(name, f)


@pytest.mark.parametrize("mesh", [(2, 2), (4, 2)])
def test_multi_device_matches_single(mesh):
    coords, attrs = global_particles()

    results = {}
    for npx, npy in [(1, 1), mesh]:
        sim = build_sim(npx, npy)
        init_fields(sim)
        sim.set_particles_global(0, coords, attrs)
        sim.run(nsteps=5)
        fields = {n: sim.get_field(n) for n in
                  ("ex", "ey", "ez", "bx", "by", "bz", "jx", "jy", "jz",
                   "rho")}
        parts = sim.get_particles(0)
        results[(npx, npy)] = (fields, parts)

    f1, p1 = results[(1, 1)]
    f2, p2 = results[mesh]
    for name in f1:
        scale = np.abs(f1[name]).max() + 1e-30
        np.testing.assert_allclose(f2[name], f1[name], atol=1e-9 * scale,
                                   err_msg=name)

    # particle sets equal up to ordering: compare sorted phase-space tuples
    def keyed(p):
        arr = np.stack([p["x"], p["y"], p["ux"], p["uy"], p["uz"], p["w"]])
        order = np.lexsort(arr[::-1])
        return arr[:, order]

    k1, k2 = keyed(p1), keyed(p2)
    assert k1.shape == k2.shape
    np.testing.assert_allclose(k2, k1, rtol=1e-9, atol=1e-12)


def test_migration_wraps_periodic():
    """Fast particles crossing shard and domain boundaries keep global
    trajectory continuity."""
    sim = build_sim(2, 2)
    n = 16
    coords = {"x": np.full(n, 15.6e-6), "y": np.full(n, 15.6e-6)}
    ux = np.full(n, 5.0)
    ig = 1 / np.sqrt(1 + 25.0)
    attrs = {"w": np.ones(n), "ux": ux, "uy": np.zeros(n),
             "uz": np.zeros(n), "inv_gamma": np.full(n, ig)}
    sim.set_particles_global(0, coords, attrs)
    x0 = sim.get_particles(0)["x"].copy()
    nsteps = 12
    sim.run(nsteps=nsteps)
    from lambdapic_tpu.constants import c
    # electron in zero fields: ballistic (gets Boris-pushed by zero fields)
    # domain convention: cell centers at 0..nx-1 -> x in [-dx/2, Lx-dx/2)
    expected = ((x0 + ux * ig * c * sim.dt * nsteps + sim.dx / 2)
                % sim.Lx) - sim.dx / 2
    got = np.sort(sim.get_particles(0)["x"])
    np.testing.assert_allclose(np.sort(expected), got, rtol=1e-9, atol=1e-12)
    assert sim.npart_alive[0] == n


def test_open_boundary_kills_leavers():
    """Particles exiting a non-periodic boundary are removed (reference
    sync_particles_2d.c:184-198)."""
    sim = build_sim(2, 2, periodic=False)
    n = 8
    coords = {"x": np.full(n, 31.2e-6), "y": np.full(n, 15.6e-6)}
    attrs = {"w": np.ones(n), "ux": np.full(n, 10.0), "uy": np.zeros(n),
             "uz": np.zeros(n),
             "inv_gamma": np.full(n, 1 / np.sqrt(101.0))}
    sim.set_particles_global(0, coords, attrs)
    sim.run(nsteps=30)
    assert sim.npart_alive[0] == 0
