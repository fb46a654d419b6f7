"""QED (photon emission + pair production) under the tiled particle engine:
creation goes through ops/tiled2d.py::insert_tiled (same-tile merge) instead
of insert_local. Mirrors tests/test_qed.py scenarios (reference
tests/test_radiation.py, test_pair_production.py)."""
import numpy as np
import pytest

from lambdapic_tpu import Electron, Photon, Positron, Simulation
from lambdapic_tpu.constants import c, e, hbar, m_e
from lambdapic_tpu.core.species import _ALL_SPECIES

um = 1e-6


@pytest.fixture(autouse=True)
def clear_species_registry():
    _ALL_SPECIES.clear()
    yield
    _ALL_SPECIES.clear()


def _tiled_sim(species, seed=3, tiling=(8, 8)):
    bc = {k: "periodic" for k in ("xmin", "xmax", "ymin", "ymax")}
    sim = Simulation(nx=32, ny=32, dx=1e-7, dy=1e-7, npatch_x=2, npatch_y=2,
                     boundary_conditions=bc, random_seed=seed,
                     precision="double", tiling=tiling)
    sim.add_species(species)
    return sim


@pytest.mark.parametrize("tiling", [(8, 8), "cell"])
def test_tiled_photon_emission(tiling):
    """Emission into tile-local (or cell-local) dead slots: photons appear,
    inherit the parent weight, sit inside the parent's tile (same
    position), and carry a momentum fraction of the parent's."""
    # capacity sized for the cell layout's per-cell mapping (capacity
    # spread over ncells): photons cluster where they were emitted, and
    # this test asserts exact parent weights — per-cell capacity pressure
    # would trigger weight-conserving merges (w=2) instead
    pho = Photon(capacity=32768)
    ele = Electron(radiation="photons")
    ele.set_photon(pho)
    sim = _tiled_sim([ele, pho], tiling=tiling)
    sim.initialize()

    n = 200
    gamma = 2000.0
    ux = np.sqrt(gamma**2 - 1)
    rng = np.random.default_rng(0)
    coords = {"x": rng.uniform(0.5e-6, 2.5e-6, n),
              "y": rng.uniform(0.5e-6, 2.5e-6, n)}
    attrs = {"w": np.ones(n), "ux": np.full(n, ux), "uy": np.zeros(n),
             "uz": np.zeros(n), "inv_gamma": np.full(n, 1 / gamma)}
    sim.set_particles_global(0, coords, attrs)
    chi_target = 1.0
    bz = chi_target / (e * hbar / (m_e**2 * c**3) * c * ux)
    sim.set_field("bz", np.full((32, 32), bz))

    sim.run(nsteps=10)

    eparts = sim.get_particles(0)
    phparts = sim.get_particles(1)
    assert len(eparts["w"]) == n          # electrons are not consumed
    n_ph = len(phparts["w"])
    assert n_ph > 0, "no photons emitted at chi~1 after 10 steps"
    np.testing.assert_allclose(phparts["w"], 1.0, rtol=1e-12)
    umag_ph = np.sqrt(phparts["ux"]**2 + phparts["uy"]**2
                      + phparts["uz"]**2)
    assert umag_ph.max() < ux
    assert umag_ph.min() > 0
    np.testing.assert_allclose(phparts["inv_gamma"], 1 / umag_ph, rtol=1e-9)
    # photons stay inside the periodic domain [-dx/2, L-dx/2) (they fly
    # ballistically ~0.67 cells/step, so they spread well beyond the birth
    # region after 10 steps)
    assert phparts["x"].min() >= -0.5e-7 and phparts["x"].max() < 3.15e-6
    assert phparts["y"].min() >= -0.5e-7 and phparts["y"].max() < 3.15e-6
    # recoil: electron ux dropped
    assert eparts["ux"].sum() < ux * n
    # unique ids among photons (per device hi/lo pair)
    ids = (phparts["id_hi"].astype(np.uint64) << np.uint64(32)) | \
        phparts["id_lo"].astype(np.uint64)
    assert len(np.unique(ids)) == n_ph


@pytest.mark.parametrize("tiling", [(8, 8), "cell"])
def test_tiled_pair_production(tiling):
    """Pair creation under tiling: photon removed, e-/e+ inserted in the
    photon's tile with momentum split delta/(1-delta)."""
    ele = Electron(capacity=2048)
    pos = Positron(capacity=2048)
    pho = Photon()
    pho.set_bw_pair(electron=ele, positron=pos)
    sim = _tiled_sim([pho, ele, pos], tiling=tiling)
    sim.initialize()

    n = 500
    upho = 5000.0
    rng = np.random.default_rng(2)
    coords = {"x": rng.uniform(0.4e-6, 2.8e-6, n),
              "y": rng.uniform(0.4e-6, 2.8e-6, n)}
    attrs = {"w": np.full(n, 2.0), "ux": np.full(n, upho),
             "uy": np.zeros(n), "uz": np.zeros(n),
             "inv_gamma": np.full(n, 1 / upho)}
    sim.set_particles_global(0, coords, attrs)
    chi_target = 2.0
    by = chi_target / (e * hbar / (m_e**2 * c**3) * c * upho)
    sim.set_field("by", np.full((32, 32), by))

    sim.run(nsteps=6)

    phparts = sim.get_particles(0)
    eparts = sim.get_particles(1)
    pparts = sim.get_particles(2)
    n_e, n_p = len(eparts["w"]), len(pparts["w"])
    assert n_e > 0, "no pairs created at chi~2 after 6 steps"
    assert n_e == n_p                       # pairs are born together
    assert len(phparts["w"]) == n - n_e     # converted photons removed
    np.testing.assert_allclose(eparts["w"], 2.0, rtol=1e-12)
    np.testing.assert_allclose(pparts["w"], 2.0, rtol=1e-12)
    # |u| conserved per pair in the By rotation: electron and positron ids
    # are assigned in the same rank order at creation, so sorting each
    # species by id aligns the pairs; each pair's |u_e| + |u_p| equals the
    # parent photon |u| (delta + (1-delta) split, rotation preserves |u|;
    # small self-consistent E fields allow a loose tolerance)
    def full_id(p):
        return (p["id_hi"].astype(np.uint64) << np.uint64(32)) | \
            p["id_lo"].astype(np.uint64)

    ue = np.sqrt(eparts["ux"]**2 + eparts["uy"]**2 + eparts["uz"]**2)
    up = np.sqrt(pparts["ux"]**2 + pparts["uy"]**2 + pparts["uz"]**2)
    ue = ue[np.argsort(full_id(eparts))]
    up = up[np.argsort(full_id(pparts))]
    np.testing.assert_allclose(ue + up, upho, rtol=1e-2)
