"""QED tests (reference tests/test_radiation.py:93-142,
test_pair_production.py:96-145 analogs): chi correctness, photon emission
with momentum conservation, Breit-Wheeler pair creation."""
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


def test_chi_formula():
    from lambdapic_tpu.models.qed import calculate_chi
    import jax.numpy as jnp
    ux = jnp.asarray([1000.0])
    z = jnp.zeros(1)
    bz = jnp.asarray([1e5])
    ig = 1.0 / jnp.sqrt(1 + ux**2)
    chi = calculate_chi(z, z, z, z, z, bz, ux, z[0:1] * 0, z[0:1] * 0, ig)
    expected = e * hbar / (m_e**2 * c**3) * c * 1000.0 * 1e5
    np.testing.assert_allclose(float(chi[0]), expected, rtol=1e-6)


def _periodic_sim(species, seed=3):
    bc = {k: "periodic" for k in ("xmin", "xmax", "ymin", "ymax")}
    sim = Simulation(nx=32, ny=32, dx=1e-7, dy=1e-7, npatch_x=2, npatch_y=2,
                     boundary_conditions=bc, random_seed=seed,
                     precision="double")
    sim.add_species(species)
    return sim


def test_photon_emission_and_recoil():
    """Electrons in a strong uniform Bz emit photons; momentum is conserved
    (photon takes delta*u, electron keeps (1-delta)*u) and photon weights
    equal parent weights."""
    pho = Photon(capacity=4096)
    ele = Electron(radiation="photons")
    ele.set_photon(pho)
    sim = _periodic_sim([ele, pho])
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

    # chi = (e hbar / m^2 c^3) * c * ux * Bz  ~ 1.0
    chi_target = 1.0
    bz = chi_target / (e * hbar / (m_e**2 * c**3) * c * ux)
    sim.set_field("bz", np.full((32, 32), bz))

    ux_total_before = ux * n
    sim.run(nsteps=10)

    eparts = sim.get_particles(0)
    phparts = sim.get_particles(1)
    n_ph = len(phparts["w"])
    assert n_ph > 0, "no photons emitted at chi~1 after 10 steps"
    # weights inherited
    np.testing.assert_allclose(phparts["w"], 1.0, rtol=1e-12)
    # photons carry a fraction of the parent momentum (heavily-recoiled
    # low-gamma electrons gyrate fast in this B, so late photons may point
    # backwards: check magnitudes, not direction)
    umag_ph = np.sqrt(phparts["ux"]**2 + phparts["uy"]**2 + phparts["uz"]**2)
    assert umag_ph.max() < ux
    assert umag_ph.min() > 0
    # photon inv_gamma = 1/|u|
    np.testing.assert_allclose(phparts["inv_gamma"], 1 / umag_ph, rtol=1e-9)
    # x-momentum approximately conserved (Bz rotation moves some ux into uy;
    # compare the total |u| budget instead of a single component)
    total_after = eparts["ux"].sum() + phparts["ux"].sum()
    # electrons recoiled: their summed ux is below the initial
    assert eparts["ux"].sum() < ux_total_before
    # emission does not create momentum (rotation conserves |u|; recoil
    # moves it to photons). Allow the Bz rotation angle effect.
    assert total_after <= ux_total_before * 1.01


def test_emission_rate_matches_table():
    """Photon count after N steps matches the optical-depth statistics:
    per-step event probability p = 1 - exp(-W dt / gamma), at most one
    event per particle per step (reference optical_depth.py:36-82)."""
    pho = Photon(capacity=2048)
    ele = Electron(radiation="photons")
    ele.set_photon(pho)
    sim = _periodic_sim([ele, pho])
    sim.initialize()

    n = 2000
    gamma = 20000.0
    ux = np.sqrt(gamma**2 - 1)
    rng = np.random.default_rng(1)
    coords = {"x": rng.uniform(0.3e-6, 2.9e-6, n),
              "y": rng.uniform(0.3e-6, 2.9e-6, n)}
    attrs = {"w": np.ones(n), "ux": np.full(n, ux),
             "uy": np.zeros(n), "uz": np.zeros(n),
             "inv_gamma": np.full(n, 1 / gamma)}
    sim.set_particles_global(0, coords, attrs)
    chi_target = 0.5
    bz = chi_target / (e * hbar / (m_e**2 * c**3) * c * ux)
    sim.set_field("bz", np.full((32, 32), bz))

    nsteps = 5
    sim.run(nsteps=nsteps)

    from lambdapic_tpu.models.qed_tables import load_tables
    t = load_tables()
    log_chi = np.log10(chi_target)
    grid = np.linspace(*t["log_chi_range"], int(t["chi_N"]))
    W = np.interp(log_chi, grid, t["photon_prob_rate_total"])
    p_step = 1 - np.exp(-W * sim.dt / gamma)
    # first-event expectation; recoil secondaries add a few percent
    expected = n * (1 - (1 - p_step) ** nsteps)
    n_ph = sim.npart_alive[1]
    assert expected > 50
    assert expected * 0.85 - 4 * np.sqrt(expected) < n_ph < \
        expected * 1.3 + 4 * np.sqrt(expected)


def test_pair_production():
    """High-chi photons convert to e-/e+ pairs; photon is removed, momentum
    split delta/(1-delta). B is along y so pairs rotate in the x-z plane:
    |u| per particle is conserved, and |u_e|+|u_p| equals the parent photon
    momentum (elementwise: pairs are created into matching dead slots)."""
    ele = Electron(capacity=512)
    pos = Positron(capacity=512)
    pho = Photon()
    pho.set_bw_pair(electron=ele, positron=pos)
    sim = _periodic_sim([pho, ele, pos])
    sim.initialize()

    n = 500
    upho = 5000.0
    rng = np.random.default_rng(2)
    # keep particles away from shard boundaries: migration would reorder
    # slots and break the elementwise e-/e+ pairing check below
    coords = {"x": rng.uniform(0.4e-6, 1.1e-6, n),
              "y": rng.uniform(0.4e-6, 1.1e-6, n)}
    attrs = {"w": np.full(n, 2.0), "ux": np.full(n, upho),
             "uy": np.zeros(n), "uz": np.zeros(n),
             "inv_gamma": np.full(n, 1 / upho)}
    sim.set_particles_global(0, coords, attrs)
    chi_target = 2.0
    by = chi_target / (e * hbar / (m_e**2 * c**3) * c * upho)
    sim.set_field("by", np.full((32, 32), by))

    sim.run(nsteps=3)
    n_pho, n_ele, n_pos = sim.npart_alive
    assert n_ele > 0, "no pairs produced at chi~2"
    assert n_ele == n_pos
    assert n_pho == n - n_ele
    eparts = sim.get_particles(1)
    pparts = sim.get_particles(2)
    np.testing.assert_allclose(eparts["w"], 2.0, rtol=1e-12)
    # |u| is invariant under the magnetic rotation: the pair's momentum
    # magnitudes sum to the parent photon momentum (gamma >> 1)
    ue = np.sqrt(eparts["ux"]**2 + eparts["uy"]**2 + eparts["uz"]**2)
    up = np.sqrt(pparts["ux"]**2 + pparts["uy"]**2 + pparts["uz"]**2)
    np.testing.assert_allclose(ue + up, upho, rtol=1e-3)


def test_qed_multi_device_statistical_parity():
    """QED on a 1x1 vs 2x2 mesh: RNG streams are per-device, so results
    are not bitwise equal, but the emission statistics (photon count,
    emitted energy fraction) must agree (VERDICT r1 weak #8; reference
    relies on MPI-invariant physics)."""
    import jax

    stats = {}
    for mesh in [(1, 1), (2, 2)]:
        _ALL_SPECIES.clear()
        pho = Photon(capacity=16384)
        ele = Electron(radiation="photons")
        ele.set_photon(pho)
        bc = {k: "periodic" for k in ("xmin", "xmax", "ymin", "ymax")}
        sim = Simulation(nx=32, ny=32, dx=1e-7, dy=1e-7,
                         npatch_x=mesh[0], npatch_y=mesh[1],
                         boundary_conditions=bc, random_seed=3,
                         precision="double")
        sim.add_species([ele, pho])
        sim.initialize()

        n = 4000
        gamma = 2000.0
        ux = np.sqrt(gamma**2 - 1)
        rng = np.random.default_rng(0)
        coords = {"x": rng.uniform(0.3e-6, 2.9e-6, n),
                  "y": rng.uniform(0.3e-6, 2.9e-6, n)}
        attrs = {"w": np.ones(n), "ux": np.full(n, ux),
                 "uy": np.zeros(n), "uz": np.zeros(n),
                 "inv_gamma": np.full(n, 1 / gamma)}
        sim.set_particles_global(0, coords, attrs)
        bz = 1.0 / (e * hbar / (m_e**2 * c**3) * c * ux)
        sim.set_field("bz", np.full((32, 32), bz))
        sim.run(nsteps=6)
        ph = sim.get_particles(1)
        el = sim.get_particles(0)
        umag = np.sqrt(ph["ux"]**2 + ph["uy"]**2 + ph["uz"]**2)
        stats[mesh] = (len(ph["w"]), umag.sum(), el["ux"].sum())

    n1, e1, r1 = stats[(1, 1)]
    n4, e4, r4 = stats[(2, 2)]
    assert n1 > 500 and n4 > 500
    # Poisson-ish: expect agreement within ~5 sigma of sqrt(N)
    assert abs(n1 - n4) < 5 * np.sqrt(max(n1, n4)), (n1, n4)
    assert abs(e1 - e4) / e1 < 0.15
    assert abs(r1 - r4) / abs(r1) < 0.05
