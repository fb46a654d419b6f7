"""Binary-collision tests (reference tests/test_collision.py:106-216):
finiteness, exact energy/momentum conservation for equal weights, and
temperature isotropization."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lambdapic_tpu.constants import c, e as qe, m_e
from lambdapic_tpu.core.grid import Grid
from lambdapic_tpu.core.species import _ALL_SPECIES
from lambdapic_tpu.io.utils import SetTemperature
from lambdapic_tpu.models.collision import (Collision, CollisionConfig,
                                            CollisionPairCfg)


@pytest.fixture(autouse=True)
def clear_species_registry():
    _ALL_SPECIES.clear()
    yield
    _ALL_SPECIES.clear()


def make_grid(nx=8, ny=8):
    return Grid(dimension=2, nx=nx, ny=ny, dx=1e-6, dy=1e-6,
                npatch_x=1, npatch_y=1, n_guard=3, cpml_thickness=6,
                boundary_conditions=(("xmin", "periodic"),
                                     ("xmax", "periodic"),
                                     ("ymin", "periodic"),
                                     ("ymax", "periodic")))


def make_particles(n, nx, ny, theta=0.1, aniso=(1.0, 1.0, 1.0), seed=0):
    rng = np.random.default_rng(seed)
    ux, uy, uz = SetTemperature.sample_maxwell_juttner(
        n, theta, np.random.default_rng(seed + 1))
    ux, uy, uz = ux * aniso[0], uy * aniso[1], uz * aniso[2]
    data = {
        "x": jnp.asarray(rng.uniform(-0.5, nx - 0.5, n)),
        "y": jnp.asarray(rng.uniform(-0.5, ny - 0.5, n)),
        "w": jnp.full(n, 1e10),
        "ux": jnp.asarray(ux), "uy": jnp.asarray(uy), "uz": jnp.asarray(uz),
        "inv_gamma": jnp.asarray(1 / np.sqrt(1 + ux**2 + uy**2 + uz**2)),
    }
    alive = jnp.ones(n, bool)
    return data, alive


def energy(data, alive, m):
    g = 1.0 / np.asarray(data["inv_gamma"])
    w = np.asarray(data["w"])
    return float((w * g * m)[np.asarray(alive)].sum())


def momentum(data, alive, m):
    sel = np.asarray(alive)
    w = np.asarray(data["w"])[sel]
    return np.array([float((w * np.asarray(data[k])[sel]).sum() * m)
                     for k in ("ux", "uy", "uz")])


def test_intra_collision_conserves_energy_momentum():
    grid = make_grid()
    cfg = CollisionConfig(pairs=(CollisionPairCfg(0, 0),),
                          species_mq=((m_e, -qe),),
                          cell_vol=1e-18, lnLambda=2.0)
    col = Collision(cfg, grid)
    data, alive = make_particles(6400, 8, 8)
    e0 = energy(data, alive, m_e)
    p0 = momentum(data, alive, m_e)
    out = col.apply_local({0: (data, alive)}, dt=1e-15,
                          key=jax.random.PRNGKey(0))[0]
    for k in ("ux", "uy", "uz", "inv_gamma"):
        assert np.isfinite(np.asarray(out[k])).all()
    ig = np.asarray(out["inv_gamma"])
    assert (ig > 0).all() and (ig <= 1.0).all()
    e1 = energy(out, alive, m_e)
    p1 = momentum(out, alive, m_e)
    # equal weights: every pair updates both partners -> exact conservation
    np.testing.assert_allclose(e1, e0, rtol=1e-12)
    scale = np.abs(np.asarray(momentum(data, alive, m_e))).max() + \
        float(np.abs(np.asarray(data["ux"])).mean() * 1e10 * m_e)
    np.testing.assert_allclose(p1, p0, atol=1e-9 * scale)
    # something actually happened
    assert not np.allclose(np.asarray(out["ux"]), np.asarray(data["ux"]))


def test_inter_collision_conserves_energy():
    grid = make_grid()
    cfg = CollisionConfig(pairs=(CollisionPairCfg(0, 1),),
                          species_mq=((m_e, -qe), (m_e, -qe)),
                          cell_vol=1e-18, lnLambda=2.0)
    col = Collision(cfg, grid)
    d1, a1 = make_particles(3200, 8, 8, seed=10)
    d2, a2 = make_particles(3200, 8, 8, seed=20)
    e0 = energy(d1, a1, m_e) + energy(d2, a2, m_e)
    out = col.apply_local({0: (d1, a1), 1: (d2, a2)}, dt=1e-15,
                          key=jax.random.PRNGKey(1))
    e1 = energy(out[0], a1, m_e) + energy(out[1], a2, m_e)
    np.testing.assert_allclose(e1, e0, rtol=1e-12)
    for out_d in out.values():
        for k in ("ux", "uy", "uz", "inv_gamma"):
            assert np.isfinite(np.asarray(out_d[k])).all()


def test_intra_collision_isotropizes():
    """Anisotropic distribution relaxes toward isotropy
    (reference test_collision.py isotropization)."""
    grid = make_grid(4, 4)
    cfg = CollisionConfig(pairs=(CollisionPairCfg(0, 0),),
                          species_mq=((m_e, -qe),),
                          cell_vol=1e-18, lnLambda=5.0)
    col = Collision(cfg, grid)
    data, alive = make_particles(8000, 4, 4, theta=0.02,
                                 aniso=(2.0, 0.5, 0.5))
    def ratio(d):
        ux = np.asarray(d["ux"])
        uy = np.asarray(d["uy"])
        return (ux**2).mean() / (uy**2).mean()

    r0 = ratio(data)
    assert r0 > 8
    key = jax.random.PRNGKey(2)
    apply = jax.jit(lambda d, a, k: col.apply_local({0: (d, a)}, 2e-15, k)[0])
    for i in range(40):
        data = apply(data, alive, jax.random.fold_in(key, i))
    r1 = ratio(data)
    assert r1 < 0.7 * r0, (r0, r1)


def test_varying_coulomb_log():
    """lnLambda=0 path (Debye-length based) runs and conserves energy."""
    grid = make_grid()
    cfg = CollisionConfig(pairs=(CollisionPairCfg(0, 0),),
                          species_mq=((m_e, -qe),),
                          cell_vol=1e-18, lnLambda=0.0)
    col = Collision(cfg, grid)
    data, alive = make_particles(3200, 8, 8)
    e0 = energy(data, alive, m_e)
    out = col.apply_local({0: (data, alive)}, dt=1e-15,
                          key=jax.random.PRNGKey(3))[0]
    e1 = energy(out, alive, m_e)
    np.testing.assert_allclose(e1, e0, rtol=1e-12)
    assert np.isfinite(np.asarray(out["ux"])).all()


def test_collision_in_simulation():
    """End-to-end: sim.add_collision runs inside the step without NaNs."""
    from lambdapic_tpu import Electron, Proton, Simulation
    nc = 1.742e27
    e1 = Electron(density=lambda x, y: 10 * nc, ppc=8)
    pro = Proton(density=lambda x, y: 10 * nc, ppc=8)
    bc = {k: "periodic" for k in ("xmin", "xmax", "ymin", "ymax")}
    sim = Simulation(nx=16, ny=16, dx=1e-7, dy=1e-7, npatch_x=2, npatch_y=2,
                     boundary_conditions=bc, random_seed=0,
                     precision="double")
    sim.add_species([e1, pro])
    sim.add_collision([[e1, e1, pro]], lnLambda=2.0)
    sim.run(nsteps=2, callbacks=[SetTemperature(e1, 1000.0)])
    for k in ("ux", "uy"):
        assert np.isfinite(sim.get_particles(0)[k]).all()
        assert np.isfinite(sim.get_particles(1)[k]).all()


import pytest


@pytest.mark.parametrize("tiling", [(8, 8), "cell"])
def test_collision_in_tiled_simulation(tiling):
    """Collisions under the tiled/cell engines: the flat per-device pairing
    runs on the flattened view (momenta-only updates keep the binning
    valid). Conserves energy and changes momenta."""
    from lambdapic_tpu import Electron, Proton, Simulation

    def run(with_collisions):
        _ALL_SPECIES.clear()
        nc = 1.742e27
        e1 = Electron(density=lambda x, y: 10 * nc, ppc=8)
        pro = Proton(density=lambda x, y: 10 * nc, ppc=8)
        bc = {k: "periodic" for k in ("xmin", "xmax", "ymin", "ymax")}
        sim = Simulation(nx=16, ny=16, dx=1e-7, dy=1e-7,
                         npatch_x=2, npatch_y=2, boundary_conditions=bc,
                         random_seed=0, precision="double", tiling=tiling)
        sim.add_species([e1, pro])
        if with_collisions:
            sim.add_collision([[e1, e1, pro]], lnLambda=2.0)
        sim.run(nsteps=2, callbacks=[SetTemperature(e1, 1000.0)])
        return sim

    sim = run(True)
    p0, p1 = sim.get_particles(0), sim.get_particles(1)
    assert np.isfinite(p0["ux"]).all() and np.isfinite(p1["ux"]).all()
    sim_nc = run(False)
    # with a hot electron population the collisional run must diverge from
    # the collisionless one (momenta exchanged within cells)
    assert not np.allclose(np.sort(p0["ux"]),
                           np.sort(sim_nc.get_particles(0)["ux"]))


def _cell_particles(n, cell_xy=(0, 0), seed=0, w=1e10):
    """n particles all inside one cell, relativistic thermal momenta."""
    rng = np.random.default_rng(seed)
    ux, uy, uz = (rng.normal(size=n) * 2, rng.normal(size=n) * 2,
                  rng.normal(size=n) * 2)
    data = {
        "x": jnp.asarray(cell_xy[0] + rng.uniform(-0.4, 0.4, n)),
        "y": jnp.asarray(cell_xy[1] + rng.uniform(-0.4, 0.4, n)),
        "w": jnp.full(n, w),
        "ux": jnp.asarray(ux), "uy": jnp.asarray(uy), "uz": jnp.asarray(uz),
        "inv_gamma": jnp.asarray(1 / np.sqrt(1 + ux**2 + uy**2 + uz**2)),
    }
    return data, jnp.ones(n, bool)


def test_intra_odd_cell_repairing():
    """Odd cells re-pair the last particle with the first (reference
    cpu.py:49-58): with 3 particles in a cell ALL THREE scatter."""
    grid = make_grid(2, 2)
    cfg = CollisionConfig(pairs=(CollisionPairCfg(0, 0),),
                          species_mq=((m_e, -qe),),
                          cell_vol=1e-18, lnLambda=20.0)
    col = Collision(cfg, grid)
    data, alive = _cell_particles(3)
    e0 = energy(data, alive, m_e)
    out = col.apply_local({0: (data, alive)}, dt=1e-13,
                          key=jax.random.PRNGKey(3))[0]
    changed = ~np.isclose(np.asarray(out["ux"]), np.asarray(data["ux"]))
    assert changed.all(), f"only {changed.sum()}/3 collided in an odd cell"
    np.testing.assert_allclose(energy(out, alive, m_e), e0, rtol=1e-12)


def test_inter_asymmetric_counts_all_big_side_collide():
    """max(n1,n2) pairing (reference cpu.py:71-134): with 9 vs 3 particles
    in a cell, all 9 big-side particles collide (3 sequential rounds) and
    equal-weight energy conservation is exact."""
    grid = make_grid(2, 2)
    cfg = CollisionConfig(pairs=(CollisionPairCfg(0, 1),),
                          species_mq=((m_e, -qe), (m_e, -qe)),
                          cell_vol=1e-18, lnLambda=20.0)
    col = Collision(cfg, grid)
    d1, a1 = _cell_particles(9, seed=1)
    d2, a2 = _cell_particles(3, seed=2)
    e0 = energy(d1, a1, m_e) + energy(d2, a2, m_e)
    out = col.apply_local({0: (d1, a1), 1: (d2, a2)}, dt=1e-13,
                          key=jax.random.PRNGKey(4))
    ch1 = ~np.isclose(np.asarray(out[0]["ux"]), np.asarray(d1["ux"]))
    ch2 = ~np.isclose(np.asarray(out[1]["ux"]), np.asarray(d2["ux"]))
    assert ch1.all(), f"only {ch1.sum()}/9 big-side particles collided"
    assert ch2.all(), f"only {ch2.sum()}/3 small-side particles collided"
    e1 = energy(out[0], a1, m_e) + energy(out[1], a2, m_e)
    np.testing.assert_allclose(e1, e0, rtol=1e-12)


def test_inter_mixed_orientation_cells():
    """One call handles cells where n1 > n2 and cells where n2 > n1
    (the two masked sub-passes are disjoint)."""
    grid = make_grid(2, 2)
    cfg = CollisionConfig(pairs=(CollisionPairCfg(0, 1),),
                          species_mq=((m_e, -qe), (m_e, -qe)),
                          cell_vol=1e-18, lnLambda=20.0)
    col = Collision(cfg, grid)
    dA1, _ = _cell_particles(6, cell_xy=(0, 0), seed=3)
    dB1, _ = _cell_particles(2, cell_xy=(1, 1), seed=4)
    dA2, _ = _cell_particles(2, cell_xy=(0, 0), seed=5)
    dB2, _ = _cell_particles(6, cell_xy=(1, 1), seed=6)
    d1 = {k: jnp.concatenate([dA1[k], dB1[k]]) for k in dA1}
    d2 = {k: jnp.concatenate([dA2[k], dB2[k]]) for k in dA2}
    a1 = jnp.ones(8, bool)
    a2 = jnp.ones(8, bool)
    e0 = energy(d1, a1, m_e) + energy(d2, a2, m_e)
    out = col.apply_local({0: (d1, a1), 1: (d2, a2)}, dt=1e-13,
                          key=jax.random.PRNGKey(5))
    ch1 = ~np.isclose(np.asarray(out[0]["ux"]), np.asarray(d1["ux"]))
    ch2 = ~np.isclose(np.asarray(out[1]["ux"]), np.asarray(d2["ux"]))
    assert ch1.all() and ch2.all()
    e1 = energy(out[0], a1, m_e) + energy(out[1], a2, m_e)
    np.testing.assert_allclose(e1, e0, rtol=1e-12)


# ----------------------------------------------------------------------
# cell-layout pairing (Collision.apply_cell): same reference semantics
# (collision/cpu.py:22-134) on (cap_c, nx, ny) cell-binned arrays
# ----------------------------------------------------------------------

def _bin_cells(data, alive, nx, ny, cap):
    """Bin flat test particles into (cap, nx, ny) arrays by cell index
    (= round(x), round(y)); fails the test if a cell overflows cap."""
    n = int(np.asarray(alive).shape[0])
    out = {k: np.zeros((cap, nx, ny)) for k in data}
    out["inv_gamma"] = np.ones((cap, nx, ny))
    a = np.zeros((cap, nx, ny), bool)
    fill = np.zeros((nx, ny), int)
    x = np.asarray(data["x"])
    y = np.asarray(data["y"])
    for i in range(n):
        if not np.asarray(alive)[i]:
            continue
        ix, iy = int(round(x[i])), int(round(y[i]))
        s = fill[ix, iy]
        assert s < cap, "test cell overflow; raise cap"
        for k in data:
            out[k][s, ix, iy] = np.asarray(data[k])[i]
        a[s, ix, iy] = True
        fill[ix, iy] += 1
    return ({k: jnp.asarray(v) for k, v in out.items()}, jnp.asarray(a))


def _cell_energy(d, a, m):
    g = 1.0 / np.asarray(d["inv_gamma"])
    w = np.asarray(d["w"])
    return float((w * g * m)[np.asarray(a)].sum())


def test_cell_intra_conserves_energy_momentum():
    grid = make_grid()
    cfg = CollisionConfig(pairs=(CollisionPairCfg(0, 0),),
                          species_mq=((m_e, -qe),),
                          cell_vol=1e-18, lnLambda=2.0)
    col = Collision(cfg, grid)
    flat, aflat = make_particles(1600, 8, 8)
    data, alive = _bin_cells(flat, aflat, 8, 8, cap=64)
    e0 = _cell_energy(data, alive, m_e)
    p0 = [float((np.asarray(data["w"]) * np.asarray(data[k])
                 )[np.asarray(alive)].sum()) for k in ("ux", "uy", "uz")]
    out = col.apply_cell({0: (data, alive)}, dt=1e-15,
                         key=jax.random.PRNGKey(0))[0]
    for k in ("ux", "uy", "uz", "inv_gamma"):
        assert np.isfinite(np.asarray(out[k])).all()
    e1 = _cell_energy(out, alive, m_e)
    np.testing.assert_allclose(e1, e0, rtol=1e-12)
    p1 = [float((np.asarray(out["w"]) * np.asarray(out[k])
                 )[np.asarray(alive)].sum()) for k in ("ux", "uy", "uz")]
    scale = np.abs(np.asarray(flat["ux"])).mean() * 1e10
    np.testing.assert_allclose(p1, p0, atol=1e-9 * scale)
    assert not np.allclose(np.asarray(out["ux"]), np.asarray(data["ux"]))


def test_cell_pairing_parity_with_flat_path():
    """Pairing-structure parity vs apply_local: the set of particles
    that collide is fully determined by the per-cell counts (intra: all
    alive in cells with n >= 2; inter: every particle of both sides in
    cells where both are populated), so the per-cell changed-momentum
    counts must match the flat path exactly, and both conserve energy."""
    grid = make_grid(4, 4)
    cfg = CollisionConfig(pairs=(CollisionPairCfg(0, 0),
                                 CollisionPairCfg(0, 1)),
                          species_mq=((m_e, -qe), (1836 * m_e, qe)),
                          cell_vol=1e-18, lnLambda=20.0)
    col = Collision(cfg, grid)
    rng = np.random.default_rng(42)
    # ragged per-cell counts incl. empty, single, odd and even cells
    flat1, a1 = make_particles(57, 4, 4, seed=3)
    flat2, a2 = make_particles(23, 4, 4, seed=4)
    out_flat = col.apply_local({0: (dict(flat1), a1), 1: (dict(flat2), a2)},
                               dt=1e-13, key=jax.random.PRNGKey(7))
    cell1, ca1 = _bin_cells(flat1, a1, 4, 4, cap=32)
    cell2, ca2 = _bin_cells(flat2, a2, 4, 4, cap=32)
    out_cell = col.apply_cell({0: (cell1, ca1), 1: (cell2, ca2)},
                              dt=1e-13, key=jax.random.PRNGKey(7))

    def changed_per_cell_flat(out, ref, alive, nx=4, ny=4):
        # exact != : a collided particle's ux changes bitwise (cosX != 1
        # for any u_s > 0); isclose would misclassify small-angle events
        ch = ((np.asarray(out["ux"]) != np.asarray(ref["ux"]))
              & np.asarray(alive))
        cnt = np.zeros((nx, ny), int)
        for i in np.nonzero(ch)[0]:
            cnt[int(round(float(np.asarray(ref["x"])[i]))),
                int(round(float(np.asarray(ref["y"])[i])))] += 1
        return cnt

    def changed_per_cell_cell(out, ref, alive):
        ch = ((np.asarray(out["ux"]) != np.asarray(ref["ux"]))
              & np.asarray(alive))
        return ch.sum(axis=0)

    for ispec, (flat, af, celld, ac) in (
            (0, (flat1, a1, cell1, ca1)), (1, (flat2, a2, cell2, ca2))):
        cf = changed_per_cell_flat(out_flat[ispec], flat, af)
        cc = changed_per_cell_cell(out_cell[ispec], celld, ac)
        np.testing.assert_array_equal(cf, cc)

    e_flat = energy(out_flat[0], a1, m_e) + energy(out_flat[1], a2,
                                                   1836 * m_e)
    e_cell = (_cell_energy(out_cell[0], ca1, m_e)
              + _cell_energy(out_cell[1], ca2, 1836 * m_e))
    e0 = energy(flat1, a1, m_e) + energy(flat2, a2, 1836 * m_e)
    np.testing.assert_allclose(e_flat, e0, rtol=1e-12)
    np.testing.assert_allclose(e_cell, e0, rtol=1e-12)


def test_cell_intra_odd_repairing():
    """3 particles in one cell: all three scatter (last re-pairs first)."""
    grid = make_grid(2, 2)
    cfg = CollisionConfig(pairs=(CollisionPairCfg(0, 0),),
                          species_mq=((m_e, -qe),),
                          cell_vol=1e-18, lnLambda=20.0)
    col = Collision(cfg, grid)
    flat, af = _cell_particles(3)
    data, alive = _bin_cells(flat, af, 2, 2, cap=4)
    e0 = _cell_energy(data, alive, m_e)
    out = col.apply_cell({0: (data, alive)}, dt=1e-13,
                         key=jax.random.PRNGKey(3))[0]
    ch = (~np.isclose(np.asarray(out["ux"]), np.asarray(data["ux"]))
          & np.asarray(alive))
    assert ch.sum() == 3, f"only {ch.sum()}/3 collided in an odd cell"
    np.testing.assert_allclose(_cell_energy(out, alive, m_e), e0,
                               rtol=1e-12)
    # dead slots untouched
    dead = ~np.asarray(alive)
    np.testing.assert_array_equal(np.asarray(out["ux"])[dead],
                                  np.asarray(data["ux"])[dead])


def test_cell_inter_asymmetric_all_collide():
    """9 vs 3 in one cell: all 9 big-side and all 3 small-side collide
    (3 sequential rounds), energy conserved exactly at equal weights."""
    grid = make_grid(2, 2)
    cfg = CollisionConfig(pairs=(CollisionPairCfg(0, 1),),
                          species_mq=((m_e, -qe), (m_e, -qe)),
                          cell_vol=1e-18, lnLambda=20.0)
    col = Collision(cfg, grid)
    f1, a1 = _cell_particles(9, seed=1)
    f2, a2 = _cell_particles(3, seed=2)
    d1, c1 = _bin_cells(f1, a1, 2, 2, cap=16)
    d2, c2 = _bin_cells(f2, a2, 2, 2, cap=16)
    e0 = _cell_energy(d1, c1, m_e) + _cell_energy(d2, c2, m_e)
    out = col.apply_cell({0: (d1, c1), 1: (d2, c2)}, dt=1e-13,
                         key=jax.random.PRNGKey(4))
    ch1 = (~np.isclose(np.asarray(out[0]["ux"]), np.asarray(d1["ux"]))
           & np.asarray(c1))
    ch2 = (~np.isclose(np.asarray(out[1]["ux"]), np.asarray(d2["ux"]))
           & np.asarray(c2))
    assert ch1.sum() == 9, f"only {ch1.sum()}/9 big-side collided"
    assert ch2.sum() == 3, f"only {ch2.sum()}/3 small-side collided"
    e1 = _cell_energy(out[0], c1, m_e) + _cell_energy(out[1], c2, m_e)
    np.testing.assert_allclose(e1, e0, rtol=1e-12)
