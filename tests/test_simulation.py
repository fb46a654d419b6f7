"""Simulation driver integration tests (reference test_laser_target.py
smoke, test_callback.py stages/intervals, test_random_seed.py)."""
import numpy as np
import pytest

from lambdapic_tpu import (Callback, Electron, Proton, Simulation,
                           SimpleLaser2D, callback)
from lambdapic_tpu.core.species import _ALL_SPECIES

um = 1e-6
l0 = 0.8 * um
nc = 1.742e27


@pytest.fixture(autouse=True)
def clear_species_registry():
    _ALL_SPECIES.clear()
    yield
    _ALL_SPECIES.clear()


def make_laser_target(npx=2, npy=2, seed=0, precision="double"):
    def density(x, y):
        return np.where(x > 2 * um, 5 * nc, 0.0)

    ele = Electron(density=density, ppc=4)
    pro = Proton(density=density, ppc=4)
    sim = Simulation(nx=64, ny=64, dx=l0 / 10, dy=l0 / 10,
                     npatch_x=npx, npatch_y=npy, random_seed=seed,
                     precision=precision)
    sim.add_species([ele, pro])
    return sim


@pytest.mark.integration
def test_laser_target_smoke():
    """10-step laser-target run stays finite and conserves particle number
    (reference test_laser_target.py:71-75)."""
    sim = make_laser_target()
    laser = SimpleLaser2D(a0=10, w0=2 * um, ctau=5 * um)
    sim.run(nsteps=10, callbacks=[laser])
    for name in ("ex", "ey", "ez", "bx", "by", "bz", "jx", "jy", "jz", "rho"):
        assert np.isfinite(sim.get_field(name)).all(), name
    n0 = sim.npart_alive
    assert all(n > 0 for n in n0)
    assert np.abs(sim.get_field("ey")).max() > 0


def test_reproducibility_with_seed():
    """Same random_seed => identical results (reference
    test_random_seed.py:10-107)."""
    outs = []
    for _ in range(2):
        sim = make_laser_target(seed=42)
        sim.run(nsteps=5)
        outs.append((sim.get_field("jx"), sim.get_particles(0)["x"]))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])


def test_different_seed_diverges():
    sims = []
    for seed in (1, 2):
        sim = make_laser_target(seed=seed)
        sim.run(nsteps=2)
        sims.append(sim.get_particles(0)["x"])
    assert not np.array_equal(sims[0], sims[1])


def test_callback_stages_and_intervals():
    """Stage bucketing + int/float/callable intervals (reference
    test_callback.py)."""
    sim = make_laser_target()
    calls = {"start": 0, "end": 0, "maxwell_1": 0, "every3": 0,
             "timed": 0, "cond": 0}

    @callback(stage="start")
    def on_start(s):
        calls["start"] += 1

    @callback(stage="maxwell_1")
    def on_m1(s):
        calls["maxwell_1"] += 1

    @callback(stage="end", interval=3)
    def every3(s):
        calls["every3"] += 1

    def plain(s):
        calls["end"] += 1

    @callback(stage="end", interval=lambda s: s.itime == 4)
    def cond(s):
        calls["cond"] += 1

    sim.run(nsteps=6, callbacks=[on_start, on_m1, every3, plain, cond])
    assert calls["start"] == 6
    assert calls["maxwell_1"] == 6
    assert calls["end"] == 6
    assert calls["every3"] == 2       # itime 0 and 3
    assert calls["cond"] == 1


def test_inner_stage_host_callback_takes_split_path():
    """Inner-stage host callbacks run via the split particle path
    (tests/test_inner_stage_callbacks.py covers path parity)."""
    sim = make_laser_target()
    calls = []

    @callback(stage="_interpolator")
    def probe(s):
        calls.append(s.itime)

    sim.run(nsteps=2, callbacks=[probe])
    assert calls == [0, 1]


def test_charge_conservation_full_sim():
    """Gauss-law-style check over a full multi-species run: deposited rho
    equals the charge of the particles (reference
    test_current_deposition.py multi-species analogs). Periodic boundaries:
    open boundaries legitimately drop guard-rim charge of edge-cell
    particles (reference behaves identically — edge patches have no
    neighbor to receive guard deposits)."""

    def density(x, y):
        return np.where(x > 2 * um, 5 * nc, 0.0)

    ele = Electron(density=density, ppc=4)
    pro = Proton(density=density, ppc=4)
    sim = Simulation(nx=64, ny=64, dx=l0 / 10, dy=l0 / 10,
                     npatch_x=2, npatch_y=2, random_seed=0,
                     precision="double",
                     boundary_conditions={k: "periodic" for k in
                                          ("xmin", "xmax", "ymin", "ymax")})
    sim.add_species([ele, pro])
    sim.run(nsteps=5)
    rho_tot = sim.get_field("rho").sum() * sim.dx * sim.dy
    q_parts = 0.0
    q_abs = 0.0
    for ispec, sp in enumerate(sim.species):
        w = sim.get_particles(ispec)["w"]
        q_parts += sp.q * w.sum()
        q_abs += abs(sp.q) * w.sum()
    # net charge is ~0 (quasineutral target): compare against the absolute
    # charge scale
    assert abs(rho_tot - q_parts) < 1e-9 * q_abs


def test_step_chunking_matches_stepwise():
    """step_chunk>1 (lax.scan fused steps) must reproduce per-step
    dispatch exactly, including laser scalars and interval callbacks."""
    results = []
    for chunk in (1, 4):
        sim = make_laser_target(seed=5)
        sim.step_chunk = chunk
        laser = SimpleLaser2D(a0=5, w0=2 * um, ctau=5 * um)
        hits = []

        @callback(stage="end", interval=6)
        def probe(s):
            hits.append(s.itime)

        sim.run(nsteps=9, callbacks=[laser, probe])
        results.append((sim.get_field("ey"), sim.get_particles(0)["x"],
                        tuple(hits)))
    np.testing.assert_allclose(results[1][0], results[0][0], rtol=1e-12,
                               atol=np.abs(results[0][0]).max() * 1e-12)
    np.testing.assert_allclose(np.sort(results[1][1]),
                               np.sort(results[0][1]), rtol=1e-12)
    assert results[0][2] == results[1][2]


def test_step_chunk_auto_resolution():
    """Default 'auto' resolves per backend (off on CPU, where the tests
    run); bad values raise rather than silently disabling chunking."""
    import jax
    sim = make_laser_target()
    assert sim.step_chunk == "auto"
    expect = 1 if jax.default_backend() == "cpu" else sim.CHUNK_SIZES[0]
    assert sim._chunk_limit() == expect
    sim.step_chunk = 4
    assert sim._chunk_limit() == 4
    for bad in ("fast", 0, -2, 2.5, True):
        sim.step_chunk = bad
        with pytest.raises(ValueError):
            sim._chunk_limit()


def test_single_precision_runs():
    sim = make_laser_target(precision="single")
    laser = SimpleLaser2D(a0=5, w0=2 * um, ctau=5 * um)
    sim.run(nsteps=3, callbacks=[laser])
    assert np.isfinite(sim.get_field("ey")).all()
    assert sim.get_field("ey").dtype == np.float32


def test_load_imbalance_metric():
    """Static-sharding divergence: imbalance is surfaced as a metric
    (reference LoadBalancer trigger, core/mpi/load_balancer.py:32-52)."""
    sim = make_laser_target()          # plasma only at x > 2um: devices
    sim.initialize()                   # in the left column are empty
    m = sim.load_imbalance()
    assert m > 0.5                     # strongly imbalanced by design
    # uniform fill -> balanced
    _ALL_SPECIES.clear()
    ele = Electron(density=lambda x, y: 5 * nc, ppc=4)
    sim2 = Simulation(nx=64, ny=64, dx=l0 / 10, dy=l0 / 10,
                      npatch_x=2, npatch_y=2, random_seed=0)
    sim2.add_species([ele])
    sim2.initialize()
    assert sim2.load_imbalance() < 0.01
