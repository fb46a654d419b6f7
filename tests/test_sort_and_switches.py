"""Bucket sort invariants (reference tests/test_sort.py:38-414 analogs) and
runtime operator toggles (reference test_enable_mixin.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lambdapic_tpu.core.species import _ALL_SPECIES
from lambdapic_tpu.ops.sort import (bucket_bounds, cell_ids_2d,
                                    shuffled_sort_perm, sort_perm)


@pytest.fixture(autouse=True)
def clear_species_registry():
    _ALL_SPECIES.clear()
    yield
    _ALL_SPECIES.clear()


def test_cell_ids_and_bounds():
    nx, ny = 4, 3
    x = jnp.asarray([0.2, 1.6, -0.4, 3.4, 0.0])
    y = jnp.asarray([0.0, 2.4, 1.0, 0.4, 0.0])
    alive = jnp.asarray([True, True, True, True, False])
    cid = cell_ids_2d(x, y, alive, nx, ny)
    # dead -> last bucket; out-of-range clipped (reference sort/cpu2d.c:46-52)
    np.testing.assert_array_equal(np.asarray(cid), [0, 2 * 3 + 2, 1, 9, 12])
    perm = sort_perm(cid)
    cs = np.asarray(cid)[np.asarray(perm)]
    assert (np.diff(cs) >= 0).all()
    starts, counts = bucket_bounds(jnp.asarray(cs), nx * ny)
    assert counts.sum() == 4          # alive only
    assert counts[0] == 1 and counts[1] == 1 and counts[8] == 1


def test_shuffled_sort_randomizes_within_cell():
    n = 512
    cell = jnp.zeros(n, dtype=jnp.int32)   # all in one cell
    p1 = np.asarray(shuffled_sort_perm(cell, jax.random.PRNGKey(0), 4))
    p2 = np.asarray(shuffled_sort_perm(cell, jax.random.PRNGKey(1), 4))
    assert not np.array_equal(p1, p2)
    assert sorted(p1) == list(range(n))


def test_set_enabled_freezes_physics():
    """Disabling the pusher freezes particles; disabling maxwell freezes
    fields (reference EnableMixin semantics)."""
    from lambdapic_tpu import Simulation, Species
    ele = Species(name="e", charge=-1, mass=1.0)
    bc = {k: "periodic" for k in ("xmin", "xmax", "ymin", "ymax")}
    sim = Simulation(nx=16, ny=16, dx=1e-6, dy=1e-6, npatch_x=2, npatch_y=2,
                     boundary_conditions=bc, random_seed=0,
                     precision="double")
    sim.add_species([ele])
    sim.initialize()
    n = 10
    rng = np.random.default_rng(0)
    coords = {"x": rng.uniform(1e-6, 15e-6, n),
              "y": rng.uniform(1e-6, 15e-6, n)}
    attrs = {"w": np.ones(n), "ux": np.full(n, 1.0), "uy": np.zeros(n),
             "uz": np.zeros(n), "inv_gamma": np.full(n, 1 / np.sqrt(2))}
    sim.set_particles_global(0, coords, attrs)
    sim.set_field("ez", np.ones((16, 16)))
    x0 = np.sort(sim.get_particles(0)["x"])
    ez0 = sim.get_field("ez")

    sim.set_enabled("pusher", False)
    sim.set_enabled("maxwell", False)
    sim.run(nsteps=3)
    np.testing.assert_array_equal(np.sort(sim.get_particles(0)["x"]), x0)
    np.testing.assert_array_equal(sim.get_field("ez"), ez0)

    sim.set_enabled("pusher", True)
    sim.set_enabled("maxwell", True)
    sim.run(nsteps=2)
    assert not np.array_equal(np.sort(sim.get_particles(0)["x"]), x0)
    assert not np.array_equal(sim.get_field("ez"), ez0)

    with pytest.raises(ValueError):
        sim.set_enabled("bogus", False)


def test_timer_stat_cli(tmp_path, capsys):
    """timer-stat aggregation (reference cli/stat.py:8-60)."""
    log = tmp_path / "x.timer.txt"
    log.write_text(
        "2026-01-01 | TIMER | Rank 0 update E field took 1.5 ms\n"
        "2026-01-01 | TIMER | Rank 0 update E field took 2.5 ms\n"
        "2026-01-01 | TIMER | Rank 0 pusher took 10.0 ms\n"
        "2026-01-01 | INFO  | not a timer line\n")
    from lambdapic_tpu.cli.stat import calculate_percentages, parse_log_file
    times, counts = parse_log_file(str(log))
    assert times["update E field"] == 4.0
    assert counts["update E field"] == 2
    pct, avg, total = calculate_percentages(times, counts)
    assert total == 14.0
    assert avg["pusher"] == 10.0
    assert abs(pct["pusher"] - 10 / 14 * 100) < 1e-9

    from lambdapic_tpu.cli.main import main
    assert main(["timer-stat", str(log)]) == 0
