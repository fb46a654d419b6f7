"""insert_cells parity: the rank-matched select path (default) must be
physically identical to the sort-merge oracle — same surviving newborn
set (by id), same payload values, same loss count, same next_id —
while leaving resident alive slots untouched in place.

Reference semantics analog: qed/cpu.py create_photon_patches — newborns
occupy free slots of the child arrays; none are lost while free slots
remain.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from lambdapic_tpu.ops.cell2d import insert_cells


def _mk(rng, cap, cap_s, cells, frac_alive, frac_valid):
    shape_c = (cap,) + cells
    shape_s = (cap_s,) + cells
    alive = rng.random(shape_c) < frac_alive
    valid = rng.random(shape_s) < frac_valid
    data = {
        "x": rng.normal(size=shape_c),
        "ux": rng.normal(size=shape_c),
        "w": rng.random(shape_c) + 0.5,
        "inv_gamma": rng.random(shape_c) + 0.1,
        "id_lo": rng.integers(0, 1 << 20, shape_c).astype(np.uint32),
        "id_hi": np.full(shape_c, 3, np.uint32),
    }
    # dead-slot payloads are garbage in the live layout
    new_vals = {
        "x": rng.normal(size=shape_s),
        "ux": rng.normal(size=shape_s),
        "w": rng.random(shape_s) + 0.5,
        "inv_gamma": rng.random(shape_s) + 0.1,
    }
    return data, alive, new_vals, valid


def _run(mode, monkeypatch, data, alive, new_vals, valid, next_id=100,
         device_id=7):
    monkeypatch.setenv("LAMBDAPIC_CELL_INSERT", mode)
    out, al, nid, lost = insert_cells(
        {k: jnp.asarray(v) for k, v in data.items()}, jnp.asarray(alive),
        jnp.uint32(next_id),
        {k: jnp.asarray(v) for k, v in new_vals.items()},
        jnp.asarray(valid), device_id=jnp.int32(device_id))
    return ({k: np.asarray(v) for k, v in out.items()}, np.asarray(al),
            int(nid), int(lost))


def _records(out, al):
    """alive particles as a dict id -> (payload tuple), placement-free."""
    recs = {}
    ids = out["id_lo"]
    for idx in zip(*np.nonzero(al)):
        key = (int(out["id_hi"][idx]), int(ids[idx])) + idx[1:]
        assert key not in recs, "duplicate id within a cell"
        recs[key] = tuple(float(out[k][idx])
                          for k in ("x", "ux", "w", "inv_gamma"))
    return recs


@pytest.mark.parametrize("frac_alive,frac_valid", [
    (0.5, 0.2),       # typical emission sparsity
    (0.9, 0.9),       # overflow-heavy: newborns must be dropped
    (0.0, 1.0),       # empty child species
    (1.0, 0.5),       # full child species: every newborn lost
])
def test_select_matches_sort_oracle(monkeypatch, frac_alive, frac_valid):
    rng = np.random.default_rng(42)
    args = _mk(rng, cap=6, cap_s=8, cells=(9, 11),
               frac_alive=frac_alive, frac_valid=frac_valid)
    out_a, al_a, nid_a, lost_a = _run("sort", monkeypatch, *args)
    out_b, al_b, nid_b, lost_b = _run("select", monkeypatch, *args)
    assert nid_a == nid_b
    assert lost_a == lost_b
    assert al_a.sum() == al_b.sum()
    assert _records(out_a, al_a) == _records(out_b, al_b)


def test_select_leaves_residents_in_place(monkeypatch):
    rng = np.random.default_rng(3)
    data, alive, new_vals, valid = _mk(rng, 5, 4, (6, 7), 0.6, 0.3)
    out, al, _, _ = _run("select", monkeypatch, data, alive, new_vals,
                         valid)
    for k in data:
        np.testing.assert_array_equal(out[k][alive], data[k][alive],
                                      err_msg=k)
    assert (al | ~alive).all()  # alive slots never die


def test_newborn_ids_sequential_and_device_tagged(monkeypatch):
    rng = np.random.default_rng(11)
    data, alive, new_vals, valid = _mk(rng, 8, 6, (4, 5), 0.3, 0.5)
    next_id = 1000
    out, al, nid, lost = _run("select", monkeypatch, data, alive,
                              new_vals, valid, next_id=next_id,
                              device_id=9)
    born = al & ~alive
    ids = np.sort(out["id_lo"][born].astype(np.int64))
    n_new = int(valid.sum())
    assert nid == next_id + n_new
    # surviving newborn ids are a subset of [next_id, next_id + n_new)
    assert ids.min() >= next_id and ids.max() < next_id + n_new
    assert len(np.unique(ids)) == len(ids)
    assert lost == n_new - born.sum()
    assert (out["id_hi"][born] == 9).all()
