"""insert_tiled (ops/tiled2d.py): tile-aligned in-step creation must match
insert_local's semantics (parallel/inject.py) — newborns fill dead slots,
survivors untouched, sequential ids, overflow counted."""
import numpy as np
import jax.numpy as jnp

from lambdapic_tpu.ops.tiled2d import insert_tiled


def _child(cap, alive_mask, ntx=1, nty=1):
    shape = (ntx, nty, cap)
    alive = jnp.asarray(np.broadcast_to(alive_mask, shape))
    data = {
        "x": jnp.where(alive, 1.5, 0.0) * jnp.ones(shape),
        "w": jnp.where(alive, 2.0, 0.0) * jnp.ones(shape),
        "ux": jnp.where(alive, -3.0, 0.0) * jnp.ones(shape),
        "inv_gamma": jnp.ones(shape),
        "id_lo": jnp.arange(cap, dtype=jnp.uint32) * jnp.ones(
            shape, jnp.uint32),
        "id_hi": jnp.full(shape, 7, jnp.uint32),
    }
    return data, alive


def test_insert_fills_dead_slots():
    cap = 16
    alive_mask = np.zeros(cap, bool)
    alive_mask[:5] = True
    data, alive = _child(cap, alive_mask)
    csrc = 8
    valid = np.zeros((1, 1, csrc), bool)
    valid[0, 0, [1, 4, 6]] = True
    new = {"x": jnp.arange(csrc, dtype=jnp.float64).reshape(1, 1, csrc) + 10,
           "w": jnp.full((1, 1, csrc), 0.5),
           "ux": jnp.zeros((1, 1, csrc)),
           "inv_gamma": jnp.full((1, 1, csrc), 0.25)}
    out, alive2, nid, lost = insert_tiled(data, alive, jnp.uint32(100),
                                          new, jnp.asarray(valid))
    assert int(alive2.sum()) == 8
    assert int(lost) == 0
    assert int(nid) == 103
    x = np.asarray(out["x"])[0, 0][np.asarray(alive2)[0, 0]]
    # survivors (x=1.5) plus newborns x = 11, 14, 16
    np.testing.assert_array_equal(np.sort(x),
                                  np.sort([1.5] * 5 + [11.0, 14.0, 16.0]))
    w = np.asarray(out["w"])[0, 0][np.asarray(alive2)[0, 0]]
    assert np.isclose(np.sort(w), np.sort([2.0] * 5 + [0.5] * 3)).all()
    ig = np.asarray(out["inv_gamma"])[0, 0][np.asarray(alive2)[0, 0]]
    assert set(np.round(ig, 3)) == {1.0, 0.25}
    ids = np.asarray(out["id_lo"])[0, 0][np.asarray(alive2)[0, 0]]
    for want in (100, 101, 102):
        assert want in ids
    hi = np.asarray(out["id_hi"])[0, 0][np.asarray(alive2)[0, 0]]
    assert (hi == 7).all()


def test_insert_overflow_counted():
    cap = 8
    alive_mask = np.ones(cap, bool)
    alive_mask[-2:] = False                  # 2 free slots
    data, alive = _child(cap, alive_mask)
    valid = np.ones((1, 1, 4), bool)         # 4 newborns -> 2 lost
    new = {"x": jnp.full((1, 1, 4), 9.0), "w": jnp.ones((1, 1, 4)),
           "ux": jnp.zeros((1, 1, 4)), "inv_gamma": jnp.ones((1, 1, 4))}
    out, alive2, nid, lost = insert_tiled(data, alive, jnp.uint32(0), new,
                                          jnp.asarray(valid))
    assert int(lost) == 2
    assert int(alive2.sum()) == cap
    # survivors always win over newborns
    assert int((np.asarray(out["x"])[0, 0] == 1.5).sum()) == 6


def test_ids_sequential_across_tiles():
    cap = 8
    ntx, nty = 2, 3
    alive_mask = np.zeros(cap, bool)
    data, alive = _child(cap, alive_mask, ntx, nty)
    rng = np.random.default_rng(0)
    valid = rng.uniform(size=(ntx, nty, 4)) < 0.5
    new = {"x": jnp.ones((ntx, nty, 4)), "w": jnp.ones((ntx, nty, 4)),
           "ux": jnp.zeros((ntx, nty, 4)),
           "inv_gamma": jnp.ones((ntx, nty, 4))}
    out, alive2, nid, lost = insert_tiled(data, alive, jnp.uint32(50), new,
                                          jnp.asarray(valid))
    n = int(valid.sum())
    assert int(nid) == 50 + n
    ids = np.asarray(out["id_lo"])[np.asarray(alive2)]
    np.testing.assert_array_equal(np.sort(ids), 50 + np.arange(n))
