"""Frozen-region skipping tests for the slab megakernel
(ops/cellslab.py::_skips_enabled paths).

The main parity suite (test_cellslab.py) uses hot random states, so
nearly every block contains cell-crossers and nonzero fields and the
skip branches are never taken. These tests target them directly:

- a fully cold block (u == 0, fields == 0) must pass through the kernel
  as an exact identity (merge skip + particle-tail skip);
- a mixed cold/hot domain must produce identical physics with skips on
  and off (slot ORDER may differ — the merge skip leaves unsorted rows
  in place at inactivity fixed points — so comparison is canonicalized
  by particle id).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tests.core.test_cellslab import shard_map
from lambdapic_tpu.parallel.halo import HaloSpec

DX = 1e-6
DT = 1.8e-15          # CFL ~0.54 in 3D at DX
Q = -1.602e-19
M = 9.109e-31


def _mk_state(dim, cap, cells, hot_frac, seed=0):
    """Cell-binned state where cells with index x < hot_frac * nx are
    hot (random u, fields nonzero there) and the rest are exactly cold
    (u = 0; fields exactly zero outside the hot region)."""
    rng = np.random.default_rng(seed)
    shape = (cap,) + cells
    g = 2
    alive = rng.uniform(0, 1, shape) < 0.5
    nx = cells[0]
    hot_cells = int(hot_frac * nx)
    hot = np.zeros(cells, bool)
    if hot_cells:
        hot[:hot_cells] = True

    pos = []
    for k in range(dim):
        idx = np.arange(cells[k]).reshape(
            [1] * (1 + k) + [cells[k]] + [1] * (dim - 1 - k))
        pos.append(rng.uniform(-0.45, 0.45, shape) + idx)
    u = [np.where(hot[None], rng.normal(size=shape) * 2, 0.0)
         for _ in range(3)]
    ig = 1 / np.sqrt(1 + sum(a**2 for a in u))
    data = {c: jnp.asarray(np.where(alive, p, 0.0))
            for c, p in zip(("x", "y", "z")[:dim], pos)}
    data.update({f"u{c}": jnp.asarray(np.where(alive, a, 0.0))
                 for c, a in zip("xyz", u)})
    data["inv_gamma"] = jnp.asarray(np.where(alive, ig, 1.0))
    data["w"] = jnp.asarray(
        np.where(alive, rng.uniform(0.5, 1.5, shape), 0.0))
    # unique ids so cross-run comparison can canonicalize by identity
    ids = np.arange(np.prod(shape), dtype=np.uint32).reshape(shape)
    data["id_lo"] = jnp.asarray(np.where(alive, ids, 0))
    data["id_hi"] = jnp.zeros(shape, jnp.uint32)

    ebpad = np.zeros((6,) + tuple(c + 2 * g for c in cells))
    if hot_cells:
        # fields only over the hot region's padded window
        ebpad[:, : hot_cells + g] = rng.uniform(
            -5e11, 5e11, ebpad[:, : hot_cells + g].shape)
    return data, jnp.asarray(alive), jnp.asarray(ebpad), g


def _run_slab(dim, data, alive, ebpad, g):
    from lambdapic_tpu.ops.cellslab import slab_species_step

    cells = alive.shape[1:]
    names = ("px", "py", "pz")[:dim]
    mesh = Mesh(np.array(jax.devices()[:1]).reshape((1,) * dim), names)
    specs = tuple(HaloSpec(nm, 1, True) for nm in names)
    plan = tuple((cells[k], specs[k], ("x", "y", "z")[k])
                 for k in range(dim))
    deltas = (DX,) * dim

    def run(eb, d, al):
        # with_rho=False matches the hot path (rho recomputed on
        # demand), which is where the frozen-region skips engage
        d2, al2, nl, jpad = slab_species_step(
            eb, dict(d), al, plan, q=Q, m=M, dt=DT, deltas=deltas, g=g,
            with_rho=False)
        return d2, al2, jnp.reshape(nl, (1,)), jpad

    jf = jax.jit(shard_map(
        run, mesh,
        in_specs=(P(), {k: P() for k in data}, P()),
        out_specs=({k: P() for k in data}, P(), P("px"), P())))
    d2, al2, nl, jpad = jf(ebpad, data, alive)
    return (jax.device_get(d2), np.asarray(al2),
            int(np.asarray(nl).sum()), np.asarray(jpad))


@pytest.mark.parametrize("dim", [2, 3])
def test_frozen_cold_block_exact_identity(dim):
    """u == 0 and fields == 0 everywhere: the step is an exact identity
    (no movers -> merge skipped in place; zero window -> tail skipped),
    with ig = 1, zero current, and zero merges."""
    cells = (16, 16) if dim == 2 else (8, 8, 8)
    data, alive, ebpad, g = _mk_state(dim, 4, cells, hot_frac=0.0)
    d2, al2, nl, jpad = _run_slab(dim, data, alive, ebpad, g)
    np.testing.assert_array_equal(al2, np.asarray(alive))
    assert nl == 0
    assert np.abs(jpad).max() == 0.0
    for k in data:
        if k == "inv_gamma":
            np.testing.assert_array_equal(d2[k], np.ones_like(d2[k]))
        else:
            np.testing.assert_array_equal(d2[k], np.asarray(data[k]),
                                          err_msg=k)


def _canon(d, al):
    """(id -> attrs) records of alive particles, sorted by id."""
    ids = np.asarray(d["id_lo"])[al]
    order = np.argsort(ids)
    rec = {k: np.asarray(d[k])[al][order] for k in d}
    return ids[order], rec


@pytest.mark.parametrize("dim", [2, 3])
def test_mixed_domain_skips_match_noskips(dim):
    """Half-hot / half-cold domain: identical physics with skips on and
    off, canonicalized by particle id (slot order may differ)."""
    cells = (16, 16) if dim == 2 else (8, 8, 8)
    outs = {}
    for skips in ("1", "0"):
        os.environ["LAMBDAPIC_SLAB_SKIPS"] = skips
        try:
            data, alive, ebpad, g = _mk_state(dim, 4, cells,
                                              hot_frac=0.5, seed=3)
            outs[skips] = _run_slab(dim, data, alive, ebpad, g)
        finally:
            os.environ.pop("LAMBDAPIC_SLAB_SKIPS", None)
    (d1, a1, l1, j1), (d0, a0, l0, j0) = outs["1"], outs["0"]
    assert l1 == l0
    assert a1.sum() == a0.sum()
    ids1, r1 = _canon(d1, a1)
    ids0, r0 = _canon(d0, a0)
    np.testing.assert_array_equal(ids1, ids0)
    for k in r1:
        np.testing.assert_array_equal(r1[k], r0[k], err_msg=k)
    scale = np.abs(j0).max() + 1e-30
    np.testing.assert_allclose(j1, j0, atol=1e-12 * scale)
