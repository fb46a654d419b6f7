"""Fused migration kernel (ops/cellpallas.py::migrate_cells_fused) must
reproduce the XLA fast path (ops/cell2d.py::migrate_cells) exactly: same
sorted placement, same merges, same counters."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map

from lambdapic_tpu.ops.cell2d import migrate_cells
from lambdapic_tpu.ops.cellpallas import migrate_cells_fused, \
    sort_cells_pallas
from lambdapic_tpu.parallel.halo import HaloSpec


def migrate_ref(d, a, plan, recompute_ig=True):
    """The production fast path (Batcher in-kernel sort): the fused kernel
    uses the same network, so agreement is bitwise. (Plain lax.sort
    differs only in equal-key placement of dead slots, which shifts a few
    merge pairings.)"""
    return migrate_cells(d, a, plan, recompute_ig=recompute_ig,
                         sort_fn=sort_cells_pallas)


def _random_state(rng, cap, cells, drift=0.0, lead=(), cell_mask=None):
    """Global state with per-device leading dims `lead` (= mesh shape).
    cell_mask: optional per-cell bool (broadcastable to `shape`) limiting
    where alive slots may exist (sparse-occupancy tests)."""
    shape = lead + (cap,) + cells
    ndim = len(cells)
    nl = len(lead)
    names = ("x", "y", "z")[:ndim]
    data = {}
    alive = rng.random(shape) < 0.6
    if cell_mask is not None:
        alive = alive & cell_mask
    for ax, nm in enumerate(names):
        ishape = [1] * (nl + 1 + ndim)
        ishape[nl + 1 + ax] = cells[ax]
        idx = np.arange(cells[ax], dtype=np.float64).reshape(ishape)
        data[nm] = np.where(alive,
                            idx + rng.uniform(-0.9, 0.9, shape)
                            + (drift if nm == "x" else 0.0),
                            0.0)
    data["w"] = np.where(alive, rng.uniform(0.5, 2.0, shape), 0.0)
    for nm in ("ux", "uy", "uz"):
        data[nm] = np.where(alive, rng.normal(size=shape), 0.0)
    data["inv_gamma"] = np.ones(shape)
    data["id_lo"] = (rng.integers(0, 1 << 20, shape)
                     .astype(np.uint32) * alive)
    data["id_hi"] = np.zeros(shape, np.uint32)
    return data, alive


def _run(fn, data, alive, mesh_shape, cells, periodic=True,
         recompute_ig=True):
    ndim = len(cells)
    axes = ("px", "py", "pz")[:ndim]
    ndev = int(np.prod(mesh_shape))
    mesh = Mesh(np.asarray(jax.devices()[:ndev], dtype=object
                           ).reshape(mesh_shape), axes)
    specs = tuple(HaloSpec(axes[i], mesh_shape[i], periodic)
                  for i in range(ndim))
    plan = tuple((cells[i], specs[i], ("x", "y", "z")[i])
                 for i in range(ndim))

    lead = (1,) * ndim
    jd = {k: jnp.asarray(v) for k, v in data.items()}
    ja = jnp.asarray(alive)

    def local(d, a):
        d = {k: v.reshape(v.shape[ndim:]) for k, v in d.items()}
        a = a.reshape(a.shape[ndim:])
        d, a, lost = fn(d, a, plan, recompute_ig=recompute_ig)
        return ({k: v[(None,) * ndim] for k, v in d.items()},
                a[(None,) * ndim], lost.reshape(lead))

    dspec = {k: P(*axes) for k in jd}
    f = shard_map(local, mesh=mesh, in_specs=(dspec, P(*axes)),
                  out_specs=(dspec, P(*axes), P(*axes)), check_vma=False)
    d2, a2, lost = f(jd, ja)
    d2 = {k: np.asarray(v) for k, v in d2.items()}
    return d2, np.asarray(a2), int(np.asarray(lost).sum())


CASES_2D = [
    ((1, 1), (32, 128), True),
    ((2, 2), (16, 128), True),
    ((2, 2), (16, 128), False),
]


@pytest.mark.parametrize("mesh_shape,cells,periodic", CASES_2D)
def test_fused_matches_xla_2d(mesh_shape, cells, periodic):
    rng = np.random.default_rng(0)
    data, alive = _random_state(rng, 8, cells, lead=mesh_shape)
    ref_d, ref_a, ref_lost = _run(migrate_ref, data, alive, mesh_shape,
                                  cells, periodic)
    got_d, got_a, got_lost = _run(migrate_cells_fused, data, alive,
                                  mesh_shape, cells, periodic)
    assert got_lost == ref_lost
    np.testing.assert_array_equal(got_a, ref_a)
    for k in ref_d:
        np.testing.assert_allclose(got_d[k], ref_d[k], rtol=1e-12,
                                   atol=1e-15, err_msg=k)


def test_fused_matches_xla_2d_drift():
    """Strong +x drift: heavy donor traffic through block and device
    boundaries."""
    rng = np.random.default_rng(1)
    data, alive = _random_state(rng, 8, (16, 128), drift=0.8,
                                lead=(2, 2))
    ref = _run(migrate_ref, data, alive, (2, 2), (16, 128), True)
    got = _run(migrate_cells_fused, data, alive, (2, 2), (16, 128), True)
    assert got[2] == ref[2]
    np.testing.assert_array_equal(got[1], ref[1])
    for k in ref[0]:
        np.testing.assert_allclose(got[0][k], ref[0][k], rtol=1e-12,
                                   atol=1e-15, err_msg=k)


@pytest.mark.parametrize("periodic", [True, False])
def test_fused_skip_empty_sparse_arrivals(periodic):
    """Block-occupancy skipping with donors entering EMPTY blocks:
    particles only in x rows {7, 15} of each (16, 128)-cell device with a
    strong +x drift, so donors cross the (8, 128) migration-block edge
    into the vacuum second block AND the device edge into the next
    device's vacuum first block. skip_empty=True must bitwise-match both
    skip_empty=False and the XLA fast path."""
    import functools
    rng = np.random.default_rng(3)
    row = np.arange(16) % 8 == 7
    mask = row[None, None, None, :, None]      # (lead.., cap, nx, ny)
    data, alive = _random_state(rng, 8, (16, 128), drift=0.8,
                                lead=(2, 2), cell_mask=mask)
    assert alive.any()
    args = (data, alive, (2, 2), (16, 128), periodic)
    ref = _run(migrate_ref, *args)
    noskip = _run(functools.partial(migrate_cells_fused,
                                    skip_empty=False), *args)
    skip = _run(functools.partial(migrate_cells_fused,
                                  skip_empty=True), *args)
    for got in (noskip, skip):
        assert got[2] == ref[2]
        np.testing.assert_array_equal(got[1], ref[1])
        for k in ref[0]:
            np.testing.assert_allclose(got[0][k], ref[0][k], rtol=1e-12,
                                       atol=1e-15, err_msg=k)


@pytest.mark.parametrize("mesh_shape,cells,periodic", [
    ((1, 1, 1), (8, 16, 128), True),
    ((2, 2, 2), (4, 16, 128), True),
    ((2, 2, 2), (4, 16, 128), False),
])
def test_fused_matches_xla_3d(mesh_shape, cells, periodic):
    rng = np.random.default_rng(2)
    data, alive = _random_state(rng, 4, cells, lead=mesh_shape)
    ref_d, ref_a, ref_lost = _run(migrate_ref, data, alive, mesh_shape,
                                  cells, periodic)
    got_d, got_a, got_lost = _run(migrate_cells_fused, data, alive,
                                  mesh_shape, cells, periodic)
    assert got_lost == ref_lost
    np.testing.assert_array_equal(got_a, ref_a)
    for k in ref_d:
        np.testing.assert_allclose(got_d[k], ref_d[k], rtol=1e-12,
                                   atol=1e-15, err_msg=k)
