"""Halo pad/reduce correctness on a multi-device CPU mesh (equivalent of the
reference patch sync tests, tests/mpi/test_syncparticles.py /
sync_fields semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lambdapic_tpu.parallel.halo import HaloSpec, halo_pad, halo_reduce

try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map


def make_mesh(npx, npy):
    dev = np.asarray(jax.devices()[: npx * npy], dtype=object).reshape(npx, npy)
    return Mesh(dev, ("px", "py"))


def test_halo_pad_periodic_matches_manual():
    npx, npy, g = 2, 2, 2
    nx, ny = 8, 6
    mesh = make_mesh(npx, npy)
    specs = (HaloSpec("px", npx, True), HaloSpec("py", npy, True))
    f = jnp.arange(nx * ny, dtype=jnp.float64).reshape(nx, ny)

    padded = shard_map(
        lambda a: halo_pad(a, g, (0, 1), specs),
        mesh=mesh, in_specs=P("px", "py"), out_specs=P("px", "py"))(f)
    padded = np.asarray(padded)

    fn = np.asarray(f)
    nxl, nyl = nx // npx, ny // npy
    for ix in range(npx):
        for iy in range(npy):
            blk = padded[ix * (nxl + 2 * g):(ix + 1) * (nxl + 2 * g),
                         iy * (nyl + 2 * g):(iy + 1) * (nyl + 2 * g)]
            gx = np.arange(ix * nxl - g, (ix + 1) * nxl + g) % nx
            gy = np.arange(iy * nyl - g, (iy + 1) * nyl + g) % ny
            expected = fn[np.ix_(gx, gy)]
            np.testing.assert_array_equal(blk, expected)


def test_halo_pad_open_boundary_zeros():
    npx, npy, g = 2, 1, 2
    nx, ny = 8, 4
    mesh = make_mesh(npx, npy)
    specs = (HaloSpec("px", npx, False), HaloSpec("py", npy, True))
    f = jnp.ones((nx, ny), dtype=jnp.float64)
    padded = shard_map(
        lambda a: halo_pad(a, g, (0, 1), specs),
        mesh=mesh, in_specs=P("px", "py"), out_specs=P("px", "py"))(f)
    padded = np.asarray(padded)
    # first device's low-x guard must be zero
    assert (padded[:g] == 0).all()
    # last device's high-x guard must be zero
    assert (padded[-g:] == 0).all()
    # interior guards between devices are filled
    nxl = nx // npx
    assert (padded[nxl + 2 * g - g:nxl + 2 * g] == 1).all()


def test_halo_reduce_inverse_of_pad_sum():
    """Depositing 1 everywhere on padded blocks and reducing gives the
    overlap multiplicity: interior cells receive their own value plus every
    neighbor rim covering them."""
    npx, npy, g = 2, 2, 2
    nx, ny = 8, 8
    mesh = make_mesh(npx, npy)
    specs = (HaloSpec("px", npx, True), HaloSpec("py", npy, True))
    nxl, nyl = nx // npx, ny // npy
    jpad = jnp.ones((npx * (nxl + 2 * g), npy * (nyl + 2 * g)),
                    dtype=jnp.float64)
    red = shard_map(
        lambda a: halo_reduce(a, g, (0, 1), specs),
        mesh=mesh, in_specs=P("px", "py"), out_specs=P("px", "py"))(jpad)
    red = np.asarray(red)
    # each interior cell within g of a shard edge receives contributions from
    # the rims of the adjacent shard(s): count = (1+x-edges)*(1+y-edges)
    for i in range(nx):
        for j in range(ny):
            li, lj = i % nxl, j % nyl
            mult_x = 2 if (li < g or li >= nxl - g) else 1
            mult_y = 2 if (lj < g or lj >= nyl - g) else 1
            assert red[i, j] == mult_x * mult_y, (i, j)


def test_halo_reduce_conserves_total():
    npx, npy, g = 4, 2, 3
    nx, ny = 16, 8
    mesh = make_mesh(npx, npy)
    specs = (HaloSpec("px", npx, True), HaloSpec("py", npy, True))
    nxl, nyl = nx // npx, ny // npy
    rng = np.random.default_rng(0)
    jpad = rng.normal(size=(npx * (nxl + 2 * g), npy * (nyl + 2 * g)))
    red = shard_map(
        lambda a: halo_reduce(a, g, (0, 1), specs),
        mesh=mesh, in_specs=P("px", "py"), out_specs=P("px", "py"))(
        jnp.asarray(jpad))
    np.testing.assert_allclose(np.asarray(red).sum(), jpad.sum(), rtol=1e-12)
