"""Pallas cell-engine kernels (ops/cellpallas.py, interpret mode on CPU)
must reproduce the XLA cell kernels exactly: fused push == pos/gather/
boris/pos composition, pallas deposit == deposit_cell_2d/3d."""
import numpy as np
import jax
import jax.numpy as jnp

from lambdapic_tpu.ops.cell2d import deposit_cell_2d, gather_cell_2d
from lambdapic_tpu.ops.cell3d import deposit_cell_3d, gather_cell_3d
from lambdapic_tpu.ops.cellpallas import (deposit_cell_2d_pallas,
                                          deposit_cell_3d_pallas,
                                          fused_push_cell_2d,
                                          fused_push_cell_3d)
from lambdapic_tpu.ops.pusher import (boris_push, push_position_2d,
                                      push_position_3d)
from lambdapic_tpu.constants import c as c_light

G = 3
Q, M = -1.602176634e-19, 9.1093837015e-31
DX = 5e-8


def _mk2(seed=0, cap=8, nx=16, ny=128):
    rng = np.random.default_rng(seed)
    ix = np.arange(nx)[None, :, None]
    iy = np.arange(ny)[None, None, :]
    x = jnp.asarray(rng.uniform(-0.5, 0.4999, (cap, nx, ny)) + ix)
    y = jnp.asarray(rng.uniform(-0.5, 0.4999, (cap, nx, ny)) + iy)
    u = [jnp.asarray(rng.standard_normal((cap, nx, ny))) for _ in range(3)]
    w = jnp.asarray(rng.uniform(0, 1, (cap, nx, ny)))
    eb = jnp.asarray(rng.standard_normal((6, nx + 2 * G, ny + 2 * G)))
    dt = 0.95 * DX / (c_light * np.sqrt(2))
    return x, y, u, w, eb, dt


def test_fused_push_2d_matches_xla():
    x, y, (ux, uy, uz), w, eb, dt = _mk2()
    cdx = c_light * dt / DX
    ig = 1.0 / jnp.sqrt(1 + ux**2 + uy**2 + uz**2)
    xm, ym = push_position_2d(x, y, ux, uy, ig, cdx / 2, cdx / 2)
    ebp = gather_cell_2d(eb, xm, ym, G)
    ux2, uy2, uz2, ig2 = boris_push(ux, uy, uz, *ebp, Q, M, dt)
    xr, yr = push_position_2d(xm, ym, ux2, uy2, ig2, cdx / 2, cdx / 2)

    out = fused_push_cell_2d(eb, x, y, ux, uy, uz, q=Q, m=M, dt=dt,
                             dx=DX, dy=DX, g=G, want_eb=True)
    want = [xr, yr, ux2, uy2, uz2, ig2] + list(ebp)
    for k, (a, b) in enumerate(zip(out, want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-14, err_msg=str(k))


def test_deposit_2d_pallas_matches_xla():
    x, y, (ux, uy, uz), w, eb, dt = _mk2(seed=1)
    ig = 1.0 / jnp.sqrt(1 + ux**2 + uy**2 + uz**2)
    ref = deposit_cell_2d(x, y, ux, uy, uz, ig, w, q=Q, dx=DX, dy=DX,
                          dt=dt, g=G)
    got = deposit_cell_2d_pallas(x, y, ux, uy, uz, ig, w, q=Q, dx=DX,
                                 dy=DX, dt=dt, g=G)
    scale = np.abs(np.asarray(ref)).max()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-10, atol=scale * 1e-13)


def _mk3(seed=2, cap=4, nx=6, ny=16, nz=24):
    rng = np.random.default_rng(seed)
    ix = np.arange(nx)[None, :, None, None]
    iy = np.arange(ny)[None, None, :, None]
    iz = np.arange(nz)[None, None, None, :]
    shp = (cap, nx, ny, nz)
    x = jnp.asarray(rng.uniform(-0.5, 0.4999, shp) + ix)
    y = jnp.asarray(rng.uniform(-0.5, 0.4999, shp) + iy)
    z = jnp.asarray(rng.uniform(-0.5, 0.4999, shp) + iz)
    u = [jnp.asarray(rng.standard_normal(shp)) for _ in range(3)]
    w = jnp.asarray(rng.uniform(0, 1, shp))
    eb = jnp.asarray(rng.standard_normal(
        (6, nx + 2 * G, ny + 2 * G, nz + 2 * G)))
    dt = 0.95 * DX / (c_light * np.sqrt(3))
    return x, y, z, u, w, eb, dt


def test_fused_push_3d_matches_xla():
    x, y, z, (ux, uy, uz), w, eb, dt = _mk3()
    cdx = c_light * dt / DX
    ig = 1.0 / jnp.sqrt(1 + ux**2 + uy**2 + uz**2)
    xm, ym, zm = push_position_3d(x, y, z, ux, uy, uz, ig,
                                  cdx / 2, cdx / 2, cdx / 2)
    ebp = gather_cell_3d(eb, xm, ym, zm, G)
    ux2, uy2, uz2, ig2 = boris_push(ux, uy, uz, *ebp, Q, M, dt)
    xr, yr, zr = push_position_3d(xm, ym, zm, ux2, uy2, uz2, ig2,
                                  cdx / 2, cdx / 2, cdx / 2)

    out = fused_push_cell_3d(eb, x, y, z, ux, uy, uz, q=Q, m=M, dt=dt,
                             dx=DX, dy=DX, dz=DX, g=G, want_eb=True)
    want = [xr, yr, zr, ux2, uy2, uz2, ig2] + list(ebp)
    for k, (a, b) in enumerate(zip(out, want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-14, err_msg=str(k))


def test_deposit_3d_pallas_matches_xla():
    x, y, z, (ux, uy, uz), w, eb, dt = _mk3(seed=3)
    ig = 1.0 / jnp.sqrt(1 + ux**2 + uy**2 + uz**2)
    ref = deposit_cell_3d(x, y, z, ux, uy, uz, ig, w, q=Q, dx=DX, dy=DX,
                          dz=DX, dt=dt, g=G)
    got = deposit_cell_3d_pallas(x, y, z, ux, uy, uz, ig, w, q=Q, dx=DX,
                                 dy=DX, dz=DX, dt=dt, g=G)
    scale = np.abs(np.asarray(ref)).max()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-10, atol=scale * 1e-13)


# ----------------------------------------------------------------------
# block-occupancy skipping: a sparse population must produce identical
# results for alive slots (and identical deposits everywhere — dead
# slots carry w == 0) whether vacuum blocks are skipped or computed
# ----------------------------------------------------------------------

def _sparse2(seed=4, cap=8, nx=16, ny=128):
    """Alive only in x rows [0, 8) — the second (8, 128) K1/K2 block is
    pure vacuum. Dead slots zero-sanitized, as migrate_cells guarantees."""
    x, y, (ux, uy, uz), w, eb, dt = _mk2(seed=seed, cap=cap, nx=nx, ny=ny)
    rng = np.random.default_rng(seed + 100)
    alive = jnp.asarray(
        (rng.random((cap, nx, ny)) < 0.5) & (np.arange(nx) < 8)[None, :,
                                                                None])
    zero = lambda a: jnp.where(alive, a, 0.0)
    return (zero(x), zero(y), zero(ux), zero(uy), zero(uz), zero(w),
            alive, eb, dt)


def test_fused_push_2d_occ_parity():
    from lambdapic_tpu.ops.cellpallas import block_occupancy
    x, y, ux, uy, uz, w, alive, eb, dt = _sparse2()
    occ = block_occupancy(alive)
    assert np.asarray(occ).tolist() == [[1], [0]]
    base = fused_push_cell_2d(eb, x, y, ux, uy, uz, q=Q, m=M, dt=dt,
                              dx=DX, dy=DX, g=G, want_eb=True)
    skip = fused_push_cell_2d(eb, x, y, ux, uy, uz, q=Q, m=M, dt=dt,
                              dx=DX, dy=DX, g=G, want_eb=True, occ=occ)
    m = np.asarray(alive)
    for k, (a, b) in enumerate(zip(base, skip)):
        np.testing.assert_array_equal(np.asarray(a)[m], np.asarray(b)[m],
                                      err_msg=str(k))
        assert np.isfinite(np.asarray(b)).all(), k
    # inv_gamma of skipped slots stays 1 (downstream 1/ig must be finite)
    assert (np.asarray(skip[5])[~m] == 1.0).all()


def test_deposit_2d_pallas_occ_parity():
    from lambdapic_tpu.ops.cellpallas import block_occupancy
    x, y, ux, uy, uz, w, alive, eb, dt = _sparse2(seed=5)
    ig = jnp.where(alive, 1.0 / jnp.sqrt(1 + ux**2 + uy**2 + uz**2), 1.0)
    occ = block_occupancy(alive)
    base = deposit_cell_2d_pallas(x, y, ux, uy, uz, ig, w, q=Q, dx=DX,
                                  dy=DX, dt=dt, g=G)
    skip = deposit_cell_2d_pallas(x, y, ux, uy, uz, ig, w, q=Q, dx=DX,
                                  dy=DX, dt=dt, g=G, occ=occ)
    np.testing.assert_array_equal(np.asarray(skip), np.asarray(base))


def _sparse3(seed=6, cap=4, nx=6, ny=16, nz=24):
    """Alive only in y rows [0, 8) — the second (6, 8) 3D block column is
    vacuum."""
    x, y, z, (ux, uy, uz), w, eb, dt = _mk3(seed=seed, cap=cap, nx=nx,
                                            ny=ny, nz=nz)
    rng = np.random.default_rng(seed + 100)
    alive = jnp.asarray(
        (rng.random((cap, nx, ny, nz)) < 0.5)
        & (np.arange(ny) < 8)[None, None, :, None])
    zero = lambda a: jnp.where(alive, a, 0.0)
    return (zero(x), zero(y), zero(z), zero(ux), zero(uy), zero(uz),
            zero(w), alive, eb, dt)


def test_fused_push_3d_occ_parity():
    from lambdapic_tpu.ops.cellpallas import block_occupancy
    x, y, z, ux, uy, uz, w, alive, eb, dt = _sparse3()
    occ = block_occupancy(alive)
    assert np.asarray(occ).tolist() == [[1, 0]]
    base = fused_push_cell_3d(eb, x, y, z, ux, uy, uz, q=Q, m=M, dt=dt,
                              dx=DX, dy=DX, dz=DX, g=G, want_eb=True)
    skip = fused_push_cell_3d(eb, x, y, z, ux, uy, uz, q=Q, m=M, dt=dt,
                              dx=DX, dy=DX, dz=DX, g=G, want_eb=True,
                              occ=occ)
    m = np.asarray(alive)
    for k, (a, b) in enumerate(zip(base, skip)):
        np.testing.assert_array_equal(np.asarray(a)[m], np.asarray(b)[m],
                                      err_msg=str(k))
        assert np.isfinite(np.asarray(b)).all(), k
    assert (np.asarray(skip[6])[~m] == 1.0).all()


def test_deposit_3d_pallas_occ_parity():
    from lambdapic_tpu.ops.cellpallas import block_occupancy
    x, y, z, ux, uy, uz, w, alive, eb, dt = _sparse3(seed=7)
    ig = jnp.where(alive, 1.0 / jnp.sqrt(1 + ux**2 + uy**2 + uz**2), 1.0)
    occ = block_occupancy(alive)
    base = deposit_cell_3d_pallas(x, y, z, ux, uy, uz, ig, w, q=Q, dx=DX,
                                  dy=DX, dz=DX, dt=dt, g=G)
    skip = deposit_cell_3d_pallas(x, y, z, ux, uy, uz, ig, w, q=Q, dx=DX,
                                  dy=DX, dz=DX, dt=dt, g=G, occ=occ)
    np.testing.assert_array_equal(np.asarray(skip), np.asarray(base))
