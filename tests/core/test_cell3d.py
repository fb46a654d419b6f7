"""3D cell-binned kernels (ops/cell3d.py) must reproduce the
reference-layout scatter/gather kernels exactly (reference
interpolation/cpu3d.c, current_deposit.h:275-440)."""
import numpy as np
import jax
import jax.numpy as jnp

from lambdapic_tpu.ops.cell3d import (deposit_cell_3d, gather_cell_3d,
                                      migrate_cell_3d)
from lambdapic_tpu.ops.deposition import deposit_3d
from lambdapic_tpu.ops.interpolation import gather_eb_3d
from lambdapic_tpu.parallel.halo import HaloSpec

CAP, NX, NY, NZ, G = 4, 12, 10, 8, 3


def _bin(x, y, z, extra=None):
    extra = extra or {}
    out = {k: np.zeros((CAP, NX, NY, NZ))
           for k in ["x", "y", "z"] + list(extra)}
    alive = np.zeros((CAP, NX, NY, NZ), bool)
    fill = np.zeros((NX, NY, NZ), int)
    ix = np.clip(np.floor(x + 0.5).astype(int), 0, NX - 1)
    iy = np.clip(np.floor(y + 0.5).astype(int), 0, NY - 1)
    iz = np.clip(np.floor(z + 0.5).astype(int), 0, NZ - 1)
    for p in range(len(x)):
        i, j, k = ix[p], iy[p], iz[p]
        s = fill[i, j, k]
        assert s < CAP, "test overfilled a cell"
        out["x"][s, i, j, k] = x[p]
        out["y"][s, i, j, k] = y[p]
        out["z"][s, i, j, k] = z[p]
        for kk, v in extra.items():
            out[kk][s, i, j, k] = v[p]
        alive[s, i, j, k] = True
        fill[i, j, k] = s + 1
    return out, alive


def test_gather_cell3d_matches_scatter():
    rng = np.random.default_rng(0)
    n = 250
    x = rng.uniform(-0.49, NX - 0.51, n)
    y = rng.uniform(-0.49, NY - 0.51, n)
    z = rng.uniform(-0.49, NZ - 0.51, n)
    eb = jnp.asarray(rng.standard_normal(
        (6, NX + 2 * G, NY + 2 * G, NZ + 2 * G)))

    ref = gather_eb_3d(*[eb[i] for i in range(6)],
                       jnp.asarray(x), jnp.asarray(y), jnp.asarray(z), G)

    binned, alive = _bin(x, y, z)
    out = gather_cell_3d(eb, jnp.asarray(binned["x"]),
                         jnp.asarray(binned["y"]),
                         jnp.asarray(binned["z"]), G)
    slot = {}
    fill = np.zeros((NX, NY, NZ), int)
    ii = np.floor(x + 0.5).astype(int)
    jj = np.floor(y + 0.5).astype(int)
    kk = np.floor(z + 0.5).astype(int)
    for p in range(n):
        slot[p] = (fill[ii[p], jj[p], kk[p]], ii[p], jj[p], kk[p])
        fill[ii[p], jj[p], kk[p]] += 1
    for c in range(6):
        got = np.asarray(out[c])
        want = np.asarray(ref[c])
        for p in range(n):
            s, i, j, k = slot[p]
            np.testing.assert_allclose(got[s, i, j, k], want[p], rtol=1e-12,
                                       atol=1e-14, err_msg=f"comp {c} p {p}")


def test_deposit_cell3d_matches_scatter():
    rng = np.random.default_rng(1)
    n = 300
    x = rng.uniform(-0.49, NX - 0.51, n)
    y = rng.uniform(-0.49, NY - 0.51, n)
    z = rng.uniform(-0.49, NZ - 0.51, n)
    u = rng.standard_normal((3, n))
    ig = 1.0 / np.sqrt(1 + (u**2).sum(0))
    w = rng.uniform(0.2, 1.0, n)
    kw = dict(q=-1.6e-19, dx=1e-6, dy=1e-6, dz=1e-6, dt=1.8e-15)

    j4 = deposit_3d(jnp.asarray(x), jnp.asarray(y), jnp.asarray(z),
                    *map(jnp.asarray, u), jnp.asarray(ig), jnp.asarray(w),
                    nx_loc=NX, ny_loc=NY, nz_loc=NZ, g=G, **kw)
    ref = np.asarray(jnp.stack(j4, axis=0))

    binned, alive = _bin(x, y, z, {"ux": u[0], "uy": u[1], "uz": u[2],
                                   "ig": ig, "w": w})
    wb = jnp.asarray(np.where(alive, binned["w"], 0.0))
    out = deposit_cell_3d(jnp.asarray(binned["x"]), jnp.asarray(binned["y"]),
                          jnp.asarray(binned["z"]),
                          jnp.asarray(binned["ux"]),
                          jnp.asarray(binned["uy"]),
                          jnp.asarray(binned["uz"]),
                          jnp.asarray(np.where(alive, binned["ig"], 1.0)),
                          wb, g=G, **kw)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-10,
                               atol=scale * 1e-12)


import pytest


@pytest.mark.parametrize("exact", [True, False])
def test_migrate_cell3d_rebins(exact):
    from jax.sharding import Mesh, PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    rng = np.random.default_rng(2)
    n = 150
    x = rng.uniform(0.0, NX - 1.0, n)
    y = rng.uniform(0.0, NY - 1.0, n)
    z = rng.uniform(0.0, NZ - 1.0, n)
    binned, alive = _bin(x, y, z, {"w": np.ones(n),
                                   "inv_gamma": np.ones(n),
                                   "ux": np.zeros(n), "uy": np.zeros(n),
                                   "uz": np.zeros(n)})
    shift = rng.uniform(-0.7, 0.7, (3, n))
    sb, _ = _bin(x, y, z, {"sx": shift[0], "sy": shift[1], "sz": shift[2]})
    binned["x"] = binned["x"] + sb["sx"] * alive
    binned["y"] = binned["y"] + sb["sy"] * alive
    binned["z"] = binned["z"] + sb["sz"] * alive

    mesh = Mesh(np.asarray(jax.devices()[:1], dtype=object).reshape(1, 1, 1),
                ("px", "py", "pz"))
    specs = (HaloSpec("px", 1, True), HaloSpec("py", 1, True),
             HaloSpec("pz", 1, True))
    jd = {k: jnp.asarray(v)[None, None, None] for k, v in binned.items()
          if k not in ("sx", "sy", "sz")}
    ja = jnp.asarray(alive)[None, None, None]

    def local(d, a):
        d = {k: v.reshape(v.shape[3:]) for k, v in d.items()}
        a = a.reshape(a.shape[3:])
        d, a, lost = migrate_cell_3d(d, a, specs, NX, NY, NZ, exact=exact)
        return ({k: v[None, None, None] for k, v in d.items()},
                a[None, None, None], lost.reshape(1, 1, 1))

    dspec = {k: P("px", "py", "pz") for k in jd}
    try:
        fn = shard_map(local, mesh=mesh,
                       in_specs=(dspec, P("px", "py", "pz")),
                       out_specs=(dspec, P("px", "py", "pz"),
                                  P("px", "py", "pz")),
                       check_vma=False)
    except TypeError:
        fn = shard_map(local, mesh=mesh,
                       in_specs=(dspec, P("px", "py", "pz")),
                       out_specs=(dspec, P("px", "py", "pz"),
                                  P("px", "py", "pz")),
                       check_rep=False)
    d2, a2, lost = fn(jd, ja)
    a2 = np.asarray(a2)[0, 0, 0]
    nlost = int(np.asarray(lost).ravel()[0])
    if exact:
        assert nlost == 0
    else:
        assert nlost <= max(2, n // 50)
    assert a2.sum() == n - nlost
    for coord, L in (("x", NX), ("y", NY), ("z", NZ)):
        v = np.asarray(d2[coord])[0, 0, 0]
        shp = [1, 1, 1]
        shp["xyz".index(coord)] = L
        idx = np.arange(L).reshape([1] + shp)
        d = (v - idx)[a2]
        assert (d >= -0.5).all() and (d < 0.5).all(), coord

    def wrap(v, L):
        return (v + 0.5) % L - 0.5
    got = np.sort(wrap(np.asarray(d2["x"])[0, 0, 0][a2], NX))
    want = np.sort(wrap(np.asarray(binned["x"])[alive], NX))
    if nlost == 0:
        np.testing.assert_allclose(got, want, atol=1e-12)
    else:
        # collisions MERGE (weight-conserving) rather than drop: merged
        # positions are weight-averaged, so check conservation instead
        lead = (0,) * (np.asarray(d2["w"]).ndim - a2.ndim)
        w2 = np.asarray(d2["w"])[lead]
        w0 = np.asarray(binned["w"])
        np.testing.assert_allclose(w2[a2].sum(), w0[alive].sum(),
                                   rtol=1e-12)
