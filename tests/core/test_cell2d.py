"""Cell-binned kernels (ops/cell2d.py) must reproduce the reference-layout
scatter/gather kernels exactly (reference interpolation/cpu2d.c,
current_deposit.h) — the stencil-offset-loop formulation is algebraically
the same sum, evaluated without random access."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lambdapic_tpu.ops.cell2d import (deposit_cell_2d, gather_cell_2d,
                                      migrate_cell_2d)
from lambdapic_tpu.ops.deposition import deposit_2d
from lambdapic_tpu.ops.interpolation import gather_eb_2d
from lambdapic_tpu.parallel.halo import HaloSpec

CAP, NX, NY, G = 8, 24, 16, 3


def _bin(x, y, extra=None):
    """Host binning of flat particles into the (cap, nx, ny) cell layout."""
    extra = extra or {}
    out = {k: np.zeros((CAP, NX, NY)) for k in ["x", "y"] + list(extra)}
    alive = np.zeros((CAP, NX, NY), bool)
    fill = np.zeros((NX, NY), int)
    ix = np.clip(np.floor(x + 0.5).astype(int), 0, NX - 1)
    iy = np.clip(np.floor(y + 0.5).astype(int), 0, NY - 1)
    for p in range(len(x)):
        i, j = ix[p], iy[p]
        s = fill[i, j]
        assert s < CAP, "test overfilled a cell"
        out["x"][i * 0 + s, i, j] = x[p]      # (s, i, j)
        out["y"][s, i, j] = y[p]
        for k, v in extra.items():
            out[k][s, i, j] = v[p]
        alive[s, i, j] = True
        fill[i, j] = s + 1
    return out, alive


def _flatten(binned, alive, keys):
    sel = alive.reshape(-1)
    return [binned[k].reshape(-1)[sel] for k in keys]


def test_gather_cell_matches_scatter():
    rng = np.random.default_rng(0)
    n = 300
    x = rng.uniform(-0.49, NX - 0.51, n)
    y = rng.uniform(-0.49, NY - 0.51, n)
    eb = jnp.asarray(rng.standard_normal((6, NX + 2 * G, NY + 2 * G)))

    ref = gather_eb_2d(*[eb[i] for i in range(6)],
                       jnp.asarray(x), jnp.asarray(y), G)

    binned, alive = _bin(x, y)
    out = gather_cell_2d(eb, jnp.asarray(binned["x"]),
                         jnp.asarray(binned["y"]), G)
    # compare per particle: match cell-layout entries back to flat order
    ix = np.floor(x + 0.5).astype(int)
    iy = np.floor(y + 0.5).astype(int)
    slot = {}
    fill = np.zeros((NX, NY), int)
    for p in range(n):
        slot[p] = (fill[ix[p], iy[p]], ix[p], iy[p])
        fill[ix[p], iy[p]] += 1
    for c in range(6):
        got = np.asarray(out[c])
        want = np.asarray(ref[c])
        for p in range(n):
            s, i, j = slot[p]
            np.testing.assert_allclose(got[s, i, j], want[p], rtol=1e-12,
                                       atol=1e-14, err_msg=f"comp {c} p {p}")


def test_deposit_cell_matches_scatter():
    rng = np.random.default_rng(1)
    n = 400
    x = rng.uniform(-0.49, NX - 0.51, n)
    y = rng.uniform(-0.49, NY - 0.51, n)
    u = rng.standard_normal((3, n))
    ig = 1.0 / np.sqrt(1 + (u**2).sum(0))
    w = rng.uniform(0.2, 1.0, n)
    kw = dict(q=-1.6e-19, dx=1e-6, dy=1e-6, dt=2.2e-15)

    j4 = deposit_2d(jnp.asarray(x), jnp.asarray(y), *map(jnp.asarray, u),
                    jnp.asarray(ig), jnp.asarray(w), nx_loc=NX, ny_loc=NY,
                    g=G, **kw)
    ref = np.asarray(jnp.stack(j4, axis=0))

    binned, alive = _bin(x, y, {"ux": u[0], "uy": u[1], "uz": u[2],
                                "ig": ig, "w": w})
    wb = jnp.asarray(np.where(alive, binned["w"], 0.0))
    out = deposit_cell_2d(jnp.asarray(binned["x"]), jnp.asarray(binned["y"]),
                          jnp.asarray(binned["ux"]), jnp.asarray(binned["uy"]),
                          jnp.asarray(binned["uz"]),
                          jnp.asarray(np.where(alive, binned["ig"], 1.0)),
                          wb, g=G, **kw)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-10,
                               atol=scale * 1e-12)


@pytest.mark.parametrize("exact", [True, False])
def test_migrate_cell_rebins(exact):
    from jax.sharding import Mesh, PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    rng = np.random.default_rng(2)
    n = 200
    x = rng.uniform(0.0, NX - 1.0, n)
    y = rng.uniform(0.0, NY - 1.0, n)
    binned, alive = _bin(x, y, {"w": np.ones(n), "inv_gamma": np.ones(n),
                                "ux": np.zeros(n), "uy": np.zeros(n),
                                "uz": np.zeros(n)})
    # push off-cell by up to ~0.7 cells
    shift = rng.uniform(-0.7, 0.7, (2, n))
    sb, _ = _bin(x, y, {"sx": shift[0], "sy": shift[1]})
    binned["x"] = binned["x"] + sb["sx"] * alive
    binned["y"] = binned["y"] + sb["sy"] * alive

    mesh = Mesh(np.asarray(jax.devices()[:1], dtype=object).reshape(1, 1),
                ("px", "py"))
    specs = (HaloSpec("px", 1, True), HaloSpec("py", 1, True))
    jd = {k: jnp.asarray(v)[None, None] for k, v in binned.items()
          if k not in ("sx", "sy")}
    ja = jnp.asarray(alive)[None, None]

    def local(d, a):
        d = {k: v.reshape(v.shape[2:]) for k, v in d.items()}
        a = a.reshape(a.shape[2:])
        d, a, lost = migrate_cell_2d(d, a, specs, NX, NY, exact=exact)
        return ({k: v[None, None] for k, v in d.items()}, a[None, None],
                lost.reshape(1, 1))

    dspec = {k: P("px", "py") for k in jd}
    fn = shard_map(local, mesh=mesh, in_specs=(dspec, P("px", "py")),
                   out_specs=(dspec, P("px", "py"), P("px", "py")),
                   check_vma=False)
    d2, a2, lost = fn(jd, ja)
    a2 = np.asarray(a2)[0, 0]
    nlost = int(np.asarray(lost).ravel()[0])
    if exact:
        assert nlost == 0          # lossless while cells stay within cap
    else:
        # fast overwrite-merge: rare positional collisions are counted
        assert nlost <= max(2, n // 50)
    assert a2.sum() == n - nlost
    x2 = np.asarray(d2["x"])[0, 0]
    y2 = np.asarray(d2["y"])[0, 0]
    ii = np.broadcast_to(np.arange(NX)[None, :, None], x2.shape)
    jj = np.broadcast_to(np.arange(NY)[None, None, :], y2.shape)
    dx = (x2 - ii)[a2]
    dy = (y2 - jj)[a2]
    assert (dx >= -0.5).all() and (dx < 0.5).all()
    assert (dy >= -0.5).all() and (dy < 0.5).all()

    def wrap(v, L):
        return (v + 0.5) % L - 0.5
    got = np.sort(wrap(x2[a2], NX))
    want = np.sort(wrap(np.asarray(binned["x"])[alive], NX))
    if nlost == 0:
        np.testing.assert_allclose(got, want, atol=1e-12)
    else:
        # collisions MERGE (weight-conserving) rather than drop: merged
        # positions are weight-averaged, so check conservation instead
        w2 = np.asarray(d2["w"])[0, 0]
        w0 = np.asarray(binned["w"])
        np.testing.assert_allclose(w2[a2].sum(), w0[alive].sum(),
                                   rtol=1e-12)


@pytest.mark.parametrize("exact", [True, False])
def test_migrate_overflow_merges_conserving_charge_momentum(exact):
    """Capacity overflow merges particles instead of dropping them
    (VERDICT r1 item 4): sum(w) and sum(w*u) are conserved exactly even
    when a cell receives more particles than it can hold."""
    from jax.sharding import Mesh, PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    cap = 4
    nx, ny = 8, 8
    rng = np.random.default_rng(7)
    data = {k: np.zeros((cap, nx, ny)) for k in
            ("x", "y", "w", "ux", "uy", "uz", "inv_gamma")}
    alive = np.zeros((cap, nx, ny), bool)
    # cell (5,5): full with 4 stationary particles
    for s in range(cap):
        data["x"][s, 5, 5] = 5.0 + rng.uniform(-0.3, 0.3)
        data["y"][s, 5, 5] = 5.0
        data["w"][s, 5, 5] = 1.0 + s
        data["ux"][s, 5, 5] = rng.normal() * 0.1
        alive[s, 5, 5] = True
    # cell (6,5): 3 particles that have moved into cell 5's range
    for s in range(3):
        data["x"][s, 6, 5] = 5.3 + 0.05 * s       # floor(x+.5)=5 -> out_lo
        data["y"][s, 6, 5] = 5.0
        data["w"][s, 6, 5] = 10.0 + s
        data["ux"][s, 6, 5] = -1.0
        alive[s, 6, 5] = True
    data["inv_gamma"][:] = 1.0

    w0 = data["w"][alive].sum()
    pux0 = (data["w"] * data["ux"])[alive].sum()
    puy0 = (data["w"] * data["uy"])[alive].sum()
    n0 = alive.sum()

    mesh = Mesh(np.asarray(jax.devices()[:1], dtype=object).reshape(1, 1),
                ("px", "py"))
    specs = (HaloSpec("px", 1, True), HaloSpec("py", 1, True))
    jd = {k: jnp.asarray(v)[None, None] for k, v in data.items()}
    ja = jnp.asarray(alive)[None, None]

    def local(d, a):
        d = {k: v.reshape(v.shape[2:]) for k, v in d.items()}
        a = a.reshape(a.shape[2:])
        d, a, lost = migrate_cell_2d(d, a, specs, nx, ny, exact=exact)
        return ({k: v[None, None] for k, v in d.items()}, a[None, None],
                lost.reshape(1, 1))

    dspec = {k: P("px", "py") for k in jd}
    fn = shard_map(local, mesh=mesh, in_specs=(dspec, P("px", "py")),
                   out_specs=(dspec, P("px", "py"), P("px", "py")),
                   check_vma=False)
    d2, a2, lost = fn(jd, ja)
    a2 = np.asarray(a2)[0, 0]
    nm = int(np.asarray(lost).ravel()[0])
    w2 = np.asarray(d2["w"])[0, 0]
    ux2 = np.asarray(d2["ux"])[0, 0]
    uy2 = np.asarray(d2["uy"])[0, 0]
    assert nm == 3, f"expected 3 merges, counted {nm}"
    assert a2.sum() == n0 - nm
    np.testing.assert_allclose(w2[a2].sum(), w0, rtol=1e-12)
    np.testing.assert_allclose((w2 * ux2)[a2].sum(), pux0, rtol=1e-12)
    np.testing.assert_allclose((w2 * uy2)[a2].sum(), puy0, atol=1e-12)
    # merged particles stay inside their home cell
    x2 = np.asarray(d2["x"])[0, 0]
    ii = np.broadcast_to(np.arange(nx)[None, :, None], x2.shape)
    assert (np.abs((x2 - ii))[a2] < 0.5 + 1e-12).all()
