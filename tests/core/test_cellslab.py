"""Slab megakernel (ops/cellslab.py) == per-stage pipeline parity.

The unified kernel must reproduce the split path — migrate_cells_fused
+ fused_push_cell + deposit_cell_pallas + fold — slot-for-slot: same
5-way-key overwrite-merge re-binning, same gather/Boris/Esirkepov
closed forms. Mirrors the reference criterion that the unified pusher
equals the split stages (reference unified_pusher_2d.c vs the separate
interpolation/push/deposit kernels).

Function-level comparisons (not full Simulations): the interpret-mode
megakernel inside a 2-species full_step makes XLA CPU compilation
pathologically slow, so each case jits one species stage per side.
"""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lambdapic_tpu.parallel.halo import HaloSpec

try:
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
except ImportError:
    from jax.experimental.shard_map import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_rep=False)


Q, M, DT = -1.602e-19, 9.109e-31, 1.1e-16
DX = 5e-8   # c*dt/dx ~ 0.66


def make_inputs(dim, cap, cells, n_frac=0.4, seed=0, spread=0.95):
    """Random cell-binned state with |delta| up to ``spread`` (covers
    migration in every direction) and random fields."""
    rng = np.random.default_rng(seed)
    shape = (cap,) + cells
    g = 2

    def mk(lo, hi):
        return rng.uniform(lo, hi, shape)

    alive = rng.uniform(0, 1, shape) < n_frac
    pos = []
    for k in range(dim):
        idx = np.arange(cells[k]).reshape(
            [1] * (1 + k) + [cells[k]] + [1] * (dim - 1 - k))
        pos.append(mk(-spread / 2, spread / 2) + idx)
    u = [mk(-2, 2) for _ in range(3)]
    ig = 1 / np.sqrt(1 + sum(a**2 for a in u))
    data = {c: jnp.asarray(np.where(alive, p, 0.0))
            for c, p in zip(("x", "y", "z")[:dim], pos)}
    data.update({f"u{c}": jnp.asarray(np.where(alive, a, 0.0))
                 for c, a in zip("xyz", u)})
    data["inv_gamma"] = jnp.asarray(np.where(alive, ig, 1.0))
    data["w"] = jnp.asarray(np.where(alive, mk(0.5, 1.5), 0.0))
    data["id_lo"] = jnp.asarray(
        rng.integers(0, 1 << 24, shape), jnp.uint32)
    data["id_hi"] = jnp.zeros(shape, jnp.uint32)
    ebpad = jnp.asarray(rng.uniform(
        -5e11, 5e11, (6,) + tuple(c + 2 * g for c in cells)))
    return data, jnp.asarray(alive), ebpad, g


def split_ref(eb_pad, data, alive, plan, g, deltas):
    """The per-stage pipeline exactly as step.py composes it (fused
    path): push_position (XLA) -> migrate_cells_fused ->
    fused_push(do_pos1=False) -> where(w) -> deposit -> (jpad)."""
    from lambdapic_tpu.constants import c as c_light
    from lambdapic_tpu.ops.pusher import (push_position_2d,
                                          push_position_3d)
    from lambdapic_tpu.ops.cellpallas import (
        migrate_cells_fused, fused_push_cell_2d, fused_push_cell_3d,
        deposit_cell_2d_pallas, deposit_cell_3d_pallas, block_occupancy)

    ndim = len(plan)
    data = dict(data)
    cdt2 = [c_light * DT / d / 2 for d in deltas]
    ig0 = data["inv_gamma"]
    if ndim == 2:
        data["x"], data["y"] = push_position_2d(
            data["x"], data["y"], data["ux"], data["uy"], ig0, *cdt2)
    else:
        data["x"], data["y"], data["z"] = push_position_3d(
            data["x"], data["y"], data["z"], data["ux"], data["uy"],
            data["uz"], ig0, *cdt2)
    data, alive, n_lost = migrate_cells_fused(data, alive, plan,
                                              recompute_ig=True)
    coords = ("x", "y", "z")[:ndim]
    pos = [data[c] for c in coords]
    occ = block_occupancy(alive)
    if ndim == 2:
        outs = fused_push_cell_2d(eb_pad, *pos, data["ux"], data["uy"],
                                  data["uz"], q=Q, m=M, dt=DT,
                                  dx=deltas[0], dy=deltas[1], g=g,
                                  do_pos1=False, occ=occ)
        pos, (ux, uy, uz), ig = outs[:2], outs[2:5], outs[5]
    else:
        outs = fused_push_cell_3d(eb_pad, *pos, data["ux"], data["uy"],
                                  data["uz"], q=Q, m=M, dt=DT,
                                  dx=deltas[0], dy=deltas[1],
                                  dz=deltas[2], g=g, do_pos1=False,
                                  occ=occ)
        pos, (ux, uy, uz), ig = outs[:3], outs[3:6], outs[6]
    w = jnp.where(alive, data["w"], 0.0)
    if ndim == 2:
        jpad = deposit_cell_2d_pallas(pos[0], pos[1], ux, uy, uz, ig, w,
                                      q=Q, dx=deltas[0], dy=deltas[1],
                                      dt=DT, g=g,
                                      occ=block_occupancy(alive))
    else:
        jpad = deposit_cell_3d_pallas(*pos, ux, uy, uz, ig, w, q=Q,
                                      dx=deltas[0], dy=deltas[1],
                                      dz=deltas[2], dt=DT, g=g,
                                      occ=block_occupancy(alive))
    for c, p in zip(coords, pos):
        data[c] = p
    data.update(ux=ux, uy=uy, uz=uz, inv_gamma=ig)
    return data, alive, n_lost, jpad


def slab(eb_pad, data, alive, plan, g, deltas):
    from lambdapic_tpu.ops.cellslab import slab_species_step
    return slab_species_step(eb_pad, dict(data), alive, plan, q=Q, m=M,
                             dt=DT, deltas=deltas, g=g)


def _canon_slots(d, alive):
    """Reorder each cell's slot column by (dead, id_lo): slot order has
    no physical meaning and the packed/unpacked tails differ by a
    within-cell permutation only."""
    alive = np.asarray(alive)
    key = (~alive).astype(np.int64) * (1 << 40) \
        + np.asarray(d["id_lo"]).astype(np.int64)
    order = np.argsort(key, axis=0, kind="stable")
    out = {k: np.take_along_axis(np.asarray(v), order, axis=0)
           for k, v in d.items()}
    return out, np.take_along_axis(alive, order, axis=0)


def _compare(dim, periodic=True, mesh_x=1, cap=4, cells=None, seed=0,
             n_frac=0.4, mesh_shape=None):
    cells = cells or ((16, 16) if dim == 2 else (8, 8, 8))
    deltas = (DX,) * dim
    names = ("px", "py", "pz")[:dim]
    mesh_shape = mesh_shape or ((mesh_x,) + (1,) * (dim - 1))
    ndev = int(np.prod(mesh_shape))
    mesh = Mesh(np.array(jax.devices()[:ndev]).reshape(mesh_shape),
                names)
    specs = tuple(HaloSpec(nm, mesh_shape[k], periodic)
                  for k, nm in enumerate(names))
    glob = tuple(cells[k] * mesh_shape[k] for k in range(dim))
    plan = tuple((cells[k], specs[k], ("x", "y", "z")[k])
                 for k in range(dim))
    data, alive, ebpad, g = make_inputs(dim, cap, glob, seed=seed,
                                        n_frac=n_frac)
    # positions are DEVICE-LOCAL cell units: localize every split coord
    pspec = P(None, *names)

    def localize(d):
        d = dict(d)
        for k, c in enumerate(("x", "y", "z")[:dim]):
            if mesh_shape[k] > 1:
                d[c] = d[c] - (jax.lax.axis_index(names[k])
                               * cells[k]).astype(d[c].dtype)
        return d

    jspec = P(None, *names)
    results = []
    for fn in (split_ref, slab):
        def run(eb, d, al):
            d2, al2, nl, jpad = fn(eb, localize(d), al, plan, g, deltas)
            return d2, al2, jnp.reshape(nl, (1,) * dim), jpad

        jf = jax.jit(shard_map(
            run, mesh,
            in_specs=(P(), {k: pspec for k in data}, pspec),
            out_specs=({k: pspec for k in data}, pspec, P(*names),
                       jspec)))
        d2, al2, nl, jpad = jf(ebpad, data, alive)
        results.append((jax.device_get(d2), np.asarray(al2),
                        int(np.asarray(nl).sum()), np.asarray(jpad)))

    (dr, ar, lr, jr), (ds, as_, ls, js) = results
    # the slab's rows mode front-packs alive slots per cell (a pure
    # within-cell slot permutation): canonicalize BOTH sides by
    # (dead, id_lo) before slot-for-slot comparison
    dr, ar = _canon_slots(dr, ar)
    ds, as_ = _canon_slots(ds, as_)
    np.testing.assert_array_equal(as_, ar)
    assert ls == lr
    for k in dr:
        if k in ("id_lo", "id_hi"):
            np.testing.assert_array_equal(
                np.asarray(ds[k])[as_], np.asarray(dr[k])[ar],
                err_msg=k)
        else:
            a, b = np.asarray(ds[k]), np.asarray(dr[k])
            np.testing.assert_allclose(a[as_], b[ar], rtol=1e-11,
                                       atol=1e-300, err_msg=k)
    # jpad folded along x only on the slab side vs per-block rims on the
    # split side — compare summed physics
    scale = np.abs(jr).max() + 1e-30
    np.testing.assert_allclose(js, jr, atol=1e-12 * scale)


def _compare_photon(dim, periodic=True, cap=4, seed=0, n_frac=0.4):
    """Field-free photon slab mode (merge + 1/|u| + half push) vs the
    per-stage photon sequence (p1 push -> migrate_cells_fused ->
    photon_push -> p2 push; reference core/pusher/photon.py:5-11)."""
    from lambdapic_tpu.constants import c as c_light
    from lambdapic_tpu.ops.pusher import (photon_push, push_position_2d,
                                          push_position_3d)
    from lambdapic_tpu.ops.cellpallas import migrate_cells_fused
    from lambdapic_tpu.ops.cellslab import slab_species_step

    cells = (16, 16) if dim == 2 else (8, 8, 8)
    deltas = (DX,) * dim
    names = ("px", "py", "pz")[:dim]
    mesh = Mesh(np.array(jax.devices()[:1]).reshape((1,) * dim), names)
    specs = tuple(HaloSpec(nm, 1, periodic) for nm in names)
    plan = tuple((cells[k], specs[k], ("x", "y", "z")[k])
                 for k in range(dim))
    data, alive, ebpad, g = make_inputs(dim, cap, cells, seed=seed,
                                        n_frac=n_frac)
    coords = ("x", "y", "z")[:dim]
    cdt2 = [c_light * DT / d / 2 for d in deltas]

    def ref(eb, d, al):
        d = dict(d)
        ig0 = d["inv_gamma"]
        if dim == 2:
            d["x"], d["y"] = push_position_2d(
                d["x"], d["y"], d["ux"], d["uy"], ig0, *cdt2)
        else:
            d["x"], d["y"], d["z"] = push_position_3d(
                d["x"], d["y"], d["z"], d["ux"], d["uy"], d["uz"],
                ig0, *cdt2)
        d, al, nl = migrate_cells_fused(d, al, plan, recompute_ig=False)
        ig = photon_push(d["ux"], d["uy"], d["uz"])
        pos = [d[c] for c in coords]
        if dim == 2:
            pos = push_position_2d(*pos, d["ux"], d["uy"], ig, *cdt2)
        else:
            pos = push_position_3d(*pos, d["ux"], d["uy"], d["uz"],
                                   ig, *cdt2)
        for c, p in zip(coords, pos):
            d[c] = p
        d["inv_gamma"] = jnp.where(al, ig, d["inv_gamma"] * 0 + 1.0)
        return d, al, jnp.reshape(nl, (1,) * dim)

    def slab_ph(eb, d, al):
        d, al, nl, jp = slab_species_step(
            eb, dict(d), al, plan, q=0.0, m=0.0, dt=DT, deltas=deltas,
            g=g, photon=True)
        assert jp is None
        return d, al, jnp.reshape(nl, (1,) * dim)

    pspec = P(None, *names)
    results = []
    for fn in (ref, slab_ph):
        jf = jax.jit(shard_map(
            fn, mesh,
            in_specs=(P(), {k: pspec for k in data}, pspec),
            out_specs=({k: pspec for k in data}, pspec, P(*names))))
        d2, al2, nl = jf(ebpad, data, alive)
        results.append((jax.device_get(d2), np.asarray(al2),
                        int(np.asarray(nl).sum())))

    (dr, ar, lr), (ds, as_, ls) = results
    dr, ar = _canon_slots(dr, ar)
    ds, as_ = _canon_slots(ds, as_)
    np.testing.assert_array_equal(as_, ar)
    assert ls == lr
    for k in dr:
        a, b = np.asarray(ds[k]), np.asarray(dr[k])
        if k in ("id_lo", "id_hi"):
            np.testing.assert_array_equal(a[as_], b[ar], err_msg=k)
        else:
            np.testing.assert_allclose(a[as_], b[ar], rtol=1e-11,
                                       atol=1e-300, err_msg=k)


def test_slab_photon_eligibility():
    """Plain photon species is slab-eligible; a photon species with QED
    pair production is not (chi needs the gather)."""
    from lambdapic_tpu.ops.cellslab import slab_reject_reason
    from lambdapic_tpu.simulation.step import SpeciesStatic

    sw = dict(maxwell=True, pusher=True, current_deposition=True,
              qed=True, collisions=True, interpolation=True,
              migration=True, species_block=True)
    plan = ((768, HaloSpec("px", 1, False), "x"),
            (768, HaloSpec("py", 1, False), "y"))
    sp = SpeciesStatic(name="photon", q=0.0, m=0.0, pusher="photon",
                       cap=16, migration_buf=16, tile_cap=16)
    assert slab_reject_reason(plan, (768, 768), 16, sw, sp, "fast",
                              False, False) is None
    assert slab_reject_reason(plan, (768, 768), 16, sw, sp, "fast",
                              True, False) is not None


def test_slab_photon_2d():
    _compare_photon(2, seed=8)


def test_slab_photon_3d():
    _compare_photon(3, seed=9)


def test_slab_photon_2d_open():
    _compare_photon(2, periodic=False, seed=10)


def test_slab_2d_periodic():
    _compare(2)


def test_slab_2d_open():
    _compare(2, periodic=False, seed=1)


def test_slab_3d_periodic():
    _compare(3, seed=2)


def test_slab_3d_open():
    _compare(3, periodic=False, seed=3)


def test_slab_2d_merges():
    # cap 2 + dense occupancy: overwrite-merge slot collisions
    _compare(2, cap=2, n_frac=0.9, seed=4)


def test_slab_2d_multidevice_x():
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    _compare(2, mesh_x=2, seed=5)


def test_slab_engages_in_simulation():
    """End-to-end wiring: a tiny cell-engine Simulation with the pallas
    backend must route through slab_species_step and run."""
    from lambdapic_tpu import Simulation, Species
    from lambdapic_tpu.core.species import _ALL_SPECIES
    from lambdapic_tpu.ops import cellslab

    _ALL_SPECIES.clear()
    calls = []
    orig = cellslab.slab_species_step

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    cellslab.slab_species_step = spy
    try:
        ele = Species(name="e", charge=-1, mass=1.0)
        bc = {k: "periodic" for k in ("xmin", "xmax", "ymin", "ymax")}
        sim = Simulation(nx=8, ny=8, dx=1e-6, dy=1e-6, npatch_x=1,
                         npatch_y=1, boundary_conditions=bc,
                         precision="double", random_seed=3,
                         tiling="cell", tiling_backend="pallas")
        sim.add_species([ele])
        sim.initialize()
        rng = np.random.default_rng(11)
        n = 20
        coords = {c: rng.uniform(0, 8e-6 * 0.999, n) - 0.49e-6
                  for c in ("x", "y")}
        attrs = {"w": np.ones(n) * 1e6, "ux": rng.normal(size=n),
                 "uy": rng.normal(size=n), "uz": rng.normal(size=n)}
        attrs["inv_gamma"] = 1 / np.sqrt(
            1 + attrs["ux"]**2 + attrs["uy"]**2 + attrs["uz"]**2)
        sim.set_particles_global(0, coords, attrs)
        sim.run(nsteps=1)
        assert calls
        p = sim.get_particles(0)
        assert np.isfinite(p["x"]).all()
    finally:
        cellslab.slab_species_step = orig
        _ALL_SPECIES.clear()


@pytest.mark.parametrize("dim,periodic,mesh_x", [
    (2, True, 1), (2, False, 1), (2, True, 2), (2, False, 2),
    (3, True, 2), (3, False, 2), (2, True, 4),
])
def test_fold_reduce_slab_matches_xla_pair(dim, periodic, mesh_x):
    """fold_reduce_slab (one Pallas pass) == _fold_cfirst + halo_reduce
    on random rim panels: same overlap-add, same cross-device x strips,
    same periodic/open guard folds on every axis (reference
    sync_currents, patch/sync_fields2d.c:77-84)."""
    from lambdapic_tpu.ops.cellpallas import _fold_cfirst
    from lambdapic_tpu.ops.cellslab import fold_reduce_slab, slab_bx

    g = 2
    nloc = (16, 12) if dim == 2 else (8, 8, 6)
    b = slab_bx(nloc[0], dim)
    nbx = nloc[0] // b
    names = ("px", "py", "pz")[:dim]
    mesh = Mesh(np.array(jax.devices()[:mesh_x]).reshape(
        (mesh_x,) + (1,) * (dim - 1)), names)
    specs = tuple(HaloSpec(nm, mesh_x if k == 0 else 1, periodic)
                  for k, nm in enumerate(names))
    pads = tuple(n + 2 * g for n in nloc[1:])
    rng = np.random.default_rng(dim * 10 + mesh_x)
    rims = jnp.asarray(rng.normal(
        size=(mesh_x, 4, nbx, b + 4) + pads))
    rspec = P("px", None, None, *([None] * dim))

    def ref(r):
        r = r[0]
        jpad = _fold_cfirst(r, nloc[0], g, b)
        return halo_reduce(jpad, g, tuple(range(1, 1 + dim)), specs)

    def fast(r):
        return fold_reduce_slab(r[0], nloc=nloc, g=g, spec0=specs[0],
                                periodic=tuple(s.periodic for s in specs))

    from lambdapic_tpu.parallel.halo import halo_reduce  # noqa: F811
    ospec = P("px", *([None] * dim))
    out_r, out_f = [np.asarray(jax.jit(shard_map(
        f, mesh, in_specs=(rspec,),
        out_specs=ospec))(rims)) for f in (ref, fast)]
    np.testing.assert_allclose(out_f, out_r, rtol=1e-12,
                               atol=1e-13 * np.abs(out_r).max())


def test_slab_qed_chi_matches_split():
    """want_chi: the in-kernel quantum parameter must equal
    calculate_chi on the split path's gathered fields + post-migration
    pre-push momenta (reference inline.py:5-13 at the _qed stage)."""
    from lambdapic_tpu.constants import c as c_light
    from lambdapic_tpu.models.qed import calculate_chi
    from lambdapic_tpu.ops.pusher import push_position_2d
    from lambdapic_tpu.ops.cellpallas import (migrate_cells_fused,
                                              fused_push_cell_2d,
                                              block_occupancy)
    from lambdapic_tpu.ops.cellslab import slab_species_step

    dim, cap, cells = 2, 4, (16, 16)
    deltas = (DX,) * dim
    mesh = Mesh(np.array(jax.devices()[:1]).reshape((1, 1)), ("px", "py"))
    specs = (HaloSpec("px", 1, True), HaloSpec("py", 1, True))
    plan = tuple((cells[k], specs[k], ("x", "y")[k]) for k in range(dim))
    data, alive, ebpad, g = make_inputs(dim, cap, cells, seed=9)
    shape = (cap,) + cells
    rng = np.random.default_rng(10)
    # QED per-particle state rides the merge as ordinary payloads
    data["tau"] = jnp.asarray(rng.uniform(0.1, 2.0, shape))
    data["delta"] = jnp.zeros(shape)
    data["event"] = jnp.zeros(shape)

    def split_side(eb, d, al):
        d = dict(d)
        cdt2 = [c_light * DT / dd / 2 for dd in deltas]
        d["x"], d["y"] = push_position_2d(
            d["x"], d["y"], d["ux"], d["uy"], d["inv_gamma"], *cdt2)
        d, al, _ = migrate_cells_fused(d, al, plan, recompute_ig=True)
        outs = fused_push_cell_2d(
            eb, d["x"], d["y"], d["ux"], d["uy"], d["uz"], q=Q, m=M,
            dt=DT, dx=deltas[0], dy=deltas[1], g=g, want_eb=True,
            do_pos1=False, occ=block_occupancy(al))
        ebs = outs[6:]
        chi = calculate_chi(*ebs, d["ux"], d["uy"], d["uz"],
                            d["inv_gamma"])
        return chi, d["inv_gamma"], al

    def slab_side(eb, d, al):
        d2, al2, _, _, (chi, ig0) = slab_species_step(
            eb, dict(d), al, plan, q=Q, m=M, dt=DT, deltas=deltas, g=g,
            want_chi=True)
        return chi, ig0, al2

    results = []
    for fn in (split_side, slab_side):
        jf = jax.jit(shard_map(
            fn, mesh,
            in_specs=(P(), {k: P(None, "px") for k in data},
                      P(None, "px")),
            out_specs=(P(None, "px"), P(None, "px"), P(None, "px"))))
        chi, ig0, al2 = jf(ebpad, data, alive)
        results.append((np.asarray(chi), np.asarray(ig0),
                        np.asarray(al2)))

    (cr, ir, ar), (cs, is_, as_) = results
    np.testing.assert_array_equal(as_, ar)
    np.testing.assert_allclose(cs[as_], cr[ar], rtol=1e-10,
                               atol=1e-300, err_msg="chi")
    np.testing.assert_allclose(is_[as_], ir[ar], rtol=1e-12,
                               err_msg="ig_pre")
    assert (cs[as_] > 0).any(), "test fields produced no finite chi"


def test_slab_qed_engages_and_emits():
    """End-to-end: a radiating electron species under the pallas cell
    engine routes through the slab kernel WITH want_chi and emits
    photons when chi is driven high."""
    from lambdapic_tpu import Electron, Photon, Simulation
    from lambdapic_tpu.core.species import _ALL_SPECIES
    from lambdapic_tpu.ops import cellslab

    _ALL_SPECIES.clear()
    seen = []
    orig = cellslab.slab_species_step

    def spy(*a, **k):
        seen.append(k.get("want_chi", False))
        return orig(*a, **k)

    cellslab.slab_species_step = spy
    try:
        pho = Photon()
        ele = Electron(density=lambda x, y: 1e27, ppc=2,
                       radiation="photons")
        ele.set_photon(pho)
        bc = {k: "periodic" for k in ("xmin", "xmax", "ymin", "ymax")}
        sim = Simulation(nx=8, ny=8, dx=1e-6, dy=1e-6, npatch_x=1,
                         npatch_y=1, boundary_conditions=bc,
                         precision="double", random_seed=3,
                         tiling="cell", tiling_backend="pallas",
                         n_guard=2)
        sim.add_species([ele, pho])
        sim.initialize()
        # drive chi into the emitting range: hot electrons in a huge B
        p = sim.state.particles[0]
        ux = jnp.where(p.alive, 5e3, 0.0)
        ig = jnp.where(p.alive, 1.0 / jnp.sqrt(1 + ux**2), 1.0)
        sim.state = sim.state.replace(particles=(
            p.replace(data={**p.data, "ux": ux, "inv_gamma": ig}),
        ) + sim.state.particles[1:])
        sim.set_field("by", np.full((8, 8), 4e5))
        sim.run(nsteps=2)
        assert any(seen), "slab never engaged for the QED species"
        assert seen[0] is True, "slab engaged without want_chi"
        n_photons = int(np.asarray(sim.state.particles[1].alive).sum())
        assert n_photons > 0, "no photons emitted at chi >> 1"
        assert np.isfinite(sim.get_particles(0)["ux"]).all()
    finally:
        cellslab.slab_species_step = orig
        _ALL_SPECIES.clear()


def test_slab_3d_rows_on(monkeypatch):
    """Row-gated tail + packing in 3D (opt-in; default is the cap-wide
    tail, see rows_mode_enabled)."""
    monkeypatch.setenv("LAMBDAPIC_SLAB_ROWS", "1")
    _compare(3, seed=2)


def test_slab_3d_rows_chunked(monkeypatch):
    """y-chunked row bounds (LAMBDAPIC_SLAB_ROWS=chunk:BY): the tail
    runs per BY-row y-chunk with its own packed-occupancy bound; static
    y windows into the gather/deposit slices must stay slot-for-slot
    equal to the per-stage pipeline across chunk boundaries."""
    monkeypatch.setenv("LAMBDAPIC_SLAB_ROWS", "chunk:8")
    _compare(3, seed=6, cells=(8, 16, 8))


def test_slab_3d_rows_chunked_open(monkeypatch):
    monkeypatch.setenv("LAMBDAPIC_SLAB_ROWS", "chunk:8")
    _compare(3, periodic=False, seed=7, cells=(8, 16, 8))


def test_slab_2d_rows_on(monkeypatch):
    """Row-gated tail + packing in 2D (off by default there)."""
    monkeypatch.setenv("LAMBDAPIC_SLAB_ROWS", "1")
    _compare(2, seed=1)


def test_slab_2d_rows_on_merges(monkeypatch):
    monkeypatch.setenv("LAMBDAPIC_SLAB_ROWS", "1")
    _compare(2, cap=2, n_frac=0.9, seed=4)


def test_slab_3d_multidispatch_ysplit():
    """y-split 3D mesh: the multi-dispatch slab path (x dispatch ->
    ppermuted y edges -> y/z+tail dispatch) must match the per-stage
    pipeline, including corner movers that cross x AND the y device
    boundary in one step."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    _compare(3, mesh_shape=(1, 2, 1), seed=6, cells=(8, 8, 8))


def test_slab_3d_multidispatch_yzsplit():
    """Fully split 3D mesh (x, y and z): three slab dispatches chained
    by edge ppermutes."""
    if len(jax.devices()) < 8:
        pytest.skip("needs >=8 devices")
    _compare(3, mesh_shape=(2, 2, 2), seed=7, cells=(8, 8, 8),
             periodic=True)


def test_slab_3d_streamed(monkeypatch):
    """Streamed-tap tail (LAMBDAPIC_SLAB_STREAM=2): gather+Boris+
    deposit run per static y-strip. Slot-for-slot and current parity
    with the per-stage pipeline, including particles whose stencil
    reaches across the strip boundary."""
    monkeypatch.setenv("LAMBDAPIC_SLAB_STREAM", "2")
    _compare(3, seed=2)


def test_slab_3d_streamed_open(monkeypatch):
    monkeypatch.setenv("LAMBDAPIC_SLAB_STREAM", "4")
    _compare(3, periodic=False, seed=3, cells=(8, 16, 8))


def test_slab_3d_streamed_qed_chi(monkeypatch):
    """chi/ig_pre outputs written per strip must equal the unstreamed
    kernel's."""
    monkeypatch.setenv("LAMBDAPIC_SLAB_STREAM", "2")
    test_slab_qed_chi_matches_split()


def test_slab_chain_rims_off(monkeypatch):
    """LAMBDAPIC_SLAB_CHAIN_RIMS=0 (XLA rims sum instead of chaining
    the running rims through the kernel) must be physics-identical —
    the switch exists because the chained ref's double-buffered VMEM
    window is the margin at bx=4 (docs/BENCH_LOCAL.md round 5)."""
    monkeypatch.setenv("LAMBDAPIC_SLAB_CHAIN_RIMS", "0")
    _compare(3, seed=2)
    test_slab_engages_in_simulation()


def test_slab_ok_round5_calibration(monkeypatch):
    """slab_ok anchors from the round-5 probes: with perm-merge +
    streamed tail at bx=1, cap 10 fits a 128 MB chip (measured: 890
    Mpush/s) while cap 12 register-spills to 1/3 the rate and must be
    rejected."""
    from lambdapic_tpu.ops.cellslab import slab_ok

    monkeypatch.setenv("LAMBDAPIC_SLAB_BX", "1")
    monkeypatch.setenv("LAMBDAPIC_SLAB_STREAM", "2")
    monkeypatch.setenv("LAMBDAPIC_SLAB_VMEM_MB", "140")
    assert slab_ok((128, 128, 128), 10)
    assert not slab_ok((128, 128, 128), 12)
    # legacy merge path keeps the conservative 1.7x model
    monkeypatch.setenv("LAMBDAPIC_SLAB_PERM_MERGE", "0")
    assert not slab_ok((128, 128, 128), 12)


def test_slab_stream_selection(monkeypatch):
    """slab_stream: forced values clamp to divisors of ny; auto engages
    only when the unstreamed tail estimate misses the budget."""
    from lambdapic_tpu.ops.cellslab import slab_stream

    monkeypatch.setenv("LAMBDAPIC_SLAB_STREAM", "4")
    assert slab_stream(3, 8, (128, 128, 128)) == 4
    monkeypatch.setenv("LAMBDAPIC_SLAB_STREAM", "3")
    assert slab_stream(3, 8, (128, 100, 128)) == 2   # 100 % 3 != 0
    monkeypatch.setenv("LAMBDAPIC_SLAB_STREAM", "0")
    monkeypatch.setenv("LAMBDAPIC_SLAB_VMEM_MB", "140")
    monkeypatch.setenv("LAMBDAPIC_SLAB_BX", "2")
    # cap 4 / bx 2 fits unstreamed -> stay at 1 (the fastest form)
    assert slab_stream(3, 4, (128, 128, 128)) == 1
    assert slab_stream(2, 16, (768, 768)) == 1       # 2D never streams
