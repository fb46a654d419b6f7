"""Per-piece TPU timings for the 3D cell-engine hot loop at bench shapes
(cap 4, 128^3 — the BASELINE laser-target-3d config). Chain-timed via
fori_loop inside a 1-device shard_map (the migration kernels need mesh
axis names). Run AFTER the test suite: host CPU contention corrupts the
dispatch timing (docs/BENCH_LOCAL.md measurement rules).

Usage: python docs/cellprof3d_tpu.py [occ_fill]
  occ_fill: fraction of cells containing particles (default 0.67 — the
  bench target fills x > Lx/3).
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from lambdapic_tpu.parallel.halo import HaloSpec
from lambdapic_tpu.ops.cellpallas import (
    fused_push_cell_3d, deposit_cell_3d_pallas, migrate_cells_fused,
    block_occupancy)

import os
CAP, NX, NY, NZ, G = (int(os.environ.get(k, d)) for k, d in
                     (("P_CAP", 4), ("P_NX", 128), ("P_NY", 128),
                      ("P_NZ", 128), ("P_G", 2)))
FILL = float(sys.argv[1]) if len(sys.argv) > 1 else 0.67
DT, DX = 1.1e-16, 5e-8
rng = np.random.default_rng(0)

mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1, 1),
            ("px", "py", "pz"))
SPECS = tuple(HaloSpec(n, 1, True) for n in ("px", "py", "pz"))


def mk(shape, lo=-0.45, hi=0.45, dtype=np.float32):
    return jnp.asarray(rng.uniform(lo, hi, shape), dtype)


shape = (CAP, NX, NY, NZ)
# occupied region: x-cells [ (1-FILL)*NX, NX ), 2 alive slots of 4
x = mk(shape) + np.arange(NX)[None, :, None, None]
y = mk(shape) + np.arange(NY)[None, None, :, None]
z = mk(shape) + np.arange(NZ)[None, None, None, :]
ux, uy, uz = mk(shape, -1, 1), mk(shape, -1, 1), mk(shape, -1, 1)
ig = 1.0 / jnp.sqrt(1 + ux**2 + uy**2 + uz**2)
cell_filled = (np.arange(NX) >= (1 - FILL) * NX)[None, :, None, None]
slot_on = (np.arange(CAP) < 2)[:, None, None, None]
alive_np = np.broadcast_to(cell_filled & slot_on, shape)
alive = jnp.asarray(alive_np)
w = jnp.where(alive, mk(shape, 0.5, 1.0), 0.0)
# ids as f32 here: the u32 payloads trip an XLA jellyfish fusion bug
# under the fori_loop chain wrapper (cost-equivalent for attribution)
idlo = jnp.asarray(rng.integers(0, 1 << 24, shape), jnp.float32)
idhi = jnp.zeros(shape, jnp.float32)
ebpad = mk((6, NX + 2 * G, NY + 2 * G, NZ + 2 * G), -1e11, 1e11)

n_alive = int(alive_np.sum())
print(f"backend={jax.default_backend()} fill={FILL} alive={n_alive/1e6:.2f}M"
      f" slots={CAP*NX*NY*NZ/1e6:.1f}M", flush=True)

DATA = dict(x=x, y=y, z=z, ux=ux, uy=uy, uz=uz, w=w, inv_gamma=ig,
            id_lo=idlo, id_hi=idhi)
ARGS = dict(DATA)
ARGS["alive"] = alive
ARGS["ebpad"] = ebpad


def chain(name, body, n_iter=8, n_push=n_alive):
    """body(args) -> scalar-ish array; chained through x."""
    def loop(a):
        def it(i, xx):
            a2 = dict(a)
            a2["x"] = xx
            s = body(a2)          # scalar (sum of every output)
            return xx + s.astype(xx.dtype) * 1e-30
        return lax.fori_loop(0, n_iter, it, a["x"])[0, 0, 0, 0]

    f = jax.jit(shard_map(loop, mesh=mesh,
                          in_specs=({k: P() for k in ARGS},),
                          out_specs=P(), check_rep=False))
    _ = np.asarray(f(ARGS))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(f(ARGS))
        best = min(best, time.perf_counter() - t0)
    ms = best / n_iter * 1e3
    print(f"{name:34s}: {ms:7.2f} ms  ({n_push / (best / n_iter) / 1e6:6.0f}"
          " Mpart/s)", flush=True)
    return ms


PLAN = ((NX, SPECS[0], "x"), (NY, SPECS[1], "y"), (NZ, SPECS[2], "z"))


def b_mig(a):
    data = {k: a[k] for k in DATA}
    d2, al2, nl = migrate_cells_fused(data, a["alive"], PLAN,
                                      recompute_ig=True)
    s = sum(jnp.sum(v) for k, v in d2.items()
            if v.dtype in (jnp.float32, jnp.float64))
    return s + jnp.sum(al2) * 1e-30 + nl


def b_push(a):
    occ = block_occupancy(a["alive"])
    outs = fused_push_cell_3d(a["ebpad"], a["x"], a["y"], a["z"], a["ux"],
                              a["uy"], a["uz"], q=-1.6e-19, m=9.1e-31,
                              dt=DT, dx=DX, dy=DX, dz=DX, g=G,
                              do_pos1=False, occ=occ)
    return sum(jnp.sum(o) for o in outs)


def b_push_noocc(a):
    outs = fused_push_cell_3d(a["ebpad"], a["x"], a["y"], a["z"], a["ux"],
                              a["uy"], a["uz"], q=-1.6e-19, m=9.1e-31,
                              dt=DT, dx=DX, dy=DX, dz=DX, g=G,
                              do_pos1=False, occ=None)
    return sum(jnp.sum(o) for o in outs)


def b_dep(a):
    occ = block_occupancy(a["alive"])
    jpad = deposit_cell_3d_pallas(a["x"], a["y"], a["z"], a["ux"], a["uy"],
                                  a["uz"], a["inv_gamma"], a["w"],
                                  q=-1.6e-19, dx=DX, dy=DX, dz=DX, dt=DT,
                                  g=G, occ=occ)
    return jnp.sum(jpad)


def b_dep_noocc(a):
    jpad = deposit_cell_3d_pallas(a["x"], a["y"], a["z"], a["ux"], a["uy"],
                                  a["uz"], a["inv_gamma"], a["w"],
                                  q=-1.6e-19, dx=DX, dy=DX, dz=DX, dt=DT,
                                  g=G, occ=None)
    return jnp.sum(jpad)


def b_halfpush(a):
    from lambdapic_tpu.ops.pusher import push_position_3d
    cdt = 3e8 * DT / DX
    x2, y2, z2 = push_position_3d(a["x"], a["y"], a["z"], a["ux"], a["uy"],
                                  a["uz"], a["inv_gamma"],
                                  cdt / 2, cdt / 2, cdt / 2)
    return jnp.sum(x2) + jnp.sum(y2) + jnp.sum(z2)


def b_sanitize(a):
    # the post-migration zero-sanitize + ig recompute as standalone XLA
    out = {}
    for k in ("x", "y", "z", "w", "ux", "uy", "uz"):
        out[k] = jnp.where(a["alive"], a[k], jnp.zeros_like(a[k]))
    igr = 1.0 / jnp.sqrt(1.0 + out["ux"]**2 + out["uy"]**2 + out["uz"]**2)
    return sum(jnp.sum(v) for v in out.values()) + jnp.sum(igr)


def b_ebwin(a):
    # K1's field-window extraction cost (it is inside fused_push's trace;
    # measured standalone here for attribution)
    from lambdapic_tpu.ops.cellpallas import _blocks3
    bx, by = _blocks3(NX, NY)
    nbx, nby = NX // bx, NY // by
    wx, wy = bx + 2 * G, by + 2 * G
    nzp = NZ + 2 * G
    rows = []
    for i in range(nbx):
        cols = [lax.slice(a["ebpad"], (0, i * bx, j * by, 0),
                          (6, i * bx + wx, j * by + wy, nzp))
                for j in range(nby)]
        rows.append(jnp.stack(cols))
    return jnp.sum(jnp.stack(rows))


def b_occ(a):
    return jnp.sum(block_occupancy(a["alive"]).astype(jnp.float32))


def b_strips(a):
    # strip extraction + wrap-fix + Mosaic relayout for all 3 axes (the
    # XLA prologue of migrate_cells_fused) — measures whether the
    # strided edge-column slices on tiled dims read full arrays
    from lambdapic_tpu.ops.cellpallas import (_axis_strips, _mig_blocks)
    tot = jnp.float32(0)
    names = [k for k in DATA if DATA[k].dtype == jnp.float32]
    for axis in range(3):
        cells = (NX, NY, NZ)
        bx, by = _mig_blocks(cells, axis)
        blk = ((bx, by) + (NZ,))[axis]
        for k in names:
            sl, sh = _axis_strips(a[k], axis, blk)
            s = jnp.moveaxis(sl, 1 + axis, 0)
            s = jnp.broadcast_to(s[..., None], s.shape + (8,))
            s2 = jnp.moveaxis(sh, 1 + axis, 0)
            s2 = jnp.broadcast_to(s2[..., None], s2.shape + (8,))
            tot = tot + jnp.sum(s) + jnp.sum(s2)
    return tot


def b_fold(a):
    # K2's overlap-add epilogue alone (rims-shaped input synthesized from
    # broadcasts so only the fold cost is measured)
    from lambdapic_tpu.ops.cellpallas import _fold_xy, _blocks3
    bx, by = _blocks3(NX, NY)
    nbx, nby = NX // bx, NY // by
    rims = jnp.broadcast_to(
        a["x"][0, 0, 0, 0],
        (nbx, nby, 4, bx + 4, by + 4, NZ + 2 * G)) + jnp.float32(1.0)
    return jnp.sum(_fold_xy(rims, NX, NY, G, bx, by))


def b_fieldpad(a):
    # one stacked 6-component halo pad (the step does this once per
    # field half-update; the Yee stencil itself is a similar-sized
    # elementwise pass)
    from lambdapic_tpu.parallel.halo import halo_pad
    eb = a["ebpad"][:, G:-G, G:-G, G:-G]
    pad = halo_pad(eb, G, (1, 2, 3), SPECS)
    return jnp.sum(pad) * 1e-30


print("--- kernels (bench-fill occupancy) ---", flush=True)
t_mig = chain("migrate_cells_fused (3 axes)", b_mig)
t_push = chain("fused_push K1 (occ)", b_push)
t_dep = chain("deposit K2+fold (occ)", b_dep)
print("--- ablations ---", flush=True)
chain("fused_push K1 (no occ-skip)", b_push_noocc)
chain("deposit K2+fold (no occ-skip)", b_dep_noocc)
print("--- XLA glue ---", flush=True)
t_hp = chain("half position push (XLA)", b_halfpush)
t_san = chain("sanitize+ig (XLA, if standalone)", b_sanitize)
t_win = chain("K1 eb window extraction (XLA)", b_ebwin)
t_occ = chain("block_occupancy (XLA)", b_occ)
t_str = chain("migration strips, 3 axes (XLA)", b_strips)
t_fold = chain("K2 fold epilogue (XLA)", b_fold)
t_mx = chain("6-component halo_pad (XLA)", b_fieldpad)

per_species = t_mig + t_push + t_dep + t_hp
print(f"\nper-species hot path ~{per_species:.1f} ms; x2 species "
      f"+ maxwell/cpml/glue -> step estimate "
      f"{2 * per_species + 4 * t_mx:.1f} ms", flush=True)
