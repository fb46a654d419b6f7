"""Cell-binned particle kernels (2D) — the round-2 hot-loop design.

Layout: particles live in per-CELL slots, shape (cap_c, nx_loc, ny_loc) —
slots on the sublane axis (cap_c = a vreg's worth, 8/16/32), cells on the
lane axes. Invariant: slot (s, ix, iy) holds a particle with
floor(x + 0.5) == ix (positions stay device-local cell units).

Why: the tile-binned dense engine (ops/tiled2d.py) inflates per-particle
work by the window volume (w^2 in 2D, w^3 in 3D — fatal in 3D) to buy
MXU-regular access. With per-cell binning the shape-function footprint is
a STATIC stencil relative to the array position, so gather/deposit become
a fixed loop over stencil offsets:

    acc += shifted_field[ox, oy] * M2(ox - dx) * M2(oy - dy)

— pure VPU elementwise work at TRUE per-particle cost (f32-exact: no MXU
bf16-truncation tax), and the "shifted field" is a static slice of the
padded array. Deposition reduces each offset's contribution over the
slot axis and slice-adds it into the padded J — a scatter-free
Esirkepov. Migration is one cap-wide 5-way-key sort per axis plus +-1
rolls (device edges ppermute) with overwrite-merge placement — see
migrate_cells; on TPU the hot loop runs as fused pallas kernels
(ops/cellpallas.py).

Numerical contract identical to ops/interpolation.py::gather_eb_2d and
ops/deposition.py::deposit_2d (reference interpolation/cpu2d.c:7-154,
current_deposit.h:7-203). BINNING CONTRACT: particles are re-binned at
the MID-step position (the step runs pos-half -> migrate -> gather ->
Boris -> pos-half -> deposit). Then
- gather deltas lie in [-0.5, 0.5): integer taps {-1,0,1} and half
  taps {-2,...,1} (<=3 nonzero) are exact — wider deltas would shift
  the nearest node and need a 5-tap stencil;
- deposit sees stored (post-push) positions whose segment endpoints
  delta -+ v/2 are [mid] in [-0.5,0.5) and [mid+v] within
  +-(0.5 + CFL) < 1.5, so both S0 and S1 taps live on {-2,...,2} — a
  5x5 offset loop covered by n_guard >= 2;
- open-boundary absorption happens BEFORE a particle's push+deposit,
  so an exiting particle's final half-step current is never dropped.

Known limitation: per-cell capacity overflows under strong local
compression; overflow is counted in the species' overflow counter
(pick particle_capacity_factor by loss budget — measurements in
docs/BENCH_LOCAL.md). A future overflow path is per-cell particle
merging instead of drops.
"""
from __future__ import annotations

import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import c as c_light
from ..parallel.halo import HaloSpec
from .tiled2d import _roll_with_edge_exchange

# stencil offset ranges
_GOFF = (-1, 0, 1)           # integer-staggered taps
_HOFF = (-2, -1, 0, 1)       # half-staggered taps (<=3 nonzero)
_DOFF = (-2, -1, 0, 1, 2)    # deposit (post-re-bin; see module docstring)


def _m2(d):
    ad = jnp.abs(d)
    return jnp.where(ad <= 0.5, 0.75 - d * d,
                     jnp.where(ad < 1.5, 0.5 * (1.5 - ad) ** 2,
                               jnp.zeros_like(d)))


def _deltas(x, y):
    """Cell-local offsets: delta = x - ix with ix the cell's lane index."""
    dtype = x.dtype
    ix = jnp.arange(x.shape[1], dtype=dtype)[None, :, None]
    iy = jnp.arange(x.shape[2], dtype=dtype)[None, None, :]
    return x - ix, y - iy


def _plane(fpad, c, ox, oy, g, nx, ny):
    """Static slice: component c's value at cell (ix+ox, iy+oy)."""
    return lax.slice(fpad[c], (g + ox, g + oy), (g + ox + nx, g + oy + ny))


def gather_cell_2d(eb_pad: jnp.ndarray, x, y, g: int):
    """eb_pad (6, nx+2g, ny+2g); x, y (cap_c, nx, ny) device-local coords.
    Returns the 6 gathered components, each (cap_c, nx, ny)."""
    cap, nx, ny = x.shape
    dx, dy = _deltas(x, y)
    gx = {o: _m2(o - dx) for o in _GOFF}
    hx = {o: _m2(o + 0.5 - dx) for o in _HOFF}
    gy = {o: _m2(o - dy) for o in _GOFF}
    hy = {o: _m2(o + 0.5 - dy) for o in _HOFF}

    out = [jnp.zeros_like(x) for _ in range(6)]
    # (component, x-taps, y-taps) per the Yee staggering
    comps = ((0, hx, gy), (1, gx, hy), (2, gx, gy),
             (3, gx, hy), (4, hx, gy), (5, hx, hy))
    for c, wx, wy in comps:
        acc = jnp.zeros_like(x)
        for ox, txo in wx.items():
            for oy, tyo in wy.items():
                f = _plane(eb_pad, c, ox, oy, g, nx, ny)
                acc = acc + txo * tyo * f[None]
        out[c] = acc
    return tuple(out)


def deposit_cell_2d(x, y, ux, uy, uz, inv_gamma, w, *, q: float, dx: float,
                    dy: float, dt: float, g: int) -> jnp.ndarray:
    """Esirkepov deposit from the cell layout: per-offset contributions are
    slot-reduced and slice-added into the padded (4, nx+2g, ny+2g) J —
    no scatter. Same separable closed forms as ops/deposition.py.

    Requires home-cell binning (run migrate_cell_2d first): every
    particle's delta must lie in [-0.5, 0.5) so the 5-tap _DOFF stencil
    covers both segment endpoints."""
    cap, nx, ny = x.shape
    dtype = x.dtype
    dxl, dyl = _deltas(x, y)
    vx_c = ux * inv_gamma * jnp.asarray(c_light * dt / dx, dtype)
    vy_c = uy * inv_gamma * jnp.asarray(c_light * dt / dy, dtype)
    vz = uz * inv_gamma * jnp.asarray(c_light, dtype)

    s0x = {o: _m2(o - (dxl - 0.5 * vx_c)) for o in _DOFF}
    s1x = {o: _m2(o - (dxl + 0.5 * vx_c)) for o in _DOFF}
    s0y = {o: _m2(o - (dyl - 0.5 * vy_c)) for o in _DOFF}
    s1y = {o: _m2(o - (dyl + 0.5 * vy_c)) for o in _DOFF}

    cd = jnp.asarray(q / (dx * dy), dtype) * w
    fdx = jnp.asarray(q / (dy * dt), dtype) * w
    fdy = jnp.asarray(q / (dx * dt), dtype) * w
    cvz = cd * vz

    jpad = jnp.zeros((4, nx + 2 * g, ny + 2 * g), dtype)

    # per-axis running prefix sums (the Esirkepov recurrences)
    fx_run = {}
    acc = jnp.zeros_like(x)
    for o in _DOFF:
        acc = acc + (s1x[o] - s0x[o])
        fx_run[o] = -fdx * acc
    gy_run = {}
    acc = jnp.zeros_like(x)
    for o in _DOFF:
        acc = acc + (s1y[o] - s0y[o])
        gy_run[o] = -fdy * acc

    for ox in _DOFF:
        dsx = s1x[ox] - s0x[ox]
        ax = s0x[ox] + 0.5 * dsx
        for oy in _DOFF:
            dsy = s1y[oy] - s0y[oy]
            by = s0y[oy] + 0.5 * dsy
            jx_c = (fx_run[ox] * by).sum(0)
            jy_c = (ax * gy_run[oy]).sum(0)
            jz_c = (cvz * (ax * by + dsx * dsy / 12.0)).sum(0)
            rho_c = (cd * s1x[ox] * s1y[oy]).sum(0)
            cell = jnp.stack([jx_c, jy_c, jz_c, rho_c])
            jpad = lax.dynamic_update_slice(
                jpad, lax.dynamic_slice(
                    jpad, (0, g + ox, g + oy), (4, nx, ny)) + cell,
                (0, g + ox, g + oy))
    return jpad


# attributes rewritten from scratch before any post-migration read (the
# gathered fields by the next gather, chi by update_chi_and_events) —
# dead weight in the sorting networks (same as ops/tiled2d.py::_TRANSIENT)
_TRANSIENT = {"ex_part", "ey_part", "ez_part",
              "bx_part", "by_part", "bz_part", "chi"}


def migrate_cells(data: Dict[str, jnp.ndarray], alive: jnp.ndarray,
                  plan, *, recompute_ig: bool = False,
                  exact: bool = False, sort_fn=None):
    """Re-bin particles to their home cells — the overwrite-merge scheme,
    dimension-generic (``plan`` = sequence of (nloc, HaloSpec, coord-name),
    one per cell axis; arrays are (cap_c, *cells)).

    Per axis, ONE cap_c-wide multi-operand lax.sort with the 5-way key

        0: donor(+1)   1: dead(even slot)   2: stay
        3: dead(odd)   4: donor(-1)

    then the FULL array rolls one cell each way (device edges ppermute)
    and arrivals overwrite receiver slots elementwise with lo-priority.
    Compared with the 3*cap_c concat-merge this runs a 10-stage instead
    of a 21-stage sorting network and moves cap instead of 3*cap slots —
    the migration sorts were ~2/3 of the measured step at bench scale.

    Key-order rationale: a lo-arrival at slot p (the sender's +1-donors
    sort first) collides with a live resident only if the receiver's slot
    p is a stay, i.e. when arrivals > donors(+1) + dead(even) in that
    cell; symmetrically for hi. Donor slots may be clobbered freely
    (their payload has already left). Losses — clobbered stays, lo/hi
    arrival collisions (hi loses), donors swept past a non-periodic
    domain edge is NOT a loss (absorbed, by design) — are counted in
    n_lost like capacity overflow.

    ``exact=True`` selects the lossless 3*cap_c concat-merge instead
    (nothing is dropped while a cell's total stays <= cap_c): donors
    roll as dedicated buffers and each cell merges
    [residents, lo-arrivals, hi-arrivals] through one 3*cap_c-wide sort.
    ~2.5x the sort work of the fast scheme — for validation runs and
    physics where every macroparticle counts.

    Returns (data, alive, n_lost)."""
    cap = alive.shape[0]
    n_lost = jnp.int32(0)
    transient = set(_TRANSIENT)
    if recompute_ig:
        # non-photon species: 1/sqrt(1+u^2) is cheaper to recompute than
        # to carry through the sorting networks (ops/tiled2d.py does the
        # same); the expression below matches boris_push bitwise
        transient.add("inv_gamma")
    names = sorted(k for k in data if k not in transient)
    ndim = len(plan)
    parity_shape = (cap,) + (1,) * ndim
    parity = ((jnp.arange(cap, dtype=jnp.int32) & 1) == 0).reshape(
        parity_shape)

    for axis, (nloc, spec, coord) in enumerate(plan):
        pos = data[coord]
        nt = pos.shape[1 + axis]
        ishape = [1] * (1 + ndim)
        ishape[1 + axis] = nt
        idx = jnp.arange(nt, dtype=pos.dtype).reshape(ishape)
        local = pos - idx
        out_hi = alive & (local >= 0.5)
        out_lo = alive & (local < -0.5)

        from_wrap = (jnp.arange(nt).reshape(ishape) == 0)
        to_wrap = (jnp.arange(nt).reshape(ishape) == nt - 1)

        def send(payload, mask, direction):
            moved, valid = _roll_with_edge_exchange(
                (payload, mask), 1 + axis, direction, spec)
            wrapped = from_wrap if direction > 0 else to_wrap
            adj = jnp.asarray(-nloc if direction > 0 else nloc, pos.dtype)
            moved = dict(moved)
            moved[coord] = jnp.where(wrapped, moved[coord] + adj,
                                     moved[coord])
            if not spec.periodic:
                i = lax.axis_index(spec.axis_name)
                edge = (i == 0) if direction > 0 else (i == spec.size - 1)
                valid = valid & ~(wrapped & edge)
            return moved, valid

        if exact:
            send_up = {k: jnp.where(out_hi, data[k], 0) for k in names}
            send_dn = {k: jnp.where(out_lo, data[k], 0) for k in names}
            in_lo, val_lo = send(send_up, out_hi, +1)
            in_hi, val_hi = send(send_dn, out_lo, -1)
            alive = alive & ~(out_lo | out_hi)
            keys = jnp.concatenate([
                jnp.where(alive, 0, 2).astype(jnp.int32),
                jnp.where(val_lo, 1, 2).astype(jnp.int32),
                jnp.where(val_hi, 1, 2).astype(jnp.int32)], axis=0)
            ops = [jnp.concatenate([data[k], in_lo[k], in_hi[k]], axis=0)
                   for k in names]
            sorted_ops = lax.sort([keys] + ops, dimension=0, num_keys=1)
            skeys = sorted_ops[0]
            kept = dict(zip(names, (o[:cap] for o in sorted_ops[1:])))
            kept_alive = skeys[:cap] < 2
            # capacity-overflow MERGE (VERDICT r1 item 4): alive rows
            # beyond cap fold into kept rows (reversed alignment: overflow
            # row cap+j -> kept row cap-1-j, same cell, conflict-free;
            # whenever row cap+j is alive all kept rows are too). Charge
            # and momentum conserve; count goes to the overflow counter.
            ofl = {k: o[cap:2 * cap][::-1] for k, o in
                   zip(names, sorted_ops[1:])}
            valid_m = (skeys[cap:2 * cap] < 2)[::-1]
            n_lost = n_lost + (jnp.sum(valid_m) + jnp.sum(
                skeys[2 * cap:] < 2)).astype(jnp.int32)
            if "w" in names:
                w_of = jnp.where(valid_m, ofl["w"], 0.0)
                wsum = kept["w"] + w_of
                wsafe = jnp.maximum(wsum, jnp.asarray(
                    1e-300 if wsum.dtype == jnp.float64 else 1e-30,
                    wsum.dtype))
                for k in names:
                    if k in ("x", "y", "z", "ux", "uy", "uz",
                             "inv_gamma"):
                        kept[k] = jnp.where(
                            valid_m,
                            (kept["w"] * kept[k] + w_of * ofl[k]) / wsafe,
                            kept[k])
                kept["w"] = wsum
            data = {**data, **kept}
            alive = kept_alive
            continue

        key = jnp.where(out_hi, 0,
                        jnp.where(out_lo, 4,
                                  jnp.where(alive, 2,
                                            jnp.where(parity, 1, 3))))
        if sort_fn is not None:
            skey, spay = sort_fn(key.astype(jnp.int32),
                                 [data[k] for k in names])
        else:
            sorted_ops = lax.sort(
                [key.astype(jnp.int32)] + [data[k] for k in names],
                dimension=0, num_keys=1)
            skey, spay = sorted_ops[0], sorted_ops[1:]
        sdata = dict(zip(names, spay))

        in_lo, val_lo = send(sdata, skey == 0, +1)
        in_hi, val_hi = send(sdata, skey == 4, -1)

        stay = skey == 2
        # slot collisions MERGE instead of drop (VERDICT r1 item 4):
        # when two or three particles land on one slot (arrival(s) onto a
        # stay, or lo+hi arrivals), combine them into one macroparticle —
        # w summed, position/momentum weight-averaged — conserving charge
        # and momentum exactly (energy approximately). Merge count is
        # reported through the overflow counter (no particles are lost).
        n_src = (val_lo.astype(jnp.int32) + val_hi.astype(jnp.int32)
                 + stay.astype(jnp.int32))
        multi = n_src >= 2
        n_lost = n_lost + jnp.sum(
            jnp.maximum(n_src - 1, 0)).astype(jnp.int32)
        w_lo = jnp.where(val_lo, in_lo["w"], 0.0) if "w" in names else None
        merged = {}
        if "w" in names:
            w_hi = jnp.where(val_hi, in_hi["w"], 0.0)
            w_res = jnp.where(stay, sdata["w"], 0.0)
            wsum = w_lo + w_hi + w_res
            wsafe = jnp.maximum(wsum, jnp.asarray(
                1e-300 if sdata["w"].dtype == jnp.float64 else 1e-30,
                sdata["w"].dtype))
            for k in names:
                if k in ("x", "y", "z", "ux", "uy", "uz", "inv_gamma"):
                    merged[k] = (w_lo * in_lo[k] + w_hi * in_hi[k]
                                 + w_res * sdata[k]) / wsafe
                elif k == "w":
                    merged[k] = wsum
        data = {**data,
                **{k: jnp.where(
                    multi, merged[k].astype(sdata[k].dtype),
                    jnp.where(val_lo, in_lo[k].astype(sdata[k].dtype),
                              jnp.where(val_hi,
                                        in_hi[k].astype(sdata[k].dtype),
                                        sdata[k])))
                   if k in merged else
                   jnp.where(val_lo, in_lo[k].astype(sdata[k].dtype),
                             jnp.where(val_hi,
                                       in_hi[k].astype(sdata[k].dtype),
                                       sdata[k]))
                   for k in names}}
        alive = val_lo | val_hi | stay

    for k in ("x", "y", "z", "w", "ux", "uy", "uz"):
        if k in data:
            data[k] = jnp.where(alive, data[k], jnp.zeros_like(data[k]))
    if recompute_ig:
        data["inv_gamma"] = 1.0 / jnp.sqrt(
            1.0 + data["ux"]**2 + data["uy"]**2 + data["uz"]**2)
    elif "inv_gamma" in data:
        data["inv_gamma"] = jnp.where(alive, data["inv_gamma"],
                                      jnp.ones_like(data["inv_gamma"]))
    return data, alive, n_lost


def migrate_cell_2d(data: Dict[str, jnp.ndarray], alive: jnp.ndarray,
                    specs: Tuple[HaloSpec, HaloSpec],
                    nx_loc: int, ny_loc: int, *,
                    recompute_ig: bool = False, exact: bool = False,
                    sort_fn=None):
    """2D overwrite-merge re-binning (see migrate_cells)."""
    return migrate_cells(
        data, alive,
        ((nx_loc, specs[0], "x"), (ny_loc, specs[1], "y")),
        recompute_ig=recompute_ig, exact=exact, sort_fn=sort_fn)


def insert_cells(data: Dict[str, jnp.ndarray], alive: jnp.ndarray,
                 next_id: jnp.ndarray, new_vals: Dict[str, jnp.ndarray],
                 valid: jnp.ndarray, device_id=None):
    """Cell-aligned in-step creation (QED photon/pair birth): newborns sit
    at their parent's slot in the parent species' cell layout, and a
    newborn's position equals its parent's, so its home cell is the
    parent's cell — insertion is a per-cell merge of (child survivors,
    newborn buffer) along the slot axis. Dimension-generic counterpart of
    ops/tiled2d.py::insert_tiled (reference qed/cpu.py create_*_patches).

    data/alive: child species, (cap_c, *cells). new_vals/valid:
    (cap_src, *cells) elementwise newborn values at parent slots.
    Ids are sequential from ``next_id`` via intra-cell cumsum + an
    exclusive scan over per-cell counts. Newborns that find no free slot
    in their cell are dropped and counted.

    Returns (data, alive, next_id, n_lost)."""
    cap = alive.shape[0]
    vi = valid.astype(jnp.int32)
    intra = jnp.cumsum(vi, axis=0) - vi                # exclusive, per cell
    counts = jnp.sum(vi, axis=0)                       # (*cells,)
    # hierarchical exclusive prefix over cells: row-wise cumsum + a short
    # 1D scan over row totals (a full-length 1D cumsum over nx*ny(*nz)
    # elements is pathological on TPU — lane-padded serial scan)
    c2 = counts.reshape(counts.shape[0], -1)
    row_incl = jnp.cumsum(c2, axis=1)
    row_tot = row_incl[:, -1]
    row_base = jnp.cumsum(row_tot) - row_tot
    base = (row_base[:, None] + row_incl - c2).reshape(counts.shape)
    rank = base[None] + intra
    ids = next_id + rank.astype(jnp.uint32)

    def newborn_value(k, arr):
        if k == "id_lo":
            return ids.astype(arr.dtype)
        if k == "id_hi":
            # newborns belong to THIS device: resident slots can hold
            # immigrants carrying a foreign id_hi, so never copy from them
            if device_id is None:
                return jnp.broadcast_to(arr[:1], valid.shape)
            return jnp.full(valid.shape, 0, arr.dtype) + \
                device_id.astype(arr.dtype)
        if k in new_vals:
            return jnp.where(valid, new_vals[k].astype(arr.dtype), 0)
        if k == "inv_gamma":
            return jnp.ones(valid.shape, arr.dtype)
        return jnp.zeros(valid.shape, arr.dtype)

    # NOTE: trace-time-only switch — insert_cells is traced once per jit
    # compile, so flipping LAMBDAPIC_CELL_INSERT after the first compile
    # has no effect until the step is rebuilt (new Simulation or a
    # capacity recompile)
    mode = os.environ.get("LAMBDAPIC_CELL_INSERT", "select")
    if mode == "sort":
        # reference-shaped merge: concatenate child + newborn rows and
        # one variadic 2*cap-row sort keyed alive=0 < newborn=1 < dead=2.
        # O(cap log^2 cap) compares moving EVERY payload — measured
        # ~14 ms/step of the 29 ms QED bench step (sort 5.5 ms +
        # broadcast_select 6.9 ms + pad/relayout ~3 ms). Kept as the
        # semantics oracle for the select path below.
        keys = jnp.concatenate([
            jnp.where(alive, 0, 2).astype(jnp.int32),
            jnp.where(valid, 1, 2).astype(jnp.int32)], axis=0)
        names = sorted(data)
        ops = []
        for k in names:
            arr = data[k]
            nv = newborn_value(k, arr)
            ops.append(jnp.concatenate([arr, nv.astype(arr.dtype)],
                                       axis=0))
        sorted_ops = lax.sort([keys] + ops, dimension=0, num_keys=1)
        kept = sorted_ops[0][:cap]
        n_lost = jnp.sum(sorted_ops[0][cap:] < 2).astype(jnp.int32)
        out = {k: o[:cap] for k, o in zip(names, sorted_ops[1:])}
        alive = kept < 2
        next_id = next_id + jnp.sum(counts).astype(jnp.uint32)
        return out, alive, next_id, n_lost

    # rank-matched dead-slot fill (default): newborn with intra-cell
    # rank r lands in the dead slot whose dead-rank equals r — alive
    # slots stay in place (slot order within a cell carries no
    # physics; the slab/per-stage engines read the alive mask). This
    # is a pure elementwise select chain over the slot axis — no
    # concatenate, no 2*cap variadic sort, XLA loop-fuses the whole
    # insert into one pass over the payloads. Newborns beyond the
    # cell's free slots are dropped and counted, exactly like the
    # sort path (loss = max(n_new - n_dead, 0) per cell).
    di = (~alive).astype(jnp.int32)
    dead_rank = jnp.cumsum(di, axis=0) - di            # exclusive
    fill = (~alive) & (dead_rank < counts[None])
    cap_s = valid.shape[0]
    out = {}
    for k in sorted(data):
        arr = data[k]
        nv = newborn_value(k, arr).astype(arr.dtype)
        res = arr
        for s in range(cap_s):
            # at most one s matches a given dead slot: progressive
            # overwrite is exact
            m_s = fill & valid[s][None] & (dead_rank == intra[s][None])
            res = jnp.where(m_s, nv[s][None], res)
        out[k] = res
    alive = alive | fill
    next_id = next_id + jnp.sum(counts).astype(jnp.uint32)
    n_lost = jnp.sum(jnp.maximum(counts - jnp.sum(di, axis=0), 0)
                     ).astype(jnp.int32)
    return out, alive, next_id, n_lost
