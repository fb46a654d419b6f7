"""Unified slab megakernel for the cell engine (Pallas TPU).

One kernel per species per step runs the ENTIRE particle stage —

    re-binning (x, y, z in sequence)  ->  staggered gather  ->  Boris
    ->  position half push  ->  5-tap Esirkepov deposit

— in a single VMEM-resident pass. This is the TPU analog of the
reference's unified pusher (core/pusher/unified/unified_pusher_2d.c:
157-365: one strip-mined OpenMP pass fusing push+gather+deposit), taken
one step further by absorbing the particle re-binning (the reference's
separate sort + sync_particles stages) into the same pass.

Motivation (profiled at bench shapes, docs/BENCH_LOCAL.md): the split
pipeline — 3 migration kernels + push kernel + deposit kernel — spends
over half the step in XLA glue between kernels: per-axis key selects,
edge-strip extraction on tiled dims (reads the full array to produce a
thin strip), dead-slot sanitize passes, field-window materialization,
and rim-panel layout copies. The slab kernel touches HBM once per
payload (read + write) and once for the fields per block.

Blocking: grid over X SLABS — block (cap, bx, ny_loc, nz_loc), i.e. the
y (and z) cell dims stay whole. Consequences:
- y/z re-binning is fully in-block (wrap columns read from the block
  itself under periodic boundaries); only the x axis needs neighbor
  strips, and x is an untiled dim whose edge-column extraction is a
  cheap slab slice (no full-array read);
- the Mosaic (8, 128) tiling rules constrain only (ny, nz) — which
  equal the array dims — so bx is a free tuning knob;
- the mesh may be split along x arbitrarily (strips ppermute at device
  edges, reusing the per-axis wrap logic); a mesh split along y or z
  falls back to the per-axis kernels (ops/cellpallas.py) because the
  in-block wrap would need post-x-migration columns from the y/z
  neighbor device.

The E,B field slab (6, bx+4, ny+2g[, nz+2g]) windows overlap between
blocks, which BlockSpecs cannot express, so the caller pre-stacks the
per-slab windows into (nbx, 6, bx+4, ny+2g[, nz+2g]) — a cheap
static-slice stack at the small-bx duplication factor, shared across
species by XLA CSE. (A manual HBM->VMEM DMA of the padded stack would
avoid the duplication but Mosaic requires DMA slice shapes to be
tile-aligned on the sublane dim, which ny+2g generally is not.)

Numerical contract: identical to the split pipeline — the same 5-way-
key overwrite-merge re-binning per axis (ops/cell2d.py::migrate_cells
fast path), the same gather/Boris/deposit closed forms
(ops/cellpallas.py kernels). Parity is asserted by
tests/core/test_cellslab.py against the split path.

Reference parity anchors: unified pusher unified_pusher_2d.c:157-365,
sort sort/cpu2d.c:9-324, intra-rank particle sync
patch/sync_particles_2d.c:36-540 (all collapsed into this kernel).
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from ..constants import c as c_light
from .cellpallas import (_GOFF, _HOFF, _DOFF, _COMPS2, _COMPS3,
                         _batcher_network, _boris, _compile_kwargs, _m2,
                         _mig_perms, _use_interpret, occ_skip_enabled)
from .cell2d import _TRANSIENT


def _env_int(name: str, default: int) -> int:
    import os
    v = os.environ.get(name)
    return int(v) if v else default


def slab_bx(nx_loc: int, ndim: int) -> int:
    """X-slab extent: bx cells per grid step. x is an untiled dim in 3D
    (block dims beyond the last two are unconstrained) so any bx is
    legal; in 2D bx is the sublane dim — multiples of 8 (or the full
    axis). Default tuned for VMEM: the 3D deposit holds ~90 live
    block-size tap arrays."""
    if ndim == 3:
        pref = _env_int("LAMBDAPIC_SLAB_BX", 2)
        while nx_loc % pref:
            pref -= 1
        return pref
    pref = _env_int("LAMBDAPIC_SLAB_BX2", 16)
    while nx_loc % pref and pref > 8:
        pref -= 8
    return pref if nx_loc % pref == 0 else nx_loc


def slab_ok(nloc: Tuple[int, ...], cap: int) -> bool:
    """VMEM feasibility: the deposit phase holds ~90 (3D) / ~45 (2D)
    live block-size arrays (tap dictionaries + payload rows) plus the
    field slab and in/out buffers."""
    ndim = len(nloc)
    bx = slab_bx(nloc[0], ndim)
    trail = 1
    for n in nloc[1:]:
        trail *= n + 4
    blk = cap * bx * trail * 4
    slab = 6 * (bx + 4) * trail * 4
    live = 90 if ndim == 3 else 45
    return live * blk + 2 * slab <= 56 * 1024 * 1024


def slab_enabled() -> bool:
    import os
    return os.environ.get("LAMBDAPIC_SLAB", "1") != "0"


# ----------------------------------------------------------------------
# value-level building blocks (operate on lists of per-slot row values)
# ----------------------------------------------------------------------

def _sort_rows(ces, rows_k, rows_v):
    """Batcher compare-exchange over the slot axis; rows are (1, ...)
    values. Returns (sorted keys, sorted payload row lists)."""
    rk, rv = list(rows_k), [list(r) for r in rows_v]
    for a, b in ces:
        ka, kb = rk[a], rk[b]
        swap = ka > kb
        rk[a] = jnp.where(swap, kb, ka)
        rk[b] = jnp.where(swap, ka, kb)
        for vl in rv:
            va, vb = vl[a], vl[b]
            vl[a] = jnp.where(swap, vb, va)
            vl[b] = jnp.where(swap, va, vb)
    return rk, rv


def _shift(row, strip_lo, strip_hi, axis):
    """(lo_view, hi_view): row shifted +1/-1 along ``axis`` with the
    strip columns filling the exposed edge."""
    n = row.shape[axis]
    body_lo = lax.slice_in_dim(row, 0, n - 1, axis=axis)
    body_hi = lax.slice_in_dim(row, 1, n, axis=axis)
    lo = jnp.concatenate([strip_lo, body_lo], axis=axis)
    hi = jnp.concatenate([body_hi, strip_hi], axis=axis)
    return lo, hi


def _merge_axis(ces, axis, keys, pays, skeys_lo, spays_lo, skeys_hi,
                spays_hi, merge_idx, n_merged):
    """One re-binning axis on row values: sort, ±1 shift, overwrite-merge.

    keys: list of cap (1, ...) int32 rows (5-way key, see
    ops/cell2d.py::migrate_cells). pays: list-of-lists [payload][slot].
    skeys/spays: strip rows, one column wide along ``axis`` (already
    sorted? no — raw; sorted here alongside).
    Returns (alive_rows, pays_out, n_merged)."""
    rk, rv = _sort_rows(ces, keys, pays)
    slk, slv = _sort_rows(ces, skeys_lo, spays_lo)
    shk, shv = _sort_rows(ces, skeys_hi, spays_hi)

    cap = len(rk)
    n_pay = len(pays)
    w_i = merge_idx[0] if merge_idx else -1
    alive_rows = []
    out_rows = [[] for _ in range(n_pay)]
    for a in range(cap):
        lo_k, hi_k = _shift(rk[a], slk[a], shk[a], axis)
        val_lo = lo_k == 0
        val_hi = hi_k == 4
        stay = rk[a] == 2
        alive_new = val_lo | val_hi | stay
        n_src = (val_lo.astype(jnp.int32) + val_hi.astype(jnp.int32)
                 + stay.astype(jnp.int32))
        multi = n_src >= 2
        n_merged = n_merged + jnp.sum(
            jnp.maximum(n_src - 1, 0)).astype(jnp.int32)
        if merge_idx:
            w_lo_f, w_hi_f = _shift(rv[w_i][a], slv[w_i][a], shv[w_i][a],
                                    axis)
            w_lo = jnp.where(val_lo, w_lo_f, 0.0)
            w_hi = jnp.where(val_hi, w_hi_f, 0.0)
            w_res = jnp.where(stay, rv[w_i][a], 0.0)
            wsum = w_lo + w_hi + w_res
            wsafe = jnp.maximum(wsum, jnp.asarray(
                1e-300 if wsum.dtype == jnp.float64 else 1e-30,
                wsum.dtype))
        for p in range(n_pay):
            lo_v, hi_v = _shift(rv[p][a], slv[p][a], shv[p][a], axis)
            sel = jnp.where(val_lo, lo_v,
                            jnp.where(val_hi, hi_v, rv[p][a]))
            if merge_idx and p in merge_idx:
                if p == w_i:
                    mg = wsum
                else:
                    mg = (w_lo * lo_v + w_hi * hi_v
                          + w_res * rv[p][a]) / wsafe
                sel = jnp.where(multi, mg.astype(sel.dtype), sel)
            out_rows[p].append(sel)
        alive_rows.append(alive_new)
    return alive_rows, out_rows, n_merged


def _keys_from_pos(pos_rows, alive_rows, axis):
    """5-way keys for an in-block axis pass, from current positions.
    pos_rows: per-slot (1, ...) coordinate rows in device-local cell
    units (cell index along ``axis`` = the lane/sublane index). Dead
    parity (key 1/3) is static per slot index."""
    keys = []
    for a, (pr, ar) in enumerate(zip(pos_rows, alive_rows)):
        shp = pr.shape
        idx = lax.broadcasted_iota(jnp.int32, shp, axis).astype(pr.dtype)
        local = pr - idx
        out_hi = ar & (local >= 0.5)
        out_lo = ar & (local < -0.5)
        dead = 1 if (a % 2 == 0) else 3
        k = jnp.where(out_hi, 0,
                      jnp.where(out_lo, 4,
                                jnp.where(ar, 2, dead))).astype(jnp.int32)
        keys.append(k)
    return keys


def _wrap_cols(rows, axis, coord_adj=None, invalid=False):
    """Periodic wrap strips from the block itself: lo strip = last
    column, hi strip = first column (coordinate adjusted for coords;
    key strips forced invalid at open boundaries)."""
    los, his = [], []
    n = rows[0].shape[axis]
    for r in rows:
        lo = lax.slice_in_dim(r, n - 1, n, axis=axis)
        hi = lax.slice_in_dim(r, 0, 1, axis=axis)
        if coord_adj is not None:
            lo = lo - jnp.asarray(coord_adj, lo.dtype)
            hi = hi + jnp.asarray(coord_adj, hi.dtype)
        if invalid:
            lo = jnp.full_like(lo, 9)
            hi = jnp.full_like(hi, 9)
        los.append(lo)
        his.append(hi)
    return los, his


# ----------------------------------------------------------------------
# the megakernel
# ----------------------------------------------------------------------

def unified_cell_step(eb_pad, key, data: Dict[str, jnp.ndarray],
                      strips_lo: List[jnp.ndarray],
                      strips_hi: List[jnp.ndarray], *,
                      names: Sequence[str], merge_idx: Tuple[int, ...],
                      coords: Sequence[str], periodic: Sequence[bool],
                      q: float, m: float, dt: float,
                      deltas: Sequence[float], g: int,
                      occ=None, sanitize: Sequence[int] = ()):
    """Run migration(x,y[,z]) + gather + Boris + half push + deposit in
    one pallas kernel over x-slabs.

    eb_pad: (6, nx+2g, ny+2g[, nz+2g]) padded field stack (HBM-resident,
    DMA'd per block). key: (cap, nx, ny[, nz]) int32 x-axis 5-way key
    (XLA-computed from the half-pushed positions, exactly as
    migrate_cells_fused). data[names[p]]: payload arrays. strips_lo/hi:
    per-[key, *payloads] x-edge columns relayouted to (nbx, cap, ny[, nz])
    and wrap-fixed (coordinate adjust / invalid-9 / device ppermute done
    by the caller). periodic: per-IN-BLOCK axis (y[, z]) flags.
    deltas = (dx, dy[, dz]). sanitize: payload indices zeroed for dead
    slots on output (w, coords, momenta).

    Returns (key_out, payloads_out, inv_gamma, rims, n_merged):
    key_out 2=alive / 3=dead; rims (nbx, 4, bx+4, ny+2g[, nz+2g]) —
    overlap-add along x only (cellpallas._fold) to get the padded J."""
    from jax.experimental.pallas import tpu as pltpu

    cap = key.shape[0]
    cells = key.shape[1:]
    ndim = len(cells)
    nx = cells[0]
    other = cells[1:]
    dtype = data[coords[0]].dtype
    bx = slab_bx(nx, ndim)
    nbx = nx // bx
    opad = tuple(n + 2 * g for n in other)
    n_pay = len(names)
    ci = [names.index(c) for c in coords]
    wi = names.index("w") if "w" in names else -1
    ui = [names.index(u) for u in ("ux", "uy", "uz")]

    n2 = 1
    while n2 < cap:
        n2 *= 2
    ces = _batcher_network(n2, cap)

    cdt = [float(c_light * dt / d) for d in deltas]
    vol = 1.0
    for d in deltas:
        vol *= d

    def kernel(*refs):
        qm_ref, occ_ref, refs = refs[0], refs[1], refs[2:]
        ebw_ref = refs[0]
        k_ref = refs[1]
        p_refs = refs[2:2 + n_pay]
        skl_ref = refs[2 + n_pay]
        spl_refs = refs[3 + n_pay:3 + 2 * n_pay]
        skh_ref = refs[3 + 2 * n_pay]
        sph_refs = refs[4 + 2 * n_pay:4 + 3 * n_pay]
        out_k = refs[4 + 3 * n_pay]
        out_p = refs[5 + 3 * n_pay:5 + 4 * n_pay]
        out_ig = refs[5 + 4 * n_pay]
        out_rims = refs[6 + 4 * n_pay]
        out_m = refs[7 + 4 * n_pay]
        i = pl.program_id(0)
        is_first = i == 0

        strip_shape = (1, 1) + tuple(other)

        def main_rows(ref):
            return [ref[a:a + 1] for a in range(cap)]

        def strip_rows(ref):
            return [ref[0, a:a + 1].reshape(strip_shape)
                    for a in range(cap)]

        def compute():
            # ---------------- x pass (strips from neighbors) ----------
            n_merged = jnp.zeros((), jnp.int32)
            alive_rows, pays, n_merged = _merge_axis(
                ces, 1, main_rows(k_ref), [main_rows(r) for r in p_refs],
                strip_rows(skl_ref), [strip_rows(r) for r in spl_refs],
                strip_rows(skh_ref), [strip_rows(r) for r in sph_refs],
                merge_idx, n_merged)

            # ---------------- y (and z) passes (in-block wrap) --------
            for ax in range(1, ndim):
                axis = 1 + ax
                pos_rows = pays[ci[ax]]
                keys = _keys_from_pos(pos_rows, alive_rows, axis)
                klo, khi = _wrap_cols(keys, axis,
                                      invalid=not periodic[ax - 1])
                plo, phi = [], []
                for p in range(n_pay):
                    adj = other[ax - 1] if p == ci[ax] else None
                    lo, hi = _wrap_cols(pays[p], axis, coord_adj=adj)
                    plo.append(lo)
                    phi.append(hi)
                alive_rows, pays, n_merged = _merge_axis(
                    ces, axis, keys, pays, klo, plo, khi, phi,
                    merge_idx, n_merged)

            # ---------------- sanitize + assemble blocks --------------
            alive = jnp.concatenate(alive_rows, axis=0)
            blocks = []
            for p in range(n_pay):
                b = jnp.concatenate(pays[p], axis=0)
                if p in sanitize:
                    b = jnp.where(alive, b, jnp.zeros_like(b))
                blocks.append(b)

            shp = (cap, bx) + tuple(other)
            pos = [blocks[c] for c in ci]
            ux0, uy0, uz0 = (blocks[u] for u in ui)
            w = blocks[wi] if wi >= 0 else jnp.ones(shp, dtype)
            q = qm_ref[0]
            m = qm_ref[1]

            iota = [
                (lax.broadcasted_iota(jnp.int32, shp, 1)
                 + i * bx).astype(dtype)
            ] + [lax.broadcasted_iota(jnp.int32, shp, 2 + k).astype(dtype)
                 for k in range(ndim - 1)]
            dl = [pos[k] - iota[k] for k in range(ndim)]

            # ---------------- gather + Boris + half push --------------
            taps = [{"g": {o: _m2(o - d) for o in _GOFF},
                     "h": {o: _m2(o + 0.5 - d) for o in _HOFF}}
                    for d in dl]
            comps = _COMPS2 if ndim == 2 else _COMPS3
            eb = []
            for comp, *stag in comps:
                acc = jnp.zeros(shp, dtype)
                if ndim == 2:
                    for oy, ty in taps[1][stag[1]].items():
                        for ox, tx in taps[0][stag[0]].items():
                            f = ebw_ref[0, comp, g + ox:g + ox + bx,
                                        g + oy:g + oy + other[0]]
                            acc = acc + tx * ty * f[None]
                else:
                    for oy, ty in taps[1][stag[1]].items():
                        for oz, tz in taps[2][stag[2]].items():
                            tyz = ty * tz
                            for ox, tx in taps[0][stag[0]].items():
                                f = ebw_ref[0, comp, g + ox:g + ox + bx,
                                            g + oy:g + oy + other[0],
                                            g + oz:g + oz + other[1]]
                                acc = acc + tx * tyz * f[None]
                eb.append(acc)
            del taps

            ux4, uy4, uz4, ig2 = _boris(ux0, uy0, uz0, *eb, q, m, dt,
                                        dtype)
            del eb
            u4 = (ux4, uy4, uz4)
            posn = [pos[k] + (0.5 * cdt[k]) * u4[k] * ig2
                    for k in range(ndim)]

            # ---------------- Esirkepov deposit -----------------------
            out_rims[...] = jnp.zeros(out_rims.shape, dtype)
            v = [u4[k] * ig2 * cdt[k] for k in range(ndim)]
            dln = [posn[k] - iota[k] for k in range(ndim)]

            def tapdicts(d, vk):
                s0 = {o: _m2(o - (d - 0.5 * vk)) for o in _DOFF}
                s1 = {o: _m2(o - (d + 0.5 * vk)) for o in _DOFF}
                return s0, s1

            if ndim == 2:
                f_cd = jnp.asarray(q / vol, dtype) * w
                f_dx = jnp.asarray(q / (deltas[1] * dt), dtype) * w
                f_dy = jnp.asarray(q / (deltas[0] * dt), dtype) * w
                vz_c = uz4 * ig2 * jnp.asarray(c_light, dtype)
                cvz = f_cd * vz_c
                s0x, s1x = tapdicts(dln[0], v[0])
                s0y, s1y = tapdicts(dln[1], v[1])
                fx_run = {}
                acc = jnp.zeros(shp, dtype)
                for o in _DOFF:
                    acc = acc + (s1x[o] - s0x[o])
                    fx_run[o] = -f_dx * acc
                gy_run = {}
                acc = jnp.zeros(shp, dtype)
                for o in _DOFF:
                    acc = acc + (s1y[o] - s0y[o])
                    gy_run[o] = -f_dy * acc
                ny = other[0]
                for ox in _DOFF:
                    dsx = s1x[ox] - s0x[ox]
                    ax_ = s0x[ox] + 0.5 * dsx
                    for oy in _DOFF:
                        dsy = s1y[oy] - s0y[oy]
                        by_t = s0y[oy] + 0.5 * dsy
                        jx_c = (fx_run[ox] * by_t).sum(0)
                        jy_c = (ax_ * gy_run[oy]).sum(0)
                        jz_c = (cvz * (ax_ * by_t
                                       + dsx * dsy * (1.0 / 12.0))).sum(0)
                        rho_c = (f_cd * s1x[ox] * s1y[oy]).sum(0)
                        cell = jnp.stack([jx_c, jy_c, jz_c, rho_c])
                        cur = out_rims[0, :, 2 + ox:2 + ox + bx,
                                       g + oy:g + oy + ny]
                        out_rims[0, :, 2 + ox:2 + ox + bx,
                                 g + oy:g + oy + ny] = cur + cell
            else:
                f_cd = jnp.asarray(q / vol, dtype) * w
                fd = [jnp.asarray(q / (vol / deltas[k]) / dt, dtype) * w
                      for k in range(3)]

                def taps3(d, vk):
                    s0, s1 = tapdicts(d, vk)
                    ds = {o: s1[o] - s0[o] for o in _DOFF}
                    a_ = {o: s0[o] + 0.5 * ds[o] for o in _DOFF}
                    cc = {o: 0.5 * s0[o] + ds[o] * (1.0 / 3.0)
                          for o in _DOFF}
                    run = {}
                    acc = jnp.zeros(shp, dtype)
                    for o in _DOFF:
                        acc = acc + ds[o]
                        run[o] = acc
                    return s0, s1, ds, a_, cc, run

                s0x, s1x, dsx, ax_, cx_, runx = taps3(dln[0], v[0])
                s0y, s1y, dsy, ay_, cy_, runy = taps3(dln[1], v[1])
                s0z, s1z, dsz, az_, cz_, runz = taps3(dln[2], v[2])
                ny, nz = other
                for oy in _DOFF:
                    for oz in _DOFF:
                        pyz_jx = -(ay_[oy] * s0z[oz]
                                   + cy_[oy] * dsz[oz]) * fd[0]
                        pyz_jy = -(runy[oy] * s0z[oz]) * fd[1]
                        pyz_jy2 = -(runy[oy] * dsz[oz]) * fd[1]
                        pyz_jz = -(runz[oz] * s0y[oy]) * fd[2]
                        pyz_jz2 = -(runz[oz] * dsy[oy]) * fd[2]
                        pyz_r = (s1y[oy] * s1z[oz]) * f_cd
                        for ox in _DOFF:
                            jx_c = (runx[ox] * pyz_jx).sum(0)
                            jy_c = (ax_[ox] * pyz_jy
                                    + cx_[ox] * pyz_jy2).sum(0)
                            jz_c = (ax_[ox] * pyz_jz
                                    + cx_[ox] * pyz_jz2).sum(0)
                            rho_c = (s1x[ox] * pyz_r).sum(0)
                            cell = jnp.stack([jx_c, jy_c, jz_c, rho_c])
                            cur = out_rims[0, :, 2 + ox:2 + ox + bx,
                                           g + oy:g + oy + ny,
                                           g + oz:g + oz + nz]
                            out_rims[0, :, 2 + ox:2 + ox + bx,
                                     g + oy:g + oy + ny,
                                     g + oz:g + oz + nz] = cur + cell

            # ---------------- outputs ---------------------------------
            out_k[...] = jnp.where(alive, 2, 3).astype(jnp.int32)
            for p in range(n_pay):
                if p == ci[0]:
                    val = posn[0]
                elif ndim > 1 and p == ci[1]:
                    val = posn[1]
                elif ndim > 2 and p == ci[2]:
                    val = posn[2]
                elif p == ui[0]:
                    val = ux4
                elif p == ui[1]:
                    val = uy4
                elif p == ui[2]:
                    val = uz4
                else:
                    val = blocks[p]
                out_p[p][...] = val
            out_ig[...] = ig2
            prev = jnp.where(is_first, 0, out_m[...])
            out_m[...] = prev + n_merged

        on = occ_ref[i] != 0
        pl.when(on)(compute)

        @pl.when(jnp.logical_not(on))
        def _():
            out_k[...] = jnp.full(out_k.shape, 3, jnp.int32)
            for p in range(n_pay):
                out_p[p][...] = jnp.zeros(out_p[p].shape,
                                          out_p[p].dtype)
            out_ig[...] = jnp.ones(out_ig.shape, out_ig.dtype)
            out_rims[...] = jnp.zeros(out_rims.shape, dtype)
            out_m[...] = jnp.where(is_first, 0, out_m[...])

    blk = (cap, bx) + tuple(other)
    zeros = (0,) * (ndim - 1)
    # index maps take *a so the occ path's trailing scalar-prefetch ref
    # argument is absorbed (PrefetchScalarGridSpec appends it)
    mspec = pl.BlockSpec(blk, lambda *a: (0, a[0]) + zeros)
    sspec = pl.BlockSpec((1, cap) + tuple(other),
                         lambda *a: (a[0], 0) + zeros)
    # per-slab field windows, pre-stacked (overlapping windows are not
    # expressible as a BlockSpec; DMA slices must be sublane-aligned)
    ebwin = jnp.stack([lax.slice_in_dim(eb_pad, i * bx, i * bx + bx + 4,
                                        axis=1)
                       for i in range(nbx)])
    ebspec = pl.BlockSpec((1, 6, bx + 4) + opad,
                          lambda *a: (a[0], 0, 0) + zeros)
    rims_shape = (nbx, 4, bx + 4) + opad
    rspec = pl.BlockSpec((1, 4, bx + 4) + opad,
                         lambda *a: (a[0], 0, 0) + zeros)
    cnt_spec = pl.BlockSpec((8, 128), lambda *a: (0, 0))
    in_specs = ([ebspec, mspec] + [mspec] * n_pay
                + [sspec] * (1 + n_pay) + [sspec] * (1 + n_pay))
    out_specs = ([mspec] + [mspec] * n_pay + [mspec, rspec, cnt_spec])
    out_shape = ([jax.ShapeDtypeStruct(key.shape, jnp.int32)]
                 + [jax.ShapeDtypeStruct(data[nm].shape, data[nm].dtype)
                    for nm in names]
                 + [jax.ShapeDtypeStruct(key.shape, dtype),
                    jax.ShapeDtypeStruct(rims_shape, dtype),
                    jax.ShapeDtypeStruct((8, 128), jnp.int32)])

    kw = _compile_kwargs()
    if not _use_interpret():
        kw = {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024)}
    if occ is None:
        occ = jnp.ones((nbx,), jnp.int32)
    qm = jnp.asarray([q, m], jnp.float64 if dtype == jnp.float64
                     else jnp.float32)
    call_kw = dict(grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(nbx,),
        in_specs=in_specs, out_specs=out_specs))

    outs = pl.pallas_call(kernel, out_shape=out_shape, **call_kw,
                          **kw)(qm, occ, ebwin, key,
                                *[data[nm] for nm in names],
                                *strips_lo, *strips_hi)
    key_out = outs[0]
    pays_out = list(outs[1:1 + n_pay])
    ig_out = outs[1 + n_pay]
    rims = outs[2 + n_pay]
    n_merged = outs[3 + n_pay][0, 0]
    return key_out, pays_out, ig_out, rims, n_merged


# ----------------------------------------------------------------------
# XLA prologue/epilogue wrapper — the drop-in species hot path
# ----------------------------------------------------------------------

def slab_species_step(eb_pad, data: Dict[str, jnp.ndarray], alive,
                      plan, *, q: float, m: float, dt: float,
                      deltas: Sequence[float], g: int,
                      skip_empty: bool | None = None):
    """The fused-path species stage on the slab megakernel. ``plan`` =
    ((nloc, HaloSpec, coord), ...) per cell axis, exactly as
    migrate_cells (the caller has ALREADY applied the position half
    push, i.e. data holds mid-step positions). Mesh axes 2.. must have
    size 1 (checked by the caller via slab_supported).

    Returns (data, alive, n_lost, jpad): data holds the fully pushed
    state (positions/momenta/inv_gamma post-Boris), jpad the padded
    Esirkepov currents (4, nx+2g, ...)."""
    from .cellpallas import _axis_strips, _fold, _mig_perms

    if skip_empty is None:
        skip_empty = occ_skip_enabled()
    cap = alive.shape[0]
    ndim = len(plan)
    cells = alive.shape[1:]
    nx = cells[0]
    bx = slab_bx(nx, ndim)
    nbx = nx // bx
    coords = tuple(p[2] for p in plan)
    periodic = tuple(plan[k][1].periodic for k in range(1, ndim))
    transient = set(_TRANSIENT) | {"inv_gamma"}
    names = sorted(k for k in data if k not in transient)
    mergeable = ("x", "y", "z", "ux", "uy", "uz")
    merge_idx = tuple([names.index("w")] if "w" in names else []) + tuple(
        names.index(k) for k in mergeable if k in names)
    sanitize = tuple(names.index(k)
                     for k in ("x", "y", "z", "w", "ux", "uy", "uz")
                     if k in names)

    # x-axis 5-way key from the mid-step positions (identical to
    # migrate_cells_fused axis 0)
    nloc0, spec0, coord0 = plan[0]
    pos = data[coord0]
    ishape = [1] * (1 + ndim)
    ishape[1] = nx
    idx = jnp.arange(nx, dtype=pos.dtype).reshape(ishape)
    local = pos - idx
    parity = ((jnp.arange(cap, dtype=jnp.int32) & 1) == 0).reshape(
        (cap,) + (1,) * ndim)
    out_hi = alive & (local >= 0.5)
    out_lo = alive & (local < -0.5)
    key = jnp.where(out_hi, 0,
                    jnp.where(out_lo, 4,
                              jnp.where(alive, 2,
                                        jnp.where(parity, 1, 3)))
                    ).astype(jnp.int32)

    payloads = [data[k] for k in names]
    ci0 = names.index(coord0)
    strips_l, strips_h = [], []
    for p_i, arr in enumerate([key] + payloads):
        sl, sh = _axis_strips(arr, 0, bx)
        is_coord = (p_i == 1 + ci0)
        is_key = (p_i == 0)

        def fix_wrap(strip, entry_idx, adj):
            col = lax.index_in_dim(strip, entry_idx, axis=1,
                                   keepdims=True)
            if spec0.size > 1:
                up, dn = _mig_perms(spec0.size)
                col = lax.ppermute(col, spec0.axis_name,
                                   up if adj < 0 else dn)
            if is_coord:
                col = col + jnp.asarray(adj * nloc0, col.dtype)
            if is_key and not spec0.periodic:
                i_dev = lax.axis_index(spec0.axis_name)
                edge = (i_dev == 0) if adj < 0 else \
                    (i_dev == spec0.size - 1)
                col = jnp.where(edge, jnp.full_like(col, 9), col)
            return lax.dynamic_update_index_in_dim(
                strip, col[:, 0], entry_idx, axis=1)

        sl = fix_wrap(sl, 0, -1)
        sh = fix_wrap(sh, nbx - 1, +1)
        # slab strip layout: (nbx, cap, *other) — trailing dims equal
        # the array dims, so no Mosaic pad is needed
        strips_l.append(jnp.moveaxis(sl, 1, 0))
        strips_h.append(jnp.moveaxis(sh, 1, 0))

    occ = None
    if skip_empty:
        res = alive.any(tuple(range(1 + 1, 1 + ndim))).any(0)  # (nx,)
        res = res.reshape(nbx, bx).any(1)
        arr_lo = (strips_l[0] == 0).any(tuple(range(1, 1 + ndim)))
        arr_hi = (strips_h[0] == 4).any(tuple(range(1, 1 + ndim)))
        occ = (res | arr_lo | arr_hi).astype(jnp.int32)

    key_out, pays_out, ig_out, rims, n_lost = unified_cell_step(
        eb_pad, key, data, strips_l, strips_h, names=names,
        merge_idx=merge_idx, coords=coords, periodic=periodic,
        q=q, m=m, dt=dt, deltas=deltas, g=g, occ=occ, sanitize=sanitize)

    data = {**data, **dict(zip(names, pays_out))}
    data["inv_gamma"] = ig_out
    alive = key_out == 2
    jpad = _fold(rims, nx, g, bx)
    return data, alive, n_lost, jpad


def slab_supported(plan, nloc, cap, switches, sp, cell_migration: str,
                   qed: bool, split: bool) -> bool:
    """Static eligibility for the slab megakernel fused path."""
    if not slab_enabled():
        return False
    if qed or split or cell_migration == "exact":
        return False
    if sp.pusher not in ("boris", "boris+tbmt") or sp.q == 0.0:
        return False
    for k in ("pusher", "interpolation", "migration",
              "current_deposition"):
        if not switches[k]:
            return False
    # mesh may be split along x only (in-block wrap along y/z)
    if any(p[1].size > 1 for p in plan[1:]):
        return False
    return slab_ok(tuple(nloc), cap)
