"""Fused Pallas fields half-step kernels (Yee update + CPML in one pass).

The XLA fields pipeline (ops/maxwell.py) lowers each E/B half-update into
a dozen separate fusions plus layout copies around the CPML psi slab
updates — a measured ~5.8 ms/step at 128^3 on one v5e chip (fields-only
probe, docs/BENCH_LOCAL.md) against an HBM-bandwidth floor of ~0.5 ms.
These kernels run one Pallas pass per half-update over x-slabs:

    curl diff (y/z in-block, x via neighbor-column refs)
    -> interior Yee update (kappa=1 rows: no multiply at all)
    -> CPML kappa corrections + psi recursion + psi corrections
       (slab rows only, matching the slab-restricted psi storage)

Design notes:
- grid over x-slabs, block (bxf, ny[, nz]); y/z stay whole so their
  diffs and PML slab rows are in-block static slices.
- x diffs read one neighbor column through a computed BlockSpec index
  map (clamped); the global-boundary column (periodic wrap or zeros) is
  prepared by the caller and selected at i==0 / i==nbx-1, exactly the
  ops/cellslab.py edge-column scheme.
- x-axis psi arrays (wx, ny[, nz]) ride in/out with a constant index
  map: the buffer stays VMEM-resident across the sequential TPU grid;
  the first block seeds it from the input and updates the lo-face rows,
  the last block updates the hi-face rows (regions are validated to sit
  inside those blocks), middle blocks leave it untouched. The matching
  field corrections are read-modify-writes on the output field refs
  under pl.when (value updates would not escape the conditional).
- kappa enters in correction form: interior rows multiply by exactly
  1.0 in the reference profiles (ops/cpml.py identity-outside-slab), so
  the kernel adds ``fac * (1/kappa - 1) * diff / d`` on slab rows only
  instead of multiplying everywhere. Same math, fewer flops; parity vs
  the XLA path is asserted to fp tolerance by
  tests/core/test_fieldspallas.py.

Reference parity anchors: Yee update core/maxwell/cpu.py:8-158, CPML
psi recursion + corrections core/boundary/cpml.py:342-729.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

from ..constants import c as c_light, epsilon_0
from ..core.grid import Grid
from ..core.state import FieldsState
from .cpml import CPMLCoeffs
from .cellpallas import _compile_kwargs, _use_interpret


def _env_int(name: str, default: int) -> int:
    import os
    v = os.environ.get(name)
    return int(v) if v else default


def fields_pallas_enabled() -> bool:
    import os
    return os.environ.get("LAMBDAPIC_FIELDS_PALLAS", "1") != "0"


def _fields_bx(nx: int, ndim: int) -> int:
    pref = _env_int("LAMBDAPIC_FIELDS_BX", 16)
    if ndim == 2:
        pref = _env_int("LAMBDAPIC_FIELDS_BX2", 64)
    while nx % pref:
        pref //= 2
        if pref == 0:
            return nx
    if ndim == 2 and pref % 8 and pref != nx:
        return nx
    return pref


# E/B update pair tables: (psi_key, curl source field, corrected target
# field, sign) per axis — the same (src, tgt, sign) structure carries the
# kappa correction terms (they multiply the identical diff).
_E_PAIRS = {
    "x": (("psi_ey_x", "bz", "ey", -1.0), ("psi_ez_x", "by", "ez", +1.0)),
    "y": (("psi_ex_y", "bz", "ex", +1.0), ("psi_ez_y", "bx", "ez", -1.0)),
    "z": (("psi_ex_z", "by", "ex", -1.0), ("psi_ey_z", "bx", "ey", +1.0)),
}
_B_PAIRS = {
    "x": (("psi_by_x", "ez", "by", +1.0), ("psi_bz_x", "ey", "bz", -1.0)),
    "y": (("psi_bx_y", "ez", "bx", -1.0), ("psi_bz_y", "ex", "bz", +1.0)),
    "z": (("psi_bx_z", "ey", "bx", +1.0), ("psi_by_z", "ex", "by", -1.0)),
}


def fields_pallas_ok(fields: FieldsState, grid: Grid,
                     cpml: Optional[CPMLCoeffs]) -> bool:
    """Static (trace-time) eligibility of the fused fields kernels.

    Requires: enabled; float32 (any dtype under interpret); slab psi
    storage for every PML axis; x-axis psi regions contained in the
    first/last x-slab blocks; kappa identity outside the slab regions.
    The CALLER must additionally guarantee the arrays are unsharded
    (one-device mesh): the kernel is not SPMD-partitionable.
    """
    if not fields_pallas_enabled():
        return False
    ndim = grid.dimension
    if ndim not in (2, 3):
        return False
    if fields.ex.dtype != jnp.float32 and not _use_interpret():
        return False
    if ndim == 2:
        # 2D neighbor-column fetches ride 8-row blocks (x is the
        # second-to-last dim); needs 8-divisible slabs
        nx = grid.shape[0]
        if nx % 8 or _fields_bx(nx, ndim) % 8:
            return False
    if cpml is not None:
        bxf = _fields_bx(grid.shape[0], ndim)
        for axis, ax in enumerate("xyz"[:ndim]):
            prof = cpml.axis(ax)
            if prof is None:
                continue
            regions = cpml.regions(ax)
            w = sum(r[1] for r in regions)
            n = grid.shape[axis]
            for key in _E_PAIRS[ax][0][0], _E_PAIRS[ax][1][0]:
                if key in fields.psi and fields.psi[key].shape[axis] != w:
                    return False
            for which in ("e", "b"):
                k = np.asarray(prof["kappa_" + which])
                mask = np.zeros(n, bool)
                for s, wd in regions:
                    mask[s:s + wd] = True
                if not np.all(k[~mask] == 1.0):
                    return False
            if ax == "x":
                for s, wd in regions:
                    if not (s + wd <= bxf or s >= n - bxf):
                        return False
    return True


def _coef_pack(prof, regions, which: str, npdtype):
    """Region-packed (b, c, 1/kappa - 1) coefficient rows (np arrays)."""
    rows = np.concatenate([np.arange(s, s + w) for s, w in regions])
    b = np.asarray(prof["b_" + which])[rows]
    cc = np.asarray(prof["c_" + which])[rows]
    ikm1 = 1.0 / np.asarray(prof["kappa_" + which])[rows] - 1.0
    return (b.astype(npdtype), cc.astype(npdtype), ikm1.astype(npdtype))


def _update_half(fields: FieldsState, grid: Grid, dt: float,
                 cpml: Optional[CPMLCoeffs], which: str) -> FieldsState:
    """Shared driver for the E ('e') and B ('b') half-updates."""
    ndim = grid.dimension
    dtype = fields.ex.dtype
    nx = grid.shape[0]
    other = grid.shape[1:]
    bxf = _fields_bx(nx, ndim)
    nbx = nx // bxf
    per = [grid.periodic(a) for a in ("x", "y", "z")[:ndim]]
    deltas = (grid.dx, grid.dy) + ((grid.dz,) if ndim == 3 else ())
    inv_d = [1.0 / d for d in deltas]                 # python floats
    pairs_tbl = _E_PAIRS if which == "e" else _B_PAIRS
    hi = which == "b"                  # diff_hi for B, diff_lo for E
    if which == "e":
        fac = float(dt * c_light ** 2)
        jf = float(dt / epsilon_0)
    else:
        fac = float(dt)
        jf = None

    f = {"ex": fields.ex, "ey": fields.ey, "ez": fields.ez,
         "bx": fields.bx, "by": fields.by, "bz": fields.bz}
    out_names = ("ex", "ey", "ez") if which == "e" else ("bx", "by", "bz")
    # x-diff neighbor sources: the two fields diff'd along x
    xsrc = ("bz", "by") if which == "e" else ("ez", "ey")

    npdtype = np.float32 if dtype == jnp.float32 else np.float64
    axes_info = []
    psi_in_keys = []
    if cpml is not None:
        for axis, ax in enumerate("xyz"[:ndim]):
            prof = cpml.axis(ax)
            if prof is None:
                continue
            regions = cpml.regions(ax)
            b, cc, ikm1 = _coef_pack(prof, regions, which, npdtype)
            axes_info.append((axis, ax, regions, b, cc, ikm1))
            psi_in_keys += [p[0] for p in pairs_tbl[ax]]

    # ---- caller-side prep: edge columns for the x diff ---------------
    edges = []
    for nm in xsrc:
        arr = f[nm]
        if per[0]:
            e = (lax.slice_in_dim(arr, 0, 1, axis=0) if hi
                 else lax.slice_in_dim(arr, nx - 1, nx, axis=0))
        else:
            e = jnp.zeros_like(lax.slice_in_dim(arr, 0, 1, axis=0))
        edges.append(e)

    blk = (bxf,) + other
    zeros_tr = (0,) * (ndim - 1)
    mspec = pl.BlockSpec(blk, lambda i: (i,) + zeros_tr)
    colblk = (1,) + other
    if ndim == 2:
        # in 2D, x is the SECOND-TO-LAST dim: a 1-row block of a
        # (nx, ny) array is not a legal TPU block (must be 8-divisible
        # or full). Fetch an 8-row block instead — bxf is 8-divisible
        # here (fields_pallas_ok gates) so the wanted neighbor row sits
        # at a static offset (7 for the lo fetch, 0 for hi); clamped
        # edge fetches are dead (the caller-prepared edge column is
        # selected there).
        b8 = bxf // 8
        if hi:
            cspec = pl.BlockSpec(
                (8,) + other,
                lambda i: (jnp.minimum((i + 1) * b8, nx // 8 - 1),)
                + zeros_tr)
        else:
            cspec = pl.BlockSpec(
                (8,) + other,
                lambda i: (jnp.maximum(i * b8 - 1, 0),) + zeros_tr)
    elif hi:
        cspec = pl.BlockSpec(
            colblk,
            lambda i: (jnp.minimum((i + 1) * bxf, nx - 1),) + zeros_tr)
    else:
        cspec = pl.BlockSpec(
            colblk, lambda i: (jnp.maximum(i * bxf - 1, 0),) + zeros_tr)
    espec = pl.BlockSpec(colblk, lambda i: (0,) + zeros_tr)

    # psi specs: x -> whole-array constant map; y/z -> x-sliced blocks
    psi_specs, psi_arrs, psi_out_shapes = [], [], []
    coef_specs, coef_arrs = [], []
    for axis, ax, regions, b, cc, ikm1 in axes_info:
        for key, *_ in pairs_tbl[ax]:
            parr = fields.psi[key]
            psi_arrs.append(parr)
            psi_out_shapes.append(jax.ShapeDtypeStruct(parr.shape,
                                                       parr.dtype))
            if ax == "x":
                psi_specs.append(pl.BlockSpec(
                    parr.shape, lambda i, _nd=parr.ndim: (0,) * _nd))
            else:
                psi_specs.append(pl.BlockSpec(
                    (bxf,) + parr.shape[1:], lambda i: (i,) + zeros_tr))
        # coefficient vectors: x/y as (w, 1), z as (1, w) — broadcastable
        # along the in-block slab axis
        for vec in (b, cc, ikm1):
            if ax == "z":
                coef_arrs.append(jnp.asarray(vec)[None, :])
                coef_specs.append(pl.BlockSpec(
                    (1, len(vec)), lambda i: (0, 0)))
            else:
                coef_arrs.append(jnp.asarray(vec)[:, None])
                coef_specs.append(pl.BlockSpec(
                    (len(vec), 1), lambda i: (0, 0)))

    n_psi = len(psi_arrs)
    n_coef = len(coef_arrs)

    def kernel(*refs):
        fr = {nm: refs[k] for k, nm in enumerate(
            ("ex", "ey", "ez", "bx", "by", "bz"))}
        k = 6
        jr = None
        if which == "e":
            jr = refs[k:k + 3]
            k += 3
        col0, col1 = refs[k], refs[k + 1]
        edg0, edg1 = refs[k + 2], refs[k + 3]
        k += 4
        psi_in = refs[k:k + n_psi]
        coef = refs[k + n_psi:k + n_psi + n_coef]
        outs = refs[k + n_psi + n_coef:k + n_psi + n_coef + 3]
        psi_out = refs[k + n_psi + n_coef + 3:]
        out_by_name = dict(zip(out_names, outs))

        i = pl.program_id(0)
        is_first = i == 0
        is_last = i == nbx - 1

        v = {nm: fr[nm][...] for nm in fr}

        # ---- raw diffs -------------------------------------------------
        def dshift(val, axis):
            """In-block raw diff along y/z: diff_lo (E) / diff_hi (B)."""
            n = val.shape[axis]
            periodic = per[axis]

            def cut(a, b_):
                s = [slice(None)] * val.ndim
                s[axis] = slice(a, b_)
                return val[tuple(s)]

            if hi:
                nxt = cut(0, 1) if periodic else jnp.zeros_like(cut(0, 1))
                return jnp.concatenate([cut(1, n), nxt], axis=axis) - val
            prv = cut(n - 1, n) if periodic else jnp.zeros_like(cut(0, 1))
            return val - jnp.concatenate([prv, cut(0, n - 1)], axis=axis)

        def dx_raw(val, col_ref, edg_ref):
            sel = is_last if hi else is_first
            if ndim == 2:
                cv = col_ref[...]
                ncol = jnp.where(sel, edg_ref[...],
                                 cv[0:1] if hi else cv[7:8])
            else:
                ncol = jnp.where(sel, edg_ref[...], col_ref[...])
            if hi:
                return jnp.concatenate([val[1:], ncol], axis=0) - val
            return val - jnp.concatenate([ncol, val[:-1]], axis=0)

        d = {(xsrc[0], 0): dx_raw(v[xsrc[0]], col0, edg0),
             (xsrc[1], 0): dx_raw(v[xsrc[1]], col1, edg1)}
        ysrc = ("bz", "bx") if which == "e" else ("ez", "ex")
        d[(ysrc[0], 1)] = dshift(v[ysrc[0]], 1)
        d[(ysrc[1], 1)] = dshift(v[ysrc[1]], 1)
        if ndim == 3:
            zsrc = ("by", "bx") if which == "e" else ("ey", "ex")
            d[(zsrc[0], 2)] = dshift(v[zsrc[0]], 2)
            d[(zsrc[1], 2)] = dshift(v[zsrc[1]], 2)

        # ---- interior update (kappa == 1 everywhere) --------------------
        o = {}
        if which == "e":
            if ndim == 3:
                o["ex"] = (v["ex"] + fac * (d[("bz", 1)] * inv_d[1]
                                            - d[("by", 2)] * inv_d[2])
                           - jf * jr[0][...])
                o["ey"] = (v["ey"] + fac * (d[("bx", 2)] * inv_d[2]
                                            - d[("bz", 0)] * inv_d[0])
                           - jf * jr[1][...])
                o["ez"] = (v["ez"] + fac * (d[("by", 0)] * inv_d[0]
                                            - d[("bx", 1)] * inv_d[1])
                           - jf * jr[2][...])
            else:
                o["ex"] = (v["ex"] + fac * d[("bz", 1)] * inv_d[1]
                           - jf * jr[0][...])
                o["ey"] = (v["ey"] - fac * d[("bz", 0)] * inv_d[0]
                           - jf * jr[1][...])
                o["ez"] = (v["ez"] + fac * (d[("by", 0)] * inv_d[0]
                                            - d[("bx", 1)] * inv_d[1])
                           - jf * jr[2][...])
        else:
            if ndim == 3:
                o["bx"] = v["bx"] - (fac * d[("ez", 1)] * inv_d[1]
                                     - fac * d[("ey", 2)] * inv_d[2])
                o["by"] = v["by"] - (fac * d[("ex", 2)] * inv_d[2]
                                     - fac * d[("ez", 0)] * inv_d[0])
                o["bz"] = v["bz"] - (fac * d[("ey", 0)] * inv_d[0]
                                     - fac * d[("ex", 1)] * inv_d[1])
            else:
                o["bx"] = v["bx"] - fac * d[("ez", 1)] * inv_d[1]
                o["by"] = v["by"] + fac * d[("ez", 0)] * inv_d[0]
                o["bz"] = v["bz"] - (fac * d[("ey", 0)] * inv_d[0]
                                     - fac * d[("ex", 1)] * inv_d[1])

        # ---- CPML y/z axes: vectorized slab update on VALUES -----------
        pk = 0
        ck = 0
        x_work = []              # deferred x-axis psi work (needs out refs)
        for axis, ax, regions, *_ in axes_info:
            b_ref, c_ref, ik_ref = coef[ck], coef[ck + 1], coef[ck + 2]
            ck += 3
            for (key, src, tgt, sign) in pairs_tbl[ax]:
                pref, pout = psi_in[pk], psi_out[pk]
                pk += 1
                if ax == "x":
                    x_work.append((regions, b_ref, c_ref, ik_ref,
                                   pref, pout, src, tgt, sign))
                    continue
                dif = d[(src, axis)]
                parts = []
                for (s, w) in regions:
                    sl = [slice(None)] * dif.ndim
                    sl[axis] = slice(s, s + w)
                    parts.append(dif[tuple(sl)])
                dslab = (parts[0] if len(parts) == 1
                         else jnp.concatenate(parts, axis=axis))
                shape = [1] * dif.ndim
                shape[axis] = dslab.shape[axis]
                bb = b_ref[...].reshape(shape)
                ccv = c_ref[...].reshape(shape)
                ik = ik_ref[...].reshape(shape)
                pnew = bb * pref[...] + ccv * dslab
                pout[...] = pnew
                corr = sign * fac * (ik * dslab * inv_d[axis] + pnew)
                # splice the corrected slab rows back via slice+concat
                # (static everywhere; no in-kernel dynamic-update-slice)
                tv = o[tgt]
                segs = []
                pos = 0
                off = 0
                for (s, w) in regions:
                    if s > pos:
                        sl = [slice(None)] * tv.ndim
                        sl[axis] = slice(pos, s)
                        segs.append(tv[tuple(sl)])
                    sl = [slice(None)] * tv.ndim
                    sl[axis] = slice(s, s + w)
                    so = [slice(None)] * tv.ndim
                    so[axis] = slice(off, off + w)
                    segs.append(tv[tuple(sl)] + corr[tuple(so)])
                    pos = s + w
                    off += w
                n_ax = tv.shape[axis]
                if pos < n_ax:
                    sl = [slice(None)] * tv.ndim
                    sl[axis] = slice(pos, n_ax)
                    segs.append(tv[tuple(sl)])
                o[tgt] = (segs[0] if len(segs) == 1
                          else jnp.concatenate(segs, axis=axis))

        # ---- write the updated fields ----------------------------------
        for k2, nm in enumerate(out_names):
            outs[k2][...] = o[nm]

        # ---- CPML x axis: edge blocks only, RMW on the output refs -----
        # seed the VMEM-resident x-psi buffers before the row updates
        for (_, _, _, _, pref, pout, _, _, _) in x_work:
            @pl.when(is_first)
            def _seed(pref=pref, pout=pout):
                pout[...] = pref[...]
        for (regions, b_ref, c_ref, ik_ref, pref, pout,
             src, tgt, sign) in x_work:
            dif = d[(src, 0)]
            tref = out_by_name[tgt]
            prow0 = 0
            for (s, w) in regions:
                lo_face = s + w <= bxf
                cond = is_first if lo_face else is_last
                base = 0 if lo_face else nx - bxf

                @pl.when(cond)
                def _rows(s=s, w=w, prow0=prow0, base=base, dif=dif,
                          b_ref=b_ref, c_ref=c_ref, ik_ref=ik_ref,
                          pref=pref, pout=pout, tref=tref, sign=sign):
                    for r in range(w):
                        gi = s + r - base           # block-local row
                        pr = prow0 + r              # packed psi row
                        drow = dif[gi:gi + 1]
                        pnew = (b_ref[pr, 0] * pref[pr:pr + 1]
                                + c_ref[pr, 0] * drow)
                        pout[pr:pr + 1] = pnew
                        tref[gi:gi + 1] = tref[gi:gi + 1] + sign * fac * (
                            ik_ref[pr, 0] * drow * inv_d[0] + pnew)
                prow0 += w

    in_arrs = ([f[nm] for nm in ("ex", "ey", "ez", "bx", "by", "bz")]
               + ([fields.jx, fields.jy, fields.jz] if which == "e" else [])
               + [f[xsrc[0]], f[xsrc[1]]] + edges
               + psi_arrs + coef_arrs)
    in_specs = ([mspec] * 6
                + ([mspec] * 3 if which == "e" else [])
                + [cspec, cspec, espec, espec]
                + psi_specs + coef_specs)
    out_shape = ([jax.ShapeDtypeStruct(f["ex"].shape, dtype)] * 3
                 + psi_out_shapes)
    out_specs = [mspec] * 3 + list(psi_specs)

    outs = pl.pallas_call(
        kernel, grid=(nbx,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, **_compile_kwargs())(*in_arrs)

    new_fields = dict(zip(out_names, outs[:3]))
    psi = dict(fields.psi)
    for key, arr in zip(psi_in_keys, outs[3:]):
        psi[key] = arr
    return fields.replace(psi=psi, **new_fields)


def update_efield_pl(fields: FieldsState, grid: Grid, dt: float,
                     cpml: Optional[CPMLCoeffs] = None) -> FieldsState:
    """Pallas drop-in for ops/maxwell.py::update_efield (same semantics,
    fp-tolerance parity; reference core/maxwell/cpu.py:8-22, 82-97 +
    cpml.py:531-708)."""
    return _update_half(fields, grid, dt, cpml, "e")


def update_bfield_pl(fields: FieldsState, grid: Grid, dt: float,
                     cpml: Optional[CPMLCoeffs] = None) -> FieldsState:
    """Pallas drop-in for ops/maxwell.py::update_bfield."""
    return _update_half(fields, grid, dt, cpml, "b")
