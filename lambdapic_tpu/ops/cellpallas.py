"""Pallas TPU kernels for the cell-binned engine hot loop.

The XLA cell kernels (ops/cell2d.py / cell3d.py) stream every tap panel
and pair product through HBM — at bench scale the hot loop is bound on
that intermediate traffic (the 3D deposit's 125-offset loop moves tens
of GB per step). These kernels block over cells, keep every tap, prefix
sum and pair product in VMEM, and touch HBM once per particle array.

Two kernels per dimension, split around the migration sorts (the step
order is gather/push -> re-bin -> deposit, ops/cell2d.py module
docstring):

- fused_push_cell_*: pos(dt/2) -> staggered gather -> Boris -> pos(dt/2)
  in one pass (the TPU analog of the reference unified pusher,
  unified_pusher_2d.c:157-365, minus the deposit, which needs the
  re-binned layout). Optionally also emits the gathered E,B per slot
  (QED species need them for chi; reference qed/inline.py:5-13 — chi
  uses the PRE-push momentum, which the caller still holds, so running
  the QED tau/event update after this kernel is order-equivalent to the
  reference's _interpolator -> _qed -> _push_momentum sequence).
- deposit_cell_*_pallas: 5-tap Esirkepov producing per-block rim
  panels that an XLA epilogue overlap-adds into the padded J
  (scatter-free accumulation across overlapping block footprints).

Numerical contract identical to the XLA cell kernels (the parity
oracles in tests/core/test_cellpallas.py). f32 on real TPU (pallas TPU
has no f64); CPU tests run in interpret mode where f64 also works.

Field windows are pre-sliced OUTSIDE the kernel (ebwin[i,j] = the
block's field neighborhood) because BlockSpec index maps cannot express
overlapping windows; the extraction is a cheap static-slice stack.

Block shapes respect the TPU tiling rules: particle blocks are
(cap, 8, 128) in 2D and (cap, bx, 8, nz) in 3D — the last two block
dims are (8,128)-aligned or equal to the array dims.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from ..constants import c as c_light

_GOFF = (-1, 0, 1)
_HOFF = (-2, -1, 0, 1)
_DOFF = (-2, -1, 0, 1, 2)
# Yee staggering per component (reference interpolation/cpu2d.c:62-68,
# cpu3d.c)
_COMPS2 = ((0, "h", "g"), (1, "g", "h"), (2, "g", "g"),
           (3, "g", "h"), (4, "h", "g"), (5, "h", "h"))
_COMPS3 = ((0, "h", "g", "g"), (1, "g", "h", "g"), (2, "g", "g", "h"),
           (3, "g", "h", "h"), (4, "h", "g", "h"), (5, "h", "h", "g"))

def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _compile_kwargs() -> dict:
    """interpret on CPU; on TPU raise the scoped-VMEM limit — the fused
    kernels' ~20 payload blocks + sorted-row temporaries overflow the
    conservative 16 MB default at the (8, 8) 3D block floor."""
    if _use_interpret():
        return {"interpret": True}
    from jax.experimental.pallas import tpu as pltpu
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=64 * 1024 * 1024)}


def _blk(n: int, pref: int) -> int:
    """Block extent: the preferred (tile-aligned) size when it divides the
    axis, else the whole axis (full-dim blocks are always legal)."""
    return pref if n % pref == 0 else n


def _env_blocks(name: str):
    import os
    v = os.environ.get(name)
    if v:
        a, b = (int(s) for s in v.split(","))
        return a, b
    return None


def _blocks2(nx: int, ny: int) -> Tuple[int, int]:
    pref = _env_blocks("LAMBDAPIC_BLOCKS2") or (8, 128)
    return _blk(nx, pref[0]), _blk(ny, pref[1])


def _blocks3(nx: int, ny: int) -> Tuple[int, int]:
    # (8, 8) measured fastest on v5e for the 3D laser-target (58 vs 53.5
    # Mpush/s at (2, 8); (8, 16) exceeds VMEM) — override to re-tune
    pref = _env_blocks("LAMBDAPIC_BLOCKS3") or (8, 8)
    return _blk(nx, pref[0]), _blk(ny, pref[1])


def pallas_cell_ok(nloc: Tuple[int, ...], cap: int = 16) -> bool:
    """Whether the local grid yields VMEM-sized blocks for these kernels
    (~dozens of live block-sized temporaries must fit in ~16 MB)."""
    if len(nloc) == 2:
        bx, by = _blocks2(*nloc)
        return cap * bx * by * 4 <= 1 << 19
    bx, by = _blocks3(nloc[0], nloc[1])
    return cap * bx * by * nloc[2] * 4 <= 1 << 19


def _m2(d):
    ad = jnp.abs(d)
    return jnp.where(ad <= 0.5, 0.75 - d * d,
                     jnp.where(ad < 1.5, 0.5 * (1.5 - ad) ** 2,
                               jnp.zeros_like(d)))


# ----------------------------------------------------------------------
# Block-occupancy skipping: localized plasmas (laser-solid targets, LWFA
# bunches) leave most cell-blocks with zero alive particles, yet every
# block pays the full tap/sort cost. The kernels below accept an
# optional per-block occupancy mask (scalar-prefetched into SMEM) and
# predicate the whole block body on it (pl.when), writing zeros for
# skipped blocks — equivalent output, since dead slots are already
# zero-sanitized by migrate_cells. Analogous waste does not exist in the
# reference (dynamic per-patch arrays, particles.py:141-193); this is
# the static-layout counterpart.
# ----------------------------------------------------------------------

def occ_skip_enabled() -> bool:
    """Block-occupancy skipping switch (LAMBDAPIC_OCC_SKIP, default on).
    Output-equivalent either way; off is an ablation/debug escape."""
    import os
    return os.environ.get("LAMBDAPIC_OCC_SKIP", "1") != "0"


def block_occupancy(alive: jnp.ndarray) -> jnp.ndarray:
    """(cap, *cells) bool -> (nbx, nby) int32: 1 where the push/deposit
    kernel block at that grid position contains any alive slot. Block
    granularity matches _blocks2/_blocks3 (what the K1/K2 kernels use)."""
    cells = alive.shape[1:]
    if len(cells) == 2:
        bx, by = _blocks2(*cells)
    else:
        bx, by = _blocks3(cells[0], cells[1])
    return _window_any(alive.any(0), bx, by)


def _window_any(m: jnp.ndarray, bx: int, by: int) -> jnp.ndarray:
    """any() over (bx, by) windows of the first two dims (trailing dims
    reduce fully): (c0, c1, ...) bool -> (c0//bx, c1//by) int32."""
    c = m.shape
    nb0, nb1 = c[0] // bx, c[1] // by
    m = m.reshape((nb0, bx, nb1, by) + c[2:])
    axes = (1, 3) + tuple(range(4, m.ndim))
    return jnp.any(m, axis=axes).astype(jnp.int32)


def _occ_gridspec(occ, grid, in_specs, out_specs):
    """pallas_call kwargs for the occupancy-predicated variant: the
    (nbx, nby) int32 mask rides as a scalar-prefetch arg (SMEM), and
    every index map gains the trailing scalar-ref argument."""
    from jax.experimental.pallas import tpu as pltpu

    def adapt(spec):
        im = spec.index_map
        return pl.BlockSpec(spec.block_shape,
                            lambda *a, _im=im: _im(*a[:-1]))

    single = isinstance(out_specs, pl.BlockSpec)
    outs = adapt(out_specs) if single else [adapt(s) for s in out_specs]
    return dict(grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=[adapt(s) for s in in_specs],
        out_specs=outs))


def _boris(ux, uy, uz, ex, ey, ez, bx, by, bz, q, m, dt, dtype):
    """Boris rotation (same expressions as ops/pusher.py::boris_push)."""
    efactor = jnp.asarray(q * dt / (2 * m * c_light), dtype)
    bfactor = jnp.asarray(q * dt / (2 * m), dtype)
    ux1 = ux + efactor * ex
    uy1 = uy + efactor * ey
    uz1 = uz + efactor * ez
    ig1 = 1.0 / jnp.sqrt(1.0 + ux1**2 + uy1**2 + uz1**2)
    tx = bfactor * bx * ig1
    ty = bfactor * by * ig1
    tz = bfactor * bz * ig1
    t2 = tx**2 + ty**2 + tz**2
    ux2 = ux1 + uy1 * tz - uz1 * ty
    uy2 = uy1 + uz1 * tx - ux1 * tz
    uz2 = uz1 + ux1 * ty - uy1 * tx
    sfac = 2.0 / (1.0 + t2)
    sx = tx * sfac
    sy = ty * sfac
    sz = tz * sfac
    ux3 = ux1 + uy2 * sz - uz2 * sy
    uy3 = uy1 + uz2 * sx - ux2 * sz
    uz3 = uz1 + ux2 * sy - uy2 * sx
    ux4 = ux3 + efactor * ex
    uy4 = uy3 + efactor * ey
    uz4 = uz3 + efactor * ez
    ig = 1.0 / jnp.sqrt(1.0 + ux4**2 + uy4**2 + uz4**2)
    return ux4, uy4, uz4, ig


def _windows_2d(eb_pad, nbx, nby, bx, by, g, nyp):
    wx, wy = bx + 2 * g, by + 2 * g
    rows = []
    for i in range(nbx):
        cols = [lax.slice(eb_pad, (0, i * bx, j * by),
                          (6, i * bx + wx, j * by + wy))
                for j in range(nby)]
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)                 # (nbx, nby, 6, wx, wy)


def _fold(rims, n: int, g: int, b: int):
    """Overlap-add per-block panels (nb, C, b+4, *trail) into
    (C, n+2g, *trail): block i's local index l maps to global padded
    index (g-2) + i*b + l."""
    nb, C = rims.shape[:2]
    trail = rims.shape[3:]
    npad = n + 2 * g
    out = jnp.zeros((C, npad) + trail, rims.dtype)

    def place(out, part, start):
        k = part.shape[2]
        if k < b:
            pad = [(0, 0)] * part.ndim
            pad[2] = (0, b - k)
            part = jnp.pad(part, pad)
        flat = jnp.moveaxis(part, 0, 1).reshape((C, nb * b) + trail)
        width = min(nb * b, npad - start)
        flat = flat[:, :width]
        zeros = (0,) * len(trail)
        cur = lax.slice(out, (0, start) + zeros, (C, start + width) + trail)
        return lax.dynamic_update_slice(out, cur + flat,
                                        (0, start) + zeros)

    out = place(out, rims[:, :, 2:2 + b], g)
    if b >= 2:
        out = place(out, rims[:, :, 0:2], g - 2)
        out = place(out, rims[:, :, 2 + b:], g + b)
    else:
        # b == 1: consecutive blocks' 2-wide halo panels OVERLAP in the
        # output (stride b < halo width), which the flatten-based
        # overlap-add cannot express — fold the halo column-by-column
        for j in range(2):
            out = place(out, rims[:, :, j:j + 1], g - 2 + j)
            out = place(out, rims[:, :, 2 + b + j:3 + b + j], g + b + j)
    return out


def _fold_cfirst(rims, n: int, g: int, b: int):
    """Overlap-add channel-first per-block panels (C, nb, b+4, *trail)
    into (C, n+2g, *trail). Same element order as _fold but the kernel
    emits rims with C leading, so the (nb, C) -> (C, nb) moveaxis
    relayout (a measured ~2 ms/step HBM transpose at the 3D bench
    shape) disappears — the flatten is a pure reshape."""
    C, nb = rims.shape[:2]
    trail = rims.shape[3:]
    npad = n + 2 * g
    out = jnp.zeros((C, npad) + trail, rims.dtype)

    def place(out, part, start):
        k = part.shape[2]
        if k < b:
            pad = [(0, 0)] * part.ndim
            pad[2] = (0, b - k)
            part = jnp.pad(part, pad)
        flat = part.reshape((C, nb * b) + trail)
        width = min(nb * b, npad - start)
        flat = flat[:, :width]
        zeros = (0,) * len(trail)
        cur = lax.slice(out, (0, start) + zeros, (C, start + width) + trail)
        return lax.dynamic_update_slice(out, cur + flat,
                                        (0, start) + zeros)

    out = place(out, rims[:, :, 2:2 + b], g)
    if b >= 2:
        out = place(out, rims[:, :, 0:2], g - 2)
        out = place(out, rims[:, :, 2 + b:], g + b)
    else:
        # b == 1: overlapping halo panels — column-by-column (see _fold)
        for j in range(2):
            out = place(out, rims[:, :, j:j + 1], g - 2 + j)
            out = place(out, rims[:, :, 2 + b + j:3 + b + j], g + b + j)
    return out


def _fold_xy(rims, nx, ny, g, bx, by):
    """(nbx, nby, 4, bx+4, by+4, *z) -> (4, nx+2g, ny+2g, *z)."""
    nbx, nby = rims.shape[:2]
    bx4, by4 = rims.shape[3], rims.shape[4]
    trail = rims.shape[5:]
    # fold y: (nby, C=nbx*4*bx4, by4, *z)
    r = jnp.moveaxis(rims, 1, 0).reshape((nby, nbx * 4 * bx4, by4) + trail)
    r = _fold(r, ny, g, by)                       # (C, nyp, *z)
    nyp = ny + 2 * g
    r = r.reshape((nbx, 4, bx4, nyp) + trail)
    return _fold(r, nx, g, bx)                    # (4, nxp, nyp, *z)


# ======================================================================
# K1: fused position/gather/Boris/position
# ======================================================================

def fused_push_cell_2d(eb_pad, x, y, ux, uy, uz, *, q: float, m: float,
                       dt: float, dx: float, dy: float, g: int,
                       want_eb: bool = False, do_pos1: bool = True,
                       occ=None):
    """Returns (x', y', ux', uy', uz', ig'[, 6 gathered components]).

    eb_pad (6, nx+2g, ny+2g); particle arrays (cap, nx, ny) in
    device-local cell coordinates, freshly re-binned (delta in
    [-0.5, 0.5)). With ``do_pos1=False`` the positions are ALREADY at
    the mid-step point (the step does pos-half + re-bin in XLA first,
    so the gather deltas stay within the 3/4-tap stencils). inv_gamma
    is recomputed from u (the migrate/sanitize invariants make this
    bitwise-consistent). ``occ``: optional (nbx, nby) int32
    block-occupancy mask (block_occupancy(alive)) — zero blocks skip
    all tap work and write zeros (dead slots are zero anyway)."""
    cap, nx, ny = x.shape
    dtype = x.dtype
    bx, by = _blocks2(nx, ny)
    nbx, nby = nx // bx, ny // by
    wx, wy = bx + 2 * g, by + 2 * g
    nyp = ny + 2 * g
    cdt_x = float(c_light * dt / dx)
    cdt_y = float(c_light * dt / dy)
    ebwin = _windows_2d(eb_pad, nbx, nby, bx, by, g, nyp)

    def kernel(*refs):
        if occ is not None:
            occ_ref, refs = refs[0], refs[1:]
        ebw_ref, x_ref, y_ref, ux_ref, uy_ref, uz_ref = refs[:6]
        out_refs = refs[6:]
        i = pl.program_id(0)
        j = pl.program_id(1)

        def compute():
            xb = x_ref[...]
            yb = y_ref[...]
            uxb = ux_ref[...]
            uyb = uy_ref[...]
            uzb = uz_ref[...]
            ig = 1.0 / jnp.sqrt(1.0 + uxb**2 + uyb**2 + uzb**2)
            if do_pos1:
                xm = xb + (0.5 * cdt_x) * uxb * ig
                ym = yb + (0.5 * cdt_y) * uyb * ig
            else:
                xm, ym = xb, yb

            shp = (cap, bx, by)
            ix = (lax.broadcasted_iota(jnp.int32, shp, 1)
                  + i * bx).astype(dtype)
            iy = (lax.broadcasted_iota(jnp.int32, shp, 2)
                  + j * by).astype(dtype)
            dxl = xm - ix
            dyl = ym - iy
            tapx = {"g": {o: _m2(o - dxl) for o in _GOFF},
                    "h": {o: _m2(o + 0.5 - dxl) for o in _HOFF}}
            tapy = {"g": {o: _m2(o - dyl) for o in _GOFF},
                    "h": {o: _m2(o + 0.5 - dyl) for o in _HOFF}}

            eb = []
            for comp, sx_, sy_ in _COMPS2:
                acc = jnp.zeros(shp, dtype)
                for ox, tx in tapx[sx_].items():
                    for oy, ty in tapy[sy_].items():
                        f = ebw_ref[0, 0, comp, g + ox:g + ox + bx,
                                    g + oy:g + oy + by]
                        acc = acc + tx * ty * f[None]
                eb.append(acc)

            ux4, uy4, uz4, ig2 = _boris(uxb, uyb, uzb, *eb, q, m, dt,
                                        dtype)
            xn = xm + (0.5 * cdt_x) * ux4 * ig2
            yn = ym + (0.5 * cdt_y) * uy4 * ig2

            outs = [xn, yn, ux4, uy4, uz4, ig2] + (eb if want_eb else [])
            for ref, val in zip(out_refs, outs):
                ref[...] = val

        if occ is None:
            compute()
        else:
            on = occ_ref[i, j] != 0
            pl.when(on)(compute)

            @pl.when(jnp.logical_not(on))
            def _():
                # inv_gamma (index 5) gets 1, not 0: dead slots must keep
                # 1/inv_gamma finite (QED chi, position pushes)
                for k, ref in enumerate(out_refs):
                    fill = 1.0 if k == 5 else 0.0
                    ref[...] = jnp.full(ref.shape, fill, ref.dtype)

    pspec = pl.BlockSpec((cap, bx, by), lambda i, j: (0, i, j))
    wspec = pl.BlockSpec((1, 1, 6, wx, wy), lambda i, j: (i, j, 0, 0, 0))
    n_out = 6 + (6 if want_eb else 0)
    out_shape = [jax.ShapeDtypeStruct((cap, nx, ny), dtype)] * n_out
    in_specs = [wspec] + [pspec] * 5
    out_specs = [pspec] * n_out
    if occ is None:
        kw = dict(grid=(nbx, nby), in_specs=in_specs, out_specs=out_specs)
        args = ()
    else:
        kw = _occ_gridspec(occ, (nbx, nby), in_specs, out_specs)
        args = (occ,)
    return pl.pallas_call(
        kernel, out_shape=out_shape, **kw, **_compile_kwargs(),
    )(*args, ebwin, x, y, ux, uy, uz)


# ======================================================================
# K2: 5-tap Esirkepov deposit, post-re-bin
# ======================================================================

def deposit_cell_2d_pallas(x, y, ux, uy, uz, inv_gamma, w, *, q: float,
                           dx: float, dy: float, dt: float, g: int,
                           occ=None):
    """Same contract as ops/cell2d.py::deposit_cell_2d (home-cell binned
    input; w == 0 for dead slots). Returns jpad (4, nx+2g, ny+2g).
    ``occ``: optional block-occupancy mask — zero blocks emit zero rims
    without tap work."""
    cap, nx, ny = x.shape
    dtype = x.dtype
    bx, by = _blocks2(nx, ny)
    nbx, nby = nx // bx, ny // by
    cdt_x = float(c_light * dt / dx)
    cdt_y = float(c_light * dt / dy)
    f_cd = float(q / (dx * dy))
    f_dx = float(q / (dy * dt))
    f_dy = float(q / (dx * dt))

    def kernel(*refs):
        if occ is not None:
            occ_ref, refs = refs[0], refs[1:]
        (x_ref, y_ref, ux_ref, uy_ref, uz_ref, ig_ref, w_ref,
         out_ref) = refs
        i = pl.program_id(0)
        j = pl.program_id(1)
        out_ref[...] = jnp.zeros(out_ref.shape, dtype)

        def compute():
            ig = ig_ref[...]
            wb = w_ref[...]
            vx = ux_ref[...] * ig * cdt_x
            vy = uy_ref[...] * ig * cdt_y
            vz = uz_ref[...] * ig * float(c_light)
            shp = (cap, bx, by)
            ix = (lax.broadcasted_iota(jnp.int32, shp, 1)
                  + i * bx).astype(dtype)
            iy = (lax.broadcasted_iota(jnp.int32, shp, 2)
                  + j * by).astype(dtype)
            dxl = x_ref[...] - ix
            dyl = y_ref[...] - iy

            s0x = {o: _m2(o - (dxl - 0.5 * vx)) for o in _DOFF}
            s1x = {o: _m2(o - (dxl + 0.5 * vx)) for o in _DOFF}
            s0y = {o: _m2(o - (dyl - 0.5 * vy)) for o in _DOFF}
            s1y = {o: _m2(o - (dyl + 0.5 * vy)) for o in _DOFF}

            cd = f_cd * wb
            fdx = f_dx * wb
            fdy = f_dy * wb
            cvz = cd * vz

            fx_run = {}
            acc = jnp.zeros(shp, dtype)
            for o in _DOFF:
                acc = acc + (s1x[o] - s0x[o])
                fx_run[o] = -fdx * acc
            gy_run = {}
            acc = jnp.zeros(shp, dtype)
            for o in _DOFF:
                acc = acc + (s1y[o] - s0y[o])
                gy_run[o] = -fdy * acc

            for ox in _DOFF:
                dsx = s1x[ox] - s0x[ox]
                ax = s0x[ox] + 0.5 * dsx
                for oy in _DOFF:
                    dsy = s1y[oy] - s0y[oy]
                    by_t = s0y[oy] + 0.5 * dsy
                    jx_c = (fx_run[ox] * by_t).sum(0)
                    jy_c = (ax * gy_run[oy]).sum(0)
                    jz_c = (cvz * (ax * by_t
                                   + dsx * dsy * (1.0 / 12.0))).sum(0)
                    rho_c = (cd * s1x[ox] * s1y[oy]).sum(0)
                    cell = jnp.stack([jx_c, jy_c, jz_c, rho_c])
                    cur = out_ref[0, 0, :, 2 + ox:2 + ox + bx,
                                  2 + oy:2 + oy + by]
                    out_ref[0, 0, :, 2 + ox:2 + ox + bx,
                            2 + oy:2 + oy + by] = cur + cell

        if occ is None:
            compute()
        else:
            pl.when(occ_ref[i, j] != 0)(compute)

    pspec = pl.BlockSpec((cap, bx, by), lambda i, j: (0, i, j))
    ospec = pl.BlockSpec((1, 1, 4, bx + 4, by + 4),
                         lambda i, j: (i, j, 0, 0, 0))
    in_specs = [pspec] * 7
    if occ is None:
        kw = dict(grid=(nbx, nby), in_specs=in_specs, out_specs=ospec)
        args = ()
    else:
        kw = _occ_gridspec(occ, (nbx, nby), in_specs, ospec)
        args = (occ,)
    rims = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nbx, nby, 4, bx + 4, by + 4),
                                       dtype),
        **kw, **_compile_kwargs(),
    )(*args, x, y, ux, uy, uz, inv_gamma, w)

    return _fold_xy(rims, nx, ny, g, bx, by)


def fused_push_cell_3d(eb_pad, x, y, z, ux, uy, uz, *, q: float, m: float,
                       dt: float, dx: float, dy: float, dz: float, g: int,
                       want_eb: bool = False, do_pos1: bool = True,
                       occ=None):
    """3D fused [pos/]gather/Boris/pos: blocks over (x, y), z whole.
    See fused_push_cell_2d for the do_pos1 and occ contracts."""
    cap, nx, ny, nz = x.shape
    dtype = x.dtype
    bx, by = _blocks3(nx, ny)
    nbx, nby = nx // bx, ny // by
    wx, wy = bx + 2 * g, by + 2 * g
    nzp = nz + 2 * g
    cdt = (float(c_light * dt / dx), float(c_light * dt / dy),
           float(c_light * dt / dz))

    rows = []
    for i in range(nbx):
        cols = [lax.slice(eb_pad, (0, i * bx, j * by, 0),
                          (6, i * bx + wx, j * by + wy, nzp))
                for j in range(nby)]
        rows.append(jnp.stack(cols))
    ebwin = jnp.stack(rows)        # (nbx, nby, 6, wx, wy, nzp)

    def kernel(*refs):
        if occ is not None:
            occ_ref, refs = refs[0], refs[1:]
        ebw_ref, x_ref, y_ref, z_ref, ux_ref, uy_ref, uz_ref = refs[:7]
        out_refs = refs[7:]
        i = pl.program_id(0)
        j = pl.program_id(1)

        def compute():
            xb, yb, zb = x_ref[...], y_ref[...], z_ref[...]
            uxb, uyb, uzb = ux_ref[...], uy_ref[...], uz_ref[...]
            ig = 1.0 / jnp.sqrt(1.0 + uxb**2 + uyb**2 + uzb**2)
            if do_pos1:
                xm = xb + (0.5 * cdt[0]) * uxb * ig
                ym = yb + (0.5 * cdt[1]) * uyb * ig
                zm = zb + (0.5 * cdt[2]) * uzb * ig
            else:
                xm, ym, zm = xb, yb, zb

            shp = (cap, bx, by, nz)
            ix = (lax.broadcasted_iota(jnp.int32, shp, 1)
                  + i * bx).astype(dtype)
            iy = (lax.broadcasted_iota(jnp.int32, shp, 2)
                  + j * by).astype(dtype)
            iz = lax.broadcasted_iota(jnp.int32, shp, 3).astype(dtype)
            dxl, dyl, dzl = xm - ix, ym - iy, zm - iz
            tapx = {"g": {o: _m2(o - dxl) for o in _GOFF},
                    "h": {o: _m2(o + 0.5 - dxl) for o in _HOFF}}
            tapy = {"g": {o: _m2(o - dyl) for o in _GOFF},
                    "h": {o: _m2(o + 0.5 - dyl) for o in _HOFF}}
            tapz = {"g": {o: _m2(o - dzl) for o in _GOFF},
                    "h": {o: _m2(o + 0.5 - dzl) for o in _HOFF}}

            eb = []
            for comp, sx_, sy_, sz_ in _COMPS3:
                acc = jnp.zeros(shp, dtype)
                for oy, ty in tapy[sy_].items():
                    for oz, tz in tapz[sz_].items():
                        tyz = ty * tz
                        for ox, tx in tapx[sx_].items():
                            f = ebw_ref[0, 0, comp,
                                        g + ox:g + ox + bx,
                                        g + oy:g + oy + by,
                                        g + oz:g + oz + nz]
                            acc = acc + tx * tyz * f[None]
                eb.append(acc)

            ux4, uy4, uz4, ig2 = _boris(uxb, uyb, uzb, *eb, q, m, dt,
                                        dtype)
            xn = xm + (0.5 * cdt[0]) * ux4 * ig2
            yn = ym + (0.5 * cdt[1]) * uy4 * ig2
            zn = zm + (0.5 * cdt[2]) * uz4 * ig2

            outs = [xn, yn, zn, ux4, uy4, uz4, ig2] + (
                eb if want_eb else [])
            for ref, val in zip(out_refs, outs):
                ref[...] = val

        if occ is None:
            compute()
        else:
            on = occ_ref[i, j] != 0
            pl.when(on)(compute)

            @pl.when(jnp.logical_not(on))
            def _():
                # inv_gamma (index 6) gets 1, not 0 (see 2D kernel)
                for k, ref in enumerate(out_refs):
                    fill = 1.0 if k == 6 else 0.0
                    ref[...] = jnp.full(ref.shape, fill, ref.dtype)

    pspec = pl.BlockSpec((cap, bx, by, nz), lambda i, j: (0, i, j, 0))
    wspec = pl.BlockSpec((1, 1, 6, wx, wy, nzp),
                         lambda i, j: (i, j, 0, 0, 0, 0))
    n_out = 7 + (6 if want_eb else 0)
    out_shape = [jax.ShapeDtypeStruct((cap, nx, ny, nz), dtype)] * n_out
    in_specs = [wspec] + [pspec] * 6
    out_specs = [pspec] * n_out
    if occ is None:
        kw = dict(grid=(nbx, nby), in_specs=in_specs, out_specs=out_specs)
        args = ()
    else:
        kw = _occ_gridspec(occ, (nbx, nby), in_specs, out_specs)
        args = (occ,)
    return pl.pallas_call(
        kernel, out_shape=out_shape, **kw, **_compile_kwargs(),
    )(*args, ebwin, x, y, z, ux, uy, uz)


def deposit_cell_3d_pallas(x, y, z, ux, uy, uz, inv_gamma, w, *, q: float,
                           dx: float, dy: float, dz: float, dt: float,
                           g: int, occ=None):
    """3D 5-tap Esirkepov deposit (post-re-bin), blocked over (x, y);
    same closed forms as ops/cell3d.py::deposit_cell_3d. ``occ``: see
    deposit_cell_2d_pallas."""
    cap, nx, ny, nz = x.shape
    dtype = x.dtype
    bx, by = _blocks3(nx, ny)
    nbx, nby = nx // bx, ny // by
    nzp = nz + 2 * g
    cdt = (float(c_light * dt / dx), float(c_light * dt / dy),
           float(c_light * dt / dz))
    f_cd = float(q / (dx * dy * dz))
    f_dx = float(q / (dy * dz * dt))
    f_dy = float(q / (dx * dz * dt))
    f_dz = float(q / (dx * dy * dt))

    def kernel(*refs):
        if occ is not None:
            occ_ref, refs = refs[0], refs[1:]
        (x_ref, y_ref, z_ref, ux_ref, uy_ref, uz_ref, ig_ref, w_ref,
         out_ref) = refs
        i = pl.program_id(0)
        j = pl.program_id(1)
        out_ref[...] = jnp.zeros(out_ref.shape, dtype)

        def compute():
            ig = ig_ref[...]
            wb = w_ref[...]
            vx = ux_ref[...] * ig * cdt[0]
            vy = uy_ref[...] * ig * cdt[1]
            vz = uz_ref[...] * ig * cdt[2]
            shp = (cap, bx, by, nz)
            ix = (lax.broadcasted_iota(jnp.int32, shp, 1)
                  + i * bx).astype(dtype)
            iy = (lax.broadcasted_iota(jnp.int32, shp, 2)
                  + j * by).astype(dtype)
            iz = lax.broadcasted_iota(jnp.int32, shp, 3).astype(dtype)
            dxl = x_ref[...] - ix
            dyl = y_ref[...] - iy
            dzl = z_ref[...] - iz

            def taps(d, v):
                s0 = {o: _m2(o - (d - 0.5 * v)) for o in _DOFF}
                s1 = {o: _m2(o - (d + 0.5 * v)) for o in _DOFF}
                ds = {o: s1[o] - s0[o] for o in _DOFF}
                a = {o: s0[o] + 0.5 * ds[o] for o in _DOFF}
                cc = {o: 0.5 * s0[o] + ds[o] * (1.0 / 3.0) for o in _DOFF}
                run = {}
                acc = jnp.zeros(shp, dtype)
                for o in _DOFF:
                    acc = acc + ds[o]
                    run[o] = acc
                return s0, s1, ds, a, cc, run

            s0x, s1x, dsx, ax, cx, runx = taps(dxl, vx)
            s0y, s1y, dsy, ay, cy, runy = taps(dyl, vy)
            s0z, s1z, dsz, az, cz, runz = taps(dzl, vz)

            cd = f_cd * wb
            fdx = f_dx * wb
            fdy = f_dy * wb
            fdz = f_dz * wb

            for oy in _DOFF:
                for oz in _DOFF:
                    pyz_jx = -(ay[oy] * s0z[oz] + cy[oy] * dsz[oz]) * fdx
                    pyz_jy = -(runy[oy] * s0z[oz]) * fdy
                    pyz_jy2 = -(runy[oy] * dsz[oz]) * fdy
                    pyz_jz = -(runz[oz] * s0y[oy]) * fdz
                    pyz_jz2 = -(runz[oz] * dsy[oy]) * fdz
                    pyz_r = (s1y[oy] * s1z[oz]) * cd
                    for ox in _DOFF:
                        jx_c = (runx[ox] * pyz_jx).sum(0)
                        jy_c = (ax[ox] * pyz_jy + cx[ox] * pyz_jy2).sum(0)
                        jz_c = (ax[ox] * pyz_jz + cx[ox] * pyz_jz2).sum(0)
                        rho_c = (s1x[ox] * pyz_r).sum(0)
                        cell = jnp.stack([jx_c, jy_c, jz_c, rho_c])
                        cur = out_ref[0, 0, :, 2 + ox:2 + ox + bx,
                                      2 + oy:2 + oy + by,
                                      g + oz:g + oz + nz]
                        out_ref[0, 0, :, 2 + ox:2 + ox + bx,
                                2 + oy:2 + oy + by,
                                g + oz:g + oz + nz] = cur + cell

        if occ is None:
            compute()
        else:
            pl.when(occ_ref[i, j] != 0)(compute)

    pspec = pl.BlockSpec((cap, bx, by, nz), lambda i, j: (0, i, j, 0))
    ospec = pl.BlockSpec((1, 1, 4, bx + 4, by + 4, nzp),
                         lambda i, j: (i, j, 0, 0, 0, 0))
    in_specs = [pspec] * 8
    if occ is None:
        kw = dict(grid=(nbx, nby), in_specs=in_specs, out_specs=ospec)
        args = ()
    else:
        kw = _occ_gridspec(occ, (nbx, nby), in_specs, ospec)
        args = (occ,)
    rims = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (nbx, nby, 4, bx + 4, by + 4, nzp), dtype),
        **kw, **_compile_kwargs(),
    )(*args, x, y, z, ux, uy, uz, inv_gamma, w)

    return _fold_xy(rims, nx, ny, g, bx, by)


# ======================================================================
# K3: slot-axis key sort for the migration re-binning
# ======================================================================

def _batcher_network(n: int, cap: int):
    """Batcher odd-even mergesort compare-exchange list for n = 2^k slots,
    skipping CEs whose upper index >= cap (virtual +inf entries)."""
    ces = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            for j in range(k % p, n - k, 2 * k):
                for i in range(0, min(k, n - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        a, b = i + j, i + j + k
                        if b < cap:
                            ces.append((a, b))
            k //= 2
        p *= 2
    return ces


def sort_cells_pallas(key, payloads):
    """Sort (key, *payloads) along axis 0 (the slot axis) independently
    per trailing position — the pallas replacement for the migration's
    multi-operand lax.sort (ops/cell2d.py::migrate_cells). The whole
    sorting network runs on VMEM-resident blocks: HBM is touched once
    per array instead of once per network stage. Blocks tile the CELL
    dims directly (no flatten — collapsing the tiled trailing dims
    would force a physical relayout of every payload).

    key: (cap, *cells) int32; payloads: list of (cap, *cells) arrays.
    Returns (sorted_key, [sorted payloads]) with the same shapes."""
    cap = key.shape[0]
    cells = key.shape[1:]
    n2 = 1
    while n2 < cap:
        n2 *= 2
    ces = _batcher_network(n2, cap)

    if len(cells) == 2:
        bx, by = _blocks2(*cells)
        grid = (cells[0] // bx, cells[1] // by)
        block = (cap, bx, by)
        imap = lambda i, j: (0, i, j)
    elif len(cells) == 3:
        bx, by = _blocks3(cells[0], cells[1])
        grid = (cells[0] // bx, cells[1] // by)
        block = (cap, bx, by, cells[2])
        imap = lambda i, j: (0, i, j, 0)
    else:
        grid = (1,)
        block = (cap,) + tuple(cells)
        imap = lambda i: (0,) * (1 + len(cells))

    def kernel(key_ref, *refs):
        n_pay = len(payloads)
        in_refs = refs[:n_pay]
        out_refs = refs[n_pay:]
        # rows held as separate (1, bm) values: compare-exchanges become
        # pure selects (Mosaic has no scatter for .at[row].set)
        rows_k = [key_ref[a:a + 1, :] for a in range(cap)]
        rows_v = [[r[a:a + 1, :] for a in range(cap)] for r in in_refs]
        for a, b in ces:
            ka, kb = rows_k[a], rows_k[b]
            swap = ka > kb
            rows_k[a] = jnp.where(swap, kb, ka)
            rows_k[b] = jnp.where(swap, ka, kb)
            for vlist in rows_v:
                va, vb = vlist[a], vlist[b]
                vlist[a] = jnp.where(swap, vb, va)
                vlist[b] = jnp.where(swap, va, vb)
        out_refs[0][...] = jnp.concatenate(rows_k, axis=0)
        for idx in range(n_pay):
            out_refs[1 + idx][...] = jnp.concatenate(rows_v[idx], axis=0)

    spec = pl.BlockSpec(block, imap)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec] * (1 + len(payloads)),
        out_specs=[spec] * (1 + len(payloads)),
        out_shape=[jax.ShapeDtypeStruct(key.shape, a.dtype)
                   for a in [key] + list(payloads)],
        **_compile_kwargs(),
    )(key, *payloads)
    return outs[0], list(outs[1:])


# ======================================================================
# K3-fused: per-axis migration (sort + neighbor exchange + merge) in one
# VMEM pass
# ======================================================================

def _mig_blocks(cells: Tuple[int, ...], axis: int = 0) -> Tuple[int, int]:
    """Block extents over (x, y) for the fused migration kernel; smaller
    than the push/deposit blocks because the kernel holds ~3 copies of
    every payload row (own / lo-source / hi-source).

    Per-axis: the strip BlockSpec of migration axis a constrains the
    OTHER axes' block extents to be 8-divisible (Mosaic tiling), while
    the extent along a itself is free — so each axis call shrinks its
    own-axis block to keep the kernel inside scoped VMEM."""
    pref = _env_blocks("LAMBDAPIC_MIG_BLOCKS")
    if pref is None:
        # 3D: both extents must be 8-divisible (or full) — the main
        # block's second-to-last dim and the strips of the other axes
        # both demand it — so (8, 8) is the floor; the kernel raises the
        # scoped-VMEM limit to fit
        pref = (8, 128) if len(cells) == 2 else (8, 8)
    return _blk(cells[0], pref[0]), _blk(cells[1], pref[1])


def migrate_axis_fused(key, payloads, merge_idx, axis: int,
                       strips_lo, strips_hi, occ=None):
    """One migration axis for the cell engine, fused: per-cell slot sort
    (5-way key), ±1-cell neighbor exchange, overwrite/merge placement and
    merge counting — one HBM read + one write per payload array, replacing
    the separate sort kernel + 6 full-array rolls + where-merge chains
    (measured 3D: rolls 21 ms + merges 8.5 ms + sorts 6 ms per step
    collapse to ~7 ms).

    key: (cap, *cells) int32 in {0 donor+1, 1 dead, 2 stay, 3 dead,
    4 donor-1} (9 = invalid strip entry at open boundaries).
    payloads: list of (cap, *cells) arrays. merge_idx: indices into
    payloads of [w, *weight-averaged attrs] — empty disables merging
    (pure overwrite, arrivals win; used only by tests).
    strips_lo/strips_hi: per-block halo columns for [key, *payloads]:
    same shapes with the migration axis replaced by n_blocks along that
    axis (entry b = the column just left/right of block b), already
    wrap-adjusted and device-exchanged by the caller.

    Strip Mosaic layout: VMEM blocks must tile (8, 128) on their last two
    dims or span the array, so the thin (one-column-per-block) strips are
    relayouted here to (nb, cap, *other_dims) — the per-block index
    becomes a leading, unconstrained dim. Where the trailing dims of that
    layout still cannot satisfy the rule (2D y-axis, 3D z-axis: the last
    other-dim's block extent is 8, not 128-divisible), an 8-wide
    broadcast dummy dim is appended — HBM cost x8 of a strip (small),
    VMEM cost sliced away before sorting.

    ``occ``: optional (n_blocks_i, n_blocks_j) int32 — blocks with no
    alive slot AND no arriving strip donor skip the sorting networks and
    write all-dead outputs (the caller computes arrival-exact occupancy
    from the exchanged key strips, so cross-device arrivals into empty
    blocks are never skipped).

    Returns (key_out, payloads_out, n_merged) where key_out is 2 for
    alive slots and 3 for dead, and n_merged is a scalar int32."""
    cap = key.shape[0]
    cells = key.shape[1:]
    ndim = len(cells)
    n2 = 1
    while n2 < cap:
        n2 *= 2
    ces = _batcher_network(n2, cap)

    bx, by = _mig_blocks(cells, axis)
    grid = (cells[0] // bx, cells[1] // by)
    blk = [cap, bx, by] + ([cells[2]] if ndim == 3 else [])
    maxis = 1 + axis                      # array axis of migration
    blk_sizes = (bx, by) + ((cells[2],) if ndim == 3 else ())
    nb = cells[axis] // blk_sizes[axis]

    # other (non-migration) cell dims, their block extents, and the grid
    # coordinate that indexes each of them (None = unblocked)
    others = [d for d in range(ndim) if d != axis]
    odims = tuple(cells[d] for d in others)
    oblk = tuple(blk_sizes[d] for d in others)
    ogrid = tuple(({0: "i", 1: "j"}.get(d)) for d in others)

    def _fits(second, last, dsecond, dlast):
        return (second % 8 == 0 or second == dsecond) and \
            (last % 128 == 0 or last == dlast)

    if len(oblk) == 1:
        pad = not _fits(cap, oblk[0], cap, odims[0])
    else:
        pad = not _fits(oblk[-2], oblk[-1], odims[-2], odims[-1])
    if pad and not (oblk[-1] % 8 == 0 or oblk[-1] == odims[-1]):
        raise ValueError(
            f"fused migration blocks {oblk} incompatible with Mosaic "
            f"tiling for cells {cells} axis {axis}")

    def relayout_strip(s):
        # (cap, ..., nb at maxis, ...) -> (nb, cap, *odims[, 8])
        s = jnp.moveaxis(s, maxis, 0)
        if pad:
            s = jnp.broadcast_to(s[..., None], s.shape + (8,))
        return s

    sblk = (1, cap) + oblk + ((8,) if pad else ())

    def imap_main(i, j):
        return (0, i, j) + ((0,) if ndim == 3 else ())

    def imap_strip(i, j):
        g = {"i": i, "j": j, None: 0}
        bidx = g[{0: "i", 1: "j"}.get(axis)]
        return (bidx, 0) + tuple(g[c] for c in ogrid) + \
            ((0,) if pad else ())

    # halo rows inside the kernel: main-row shape with the migration
    # axis collapsed to one column
    halo_shape = tuple(1 if d == maxis else e
                       for d, e in enumerate([1] + list(blk_sizes)))

    n_pay = len(payloads)

    def kernel(*refs):
        if occ is not None:
            occ_ref, refs = refs[0], refs[1:]
        k_ref = refs[0]
        p_refs = refs[1:1 + n_pay]
        sl_refs = refs[1 + n_pay:2 + 2 * n_pay]
        sh_refs = refs[2 + 2 * n_pay:3 + 3 * n_pay]
        out_k = refs[3 + 3 * n_pay]
        out_p = refs[4 + 3 * n_pay:4 + 4 * n_pay]
        out_m = refs[4 + 4 * n_pay]
        is_first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

        def sort_rows(rows_k, rows_v):
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

        def main_rows(ref):
            return [ref[a:a + 1] for a in range(cap)]

        def strip_rows(ref):
            v = ref[...]
            if pad:
                v = v[..., 0]
            return [lax.slice_in_dim(v, a, a + 1, axis=1)
                    .reshape(halo_shape) for a in range(cap)]

        def compute():
            rk, rv = sort_rows(main_rows(k_ref),
                               [main_rows(r) for r in p_refs])
            slk, slv = sort_rows(strip_rows(sl_refs[0]),
                                 [strip_rows(r) for r in sl_refs[1:]])
            shk, shv = sort_rows(strip_rows(sh_refs[0]),
                                 [strip_rows(r) for r in sh_refs[1:]])

            def shift_lo(strip_row, main_row):
                # lo-source col c = sorted col c-1 (strip for c=0)
                body = lax.slice_in_dim(main_row, 0,
                                        main_row.shape[maxis] - 1,
                                        axis=maxis)
                return jnp.concatenate([strip_row, body], axis=maxis)

            def shift_hi(strip_row, main_row):
                body = lax.slice_in_dim(main_row, 1,
                                        main_row.shape[maxis], axis=maxis)
                return jnp.concatenate([body, strip_row], axis=maxis)

            n_merged = jnp.zeros((), jnp.int32)
            out_rows_k = []
            out_rows_p = [[] for _ in range(n_pay)]
            w_i = merge_idx[0] if merge_idx else -1
            for a in range(cap):
                lo_k = shift_lo(slk[a], rk[a])
                hi_k = shift_hi(shk[a], rk[a])
                val_lo = lo_k == 0
                val_hi = hi_k == 4
                stay = rk[a] == 2
                alive_new = val_lo | val_hi | stay
                n_src = (val_lo.astype(jnp.int32)
                         + val_hi.astype(jnp.int32)
                         + stay.astype(jnp.int32))
                multi = n_src >= 2
                n_merged = n_merged + jnp.sum(
                    jnp.maximum(n_src - 1, 0)).astype(jnp.int32)
                if merge_idx:
                    w_lo_full = shift_lo(slv[w_i][a], rv[w_i][a])
                    w_hi_full = shift_hi(shv[w_i][a], rv[w_i][a])
                    w_lo = jnp.where(val_lo, w_lo_full, 0.0)
                    w_hi = jnp.where(val_hi, w_hi_full, 0.0)
                    w_res = jnp.where(stay, rv[w_i][a], 0.0)
                    wsum = w_lo + w_hi + w_res
                    wsafe = jnp.maximum(wsum, jnp.asarray(
                        1e-300 if wsum.dtype == jnp.float64 else 1e-30,
                        wsum.dtype))
                for p in range(n_pay):
                    lo_v = shift_lo(slv[p][a], rv[p][a])
                    hi_v = shift_hi(shv[p][a], rv[p][a])
                    sel = jnp.where(val_lo, lo_v,
                                    jnp.where(val_hi, hi_v, rv[p][a]))
                    if merge_idx and p in merge_idx:
                        if p == w_i:
                            mg = wsum
                        else:
                            mg = (w_lo * lo_v + w_hi * hi_v
                                  + w_res * rv[p][a]) / wsafe
                        sel = jnp.where(multi, mg.astype(sel.dtype), sel)
                    out_rows_p[p].append(sel)
                out_rows_k.append(
                    jnp.where(alive_new, 2, 3).astype(jnp.int32))

            out_k[...] = jnp.concatenate(out_rows_k, axis=0)
            for p in range(n_pay):
                out_p[p][...] = jnp.concatenate(out_rows_p[p], axis=0)
            # merge-count reduction: constant-index-map block stays
            # resident in VMEM across the (sequential) grid; zero it on
            # the first step, accumulate after, flush once at the end
            prev = jnp.where(is_first, 0, out_m[...])
            out_m[...] = prev + n_merged

        if occ is None:
            compute()
        else:
            on = occ_ref[pl.program_id(0), pl.program_id(1)] != 0
            pl.when(on)(compute)

            @pl.when(jnp.logical_not(on))
            def _():
                # no alive slots and no arrivals: all-dead outputs
                out_k[...] = jnp.full(out_k.shape, 3, jnp.int32)
                for p in range(n_pay):
                    out_p[p][...] = jnp.zeros(out_p[p].shape,
                                              out_p[p].dtype)
                out_m[...] = jnp.where(is_first, 0, out_m[...])

    mspec = pl.BlockSpec(tuple(blk), imap_main)
    sspec = pl.BlockSpec(sblk, imap_strip)
    cnt_spec = pl.BlockSpec((8, 128), lambda i, j: (0, 0))
    strips = [relayout_strip(s) for s in (*strips_lo, *strips_hi)]
    in_specs = [mspec] * (1 + n_pay) + [sspec] * (2 * (1 + n_pay))
    out_specs = [mspec] * (1 + n_pay) + [cnt_spec]
    if occ is None:
        kw = dict(grid=grid, in_specs=in_specs, out_specs=out_specs)
        args = ()
    else:
        kw = _occ_gridspec(occ, grid, in_specs, out_specs)
        args = (occ,)
    outs = pl.pallas_call(
        kernel,
        out_shape=([jax.ShapeDtypeStruct(key.shape, jnp.int32)]
                   + [jax.ShapeDtypeStruct(a.shape, a.dtype)
                      for a in payloads]
                   + [jax.ShapeDtypeStruct((8, 128), jnp.int32)]),
        **kw, **_compile_kwargs(),
    )(*args, key, *payloads, *strips)
    key_out = outs[0]
    pay_out = list(outs[1:1 + n_pay])
    n_merged = outs[1 + n_pay][0, 0]
    return key_out, pay_out, n_merged


def _mig_occupancy(alive, key_lo, key_hi, axis: int, bx: int, by: int):
    """Exact per-block occupancy for one fused-migration axis: a block
    needs work iff it holds any alive slot (residents, including donors
    about to leave) OR any strip entry donates into it (key 0 in the lo
    strip = arriving from below, key 4 in the hi strip = arriving from
    above; 9 = open-boundary invalid, never counted). key_lo/key_hi are
    the wrap-fixed, device-exchanged key strips BEFORE the kernel's
    Mosaic relayout: key-shaped with array axis 1+axis replaced by the
    number of blocks along that axis."""
    res = _window_any(alive.any(0), bx, by).astype(bool)
    arr = ((key_lo == 0) | (key_hi == 4)).any(0)
    if arr.ndim > 2:
        arr = arr.any(tuple(range(2, arr.ndim)))
    nbx, nby = res.shape
    if axis == 0:
        arr = arr.reshape(nbx, nby, -1).any(-1)
    elif axis == 1:
        arr = arr.reshape(nbx, -1, nby).any(1)
    else:  # z is unblocked: strips are (cap, nx, ny, 1) -> window x, y
        arr = _window_any(arr, bx, by).astype(bool)
    return (res | arr).astype(jnp.int32)


def _axis_strips(arr, axis: int, blk: int):
    """(strip_lo, strip_hi) for one array: per-block halo columns along
    the (1+axis) array axis via strided slices + a one-entry roll.
    strip_lo[b] = column b*blk-1 (wrapped), strip_hi[b] = column
    (b+1)*blk mod n."""
    aax = 1 + axis
    n = arr.shape[aax]
    # right edges of each block: {blk-1, 2*blk-1, ...} -> left halos of
    # blocks 1.. plus the wrap column (n-1) for block 0
    ridx = lax.slice_in_dim(arr, blk - 1, n, stride=blk, axis=aax)
    strip_lo = jnp.roll(ridx, 1, axis=aax)
    lidx = lax.slice_in_dim(arr, 0, n, stride=blk, axis=aax)
    strip_hi = jnp.roll(lidx, -1, axis=aax)
    return strip_lo, strip_hi


def migrate_cells_fused(data, alive, plan, *, recompute_ig: bool = False,
                        skip_empty: bool | None = None):
    """Drop-in replacement for ops/cell2d.py::migrate_cells (fast path)
    built on migrate_axis_fused. Same semantics: per-axis 5-way-key
    re-binning with merge-instead-of-drop; returns (data, alive, n_lost)
    where n_lost counts merge events.

    skip_empty: predicate each kernel block on exact occupancy — any
    alive resident OR any arriving donor in the (device-exchanged) key
    strips — so vacuum regions cost nothing (see block_occupancy)."""
    from .cell2d import _TRANSIENT

    if skip_empty is None:
        skip_empty = occ_skip_enabled()
    cap = alive.shape[0]
    n_lost = jnp.int32(0)
    transient = set(_TRANSIENT)
    if recompute_ig:
        transient.add("inv_gamma")
    names = sorted(k for k in data if k not in transient)
    ndim = len(plan)
    parity_shape = (cap,) + (1,) * ndim
    parity = ((jnp.arange(cap, dtype=jnp.int32) & 1) == 0).reshape(
        parity_shape)
    mergeable = ("x", "y", "z", "ux", "uy", "uz", "inv_gamma")
    merge_idx = tuple([names.index("w")] if "w" in names else []) + tuple(
        names.index(k) for k in mergeable if k in names)

    for axis, (nloc, spec, coord) in enumerate(plan):
        pos = data[coord]
        cells = pos.shape[1:]
        nt = cells[axis]
        ishape = [1] * (1 + ndim)
        ishape[1 + axis] = nt
        idx = jnp.arange(nt, dtype=pos.dtype).reshape(ishape)
        local = pos - idx
        out_hi = alive & (local >= 0.5)
        out_lo = alive & (local < -0.5)
        key = jnp.where(out_hi, 0,
                        jnp.where(out_lo, 4,
                                  jnp.where(alive, 2,
                                            jnp.where(parity, 1, 3)))
                        ).astype(jnp.int32)

        bx, by = _mig_blocks(cells, axis)
        blk_sizes = (bx, by) + ((cells[2],) if ndim == 3 else ())
        blk = blk_sizes[axis]
        nb = nt // blk

        payloads = [data[k] for k in names]
        strips_l, strips_h = [], []
        ci = names.index(coord)
        for p_i, arr in enumerate([key] + payloads):
            sl, sh = _axis_strips(arr, axis, blk)
            is_coord = (p_i == 1 + ci)
            is_key = (p_i == 0)
            # wrap entries: strip_lo[0] wrapped from the high end
            # (coordinate -nloc); strip_hi[-1] wrapped from the low end
            aax = 1 + axis

            def fix_wrap(strip, entry_idx, adj):
                col = lax.index_in_dim(strip, entry_idx, axis=aax,
                                       keepdims=True)
                if spec.size > 1:
                    up, dn = _mig_perms(spec.size)
                    col = lax.ppermute(col, spec.axis_name,
                                       up if adj < 0 else dn)
                if is_coord:
                    col = col + jnp.asarray(adj * nloc, col.dtype)
                if is_key and not spec.periodic:
                    i_dev = lax.axis_index(spec.axis_name)
                    edge = (i_dev == 0) if adj < 0 else \
                        (i_dev == spec.size - 1)
                    col = jnp.where(edge, jnp.full_like(col, 9), col)
                return lax.dynamic_update_index_in_dim(
                    strip, col[(slice(None),) * aax + (0,)], entry_idx,
                    axis=aax)

            sl = fix_wrap(sl, 0, -1)
            sh = fix_wrap(sh, nb - 1, +1)
            strips_l.append(sl)
            strips_h.append(sh)

        occ = None
        if skip_empty:
            occ = _mig_occupancy(alive, strips_l[0], strips_h[0], axis,
                                 bx, by)
        key_out, pay_out, n_m = migrate_axis_fused(
            key, payloads, merge_idx, axis, strips_l, strips_h, occ=occ)
        n_lost = n_lost + n_m
        data = {**data, **dict(zip(names, pay_out))}
        alive = key_out == 2

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


def _mig_perms(size: int):
    up = [(i, (i + 1) % size) for i in range(size)]
    dn = [(i, (i - 1) % size) for i in range(size)]
    return up, dn
