"""Pallas TPU kernels for the tile-binned dense particle hot loop (2D).

The XLA formulation (ops/tiled2d.py) materialises the dense B-spline tap
matrices W[c, p] in HBM — at bench scale (768^2, ~6-9M particles) that is
~0.8 GB per tap panel and ~10 of them per step, so the hot loop is bound
on HBM tap traffic. These kernels fuse the tap evaluation into the
per-tile contraction: taps live only in VMEM, and HBM traffic drops to
the particle arrays plus the (tiny) field/current windows.

Same numerical contract as ops/tiled2d.py::gather_tiled / deposit_tiled
(staggered quadratic gather, reference interpolation/cpu2d.c:32-69;
Esirkepov separable closed forms, reference current_deposit.h:124-144).

MXU-shaped formulation (one/two large dots per tile instead of 5-6
M=N=22 dots):

- gather: field components are row-stacked by their y-tap into two
  (3*24, wy) matrices A = [ex; ez; by] (y-tap gy) and B = [ey; bx; bz]
  (y-tap hy); per tile tmp = A @ Wy is ONE (72, wy) x (wy, cap) dot,
  and the x-tap contraction out_p = sum_c Wx[c,p] tmp[c,p] is a VPU
  reduction. Sections are padded to 24 rows so all slices are
  8-aligned.
- deposit: all five Esirkepov outer products are blocks of ONE
  cross-product dot G = X @ Y^T with X = [dsx*(-q w/(dy dt)); a;
  a*c*vz*q w/(dx dy); dsx*(c*vz*q w/(12 dx dy)); s1x*q w/(dx dy)]
  (5 x 24 rows, cap) and Y = [b; dsy*(-q w/(dx dt)); dsy; s1y]
  (4 x 24 rows, cap): MXU cost is one padded (128, cap) x (cap, 128)
  contraction per tile plus two small triangular matmuls implementing
  the Esirkepov prefix sums per particle (they must telescope per
  particle BEFORE the contraction for f32 accuracy).

Pallas TPU block-shape rules require the last two block dims to divide
(8, 128) or equal the array dims, so the grid is (ntx, nty // TJ) with
TJ tiles handled per kernel invocation (unrolled loop).

TPU pallas has no f64: these kernels require f32 (Simulation
precision='single'). On CPU (tests) they run in interpret mode where
f64 also works.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from .tiled2d import TileCfg

def _sec(w: int) -> int:
    """Rows per stacked section: the window width rounded up to a multiple
    of 8 so section offsets stay 8-aligned (sublane boundary)."""
    return ((w + 7) // 8) * 8


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _pick_tj(nty: int) -> int:
    """Tiles per kernel invocation along y: multiple of 8 (block rule) or
    the whole axis."""
    for tj in (16, 8):
        if nty % tj == 0:
            return tj
    return nty


def _bspline2(d):
    ad = jnp.abs(d)
    return jnp.where(ad <= 0.5, 0.75 - d * d,
                     jnp.where(ad < 1.5, 0.5 * (1.5 - ad) ** 2,
                               jnp.zeros_like(d)))


def _taps2(xw, n_w: int, shift: float):
    """(cap,) window coords -> (n_w, cap) tap panel W[c, p] = M2(c+shift-x).
    Mosaic's tpu.iota is integer-only: build int32 iota, then convert."""
    c = lax.broadcasted_iota(jnp.int32, (n_w, xw.shape[-1]), 0).astype(
        xw.dtype)
    return _bspline2(c + shift - xw[None, :])


def _localize(x, y, cfg: TileCfg):
    """Device-local cell coords -> window coords (tile origin - h at 0)."""
    dtype = x.dtype
    ox = (jnp.arange(cfg.ntx, dtype=dtype) * cfg.tx)[:, None, None]
    oy = (jnp.arange(cfg.nty, dtype=dtype) * cfg.ty)[None, :, None]
    return x - ox + cfg.h, y - oy + cfg.h


def _pad_rows(m, rows: int):
    # zeros+concat rather than lax.pad (safer under Mosaic)
    z = jnp.zeros((rows - m.shape[0], m.shape[1]), m.dtype)
    return jnp.concatenate([m, z], axis=0)


# ---------------------------------------------------------------------------
# window extract / fold as MXU contractions with 0/1 selection matrices
# ---------------------------------------------------------------------------
#
# The XLA slice+concat+transpose extract (ops/tiled2d.py::extract_windows)
# costs ~30 ms at bench scale on TPU: the (.., wx, nty, wy) transposes hit
# tiny (22) minor dims and relayout padding. Window extraction is linear,
# so it is two matmuls with 0/1 selection matrices M[X, k*w+c] = [X == k*t+c]
# (MXU, no data-movement ops), and the fold (overlap-add) is the transpose
# contraction with the same matrices — exact, since summands are added once.

def _sel_matrix(n_pad: int, t: int, nt: int, w: int, dtype):
    X = jnp.arange(n_pad)
    j = jnp.arange(nt * w)
    cell = (j // w) * t + (j % w)
    return (X[:, None] == cell[None, :]).astype(dtype)


def extract_windows_mxu(fpad: jnp.ndarray, cfg: TileCfg) -> jnp.ndarray:
    """(C, nx+2h, ny+2h) -> (C, ntx, wx, nty, wy) via two MXU contractions."""
    dtype = fpad.dtype
    mx = _sel_matrix(fpad.shape[1], cfg.tx, cfg.ntx, cfg.wx, dtype)
    my = _sel_matrix(fpad.shape[2], cfg.ty, cfg.nty, cfg.wy, dtype)
    e1 = lax.dot_general(fpad, mx, (((1,), (0,)), ((), ())),
                         preferred_element_type=dtype,
                           precision=lax.Precision.HIGHEST)   # (C, NY, A)
    e2 = lax.dot_general(e1, my, (((1,), (0,)), ((), ())),
                         preferred_element_type=dtype,
                           precision=lax.Precision.HIGHEST)   # (C, A, B)
    return e2.reshape(fpad.shape[0], cfg.ntx, cfg.wx, cfg.nty, cfg.wy)


def fold_windows_mxu(win: jnp.ndarray, cfg: TileCfg) -> jnp.ndarray:
    """(C, ntx, wx, nty, wy) -> (C, nx+2h, ny+2h) overlap-add via the
    transposed selection contractions."""
    dtype = win.dtype
    nxp = cfg.ntx * cfg.tx + 2 * cfg.h
    nyp = cfg.nty * cfg.ty + 2 * cfg.h
    mx = _sel_matrix(nxp, cfg.tx, cfg.ntx, cfg.wx, dtype)
    my = _sel_matrix(nyp, cfg.ty, cfg.nty, cfg.wy, dtype)
    w2 = win.reshape(win.shape[0], cfg.ntx * cfg.wx, cfg.nty * cfg.wy)
    u1 = lax.dot_general(w2, mx, (((1,), (1,)), ((), ())),
                         preferred_element_type=dtype,
                           precision=lax.Precision.HIGHEST)   # (C, B, NX)
    u2 = lax.dot_general(u1, my, (((1,), (1,)), ((), ())),
                         preferred_element_type=dtype,
                           precision=lax.Precision.HIGHEST)   # (C, NX, NY)
    return u2


# ---------------------------------------------------------------------------
# gather
# ---------------------------------------------------------------------------

def _gather_kernel(win_ref, x_ref, y_ref,
                   ex_ref, ey_ref, ez_ref, bx_ref, by_ref, bz_ref,
                   *, tj: int, wx: int, wy: int):
    dtype = x_ref.dtype
    _SEC = _sec(max(wx, wy))
    for j in range(tj):
        xw = x_ref[0, j, :]
        yw = y_ref[0, j, :]
        gx = _taps2(xw, wx, 0.0)          # (wx, cap)
        hx = _taps2(xw, wx, 0.5)
        gy = _taps2(yw, wy, 0.0)
        hy = _taps2(yw, wy, 0.5)

        w = win_ref[:, 0, :, j, :]        # (6, wx, wy)
        # ONE block-diagonal dot for both y-tap groups: [A 0; 0 B] (2*3SEC,
        # 2wy) x [gy; hy] (2wy, cap). K = 2wy halves the K->128 MXU padding
        # waste of two separate wy-contraction dots.
        A = jnp.concatenate([_pad_rows(w[0], _SEC), _pad_rows(w[2], _SEC),
                             _pad_rows(w[4], _SEC)], axis=0)
        B = jnp.concatenate([_pad_rows(w[1], _SEC), _pad_rows(w[3], _SEC),
                             _pad_rows(w[5], _SEC)], axis=0)
        zA = jnp.zeros_like(A)
        zB = jnp.zeros_like(B)
        AB = jnp.concatenate([jnp.concatenate([A, zA], axis=1),
                              jnp.concatenate([zB, B], axis=1)], axis=0)
        W2 = jnp.concatenate([gy, hy], axis=0)       # (2wy, cap)
        t2 = jnp.dot(AB, W2, preferred_element_type=dtype,
                     precision=lax.Precision.HIGHEST)  # (6*_SEC, cap)

        def red(lo, Wx):
            return jnp.sum(Wx * t2[lo:lo + wx], axis=0)

        ex_ref[0, j, :] = red(0, hx)
        ez_ref[0, j, :] = red(_SEC, gx)
        by_ref[0, j, :] = red(2 * _SEC, hx)
        ey_ref[0, j, :] = red(3 * _SEC, gx)
        bx_ref[0, j, :] = red(4 * _SEC, gx)
        bz_ref[0, j, :] = red(5 * _SEC, hx)


def gather_tiled_pallas(windows: jnp.ndarray, x, y, cfg: TileCfg):
    """Tiled staggered gather; windows (6, ntx, wx, nty, wy) — the
    extract_windows_mxu layout — x/y (ntx,nty,cap_t) ->
    6 arrays (ntx,nty,cap_t). Same values as ops/tiled2d.py::gather_tiled."""
    cap = x.shape[-1]
    tj = _pick_tj(cfg.nty)
    xw, yw = _localize(x, y, cfg)
    kernel = functools.partial(_gather_kernel, tj=tj, wx=cfg.wx, wy=cfg.wy)
    part = pl.BlockSpec((1, tj, cap), lambda i, j: (i, j, 0))
    out_shape = jax.ShapeDtypeStruct((cfg.ntx, cfg.nty, cap), x.dtype)
    return pl.pallas_call(
        kernel,
        grid=(cfg.ntx, cfg.nty // tj),
        in_specs=[pl.BlockSpec((6, 1, cfg.wx, tj, cfg.wy),
                               lambda i, j: (0, i, 0, j, 0)),
                  part, part],
        out_specs=[part] * 6,
        out_shape=[out_shape] * 6,
        interpret=_use_interpret(),
    )(windows, xw, yw)


# ---------------------------------------------------------------------------
# Esirkepov deposition
# ---------------------------------------------------------------------------

def _deposit_kernel(x_ref, y_ref, vxc_ref, vyc_ref, cvz_ref, w_ref,
                    o_ref, *, tj: int, wx: int, wy: int,
                    q_dxdy: float, q_dydt: float, q_dxdt: float):
    dtype = x_ref.dtype
    _SEC = _sec(max(wx, wy))
    for j in range(tj):
        xw = x_ref[0, j, :]
        yw = y_ref[0, j, :]
        vx_c = vxc_ref[0, j, :]
        vy_c = vyc_ref[0, j, :]
        cvz = cvz_ref[0, j, :] * (q_dxdy * w_ref[0, j, :])
        w = w_ref[0, j, :]

        s0x = _taps2(xw - 0.5 * vx_c, wx, 0.0)     # (wx, cap)
        s1x = _taps2(xw + 0.5 * vx_c, wx, 0.0)
        s0y = _taps2(yw - 0.5 * vy_c, wy, 0.0)
        s1y = _taps2(yw + 0.5 * vy_c, wy, 0.0)
        dsx = s1x - s0x
        dsy = s1y - s0y
        a = s0x + 0.5 * dsx
        b = s0y + 0.5 * dsy

        # Esirkepov prefix sums MUST run per particle, BEFORE the particle
        # contraction: after it they telescope to ~0 through large partial
        # sums and lose ~1e-3 relative in f32. Lower-triangular matmul =
        # cumsum along the window axis (Mosaic-friendly).
        def _tri(n):
            r = lax.broadcasted_iota(jnp.int32, (n, n), 0)
            c = lax.broadcasted_iota(jnp.int32, (n, n), 1)
            return (r >= c).astype(dtype)

        fxw = jnp.dot(_tri(wx), dsx, preferred_element_type=dtype,
                           precision=lax.Precision.HIGHEST) \
            * (-q_dydt * w)[None, :]
        gyw = jnp.dot(_tri(wy), dsy, preferred_element_type=dtype,
                           precision=lax.Precision.HIGHEST) \
            * (-q_dxdt * w)[None, :]

        X = jnp.concatenate([
            _pad_rows(fxw, _SEC),
            _pad_rows(a, _SEC),
            _pad_rows(a * cvz[None, :], _SEC),
            _pad_rows(dsx * (cvz / 12.0)[None, :], _SEC),
            _pad_rows(s1x * (q_dxdy * w)[None, :], _SEC)], axis=0)
        Y = jnp.concatenate([
            _pad_rows(b, _SEC),
            _pad_rows(gyw, _SEC),
            _pad_rows(dsy, _SEC),
            _pad_rows(s1y, _SEC)], axis=0)
        # ONE MXU contraction over the particle axis: (120, cap) x (cap, 96)
        G = lax.dot_general(X, Y, (((1,), (1,)), ((), ())),
                            preferred_element_type=dtype,
                           precision=lax.Precision.HIGHEST)

        def blk(r, c):
            return G[r * _SEC:r * _SEC + wx, c * _SEC:c * _SEC + wy]

        o_ref[0, 0, :, j, :] = blk(0, 0)                 # jx
        o_ref[1, 0, :, j, :] = blk(1, 1)                 # jy
        o_ref[2, 0, :, j, :] = blk(2, 0) + blk(3, 2)     # jz
        o_ref[3, 0, :, j, :] = blk(4, 3)                 # rho


def deposit_tiled_pallas(x, y, ux, uy, uz, inv_gamma, w, cfg: TileCfg, *,
                         q: float, dx: float, dy: float,
                         dt: float) -> jnp.ndarray:
    """Tiled Esirkepov deposition: per-tile (jx, jy, jz, rho) window blocks
    in the fold_windows_mxu layout (4, ntx, wx, nty, wy); taps never touch
    HBM. Same values as ops/tiled2d.py::deposit_tiled."""
    from ..constants import c as c_light
    cap = x.shape[-1]
    tj = _pick_tj(cfg.nty)
    dtype = x.dtype
    xw, yw = _localize(x, y, cfg)
    vx_c = ux * inv_gamma * jnp.asarray(c_light * dt / dx, dtype)
    vy_c = uy * inv_gamma * jnp.asarray(c_light * dt / dy, dtype)
    cvz = uz * inv_gamma * jnp.asarray(c_light, dtype)

    kernel = functools.partial(
        _deposit_kernel, tj=tj, wx=cfg.wx, wy=cfg.wy,
        q_dxdy=q / (dx * dy), q_dydt=q / (dy * dt), q_dxdt=q / (dx * dt))
    part = pl.BlockSpec((1, tj, cap), lambda i, j: (i, j, 0))
    win = pl.pallas_call(
        kernel,
        grid=(cfg.ntx, cfg.nty // tj),
        in_specs=[part] * 6,
        out_specs=pl.BlockSpec((4, 1, cfg.wx, tj, cfg.wy),
                               lambda i, j: (0, i, 0, j, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (4, cfg.ntx, cfg.wx, cfg.nty, cfg.wy), dtype),
        interpret=_use_interpret(),
    )(xw, yw, vx_c, vy_c, cvz, w)
    return win
