"""Tile-binned dense particle kernels (2D).

This is the speed-of-light TPU formulation of the PIC hot loop. TPUs have no
hardware gather/scatter: XLA lowers per-particle random access to ~1e8
element/s serial loops, which caps the naive kernels (ops/interpolation.py,
ops/deposition.py) at ~1 Mpush/s/chip. This module removes *all* random
access from the particle hot path:

- particles are binned into (TX, TY)-cell tiles with a fixed per-tile
  capacity (layout (ntx, nty, cap_t) — particle axis minor everywhere);
- quadratic shape functions are evaluated *densely* as tap matrices
  W[c, p] = M2(c - x_p) over the tile's halo'd cell window (M2 = quadratic
  B-spline, identical values to the reference's 3/5-tap tables,
  interpolation/cpu2d.c:7-12, current_deposit.h:7-35);
- gather and Esirkepov deposition become per-tile dense contractions on the
  MXU:   gather:  tmp = F_win @ Wy ; val = sum_x Wx * tmp
         deposit: J_win = Wx_factor @ Wy_factor^T     (5 matmuls)
  using the separable closed forms of the reference recurrences
  (current_deposit.h:124-144, derived in ops/deposition.py);
- tile-to-tile migration is dense: donors roll one tile over (device-edge
  tile slabs ppermute to the neighbor shard — tile and shard migration
  unify), and each tile merges survivors+arrivals with a multi-operand
  lax.sort — a sorting network, regular data movement, no random gathers.

Window invariant: with halo h=3 a particle whose position is within
[-1.5, T+0.5) of its tile deposits/gathers entirely inside the (T+2h)
window (CFL limits drift to <1 cell/step, and migration re-bins every
step), matching the guard-width argument of the untiled path.

Requires TX >= 2h and TY >= 2h.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import c as c_light
from ..parallel.halo import HaloSpec, _perms


@dataclass(frozen=True)
class TileCfg:
    """Static tiling description for one device shard."""

    tx: int
    ty: int
    ntx: int
    nty: int
    cap_t: int
    h: int = 3

    @property
    def wx(self) -> int:
        return self.tx + 2 * self.h

    @property
    def wy(self) -> int:
        return self.ty + 2 * self.h


def bspline2(d):
    """Quadratic B-spline M2(d), support |d| < 1.5 — the same values as the
    reference tap tables evaluated at integer offsets."""
    ad = jnp.abs(d)
    return jnp.where(ad <= 0.5, 0.75 - d * d,
                     jnp.where(ad < 1.5, 0.5 * (1.5 - ad) ** 2,
                               jnp.zeros_like(d)))


# ---------------------------------------------------------------------------
# window extraction / folding: reshapes + strided adds only
# ---------------------------------------------------------------------------

def _split_axis(g: jnp.ndarray, axis: int, n: int, t: int, nt: int, h: int
                ) -> jnp.ndarray:
    """Extract overlapping windows along `axis` of a padded array: length
    n+2h -> (nt, t+2h) inserted at `axis` (window k = padded[k*t : k*t+t+2h]).
    Three reshaped slices: heads of chunks of [0:n], core [h:h+n], tails of
    chunks of [2h:2h+n]."""
    def sub(a, b):
        s = [slice(None)] * g.ndim
        s[axis] = slice(a, b)
        return g[tuple(s)]

    head = g.shape[:axis]
    tail = g.shape[axis + 1:]
    A = sub(0, n).reshape(head + (nt, t) + tail)
    B = sub(h, h + n).reshape(head + (nt, t) + tail)
    C = sub(2 * h, 2 * h + n).reshape(head + (nt, t) + tail)

    def intra(arr, a, b):
        s = [slice(None)] * arr.ndim
        s[axis + 1] = slice(a, b)
        return arr[tuple(s)]

    return jnp.concatenate([intra(A, 0, h), B, intra(C, t - h, t)],
                           axis=axis + 1)


def _fold_axis(blocks: jnp.ndarray, axis: int, n: int, t: int, nt: int,
               h: int) -> jnp.ndarray:
    """Inverse of _split_axis with overlap-add: (…, nt, t+2h, …) ->
    (…, n+2h, …). Requires t >= 2h: each window is split into two t-wide
    halves laid out with hop t (overlap-add with two strided adds)."""
    assert t >= 2 * h, "tile size must be >= 2*halo"
    w = t + 2 * h
    # pad window axis (axis+1) to 2t
    pad = [(0, 0)] * blocks.ndim
    pad[axis + 1] = (0, 2 * t - w)
    bp = jnp.pad(blocks, pad)

    def intra(arr, a, b):
        s = [slice(None)] * arr.ndim
        s[axis + 1] = slice(a, b)
        return arr[tuple(s)]

    head = blocks.shape[:axis]
    tail = blocks.shape[axis + 2:]
    A = intra(bp, 0, t).reshape(head + (n,) + tail)
    B = intra(bp, t, 2 * t).reshape(head + (n,) + tail)
    L = n + 2 * h
    out = jnp.zeros(head + (L,) + tail, blocks.dtype)

    def at(arr, a, b):
        s = [slice(None)] * arr.ndim
        s[axis] = slice(a, b)
        return tuple(s)

    out = out.at[at(out, 0, n)].add(A)
    out = out.at[at(out, t, L)].add(B[at(B, 0, L - t)])
    return out


def extract_windows(fpad: jnp.ndarray, cfg: TileCfg) -> jnp.ndarray:
    """(C, nx+2h, ny+2h) -> (C, ntx, nty, wx, wy)."""
    nx, ny = cfg.ntx * cfg.tx, cfg.nty * cfg.ty
    out = _split_axis(fpad, 1, nx, cfg.tx, cfg.ntx, cfg.h)
    # (C, ntx, wx, ny+2h)
    out = _split_axis(out, 3, ny, cfg.ty, cfg.nty, cfg.h)
    # (C, ntx, wx, nty, wy)
    return out.transpose(0, 1, 3, 2, 4)


def fold_windows(win: jnp.ndarray, cfg: TileCfg) -> jnp.ndarray:
    """(C, ntx, nty, wx, wy) -> (C, nx+2h, ny+2h) with overlap-add."""
    nx, ny = cfg.ntx * cfg.tx, cfg.nty * cfg.ty
    w = win.transpose(0, 1, 3, 2, 4)          # (C, ntx, wx, nty, wy)
    w = _fold_axis(w, 3, ny, cfg.ty, cfg.nty, cfg.h)   # (C, ntx, wx, ny+2h)
    w = _fold_axis(w, 1, nx, cfg.tx, cfg.ntx, cfg.h)   # (C, nx+2h, ny+2h)
    return w


# ---------------------------------------------------------------------------
# per-tile coordinates and tap matrices
# ---------------------------------------------------------------------------

def _tile_coords(x, y, cfg: TileCfg):
    """Device-local cell coords -> per-tile window coords (w-indexed:
    window cell c corresponds to local cell (tile origin - h + c))."""
    dtype = x.dtype
    ox = (jnp.arange(cfg.ntx, dtype=dtype) * cfg.tx)[:, None, None]
    oy = (jnp.arange(cfg.nty, dtype=dtype) * cfg.ty)[None, :, None]
    return x - ox + cfg.h, y - oy + cfg.h


def _taps(xw, n_w: int, shift: float = 0.0):
    """Dense tap matrix (…, n_w, cap_t): W[c, p] = M2(c + shift - xw_p)."""
    cg = jnp.arange(n_w, dtype=xw.dtype).reshape(
        (1,) * (xw.ndim - 1) + (n_w, 1))
    return bspline2(cg + shift - xw[..., None, :])


# ---------------------------------------------------------------------------
# gather
# ---------------------------------------------------------------------------

def gather_tiled(windows: jnp.ndarray, x, y, cfg: TileCfg):
    """windows: (6, ntx, nty, wx, wy) = (ex, ey, ez, bx, by, bz) halo'd
    field windows; x, y: (ntx, nty, cap_t) device-local cell coords.

    Returns 6 arrays (ntx, nty, cap_t) — the staggered quadratic gather
    (reference interpolation/cpu2d.c:32-69). Staggering: integer taps =
    M2(c - x), half taps = M2(c + 0.5 - x) (field stored at c+0.5).
    """
    xw, yw = _tile_coords(x, y, cfg)
    gx = _taps(xw, cfg.wx, 0.0)          # (ntx, nty, wx, cap)
    hx = _taps(xw, cfg.wx, 0.5)
    gy = _taps(yw, cfg.wy, 0.0)
    hy = _taps(yw, cfg.wy, 0.5)

    def interp(F, Wx, Wy):
        # tmp[x, p] = sum_y F[x, y] Wy[y, p]  (batched over tiles)
        tmp = lax.dot_general(
            F, Wy, (((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=F.dtype,
            precision=lax.Precision.HIGHEST)
        return jnp.sum(Wx * tmp, axis=2)

    ex, ey, ez, bx, by, bz = windows
    return (interp(ex, hx, gy), interp(ey, gx, hy), interp(ez, gx, gy),
            interp(bx, gx, hy), interp(by, hx, gy), interp(bz, hx, hy))


# ---------------------------------------------------------------------------
# Esirkepov deposition
# ---------------------------------------------------------------------------

def deposit_tiled(x, y, ux, uy, uz, inv_gamma, w, cfg: TileCfg, *,
                  q: float, dx: float, dy: float, dt: float) -> jnp.ndarray:
    """Charge-conserving deposition into per-tile windows.

    Returns (4, ntx, nty, wx, wy) = (jx, jy, jz, rho) window blocks
    (fold_windows + the global rim reduction complete the deposit).
    Separable closed forms of the reference recurrences
    (current_deposit.h:124-144):
        jx = Fx^T b,  Fx = -q w/(dy dt) cumsum(DSx)
        jy = a^T Gy,  Gy = -q w/(dx dt) cumsum(DSy)
        jz = q w vz/(dx dy) (a^T b + DSx^T DSy / 12)
        rho = q w/(dx dy) S1x^T S1y
    with S0/S1 the 5-tap shapes at x -/+ v dt/2, DS = S1-S0,
    a = S0x + DSx/2, b = S0y + DSy/2.
    """
    dtype = x.dtype
    vx_c = ux * inv_gamma * jnp.asarray(c_light * dt / dx, dtype)
    vy_c = uy * inv_gamma * jnp.asarray(c_light * dt / dy, dtype)
    vz = uz * inv_gamma * jnp.asarray(c_light, dtype)

    xw, yw = _tile_coords(x, y, cfg)
    s0x = _taps(xw - 0.5 * vx_c, cfg.wx)      # (ntx, nty, wx, cap)
    s1x = _taps(xw + 0.5 * vx_c, cfg.wx)
    s0y = _taps(yw - 0.5 * vy_c, cfg.wy)
    s1y = _taps(yw + 0.5 * vy_c, cfg.wy)
    dsx = s1x - s0x
    dsy = s1y - s0y

    cd = jnp.asarray(q / (dx * dy), dtype) * w            # (ntx,nty,cap)
    fdx = jnp.asarray(q / (dy * dt), dtype) * w
    fdy = jnp.asarray(q / (dx * dt), dtype) * w

    a = s0x + 0.5 * dsx
    b = s0y + 0.5 * dsy
    fx = -fdx[:, :, None, :] * jnp.cumsum(dsx, axis=2)
    gy = -fdy[:, :, None, :] * jnp.cumsum(dsy, axis=2)

    def outer(u, v):
        # (…, wx, cap) x (…, wy, cap) -> (…, wx, wy), contract cap
        return lax.dot_general(u, v, (((3,), (3,)), ((0, 1), (0, 1))),
                               preferred_element_type=dtype,
                           precision=lax.Precision.HIGHEST)

    cvz = cd * vz
    jx_w = outer(fx, b)
    jy_w = outer(a, gy)
    jz_w = outer(a * cvz[:, :, None, :], b) + outer(
        dsx * (cvz / 12.0)[:, :, None, :], dsy)
    rho_w = outer(s1x * cd[:, :, None, :], s1y)
    return jnp.stack([jx_w, jy_w, jz_w, rho_w], axis=0)


# ---------------------------------------------------------------------------
# tile migration (re-binning) with unified device-edge exchange
# ---------------------------------------------------------------------------

def _roll_with_edge_exchange(tree, axis: int, direction: int,
                             spec: HaloSpec):
    """Roll donor arrays one tile along a tile axis; the slab that wraps
    around is exchanged with the neighbor device via ppermute (masked to
    invalid at open boundaries — handled by the caller's validity mask)."""
    def move(a):
        rolled = jnp.roll(a, direction, axis=axis)
        if spec.size == 1 and spec.periodic:
            return rolled
        up, dn = _perms(spec.size)
        perm = up if direction > 0 else dn
        # the wrapped slab sits at tile index 0 (direction=+1) or nt-1
        idx = 0 if direction > 0 else a.shape[axis] - 1
        slab = jnp.take(rolled, idx, axis=axis)
        recv = lax.ppermute(slab, spec.axis_name, perm)
        return lax.dynamic_update_index_in_dim(rolled, recv, idx, axis)

    return jax.tree.map(move, tree)


def migrate_tiled_sort3(data: Dict[str, jnp.ndarray], alive: jnp.ndarray,
                        cfg: TileCfg, specs: Tuple[HaloSpec, HaloSpec],
                        nx_loc: int, ny_loc: int,
                        axes: Tuple[int, ...] = (0, 1)):
    """Reference 3-buffer formulation of migrate_tiled (sorts a 3*cap_t
    concat per axis). Superseded by the slab formulation below — kept as
    the parity oracle for tests.

    ``axes`` restricts the passes (the moving-window shift only displaces
    particles along x, so it re-bins with axes=(0,))."""
    n_lost = jnp.int32(0)
    plan = ((cfg.tx, cfg.ntx, nx_loc, specs[0], "x"),
            (cfg.ty, cfg.nty, ny_loc, specs[1], "y"))
    for axis, (t, nt, nloc, spec, coord) in enumerate(plan):
        if axis not in axes:
            continue
        pos = data[coord]
        origin = jnp.arange(nt, dtype=pos.dtype) * t
        origin = origin[:, None, None] if axis == 0 else origin[None, :, None]
        local = pos - origin
        out_lo = alive & (local < -0.5)
        out_hi = alive & (local >= t - 0.5)

        # --- donors travel one tile; device-edge slabs ppermute over
        def donors(mask, direction):
            send = {k: jnp.where(mask, v, 0) for k, v in data.items()}
            valid = mask
            # device-crossing coordinate shift: slabs that wrap get +-nloc
            wrapped_idx = 0 if direction > 0 else nt - 1
            tile_idx = jnp.arange(nt)
            tile_idx = tile_idx[:, None, None] if axis == 0 else \
                tile_idx[None, :, None]
            rolled_from_wrap = (tile_idx == wrapped_idx)
            moved = _roll_with_edge_exchange(
                (send, valid), axis, direction, spec)
            send_m, valid_m = moved
            # coordinate adjust for entries that wrapped through the device
            # (or periodic-domain) boundary: moving +x means the receiver's
            # frame is nloc smaller
            adj = jnp.asarray(-nloc if direction > 0 else nloc, pos.dtype)
            send_m = dict(send_m)
            send_m[coord] = jnp.where(rolled_from_wrap,
                                      send_m[coord] + adj, send_m[coord])
            if not spec.periodic:
                i = lax.axis_index(spec.axis_name)
                edge = (i == 0) if direction > 0 else (i == spec.size - 1)
                valid_m = valid_m & ~(rolled_from_wrap & edge)
            return send_m, valid_m

        in_lo, val_lo = donors(out_hi, +1)   # leavers upward arrive from below
        in_hi, val_hi = donors(out_lo, -1)

        alive = alive & ~(out_lo | out_hi)

        # --- merge survivors + arrivals per tile with a sorting network.
        # Attributes that are recomputed before any use (the gathered
        # *_part fields, written fresh by the next gather) are dead weight
        # in the sort: skip them (their slots go stale; harmless — gather
        # runs before QED/pusher read them).
        TRANSIENT = {"ex_part", "ey_part", "ez_part",
                     "bx_part", "by_part", "bz_part"}
        keys = jnp.concatenate([
            jnp.where(alive, 0, 2).astype(jnp.int32),
            jnp.where(val_lo, 1, 2).astype(jnp.int32),
            jnp.where(val_hi, 1, 2).astype(jnp.int32)], axis=-1)
        names = sorted(k for k in data if k not in TRANSIENT)
        ops = [jnp.concatenate([data[k], in_lo[k], in_hi[k]], axis=-1)
               for k in names]
        sorted_ops = lax.sort([keys] + ops, dimension=2, num_keys=1)
        kept_keys = sorted_ops[0][..., :cfg.cap_t]
        n_lost = n_lost + jnp.sum(
            sorted_ops[0][..., cfg.cap_t:] < 2).astype(jnp.int32)
        merged = {k: o[..., :cfg.cap_t] for k, o in zip(names, sorted_ops[1:])}
        data = {k: merged.get(k, data[k]) for k in data}
        alive = kept_keys < 2

    return _sanitize_tiled(data, alive), alive, n_lost


def _sanitize_tiled(data: Dict[str, jnp.ndarray], alive: jnp.ndarray):
    """Dead slots: w=0, in-range positions, unit inv_gamma."""
    data = dict(data)
    for k in ("x", "y", "z", "w", "ux", "uy", "uz", "tau", "event"):
        if k in data:
            data[k] = jnp.where(alive, data[k], jnp.zeros_like(data[k]))
    data["inv_gamma"] = jnp.where(alive, data["inv_gamma"],
                                  jnp.ones_like(data["inv_gamma"]))
    return data


# attributes rewritten from scratch before any post-migration read: the
# gathered fields (fresh gather each step) and chi (recomputed by
# update_chi_and_events before use) — dead weight in the merge sorts
_TRANSIENT = {"ex_part", "ey_part", "ez_part",
              "bx_part", "by_part", "bz_part", "chi"}


def migrate_tiled(data: Dict[str, jnp.ndarray], alive: jnp.ndarray,
                  cfg: TileCfg, specs: Tuple[HaloSpec, HaloSpec],
                  nx_loc: int, ny_loc: int,
                  axes: Tuple[int, ...] = (0, 1), *,
                  recompute_ig: bool = False):
    """Re-bin particles to their home tiles and handle device-edge
    crossings — the slab formulation.

    Per axis, ONE cap_t-wide multi-operand lax.sort with the 5-way key

        0: donor(+1)   1: dead(even slot)   2: stay
        3: dead(odd)   4: donor(-1)

    packs +1-donors into the front slab [0:m] and -1-donors into the back
    slab [cap-m:], each padded by ~half the dead slots (the parity split
    sends half the dead to each end). The m-wide slabs roll one tile over
    (device-edge slabs ppermute to the neighbor shard), and arrivals
    OVERWRITE the end slabs elementwise — no 3*cap concat merge. This is
    ~4x less sort work than the 3-buffer formulation and 16x less
    roll/ppermute traffic (the hot-loop profile showed the 3-buffer sorts
    at ~80% of the full step at bench scale).

    Survivors that sort into an end slab (possible only when a tile is so
    full that donors+dead < m on that side) are clobbered and counted in
    n_lost, like capacity overflow. Donors beyond m are dropped and
    counted too; m = cap_t/4 (small caps) or cap_t/8 bounds the per-step,
    per-axis donor flux of a CFL-limited run with a wide margin.

    ``axes`` restricts the passes (the moving-window shift re-bins with
    axes=(0,)). With ``recompute_ig`` (non-photon species), inv_gamma is
    dropped from the sort payloads and recomputed as 1/sqrt(1+u^2) — one
    fewer operand through the sorting network, bitwise-identical to the
    carried value (the pusher computes it with the same expression).
    """
    cap = alive.shape[-1]
    # m must exceed the per-axis donor flux (<= occupancy * 1.2/t per step,
    # i.e. < cap/6.8 for t>=8 at capacity factor >= 1.5) and stay below the
    # guaranteed dead-slot padding per end (dead/2 >= cap(1-1/f)/2 = cap/6
    # at f=1.5). cap//8 sits between; residual losses are counted.
    m = max(8, cap // 8)
    n_lost = jnp.int32(0)
    skip = set(_TRANSIENT)
    if recompute_ig:
        skip.add("inv_gamma")
    names = sorted(k for k in data if k not in skip)

    plan = ((cfg.tx, cfg.ntx, nx_loc, specs[0], "x"),
            (cfg.ty, cfg.nty, ny_loc, specs[1], "y"))
    for axis, (t, nt, nloc, spec, coord) in enumerate(plan):
        if axis not in axes:
            continue
        pos = data[coord]
        origin = jnp.arange(nt, dtype=pos.dtype) * t
        origin = origin[:, None, None] if axis == 0 else origin[None, :, None]
        local = pos - origin
        out_hi = alive & (local >= t - 0.5)          # -> tile + 1
        out_lo = alive & (local < -0.5)              # -> tile - 1
        parity = (jnp.arange(cap, dtype=jnp.int32) & 1) == 0
        key = jnp.where(out_hi, 0,
                        jnp.where(out_lo, 4,
                                  jnp.where(alive, 2,
                                            jnp.where(parity, 1, 3))))
        key = key.astype(jnp.int32)

        ops = [data[k] for k in names]
        sorted_ops = lax.sort([key] + ops, dimension=2, num_keys=1)
        skey = sorted_ops[0]
        sdata = dict(zip(names, sorted_ops[1:]))

        # donors that did not fit in their slab are lost
        n_lost = n_lost + (
            jnp.sum(skey[..., m:] == 0)
            + jnp.sum(skey[..., :cap - m] == 4)).astype(jnp.int32)

        def send(sl, valid, direction):
            """Roll an m-slab one tile over; wrapped rows cross the device
            boundary (ppermute) with the +-nloc coordinate adjust."""
            wrapped_idx = 0 if direction > 0 else nt - 1
            tile_idx = jnp.arange(nt)
            tile_idx = tile_idx[:, None, None] if axis == 0 else \
                tile_idx[None, :, None]
            from_wrap = (tile_idx == wrapped_idx)
            moved, valid_m = _roll_with_edge_exchange((sl, valid), axis,
                                                      direction, spec)
            adj = jnp.asarray(-nloc if direction > 0 else nloc, pos.dtype)
            moved = dict(moved)
            moved[coord] = jnp.where(from_wrap, moved[coord] + adj,
                                     moved[coord])
            if not spec.periodic:
                i = lax.axis_index(spec.axis_name)
                edge = (i == 0) if direction > 0 else (i == spec.size - 1)
                valid_m = valid_m & ~(from_wrap & edge)
            return moved, valid_m

        up_sl = {k: v[..., :m] for k, v in sdata.items()}
        dn_sl = {k: v[..., cap - m:] for k, v in sdata.items()}
        in_lo, val_lo = send(up_sl, skey[..., :m] == 0, +1)
        in_hi, val_hi = send(dn_sl, skey[..., cap - m:] == 4, -1)

        # arrivals merge INTO the end slabs: in the receiver's front slab
        # the surviving stays are back-packed (key order up < dead_even <
        # stay) while arrivals are front-packed (the sender's ups sort
        # first), so they collide only on genuine overflow — symmetrical
        # for the back slab (stay < dead_odd < down). Collisions lose the
        # stay and are counted like capacity overflow.
        stay_lo = skey[..., :m] == 2
        stay_hi = skey[..., cap - m:] == 2
        n_lost = n_lost + (jnp.sum(stay_lo & val_lo)
                           + jnp.sum(stay_hi & val_hi)).astype(jnp.int32)
        mid_alive = skey[..., m:cap - m] == 2
        data = {k: jnp.concatenate(
                    [jnp.where(val_lo, in_lo[k].astype(v.dtype),
                               sdata[k][..., :m]),
                     sdata[k][..., m:cap - m],
                     jnp.where(val_hi, in_hi[k].astype(v.dtype),
                               sdata[k][..., cap - m:])],
                    axis=-1) if k in sdata else v
                for k, v in data.items()}
        alive = jnp.concatenate([val_lo | stay_lo, mid_alive,
                                 val_hi | stay_hi], axis=-1)

    if recompute_ig:
        # same expression shape as boris_push (ops/pusher.py:56) so the
        # recomputed value is bitwise-identical to the carried one
        data["inv_gamma"] = 1.0 / jnp.sqrt(
            1.0 + data["ux"]**2 + data["uy"]**2 + data["uz"]**2)
    return _sanitize_tiled(data, alive), alive, n_lost


def insert_tiled(data: Dict[str, jnp.ndarray], alive: jnp.ndarray,
                 next_id: jnp.ndarray, new_vals: Dict[str, jnp.ndarray],
                 valid: jnp.ndarray, device_id=None):
    """Tile-aligned in-step creation (QED photon/pair birth): newborns sit
    at their parent's slot in the parent species' tile layout, and a
    newborn's position equals its parent's, so its home tile is the
    parent's tile — insertion is a per-tile merge of (child survivors,
    newborn buffer) with the same multi-operand lax.sort network as
    migrate_tiled. Dense counterpart of parallel/inject.py::insert_local
    (reference qed/cpu.py create_*_patches).

    data/alive: child species, (ntx, nty, cap_t). new_vals/valid:
    (ntx, nty, cap_src) elementwise newborn values at parent slots.

    Ids are sequential from ``next_id`` (reference particles.py:91-139
    _npart_created counter) via a hierarchical prefix rank: intra-tile
    cumsum along the (minor) slot axis + a tiny exclusive scan over the
    per-tile counts — no full-length 1D cumsum (pathological on TPU).

    Returns (data, alive, next_id, n_lost); newborns that find no free
    slot in their tile are dropped and counted (the untiled path drops
    them identically when the capacity is exhausted).
    """
    cap_t = alive.shape[-1]
    vi = valid.astype(jnp.int32)
    intra = jnp.cumsum(vi, axis=-1) - vi                 # exclusive, per tile
    counts = jnp.sum(vi, axis=-1)                        # (ntx, nty)
    base = jnp.cumsum(counts.reshape(-1)) - counts.reshape(-1)
    rank = base.reshape(counts.shape)[..., None] + intra
    ids = next_id + rank.astype(jnp.uint32)

    keys = jnp.concatenate([
        jnp.where(alive, 0, 2).astype(jnp.int32),
        jnp.where(valid, 1, 2).astype(jnp.int32)], axis=-1)
    names = sorted(data)
    ops = []
    for k in names:
        arr = data[k]
        if k == "id_lo":
            nv = ids
        elif k == "id_hi":
            # newborns belong to THIS device: a tile's slot contents can be
            # immigrants carrying a foreign id_hi, so never copy from them
            if device_id is None:
                nv = jnp.broadcast_to(arr[..., :1], valid.shape)
            else:
                nv = jnp.full(valid.shape, 0, arr.dtype) + \
                    device_id.astype(arr.dtype)
        elif k in new_vals:
            nv = jnp.where(valid, new_vals[k].astype(arr.dtype), 0)
        elif k == "inv_gamma":
            nv = jnp.where(valid, jnp.ones_like(valid, arr.dtype),
                           jnp.ones_like(valid, arr.dtype))
        else:
            nv = jnp.zeros(valid.shape, arr.dtype)
        ops.append(jnp.concatenate([arr, nv.astype(arr.dtype)], axis=-1))
    sorted_ops = lax.sort([keys] + ops, dimension=2, num_keys=1)
    kept = sorted_ops[0][..., :cap_t]
    n_lost = jnp.sum(sorted_ops[0][..., cap_t:] < 2).astype(jnp.int32)
    out = {k: o[..., :cap_t] for k, o in zip(names, sorted_ops[1:])}
    alive = kept < 2
    next_id = next_id + jnp.sum(counts).astype(jnp.uint32)
    return out, alive, next_id, n_lost
