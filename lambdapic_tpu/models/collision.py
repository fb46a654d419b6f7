"""Relativistic binary Coulomb collisions (Nanbu/Perez).

TPU-native rebuild of the reference collision module
(core/collision/collision.py:22-207, cpu.py:22-430, utils.py:15-205):
per-cell random pairing over cell-sorted particles, COM boost, Coulomb
logarithm (fixed or varying with the per-cell Debye length), scattering-angle
sampling, boost back, with the reference's dt/weight corrections.

Vectorized pairing (instead of the reference's per-cell sequential
iterators):
- particles are sorted by (cell, random) so each cell holds a random
  permutation of its particles (ops/sort.py::shuffled_sort_perm);
- intra-species: rank 2i pairs with rank 2i+1 within the cell;
  dt_corr = n-1 (n even) / n (n odd), w_corr = 1.
- inter-species: rank r of each side pair for r < min(n1, n2);
  dt_corr = max(n1, n2).

Pairing matches the reference exactly (cpu.py:20-134):
- intra-species: rank 2i pairs rank 2i+1; odd cells re-pair the LAST
  particle with the FIRST in a second parallel pass (the reference's
  sequential last pair), with w_corr = 0.5 on the first and last pairs;
  dt_corr = 2*npairs - 1.
- inter-species: npairs = max(n1, n2) per cell; the larger side pairs
  once each while the smaller side repeats cyclically with
  w_corr = 1/ceil or 1/floor of the count ratio (cpu.py:103-134).
  Repeats are executed as sequential ROUNDS (a lax.while_loop of
  conflict-free parallel passes, one per repeat of the smaller side) so
  every small-side particle sees the previous round's momenta, exactly
  like the reference's in-cell sequential iteration. Round count is the
  worst cell's ceil(nbig/nsmall) — 1 for quasi-neutral cells.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from itertools import combinations
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import c, epsilon_0, h, pi
from ..ops.sort import bucket_bounds, cell_ids_2d, cell_ids_3d, \
    shuffled_sort_perm


@dataclass(frozen=True)
class CollisionPairCfg:
    ispec1: int
    ispec2: int


@dataclass
class CollisionConfig:
    pairs: Tuple[CollisionPairCfg, ...]
    species_mq: Tuple[Tuple[float, float], ...]   # (m, q) per ispec
    cell_vol: float
    lnLambda: float = 0.0      # 0 -> varying with Debye length (reference
    #                            collision.py:44 default)


def _com_data(ux1, uy1, uz1, ig1, m1, ux2, uy2, uz2, ig2, m2):
    """Vectorized reference collision_data (collision/utils.py:26-72)."""
    px1, py1, pz1 = ux1 * m1 * c, uy1 * m1 * c, uz1 * m1 * c
    px2, py2, pz2 = ux2 * m2 * c, uy2 * m2 * c, uz2 * m2 * c
    gamma1, gamma2 = 1.0 / ig1, 1.0 / ig2
    vx1, vy1, vz1 = ux1 * ig1 * c, uy1 * ig1 * c, uz1 * ig1 * c
    vx2, vy2, vz2 = ux2 * ig2 * c, uy2 * ig2 * c, uz2 * ig2 * c

    mg = gamma1 * m1 + gamma2 * m2
    vx_com = (px1 + px2) / mg
    vy_com = (py1 + py2) / mg
    vz_com = (pz1 + pz2) / mg
    v2 = vx_com**2 + vy_com**2 + vz_com**2
    gamma_com = 1.0 / jnp.sqrt(jnp.maximum(1 - v2 / c**2, 1e-30))

    fac = jnp.where(v2 > 0, (gamma_com - 1) / jnp.maximum(v2, 1e-300), 0.0)
    vdotv1 = vx1 * vx_com + vy1 * vy_com + vz1 * vz_com
    coeff1 = (fac * vdotv1 - gamma_com) * m1 * gamma1
    px1_com = px1 + coeff1 * vx_com
    py1_com = py1 + coeff1 * vy_com
    pz1_com = pz1 + coeff1 * vz_com
    p1_com = jnp.sqrt(px1_com**2 + py1_com**2 + pz1_com**2)

    gamma1_com = (1 - (vx_com * vx1 + vy_com * vy1 + vz_com * vz1) / c**2
                  ) * gamma_com * gamma1
    gamma2_com = (1 - (vx_com * vx2 + vy_com * vy2 + vz_com * vz2) / c**2
                  ) * gamma_com * gamma2
    p_perp = jnp.sqrt(px1_com**2 + py1_com**2)
    return dict(gamma1=gamma1, gamma2=gamma2, vx_com=vx_com, vy_com=vy_com,
                vz_com=vz_com, v2=v2, gamma_com=gamma_com,
                px1_com=px1_com, py1_com=py1_com, pz1_com=pz1_com,
                p1_com=p1_com, p_perp=p_perp, gamma1_com=gamma1_com,
                gamma2_com=gamma2_com)


def _rotate(px, py, pz, p, p_perp, cosX, sinX, phi):
    """(reference utils.py:160-177)"""
    sc = sinX * jnp.cos(phi)
    ss = sinX * jnp.sin(phi)
    safe = p_perp > 1e-10 * p
    pp = jnp.maximum(p_perp, 1e-300)
    px_new = jnp.where(safe, (px * pz * sc - py * p * ss) / pp + px * cosX,
                       p * sc)
    py_new = jnp.where(safe, (py * pz * sc + px * p * ss) / pp + py * cosX,
                       p * ss)
    pz_new = jnp.where(safe, -p_perp * sc + pz * cosX, p * cosX)
    return px_new, py_new, pz_new


def _boost_to_lab(px_c, py_c, pz_c, gamma_p_com, m, d):
    """(reference utils.py:180-205)"""
    vdotp = d["vx_com"] * px_c + d["vy_com"] * py_c + d["vz_com"] * pz_c
    fac = jnp.where(d["v2"] > 0, (d["gamma_com"] - 1)
                    / jnp.maximum(d["v2"], 1e-300), 0.0)
    coeff = fac * vdotp + m * gamma_p_com * d["gamma_com"]
    return (px_c + d["vx_com"] * coeff, py_c + d["vy_com"] * coeff,
            pz_c + d["vz_com"] * coeff)


def _pair_collide(ux1, uy1, uz1, ig1, w1, m1, q1,
                  ux2, uy2, uz2, ig2, w2, m2, q2,
                  valid, dt_corr, lnLambda_fixed, inv_debye2,
                  cell_vol, dt, u_s, u_accept, phi):
    """Vectorized collision kernel (reference cpu.py:377-430 +
    coulomb_scattering utils.py:101-157 + varying_lnLambda cpu.py:252-278).

    Returns new (ux, uy, uz, inv_gamma) for both partners and acceptance
    masks.
    """
    d = _com_data(ux1, uy1, uz1, ig1, m1, ux2, uy2, uz2, ig2, m2)
    ok = valid & (d["p1_com"] > 0)
    p1s = jnp.maximum(d["p1_com"], 1e-300)

    # Coulomb log (varying: reference cpu.py:252-278)
    q1q2 = abs(q1 * q2)
    b0 = (q1q2 / (4 * pi * epsilon_0 * c**2) * d["gamma_com"]
          / (m1 * d["gamma1_com"] + m2 * d["gamma2_com"])
          * ((m1 * d["gamma1_com"] * m2 * d["gamma2_com"]) / p1s**2 * c**2
             + 1))
    bmin = jnp.maximum(h / 2 / p1s, b0)
    lambdaD2 = 1.0 / jnp.maximum(inv_debye2, 1e-300)
    ln_var = jnp.where(inv_debye2 > 0,
                       jnp.maximum(2.0, 0.5 * jnp.log1p(lambdaD2 / bmin**2)),
                       2.0)
    lnL = lnLambda_fixed if lnLambda_fixed > 0 else ln_var

    w_max = jnp.maximum(w1, w2)
    s = (w_max / cell_vol * dt * dt_corr * (lnL * (q1 * q2)**2)
         / (4 * pi * epsilon_0**2 * c**4 * m1 * d["gamma1"] * m2
            * d["gamma2"])
         * (d["gamma_com"] * d["p1_com"]) / (m1 * d["gamma1"]
                                             + m2 * d["gamma2"])
         * (m1 * d["gamma1_com"] * m2 * d["gamma2_com"] / p1s**2 * c**2
            + 1)**2)

    # scattering angle sampling (reference utils.py:142-153)
    alpha_s = 0.37 * s - 0.005 * s**2 - 0.0064 * s**3
    sin2X2_small = alpha_s * u_s / jnp.sqrt(
        jnp.maximum((1 - u_s) + alpha_s * alpha_s * u_s, 1e-300))
    cosX_small = 1.0 - 2.0 * sin2X2_small
    sinX_small = 2.0 * jnp.sqrt(jnp.maximum(
        sin2X2_small * (1.0 - sin2X2_small), 0.0))
    cosX_big = 2.0 * u_s - 1.0
    sinX_big = jnp.sqrt(jnp.maximum(1.0 - cosX_big**2, 0.0))
    small = s < 4
    cosX = jnp.where(small, cosX_small, cosX_big)
    sinX = jnp.where(small, sinX_small, sinX_big)

    px1n, py1n, pz1n = _rotate(d["px1_com"], d["py1_com"], d["pz1_com"],
                               d["p1_com"], d["p_perp"], cosX, sinX, phi)

    acc1 = ok & (w2 / w_max > u_accept)
    acc2 = ok & (w1 / w_max > u_accept)

    px1l, py1l, pz1l = _boost_to_lab(px1n, py1n, pz1n, d["gamma1_com"], m1, d)
    px2l, py2l, pz2l = _boost_to_lab(-px1n, -py1n, -pz1n, d["gamma2_com"],
                                     m2, d)
    ux1n = jnp.where(acc1, px1l / (m1 * c), ux1)
    uy1n = jnp.where(acc1, py1l / (m1 * c), uy1)
    uz1n = jnp.where(acc1, pz1l / (m1 * c), uz1)
    ig1n = 1.0 / jnp.sqrt(1 + ux1n**2 + uy1n**2 + uz1n**2)
    ux2n = jnp.where(acc2, px2l / (m2 * c), ux2)
    uy2n = jnp.where(acc2, py2l / (m2 * c), uy2)
    uz2n = jnp.where(acc2, pz2l / (m2 * c), uz2)
    ig2n = 1.0 / jnp.sqrt(1 + ux2n**2 + uy2n**2 + uz2n**2)
    return (ux1n, uy1n, uz1n, ig1n), (ux2n, uy2n, uz2n, ig2n)


# ----------------------------------------------------------------------
# cell-layout helpers: the cell engine already bins particles by cell
# (arrays are (cap_c, nx, ny[, nz]) with the cell identity = the array
# position), so pairing needs NO argsort and NO flat gathers — a Batcher
# compare-exchange over the small slot axis compacts + shuffles each
# cell's column in one vectorized pass (the flat path's
# shuffled_sort_perm + take() pipeline was the collision bench's DNF).
# ----------------------------------------------------------------------

def _sort_cap(ces, key, payloads):
    """Batcher sort along the slot axis (axis 0) at XLA level: ``ces``
    is the compare-exchange network, ``key`` (cap, *cells), ``payloads``
    a list of same-shape arrays carried through the swaps. Returns the
    sorted payloads (the key is consumed)."""
    cap = key.shape[0]
    ks = [key[a] for a in range(cap)]
    ps = [[p[a] for a in range(cap)] for p in payloads]
    for a, b in ces:
        swap = ks[a] > ks[b]
        ka, kb = ks[a], ks[b]
        ks[a] = jnp.where(swap, kb, ka)
        ks[b] = jnp.where(swap, ka, kb)
        for pl in ps:
            va, vb = pl[a], pl[b]
            pl[a] = jnp.where(swap, vb, va)
            pl[b] = jnp.where(swap, va, vb)
    return [jnp.stack(p) for p in ps]


def _take_rank(arr, idx):
    """Per-cell dynamic slot lookup without a gather: arr (cap, *cells),
    idx (*cells) or (capB, *cells) int32 rank -> values at that rank
    (one-hot sum over the small slot axis)."""
    cap = arr.shape[0]
    out = None
    for j in range(cap):
        v = jnp.where(idx == j, arr[j][None] if idx.ndim == arr.ndim
                      else arr[j], 0.0)
        out = v if out is None else out + v
    return out


class Collision:
    """Traced collision stage over per-device local particle arrays.

    Built by the Simulation from add_collision groups
    (reference collision.py:36-63). apply() is called inside seg_particles
    (before the pusher, reference simulation.py:974-978).

    Two layouts:
    - apply_local: flat (cap,) arrays — sort-by-(cell, random) pairing
      (reference sort/cpu2d.c analog).
    - apply_cell: cell-binned (cap_c, *cells) arrays — slot-column
      pairing with identical reference pairing semantics
      (collision/cpu.py:22-134) but no argsort/gather.
    """

    def __init__(self, cfg: CollisionConfig, grid):
        self.cfg = cfg
        self.grid = grid
        # unique ispecs involved
        s = []
        for p in cfg.pairs:
            for i in (p.ispec1, p.ispec2):
                if i not in s:
                    s.append(i)
        self.ispecs = tuple(s)

    # -- local helpers ----------------------------------------------------
    def _sorted_view(self, data, alive, key):
        grid = self.grid
        if grid.dimension == 2:
            cell = cell_ids_2d(data["x"], data["y"], alive,
                               grid.nx_loc, grid.ny_loc)
            ncells = grid.nx_loc * grid.ny_loc
        else:
            cell = cell_ids_3d(data["x"], data["y"], data["z"], alive,
                               grid.nx_loc, grid.ny_loc, grid.nz_loc)
            ncells = grid.nx_loc * grid.ny_loc * grid.nz_loc
        perm = shuffled_sort_perm(cell, key, ncells)
        cell_s = jnp.take(cell, perm)
        starts, counts = bucket_bounds(cell_s, ncells)
        return perm, cell_s, starts, counts

    def _debye_field(self, views, ncells):
        """Per-cell inverse Debye length squared, summed over species
        (reference cpu.py:138-228, 230-250)."""
        inv_d2 = jnp.zeros(ncells)
        ntot = jnp.zeros(ncells)
        cell_vol = self.cfg.cell_vol
        for ispec, (perm, cell_s, starts, counts, data, alive) in views.items():
            m, q = self.cfg.species_mq[ispec]
            w = jnp.where(alive, data["w"], 0.0)
            seg = lambda v: jax.ops.segment_sum(
                v, cell_s, num_segments=ncells + 1,
                indices_are_sorted=True)[:-1]
            ws = jnp.take(w, perm)
            ux = jnp.take(data["ux"], perm)
            uy = jnp.take(data["uy"], perm)
            uz = jnp.take(data["uz"], perm)
            w_tot = seg(ws)
            wsafe = jnp.maximum(w_tot, 1e-300)
            ux_m = seg(ws * ux) / wsafe
            uy_m = seg(ws * uy) / wsafe
            uz_m = seg(ws * uz) / wsafe
            du2 = ((ux - jnp.take(ux_m, cell_s, mode="clip"))**2
                   + (uy - jnp.take(uy_m, cell_s, mode="clip"))**2
                   + (uz - jnp.take(uz_m, cell_s, mode="clip"))**2)
            # T = <v p>/3 (reference cpu.py:207-219)
            kT_mc2 = seg(ws * du2 / jnp.sqrt(1 + du2) / 3.0) / wsafe
            kT = kT_mc2 * m * c**2
            dens = w_tot / cell_vol
            contrib = jnp.where(kT > 0, dens * q**2
                                / (epsilon_0 * jnp.maximum(kT, 1e-300)),
                                jnp.where(w_tot > 0, jnp.inf, 0.0))
            inv_d2 = inv_d2 + jnp.where(w_tot > 0, contrib, 0.0)
            ntot = ntot + dens
        # physical constraint: Debye length >= interparticle distance
        # (reference cpu.py:230-250)
        rmin2 = jnp.where(ntot > 0, (4 * pi * ntot / 3.0)**(-2.0 / 3.0),
                          jnp.inf)
        inv_d2 = jnp.where((inv_d2 > 0) & (1.0 / inv_d2 < rmin2),
                           1.0 / rmin2, inv_d2)
        return inv_d2

    # -- cell layout (no argsort, no gathers) ---------------------------
    def _debye_field_cell(self, species_data):
        """Per-cell inverse Debye length squared on (cap_c, *cells)
        arrays: the per-cell sums of the flat path's segment_sum are
        plain reductions over the slot axis here (reference
        cpu.py:138-250 semantics)."""
        cell_vol = self.cfg.cell_vol
        inv_d2 = None
        ntot = None
        for ispec in self.ispecs:
            data, alive = species_data[ispec]
            m, q = self.cfg.species_mq[ispec]
            w = jnp.where(alive, data["w"], 0.0)
            ux, uy, uz = data["ux"], data["uy"], data["uz"]
            w_tot = w.sum(0)
            wsafe = jnp.maximum(w_tot, 1e-30)
            ux_m = (w * ux).sum(0) / wsafe
            uy_m = (w * uy).sum(0) / wsafe
            uz_m = (w * uz).sum(0) / wsafe
            du2 = ((ux - ux_m[None])**2 + (uy - uy_m[None])**2
                   + (uz - uz_m[None])**2)
            # T = <v p>/3 (reference cpu.py:207-219)
            kT_mc2 = (w * du2 / jnp.sqrt(1 + du2) / 3.0).sum(0) / wsafe
            kT = kT_mc2 * m * c**2
            dens = w_tot / cell_vol
            contrib = jnp.where(kT > 0,
                                dens * q**2 / (epsilon_0
                                               * jnp.maximum(kT, 1e-30)),
                                jnp.where(w_tot > 0, jnp.inf, 0.0))
            contrib = jnp.where(w_tot > 0, contrib, 0.0)
            inv_d2 = contrib if inv_d2 is None else inv_d2 + contrib
            ntot = dens if ntot is None else ntot + dens
        # Debye length >= interparticle distance (reference cpu.py:230-250)
        rmin2 = jnp.where(ntot > 0, (4 * pi * ntot / 3.0)**(-2.0 / 3.0),
                          jnp.inf)
        inv_d2 = jnp.where((inv_d2 > 0) & (1.0 / inv_d2 < rmin2),
                           1.0 / rmin2, inv_d2)
        return inv_d2

    def apply_cell(self, species_data: Dict[int, tuple], dt, key):
        """Cell-layout collision stage: species_data: ispec ->
        (data dict of (cap_c, *cells) arrays, alive). Returns updated
        data dicts. Pairing semantics identical to apply_local /
        the reference (collision/cpu.py:22-134); only the mechanics
        differ — each cell's slot column is compacted alive-first in a
        random order by a Batcher pass, pairs are formed by static slot
        arithmetic, and momenta are restored to their original slots by
        a second Batcher pass keyed on the carried slot index."""
        from ..ops.cellpallas import _batcher_network

        inv_d2 = self._debye_field_cell(species_data)

        views = {}
        for ispec in self.ispecs:
            data, alive = species_data[ispec]
            cap = alive.shape[0]
            dtype = data["ux"].dtype
            n2 = 1
            while n2 < cap:
                n2 *= 2
            ces = _batcher_network(n2, cap)
            skey = jax.random.fold_in(key, 1000 + ispec)
            pri = jax.random.uniform(skey, alive.shape, dtype=dtype)
            # alive first (in random order), dead last
            k = jnp.where(alive, pri, pri + 2.0)
            iota = jax.lax.broadcasted_iota(dtype, alive.shape, 0)
            ux, uy, uz, ig, w, io = _sort_cap(
                ces, k, [data["ux"], data["uy"], data["uz"],
                         data["inv_gamma"], jnp.where(alive, data["w"],
                                                      0.0), iota])
            views[ispec] = {
                "mom": [ux, uy, uz, ig], "w": w, "iota": io, "ces": ces,
                "n": alive.sum(0, dtype=jnp.int32), "cap": cap,
                "dtype": dtype,
            }

        for ipair, pair in enumerate(self.cfg.pairs):
            pkey = jax.random.fold_in(key, 2000 + ipair)
            if pair.ispec1 == pair.ispec2:
                self._intra_cell(pair.ispec1, views, inv_d2, dt, pkey)
            else:
                self._inter_cell(pair, views, inv_d2, dt, pkey)

        out = {}
        for ispec in self.ispecs:
            v = views[ispec]
            data = dict(species_data[ispec][0])
            # unsort: Batcher keyed on the carried original slot index
            ux, uy, uz, ig = _sort_cap(v["ces"], v["iota"], v["mom"])
            data["ux"], data["uy"], data["uz"] = ux, uy, uz
            data["inv_gamma"] = ig
            out[ispec] = data
        return out

    def _intra_cell(self, ispec, views, inv_d2, dt, key):
        """Intra-species pairing on compacted slot columns (reference
        cpu.py:22-68): rank 2i with 2i+1, odd cells re-pair last-with-
        first in a second pass with w_corr = 0.5 (on the first pair of
        pass 1 too)."""
        v = views[ispec]
        m, q = self.cfg.species_mq[ispec]
        ux, uy, uz, ig = v["mom"]
        w = v["w"]
        n = v["n"]
        cap = v["cap"]
        dtype = v["dtype"]
        cells = n.shape
        rank = jax.lax.broadcasted_iota(jnp.int32, (cap,) + cells, 0)
        nB = n[None]
        dt_corr = jnp.where(n % 2 == 0, n - 1, n).astype(dtype)
        odd = (n % 2 == 1) & (n >= 3)

        # pass 1: even rank pairs its successor (static slot arithmetic)
        ev = lambda a: a[0::2]
        od = lambda a: a[1::2]
        valid1 = (rank[0::2] + 1) < nB
        pair_idx = jax.lax.broadcasted_iota(jnp.int32,
                                            (cap // 2,) + cells, 0)
        wc1 = jnp.where(odd[None] & (pair_idx == 0), 0.5, 1.0).astype(dtype)
        k1, k2, k3 = jax.random.split(key, 3)
        shp = (cap // 2,) + cells
        u_s = jax.random.uniform(k1, shp, dtype=dtype)
        u_acc = jax.random.uniform(k2, shp, dtype=dtype)
        phi = jax.random.uniform(k3, shp, dtype=dtype, maxval=2 * pi)
        new1, new2 = _pair_collide(
            ev(ux), ev(uy), ev(uz), ev(ig), ev(w) * wc1, m, q,
            od(ux), od(uy), od(uz), od(ig), od(w) * wc1, m, q,
            valid1, dt_corr[None], self.cfg.lnLambda, inv_d2[None],
            self.cfg.cell_vol, dt, u_s, u_acc, phi)
        mom = []
        for j, arr in enumerate((ux, uy, uz, ig)):
            upd = jnp.stack([new1[j], new2[j]], axis=1).reshape(arr.shape)
            sel = jnp.repeat(valid1, 2, axis=0)
            mom.append(jnp.where(sel, upd, arr))
        ux, uy, uz, ig = mom

        # pass 2: odd cells re-pair the LAST alive with the FIRST using
        # post-pass-1 momenta (reference's sequential last pair)
        last = lambda arr: jnp.sum(jnp.where(rank == nB - 1, arr, 0.0),
                                   axis=0)
        k4, k5, k6 = jax.random.split(jax.random.fold_in(key, 7), 3)
        u_s2 = jax.random.uniform(k4, cells, dtype=dtype)
        u_acc2 = jax.random.uniform(k5, cells, dtype=dtype)
        phi2 = jax.random.uniform(k6, cells, dtype=dtype, maxval=2 * pi)
        half = jnp.asarray(0.5, dtype)
        new_l, new_f = _pair_collide(
            last(ux), last(uy), last(uz), last(ig), last(w) * half, m, q,
            ux[0], uy[0], uz[0], ig[0], w[0] * half, m, q,
            odd, dt_corr, self.cfg.lnLambda, inv_d2,
            self.cfg.cell_vol, dt, u_s2, u_acc2, phi2)
        mom = []
        for j, arr in enumerate((ux, uy, uz, ig)):
            arr = jnp.where((rank == nB - 1) & odd[None], new_l[j][None],
                            arr)
            arr = arr.at[0].set(jnp.where(odd, new_f[j], arr[0]))
            mom.append(arr)
        v["mom"] = mom

    def _inter_cell(self, pair, views, inv_d2, dt, key):
        """Inter-species pairing on compacted slot columns with the
        reference's max(n1,n2) repeats (cpu.py:71-134), as sequential
        conflict-free rounds (see _inter docstring)."""
        i1, i2 = pair.ispec1, pair.ispec2
        v1, v2 = views[i1], views[i2]
        m1, q1 = self.cfg.species_mq[i1]
        m2, q2 = self.cfg.species_mq[i2]
        cap1, cap2 = v1["cap"], v2["cap"]
        n1, n2 = v1["n"], v2["n"]
        w1, w2 = v1["w"], v2["w"]
        dtype = v1["dtype"]
        cells = n1.shape
        rank1 = jax.lax.broadcasted_iota(jnp.int32, (cap1,) + cells, 0)
        rank2 = jax.lax.broadcasted_iota(jnp.int32, (cap2,) + cells, 0)

        nbig_c = jnp.maximum(n1, n2)
        nsml_c = jnp.minimum(n1, n2)
        rounds_c = jnp.where((nsml_c > 0) & (nbig_c > 0),
                             (nbig_c + nsml_c - 1) // nsml_c, 0)
        max_rounds = jnp.max(rounds_c).astype(jnp.int32)

        def w_corr_of(small_rank, nbig, nsmall):
            fl = nbig // jnp.maximum(nsmall, 1)
            extra = nbig % jnp.maximum(nsmall, 1)
            return jnp.where(small_rank < extra,
                             1.0 / (fl + 1),
                             1.0 / jnp.maximum(fl, 1)).astype(dtype)

        def sub_pass(rkey, r, mom_big, mom_sml, w_big, w_sml, rank_big,
                     rank_sml, n_big, n_sml, big_first, mq_big, mq_sml,
                     identity=False):
            """One round's pass over the big side's slot rows. Active in
            cells where the big side is at least as large as (strictly
            larger than, for the B pass) the small side.

            ``identity``: round-0 shortcut — sr = rank_big - 0*n_sml is
            the row index itself, so the partner lookup is a plain
            row-for-row read (and the reverse scatter its transpose):
            no O(cap^2) one-hot sums. Profiled on the 2D bench
            (docs round 5): the inter-species while body was 25.9 of
            the 52.4 ms device step, and in equal-density cells
            max_rounds == 1 — unrolling round 0 this way empties the
            while loop for the common case."""
            cmp_ok = (n_big >= n_sml) if big_first else (n_big > n_sml)
            sr = rank_big - r * n_sml[None]
            act = (cmp_ok & (n_sml > 0))[None] & (sr >= 0) \
                & (sr < n_sml[None]) & (rank_big < n_big[None])
            srbesc = jnp.maximum(sr, 0)
            # partner values of the small side at per-cell rank sr
            cap_b = rank_big.shape[0]
            cap_s = rank_sml.shape[0]

            def row_match(a):
                # rows beyond the small side's cap are never active
                # (act requires sr < n_sml <= cap_s)
                if cap_b <= cap_s:
                    return a[:cap_b]
                pad = jnp.zeros((cap_b - cap_s,) + a.shape[1:], a.dtype)
                return jnp.concatenate([a, pad], axis=0)

            if identity:
                s_ux, s_uy, s_uz, s_ig, s_w = [
                    row_match(a) for a in (*mom_sml, w_sml)]
            else:
                s_ux, s_uy, s_uz, s_ig, s_w = [
                    _take_rank(a, srbesc) for a in (*mom_sml, w_sml)]
            wc = w_corr_of(srbesc, n_big[None], jnp.maximum(n_sml, 1)[None])
            dt_corr = n_big.astype(dtype)[None]
            shp = mom_big[0].shape
            ka, kb, kc = jax.random.split(rkey, 3)
            u_s = jax.random.uniform(ka, shp, dtype=dtype)
            u_acc = jax.random.uniform(kb, shp, dtype=dtype)
            phi = jax.random.uniform(kc, shp, dtype=dtype, maxval=2 * pi)
            new_b, new_s = _pair_collide(
                mom_big[0], mom_big[1], mom_big[2], mom_big[3],
                w_big * wc, mq_big[0], mq_big[1],
                s_ux, s_uy, s_uz, s_ig, s_w * wc,
                mq_sml[0], mq_sml[1],
                act, dt_corr, self.cfg.lnLambda, inv_d2[None],
                self.cfg.cell_vol, dt, u_s, u_acc, phi)
            mom_big = tuple(jnp.where(act, nv, a)
                            for a, nv in zip(mom_big, new_b))
            # small-side updates: small rank j was touched by big rank
            # j + r*n_sml — gather the new values back (invertible map
            # within a round, so this is conflict-free)
            idxS = rank_sml + r * n_sml[None]
            actS = (cmp_ok & (n_sml > 0))[None] & (rank_sml < n_sml[None]) \
                & (idxS < n_big[None])
            if identity:
                # transpose of the row-for-row read above
                def row_match_s(nv):
                    if cap_s <= cap_b:
                        return nv[:cap_s]
                    pad = jnp.zeros((cap_s - cap_b,) + nv.shape[1:],
                                    nv.dtype)
                    return jnp.concatenate([nv, pad], axis=0)
                mom_sml = tuple(
                    jnp.where(actS, row_match_s(nv), a)
                    for a, nv in zip(mom_sml, new_s))
            else:
                mom_sml = tuple(
                    jnp.where(actS, _take_rank(nv, idxS), a)
                    for a, nv in zip(mom_sml, new_s))
            return mom_big, mom_sml

        mom1 = tuple(v1["mom"])
        mom2 = tuple(v2["mom"])

        # round 0 unrolled with the identity partner mapping (sr =
        # rank): no one-hot rank lookups, and — since equal-density
        # cells have rounds_c == 1 — the while loop below is empty for
        # the common case. Key derivation matches the loop form
        # bitwise (fold_in(key, 0) + split), so the sampled physics is
        # unchanged.
        k0 = jax.random.fold_in(key, 0)
        kA0, kB0 = jax.random.split(k0)
        mom1, mom2 = sub_pass(kA0, 0, mom1, mom2, w1, w2, rank1, rank2,
                              n1, n2, True, (m1, q1), (m2, q2),
                              identity=True)
        mom2, mom1 = sub_pass(kB0, 0, mom2, mom1, w2, w1, rank2, rank1,
                              n2, n1, False, (m2, q2), (m1, q1),
                              identity=True)

        def body(carry):
            r, mom1, mom2 = carry
            rkey = jax.random.fold_in(key, r)
            kA, kB = jax.random.split(rkey)
            mom1, mom2 = sub_pass(kA, r, mom1, mom2, w1, w2, rank1, rank2,
                                  n1, n2, True, (m1, q1), (m2, q2))
            mom2, mom1 = sub_pass(kB, r, mom2, mom1, w2, w1, rank2, rank1,
                                  n2, n1, False, (m2, q2), (m1, q1))
            return r + 1, mom1, mom2

        _, mom1, mom2 = jax.lax.while_loop(
            lambda cr: cr[0] < max_rounds, body,
            (jnp.int32(1), mom1, mom2))
        v1["mom"] = list(mom1)
        v2["mom"] = list(mom2)

    def apply_local(self, species_data: Dict[int, tuple], dt, key):
        """species_data: ispec -> (data dict (cap,), alive). Returns updated
        data dicts."""
        ncells = self.grid.nx_loc * self.grid.ny_loc * (
            self.grid.nz_loc if self.grid.dimension == 3 else 1)
        views = {}
        for k_i, ispec in enumerate(self.ispecs):
            data, alive = species_data[ispec]
            skey = jax.random.fold_in(key, 1000 + ispec)
            perm, cell_s, starts, counts = self._sorted_view(data, alive,
                                                             skey)
            views[ispec] = (perm, cell_s, starts, counts, data, alive)

        inv_d2 = self._debye_field(views, ncells)

        out = {i: dict(species_data[i][0]) for i in self.ispecs}
        for ipair, pair in enumerate(self.cfg.pairs):
            pkey = jax.random.fold_in(key, 2000 + ipair)
            if pair.ispec1 == pair.ispec2:
                self._intra(pair.ispec1, views, out, inv_d2, dt, pkey)
            else:
                self._inter(pair, views, out, inv_d2, dt, pkey)
        return out

    def _gather_pair_arrays(self, data_now, perm, idx):
        cap = perm.shape[0]
        gidx = jnp.take(perm, jnp.clip(idx, 0, cap - 1))
        return gidx

    def _intra(self, ispec, views, out, inv_d2, dt, key):
        perm, cell_s, starts, counts, _, alive = views[ispec]
        data = out[ispec]
        m, q = self.cfg.species_mq[ispec]
        cap = perm.shape[0]
        dtype = data["ux"].dtype
        rank = jnp.arange(cap) - jnp.take(starts, cell_s, mode="clip")
        n_cell = jnp.take(counts, cell_s, mode="clip")
        ncells = counts.shape[0]
        in_cell = cell_s < ncells
        odd = (n_cell % 2 == 1) & (n_cell >= 3)
        d2_cell = jnp.take(inv_d2, jnp.clip(cell_s, 0, ncells - 1))
        # dt correction (reference cpu.py:32-34): 2*npairs-1 =
        # n even -> n-1, odd -> n
        dt_corr = jnp.where(n_cell % 2 == 0, n_cell - 1, n_cell).astype(
            dtype)

        # pass 1: rank 2i with rank 2i+1 (reference pairs 0..npairs-2;
        # w_corr = 0.5 on the FIRST pair of odd cells, cpu.py:63-68)
        is_p1 = in_cell & (rank % 2 == 0) & (rank + 1 < n_cell)
        i1 = jnp.arange(cap)
        i2 = jnp.minimum(i1 + 1, cap - 1)
        g1 = jnp.take(perm, i1)
        g2 = jnp.take(perm, i2)
        wc = jnp.where(odd & (rank == 0), 0.5, 1.0).astype(dtype)

        take1 = lambda k: jnp.take(data[k], g1)
        take2 = lambda k: jnp.take(data[k], g2)
        k1, k2, k3 = jax.random.split(key, 3)
        u_s = jax.random.uniform(k1, (cap,), dtype=dtype)
        u_acc = jax.random.uniform(k2, (cap,), dtype=dtype)
        phi = jax.random.uniform(k3, (cap,), dtype=dtype, maxval=2 * pi)
        new1, new2 = _pair_collide(
            take1("ux"), take1("uy"), take1("uz"), take1("inv_gamma"),
            take1("w") * wc, m, q,
            take2("ux"), take2("uy"), take2("uz"), take2("inv_gamma"),
            take2("w") * wc, m, q,
            is_p1, dt_corr, self.cfg.lnLambda, d2_cell,
            self.cfg.cell_vol, dt, u_s, u_acc, phi)
        for j, name in enumerate(("ux", "uy", "uz", "inv_gamma")):
            arr = data[name]
            arr = arr.at[jnp.where(is_p1, g1, cap)].set(new1[j], mode="drop")
            arr = arr.at[jnp.where(is_p1, g2, cap)].set(new2[j], mode="drop")
            data[name] = arr

        # pass 2: odd cells re-pair the LAST particle with the FIRST
        # (reference's sequential last pair, cpu.py:49-58; w_corr = 0.5 on
        # both, cpu.py:63-68). Runs after pass 1 so the first particle's
        # momenta are the post-pair-0 values, matching the reference's
        # in-cell sequential order.
        is_last = in_cell & odd & (rank == n_cell - 1)
        first_pos = jnp.take(starts, jnp.clip(cell_s, 0, ncells - 1))
        g2b = jnp.take(perm, jnp.clip(first_pos, 0, cap - 1))
        take2b = lambda k: jnp.take(data[k], g2b)
        k4, k5, k6 = jax.random.split(jax.random.fold_in(key, 7), 3)
        u_s2 = jax.random.uniform(k4, (cap,), dtype=dtype)
        u_acc2 = jax.random.uniform(k5, (cap,), dtype=dtype)
        phi2 = jax.random.uniform(k6, (cap,), dtype=dtype, maxval=2 * pi)
        take1b = lambda k: jnp.take(data[k], g1)
        half = jnp.asarray(0.5, dtype)
        new1b, new2b = _pair_collide(
            take1b("ux"), take1b("uy"), take1b("uz"), take1b("inv_gamma"),
            take1b("w") * half, m, q,
            take2b("ux"), take2b("uy"), take2b("uz"), take2b("inv_gamma"),
            take2b("w") * half, m, q,
            is_last, dt_corr, self.cfg.lnLambda, d2_cell,
            self.cfg.cell_vol, dt, u_s2, u_acc2, phi2)
        for j, name in enumerate(("ux", "uy", "uz", "inv_gamma")):
            arr = data[name]
            arr = arr.at[jnp.where(is_last, g1, cap)].set(new1b[j],
                                                          mode="drop")
            arr = arr.at[jnp.where(is_last, g2b, cap)].set(new2b[j],
                                                           mode="drop")
            data[name] = arr

    def _inter(self, pair, views, out, inv_d2, dt, key):
        """Inter-species pairing with the reference's max(n1,n2) repeats
        (cpu.py:71-134): per cell, every particle of the LARGER side
        collides exactly once; the smaller side repeats cyclically with
        w_corr = 1/ceil(ratio) for the first nbig%nsmall small-ranks and
        1/floor(ratio) for the rest; dt_corr = max(n1,n2). Repeats run as
        sequential rounds (round r pairs big-side ranks [r*nsmall,
        (r+1)*nsmall)) so each round is conflict-free and later rounds see
        earlier rounds' momenta — the reference's in-cell sequential
        order. Cells where n1 >= n2 and cells where n2 > n1 are handled by
        two disjoint masked sub-passes per round."""
        i1, i2 = pair.ispec1, pair.ispec2
        perm1, cell1, starts1, counts1, _, _ = views[i1]
        perm2, cell2, starts2, counts2, _, _ = views[i2]
        d1 = out[i1]
        d2 = out[i2]
        m1, q1 = self.cfg.species_mq[i1]
        m2, q2 = self.cfg.species_mq[i2]
        cap1 = perm1.shape[0]
        cap2 = perm2.shape[0]
        ncells = counts1.shape[0]
        dtype = d1["ux"].dtype
        w1_full = d1["w"]
        w2_full = d2["w"]

        def side_view(perm, cell, starts_own, counts_own, counts_oth,
                      starts_oth):
            cap = perm.shape[0]
            rank = jnp.arange(cap) - jnp.take(starts_own, cell, mode="clip")
            n_own = jnp.take(counts_own, cell, mode="clip")
            cc = jnp.clip(cell, 0, ncells - 1)
            n_oth = jnp.take(counts_oth, cc, mode="clip")
            start_oth = jnp.take(starts_oth, cc)
            in_cell = cell < ncells
            d2c = jnp.take(inv_d2, cc)
            return rank, n_own, n_oth, start_oth, in_cell, d2c

        (rank1, n1, n2o, start2o, in1, d2c1) = side_view(
            perm1, cell1, starts1, counts1, counts2, starts2)
        (rank2, n2, n1o, start1o, in2, d2c2) = side_view(
            perm2, cell2, starts2, counts2, counts1, starts1)

        # worst-cell number of repeat rounds (1 for quasi-neutral cells)
        nbig_c = jnp.maximum(counts1, counts2)
        nsml_c = jnp.minimum(counts1, counts2)
        rounds_c = jnp.where((nsml_c > 0) & (nbig_c > 0),
                             (nbig_c + nsml_c - 1) // nsml_c, 0)
        max_rounds = jnp.max(rounds_c).astype(jnp.int32)

        def w_corr_of(small_rank, nbig, nsmall):
            fl = nbig // jnp.maximum(nsmall, 1)
            extra = nbig % jnp.maximum(nsmall, 1)
            return jnp.where(small_rank < extra,
                             1.0 / (fl + 1), 1.0 / jnp.maximum(fl, 1)
                             ).astype(dtype)

        def sub_pass(rkey, r, mom_big, mom_sml, w_big, w_sml,
                     perm_big, g_small_of, active, small_rank,
                     nbig, nsmall, d2c, mq_big, mq_sml):
            """One round's conflict-free pass over the big side's slots."""
            cap = perm_big.shape[0]
            g1 = perm_big
            g2 = g_small_of(small_rank)
            wc = w_corr_of(small_rank, nbig, nsmall)
            dt_corr = nbig.astype(dtype)
            tb = lambda a: jnp.take(a, g1)
            ts = lambda a: jnp.take(a, g2)
            ka, kb, kc = jax.random.split(rkey, 3)
            u_s = jax.random.uniform(ka, (cap,), dtype=dtype)
            u_acc = jax.random.uniform(kb, (cap,), dtype=dtype)
            phi = jax.random.uniform(kc, (cap,), dtype=dtype,
                                     maxval=2 * pi)
            new_b, new_s = _pair_collide(
                tb(mom_big[0]), tb(mom_big[1]), tb(mom_big[2]),
                tb(mom_big[3]), tb(w_big) * wc, mq_big[0], mq_big[1],
                ts(mom_sml[0]), ts(mom_sml[1]), ts(mom_sml[2]),
                ts(mom_sml[3]), ts(w_sml) * wc, mq_sml[0], mq_sml[1],
                active, dt_corr, self.cfg.lnLambda, d2c,
                self.cfg.cell_vol, dt, u_s, u_acc, phi)
            cap_b = mom_big[0].shape[0]
            cap_s = mom_sml[0].shape[0]
            mom_big = tuple(
                a.at[jnp.where(active, g1, cap_b)].set(v, mode="drop")
                for a, v in zip(mom_big, new_b))
            mom_sml = tuple(
                a.at[jnp.where(active, g2, cap_s)].set(v, mode="drop")
                for a, v in zip(mom_sml, new_s))
            return mom_big, mom_sml

        mom1 = (d1["ux"], d1["uy"], d1["uz"], d1["inv_gamma"])
        mom2 = (d2["ux"], d2["uy"], d2["uz"], d2["inv_gamma"])

        def body(carry):
            r, mom1, mom2 = carry
            rkey = jax.random.fold_in(key, r)
            kA, kB = jax.random.split(rkey)
            # sub-pass A: cells with n1 >= n2 iterate species-1 slots
            srA = rank1 - r * n2o
            actA = in1 & (n1 >= n2o) & (n2o > 0) & (srA >= 0) & (srA < n2o) \
                & (rank1 < n1)
            mom1, mom2 = sub_pass(
                kA, r, mom1, mom2, w1_full, w2_full, perm1,
                lambda sr: jnp.take(perm2, jnp.clip(start2o + sr, 0,
                                                    cap2 - 1)),
                actA, jnp.maximum(srA, 0), n1, n2o, d2c1,
                (m1, q1), (m2, q2))
            # sub-pass B: cells with n2 > n1 iterate species-2 slots
            srB = rank2 - r * n1o
            actB = in2 & (n1o < n2) & (n1o > 0) & (srB >= 0) & (srB < n1o) \
                & (rank2 < n2)
            mom2, mom1 = sub_pass(
                kB, r, mom2, mom1, w2_full, w1_full, perm2,
                lambda sr: jnp.take(perm1, jnp.clip(start1o + sr, 0,
                                                    cap1 - 1)),
                actB, jnp.maximum(srB, 0), n2, n1o, d2c2,
                (m2, q2), (m1, q1))
            return r + 1, mom1, mom2

        r0 = jnp.int32(0)
        _, mom1, mom2 = jax.lax.while_loop(
            lambda c: c[0] < max_rounds, body, (r0, mom1, mom2))
        for j, name in enumerate(("ux", "uy", "uz", "inv_gamma")):
            d1[name] = mom1[j]
            d2[name] = mom2[j]
