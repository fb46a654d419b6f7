"""Unified slab megakernel for the cell engine (Pallas TPU).

One kernel per species per step runs the ENTIRE particle stage —

    position half push  ->  re-binning (x, y, z in sequence)
    ->  staggered gather  ->  Boris  ->  position half push
    ->  5-tap Esirkepov deposit

— in a single VMEM-resident pass. This is the TPU analog of the
reference's unified pusher (core/pusher/unified/unified_pusher_2d.c:
157-365: one strip-mined OpenMP pass fusing push+gather+deposit), taken
further by absorbing the particle re-binning (the reference's separate
sort + sync_particles stages, sort/cpu2d.c:9-324 and
patch/sync_particles_2d.c:36-540) AND the leading position half push
into the same pass.

Motivation (profiled at bench shapes, docs/BENCH_LOCAL.md): in the v1
slab kernel the XLA prologue dominated the step — the half-push pass,
the 5-way-key pass, and above all the per-block x-edge strip arrays
(at bx=2 the strips are HALF the payload size, and their extraction,
relayout and kernel re-read cost ~3 GB/step at 128^3 vs ~0.8 GB of
actual payload I/O). v2 removes the prologue entirely:

- the half push and the 5-way keys are computed in-kernel from the
  stored positions (inv_gamma rides in as a read-only input; it is
  NOT a merge payload — Boris recomputes it);
- neighbor x-columns are read directly from the payload arrays through
  additional pallas refs with computed index maps (block = one x
  column; offset = i*bx-1 resp. (i+1)*bx, clamped) — no strip
  materialization, no transposes, no layout copies;
- only the per-device EDGE columns (the cross-device / periodic-wrap
  column pair) are prepared in XLA: one column per side per array,
  ppermuted when the mesh splits x, alive zeroed at open boundaries.
  The kernel selects edge-vs-column per block and applies the +-nx
  coordinate adjust after the push (bitwise-identical to the v1
  ordering);
- alive enters and leaves as uint8 (was an int32 key array).

Blocking: grid over X SLABS — block (cap, bx, ny_loc, nz_loc), i.e. the
y (and z) cell dims stay whole. Consequences:
- y/z re-binning is fully in-block (wrap columns read from the block
  itself under periodic boundaries); only the x axis needs neighbor
  columns, and x is an untiled dim in 3D (arbitrary offsets legal);
- the Mosaic (8, 128) tiling rules constrain only (ny, nz) — which
  equal the array dims — so bx is a free tuning knob;
- the mesh may be split along x arbitrarily (edge columns ppermute at
  device edges); a mesh split along y or z falls back to the per-axis
  kernels (ops/cellpallas.py) because the in-block wrap would need
  post-x-migration columns from the y/z neighbor device.

The E,B field slab (6, bx+4, ny+2g[, nz+2g]) windows overlap between
blocks, which BlockSpecs cannot express, so the caller pre-stacks the
per-slab windows into (nbx, 6, bx+4, ny+2g[, nz+2g]) — a cheap
static-slice stack at the small-bx duplication factor, shared across
species by XLA CSE.

Numerical contract: identical to the split pipeline — push_position
(ops/pusher.py:68-84) -> the same 5-way-key overwrite-merge re-binning
per axis (ops/cell2d.py::migrate_cells fast path) -> the same
gather/Boris/deposit closed forms (ops/cellpallas.py kernels). The 3D
deposit recomputes the y/z Esirkepov tap dictionaries lazily inside
the (oy, oz) offset loops (same expressions, same accumulation order —
bitwise identical) to cut live VMEM. Parity is asserted by
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

from ..constants import c as c_light, e as _e_charge, hbar as _hbar, \
    m_e as _m_e
from .cellpallas import (_GOFF, _HOFF, _DOFF, _COMPS2, _COMPS3,
                         _batcher_network, _boris, _compile_kwargs, _m2,
                         _mig_perms, _use_interpret, occ_skip_enabled)
from .cell2d import _TRANSIENT

# quantum-parameter prefactor (reference inline.py:5-13; same constant
# as models/qed.py::CHI_FACTOR — duplicated here to keep ops/ free of
# models/ imports)
_CHI_FACTOR = _e_charge * _hbar / (_m_e**2 * c_light**3)


def _env_int(name: str, default: int) -> int:
    import os
    v = os.environ.get(name)
    return int(v) if v else default


def slab_bx(nx_loc: int, ndim: int) -> int:
    """X-slab extent: bx cells per grid step. x is an untiled dim in 3D
    (block dims beyond the last two are unconstrained) so any bx is
    legal; in 2D bx is the sublane dim — multiples of 8 (or the full
    axis). Default tuned for VMEM: the 3D gather+deposit holds ~65
    live block-size tap arrays (lazy y/z recompute)."""
    if ndim == 3:
        pref = _env_int("LAMBDAPIC_SLAB_BX", 2)
        while nx_loc % pref:
            pref -= 1
        return pref
    pref = _env_int("LAMBDAPIC_SLAB_BX2", 16)
    while nx_loc % pref and pref > 8:
        pref -= 8
    return pref if nx_loc % pref == 0 else nx_loc


def slab_stream(ndim: int, cap: int, nloc) -> int:
    """Streamed-tap deposit (round-5 VMEM lever): partition the
    gather+Boris+deposit tail into NS static y-strips, each reading its
    own payload rows from the output refs and RMW-ing its rim rows.
    The tap-dictionary live set — the dominant share of the tail's
    ~85 block-size arrays (slab_ok) — then scales ~1/NS, which is what
    lets cap 8 slabs keep bx=2 and cap>=10 fit at bx=1 (round-4
    measured ceilings: cap 8/bx 2 = 154.9 MB, cap 10/bx 1 = 127.99 MB
    scoped stack vs the 120-128 MB budget). Strip offsets are static
    (full unroll), so Mosaic sees only aligned sublane slices; op count
    is unchanged (taps are per-particle elementwise work partitioned by
    home row). Reference hot-path analog: the strip-mined L1-resident
    pusher, unified_pusher_2d.c:9-12 / current_deposit.h:275-440.

    3D only (in 2D y is the lane dim and the live set fits anyway).
    LAMBDAPIC_SLAB_STREAM=NS forces NS strips; 0/unset = auto (engage
    the fewest strips whose estimated tail live-set fits the budget,
    see _stream_auto)."""
    if ndim != 3:
        return 1
    ny = nloc[1]
    v = _env_int("LAMBDAPIC_SLAB_STREAM", 0)
    if v:
        while v > 1 and ny % v:
            v -= 1
        return max(v, 1)
    return _stream_auto(cap, nloc, ny)


def _stream_auto(cap: int, nloc, ny: int) -> int:
    """Fewest strips whose estimated tail live set fits the VMEM
    budget; 1 when the unstreamed tail already fits (the measured-
    fastest configuration — streaming is engaged only when it buys
    occupancy the budget would otherwise reject)."""
    bx = slab_bx(nloc[0], 3)
    trail = 1
    for n in nloc[1:]:
        trail *= n + 4
    blk = cap * bx * trail * 4
    slab = 6 * (bx + 4) * trail * 4
    refs = 26 * blk
    budget = _env_int("LAMBDAPIC_SLAB_VMEM_MB", 100) * 1024 * 1024
    for ns in (1, 2, 4, 8):
        if ny % ns or (ny // ns) % 8:
            continue
        est = (85 * blk) // ns + refs + 3 * slab
        if bx == 1:
            est = int(est * 1.7)
        if est <= budget:
            return ns
    return 8 if ny % 8 == 0 else 1


def slab_ok(nloc: Tuple[int, ...], cap: int,
            extra_arrays: int = 0, photon: bool = False) -> bool:
    """VMEM feasibility: the gather+deposit phase holds ~85 (3D) /
    ~45 (2D) live block-size arrays (x AND z tap dictionaries + payload
    rows; y taps are recomputed lazily) plus the field slab and the
    double-buffered in/out refs. ``extra_arrays``: additional block-size
    refs (QED: tau/delta/event payloads in+out + chi/ig_pre outputs).
    ``photon``: the field-free tail holds no tap dictionaries — only
    the merge phase's ~3 row copies of each payload stay live."""
    ndim = len(nloc)
    bx = slab_bx(nloc[0], ndim)
    trail = 1
    for n in nloc[1:]:
        trail *= n + 4
    blk = cap * bx * trail * 4
    slab = 6 * (bx + 4) * trail * 4
    live = 85 if ndim == 3 else 45
    if photon:
        live = 30
    elif rows_mode_enabled(ndim, cap):
        # row tail: the tap dictionaries live on (1, bx, ...) rows, so
        # the gather/deposit live set shrinks by ~cap; the merge phase
        # (~3 copies of every payload row) dominates instead
        live = 45
    refs = (26 + 2 * extra_arrays) * blk   # in+out, double-buffered
    est = live * blk + refs + 3 * slab
    if ndim == 3 and bx == 1:
        # measured calibration at bx=1 (128^3): without the round-5
        # levers, cap 10 compiles to a 127.99M scoped-vmem stack vs a
        # 77M estimate — the neighbor window and tap live set do not
        # shrink with bx, so the per-blk model under-counts. With the
        # permutation-replay merge + a >=2-strip streamed tail the
        # measured anchors move: cap 10 fits the 128M device limit
        # (est*1.15 = 96M vs a 100M default budget -> accept) while
        # cap 12 compiles only with throughput-killing register spills
        # (252 vs 815 Mpush/s, round-5 probes) -> reject.
        ns = slab_stream(3, cap, nloc)
        if perm_merge_enabled(True) and ns >= 2:
            est = int(est * 1.15)
            if cap > 10:
                # measured perf cliff, not a fit limit: cap 12/bx 1
                # compiles but register-spills to 252 vs 815+ Mpush/s
                # at cap 10 (round-5 probe) — never auto-select it
                return False
        else:
            est = int(est * 1.7)
    budget = _env_int("LAMBDAPIC_SLAB_VMEM_MB", 100) * 1024 * 1024
    return est <= budget


def slab_enabled() -> bool:
    import os
    return os.environ.get("LAMBDAPIC_SLAB", "1") != "0"




def rows_chunk(ndim: int, cap: int, ny: int = 0) -> int | None:
    """Slot-occupancy packing + row-gated tail (LAMBDAPIC_SLAB_ROWS).
    When on, the merge phase front-packs alive slots per cell (one
    extra Batcher pass) and the gather/Boris/deposit tail runs as a
    fori_loop over slot rows bounded by the actual last-alive-slot
    index. The bound is computed from the real post-merge alive mask,
    so it stays correct even if the packing invariant is ever broken
    by an external state edit. The reference's strip-mined clean/dirty
    elimination (unified_pusher_2d.c:261-312) exploits the same
    sparsity dynamically.

    Returns None (off), 0 (whole-plane bound) or BY > 0 (3D only:
    the tail loops over BY-row y-chunks, each with its OWN row bound —
    laser-solid compression is spot-localized in y, so chunks away
    from the spot keep the quiet-plasma occupancy bound and empty
    chunks run zero rows). Values:

        LAMBDAPIC_SLAB_ROWS=0          off
        LAMBDAPIC_SLAB_ROWS=1          whole-plane bound
        LAMBDAPIC_SLAB_ROWS=chunk[:BY] y-chunked bounds (default BY 16)
        LAMBDAPIC_SLAB_ROWS=auto       currently off (flip pending the
                                       round-4 A/B measurement)

    Whole-plane mode measured 401 vs 435 Mpush/s on the 3D bench
    (round 4, documented negative result): one compressed cell
    anywhere in an x-slab's plane forces that block's bound to cap.
    The y-chunked mode exists precisely to fix that."""
    import os
    v = os.environ.get("LAMBDAPIC_SLAB_ROWS", "auto")
    by = 16
    if v == "auto":
        v = "0"
    if v == "0":
        return None
    if v.startswith("chunk"):
        if ndim != 3:
            return 0                      # 2D: whole-plane bound only
        if ":" in v:
            by = int(v.split(":", 1)[1])
        while by > 8 and (ny % by):
            by -= 8
        if by < 8 or ny % by:
            return 0                      # ny not 8-divisible: plane
        return by
    return 0


def rows_mode_enabled(ndim: int, cap: int) -> bool:
    """Any row-gated tail variant active (see rows_chunk)."""
    return rows_chunk(ndim, cap) is not None


def _skips_enabled() -> bool:
    """Frozen-region skipping switch (LAMBDAPIC_SLAB_SKIPS, default on):
    per-block dynamic skips of the merge phase (no cell-crossers, no
    strip arrivals) and of gather+Boris+deposit (all momenta exactly
    zero and field window exactly zero — a causally untouched region).
    Output-equivalent; off is an ablation/debug escape."""
    import os
    return os.environ.get("LAMBDAPIC_SLAB_SKIPS", "1") != "0"


def _ablate() -> frozenset:
    """Timing-ablation knob (LAMBDAPIC_SLAB_ABLATE, comma-separated
    tokens ``merge``, ``gather``, ``deposit``): skips the named kernel
    phase to attribute in-kernel time. PHYSICS IS INVALID with any
    token set — profiling use only (docs/BENCH_LOCAL.md)."""
    import os
    v = os.environ.get("LAMBDAPIC_SLAB_ABLATE", "")
    return frozenset(t for t in v.split(",") if t)


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
    if n == 1:
        # bx=1 slabs: the whole row IS the edge — the shifted views are
        # exactly the strip columns (Mosaic rejects 0-sized vector
        # slices, so the general concatenate form cannot be used)
        return strip_lo, strip_hi
    body_lo = lax.slice_in_dim(row, 0, n - 1, axis=axis)
    body_hi = lax.slice_in_dim(row, 1, n, axis=axis)
    lo = jnp.concatenate([strip_lo, body_lo], axis=axis)
    hi = jnp.concatenate([body_hi, strip_hi], axis=axis)
    return lo, hi


def _apply_perm(perm_rows, in_rows):
    """Replay a key-sort's permutation on one payload's rows: output row
    a = in_rows[perm[a]] as a cap-deep where-chain. Same values the
    all-payload Batcher pass produces (swaps compare keys strictly, so
    the permutation fully determines payload movement), but only ONE
    payload's rows are in flight at a time — the round-5 merge-liveness
    fix (the merge phase was the binding scoped-VMEM consumer at
    cap 10: probe logs in docs/BENCH_LOCAL.md)."""
    cap = len(in_rows)
    out = []
    for a in range(cap):
        acc = in_rows[0]
        for j in range(1, cap):
            acc = jnp.where(perm_rows[a] == j, in_rows[j], acc)
        out.append(acc)
    return out


def perm_merge_enabled(is3d: bool) -> bool:
    """Default: on in 3D (the merge's sorted-payload copies are the
    binding scoped-VMEM allocation there — cap 10/bx 1 went from a
    129.06M reject to compiling, docs/BENCH_LOCAL.md round 5), off in
    2D (cap 16 makes the cap^2 replay ~2x the pruned Batcher's row
    ops and the 2D kernel has VMEM headroom anyway).
    LAMBDAPIC_SLAB_PERM_MERGE=1/0 forces either way."""
    import os
    v = os.environ.get("LAMBDAPIC_SLAB_PERM_MERGE", "auto")
    if v == "auto":
        return is3d
    return v != "0"


def _merge_axis(ces, axis, keys, pays, skeys_lo, spays_lo, skeys_hi,
                spays_hi, merge_idx, n_merged):
    """One re-binning axis on row values: sort, ±1 shift, overwrite-merge.

    keys: list of cap (1, ...) int32 rows (5-way key, see
    ops/cell2d.py::migrate_cells). pays: list-of-lists [payload][slot].
    skeys/spays: strip rows, one column wide along ``axis`` (raw;
    sorted here alongside).
    Returns (alive_rows, pays_out, n_merged).

    Default path sorts (key, slot-index) only and replays the
    permutation per payload (_apply_perm) — value-identical to the
    legacy all-payload Batcher (LAMBDAPIC_SLAB_PERM_MERGE=0) with a
    ~n_pay-fold smaller sorted-copy live set and fewer row ops at
    cap >= 8 (cap^2-1 selects/payload vs ~2x the CE count)."""
    if perm_merge_enabled(is3d=keys[0].ndim >= 4):
        return _merge_axis_perm(ces, axis, keys, pays, skeys_lo,
                                spays_lo, skeys_hi, spays_hi,
                                merge_idx, n_merged)
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


def _merge_axis_perm(ces, axis, keys, pays, skeys_lo, spays_lo,
                     skeys_hi, spays_hi, merge_idx, n_merged):
    """Permutation-replay form of _merge_axis (see its docstring):
    sort (key, slot-index) rows, derive the per-slot masks and merge
    weights once, then move each payload through the permutation + the
    ±1 shift + overwrite-merge independently."""
    cap = len(keys)
    n_pay = len(pays)
    w_i = merge_idx[0] if merge_idx else -1
    iota_m = [jnp.full_like(keys[0], a) for a in range(cap)]
    iota_s = [jnp.full_like(skeys_lo[0], a) for a in range(cap)]
    rk, (pidx,) = _sort_rows(ces, keys, [iota_m])
    slk, (sidx_lo,) = _sort_rows(ces, skeys_lo, [iota_s])
    shk, (sidx_hi,) = _sort_rows(ces, skeys_hi, [iota_s])

    alive_rows, val_lo_l, val_hi_l, stay_l, multi_l = [], [], [], [], []
    for a in range(cap):
        lo_k, hi_k = _shift(rk[a], slk[a], shk[a], axis)
        val_lo = lo_k == 0
        val_hi = hi_k == 4
        stay = rk[a] == 2
        alive_rows.append(val_lo | val_hi | stay)
        n_src = (val_lo.astype(jnp.int32) + val_hi.astype(jnp.int32)
                 + stay.astype(jnp.int32))
        multi_l.append(n_src >= 2)
        n_merged = n_merged + jnp.sum(
            jnp.maximum(n_src - 1, 0)).astype(jnp.int32)
        val_lo_l.append(val_lo)
        val_hi_l.append(val_hi)
        stay_l.append(stay)

    w_lo_l = w_hi_l = w_res_l = wsum_l = wsafe_l = None
    if merge_idx:
        wm = _apply_perm(pidx, pays[w_i])
        wl = _apply_perm(sidx_lo, spays_lo[w_i])
        wh = _apply_perm(sidx_hi, spays_hi[w_i])
        w_lo_l, w_hi_l, w_res_l, wsum_l, wsafe_l = [], [], [], [], []
        for a in range(cap):
            w_lo_f, w_hi_f = _shift(wm[a], wl[a], wh[a], axis)
            w_lo = jnp.where(val_lo_l[a], w_lo_f, 0.0)
            w_hi = jnp.where(val_hi_l[a], w_hi_f, 0.0)
            w_res = jnp.where(stay_l[a], wm[a], 0.0)
            wsum = w_lo + w_hi + w_res
            wsafe = jnp.maximum(wsum, jnp.asarray(
                1e-300 if wsum.dtype == jnp.float64 else 1e-30,
                wsum.dtype))
            w_lo_l.append(w_lo)
            w_hi_l.append(w_hi)
            w_res_l.append(w_res)
            wsum_l.append(wsum)
            wsafe_l.append(wsafe)

    out_rows = [[] for _ in range(n_pay)]
    for p in range(n_pay):
        rp = _apply_perm(pidx, pays[p])
        lp = _apply_perm(sidx_lo, spays_lo[p])
        hp = _apply_perm(sidx_hi, spays_hi[p])
        for a in range(cap):
            lo_v, hi_v = _shift(rp[a], lp[a], hp[a], axis)
            sel = jnp.where(val_lo_l[a], lo_v,
                            jnp.where(val_hi_l[a], hi_v, rp[a]))
            if merge_idx and p in merge_idx:
                if p == w_i:
                    mg = wsum_l[a]
                else:
                    mg = (w_lo_l[a] * lo_v + w_hi_l[a] * hi_v
                          + w_res_l[a] * rp[a]) / wsafe_l[a]
                sel = jnp.where(multi_l[a], mg.astype(sel.dtype), sel)
            out_rows[p].append(sel)
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

def unified_cell_step(eb_pad, alive8, ig, data: Dict[str, jnp.ndarray],
                      edges_lo: List[jnp.ndarray],
                      edges_hi: List[jnp.ndarray], *,
                      names: Sequence[str], merge_idx: Tuple[int, ...],
                      coords: Sequence[str], periodic: Sequence[bool],
                      q: float, m: float, dt: float,
                      deltas: Sequence[float], g: int,
                      occ=None, sanitize: Sequence[int] = (),
                      rims_in=None, with_rho: bool = True,
                      want_chi: bool = False, merge_axes=None,
                      tail: bool = True, yz_edges=None,
                      photon: bool = False):
    """Run half-push + migration(x,y[,z]) + gather + Boris + half push
    + deposit in one pallas kernel over x-slabs.

    eb_pad: (6, nx+2g, ny+2g[, nz+2g]) padded field stack. alive8:
    (cap, nx, ny[, nz]) uint8. ig: inv_gamma array (read-only input for
    the first half push; Boris recomputes it). data[names[p]]: STORED
    payload arrays (pre-push positions). edges_lo/hi: per-
    [alive8, ig, *payloads] single x-columns (cap, 1, ny[, nz]) — the
    cross-device / periodic-wrap neighbor columns, prepared by the
    caller (ppermuted when the mesh splits x; alive zeroed at open
    boundaries; coordinates NOT adjusted — the kernel applies the
    +-nx adjust after the push, matching the split-path ordering
    bitwise). periodic: per-IN-BLOCK axis (y[, z]) flags.
    deltas = (dx, dy[, dz]). sanitize: payload indices zeroed for dead
    slots on output (w, coords, momenta).

    Returns (alive8_out, payloads_out, inv_gamma, rims, n_merged[,
    chi, ig_pre]): rims (4, nbx, bx+4, ny+2g[, nz+2g]), channel-first —
    overlap-add along x only (cellpallas._fold_cfirst) to get the
    padded J.

    ``want_chi`` (QED species): additionally emit the quantum parameter
    chi (reference inline.py:5-13) computed in-kernel between the gather
    and the Boris rotation — i.e. from the POST-migration, PRE-push
    momenta and the gathered E,B at the mid-step position, exactly the
    reference's _qed stage inputs — plus the matching pre-push
    inv_gamma (for the optical-depth decrement outside the kernel,
    models/qed.py::_update_tau).

    Multi-dispatch mode (y/z-split meshes; slab_species_step drives
    it): ``merge_axes`` restricts this dispatch to a subset of the cell
    axes (None = all; axis 0 implies the leading half push and the
    cross-device x columns). A dispatch with ``tail=False`` returns
    only (alive8, payloads, n_merged). Between dispatches the caller
    ppermutes the post-merge edge columns of the next split axis across
    the mesh — reproducing the corner-mover ordering the reference gets
    from its sequential per-axis 8/26-neighbor exchange
    (patch/patch.py:446-592) — and passes them as ``yz_edges``: one
    entry per in-block axis, None (in-block wrap) or (lo_arrs, hi_arrs)
    with arrs = [alive_i32, *payloads], coordinates pre-adjusted.

    ``photon`` (neutral massless species, reference PhotonPusher
    core/pusher/photon.py:5-11): the tail is field-free — no gather, no
    Boris, no Esirkepov — just inv_gamma = 1/|u| and the second
    position half push, so the kernel reads no field refs and emits no
    rims. Returns (alive8, payloads, inv_gamma, n_merged)."""
    from jax.experimental.pallas import tpu as pltpu

    cap = alive8.shape[0]
    cells = alive8.shape[1:]
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

    n_arr = 2 + n_pay          # alive8, ig, payloads
    has_rims_in = rims_in is not None
    # rho is diagnostics-only (the Maxwell update consumes J alone;
    # Esirkepov guarantees charge conservation without it) — when the
    # caller recomputes rho on demand (Simulation.deposit_rho), the hot
    # path deposits 3 components and skips the rho tap dictionaries
    ncomp = 4 if with_rho else 3

    # eb_pad window refs per slab: 3D reads bx+4 single columns
    # (element-granular maps — x is an untiled dim there); 2D reads one
    # block-granular bx-row main block + one 8-row tail block (x is the
    # sublane dim in 2D: 1-row blocks are not legal TPU blocks)
    n_ebr = ((bx + 4) if ndim == 3 else 2) if (tail and not photon) \
        else 0
    # in-kernel sublane offset of the wanted neighbor column inside the
    # fetched payload block (2D fetches 8-row blocks; see cspec_lo)
    coff_lo = 7 if ndim == 2 else 0
    _rby = rows_chunk(ndim, cap, other[0] if ndim == 3 else 0)
    rows_mode = (_rby is not None) and tail and not photon
    rows_by = _rby or 0          # 0 = whole-plane bound; >0 = y-chunks
    # streamed-tap tail (see slab_stream): NS static y-strips; rows
    # mode has its own per-row restructuring and is mutually exclusive
    stream_ns = (slab_stream(ndim, cap, (nx,) + tuple(other))
                 if (tail and not photon and not rows_mode) else 1)
    if stream_ns > 1 and other[0] % stream_ns:
        stream_ns = 1
    yz_edges = (list(yz_edges) if yz_edges is not None
                else [None] * (ndim - 1))
    merge_axes = (tuple(range(ndim)) if merge_axes is None
                  else tuple(merge_axes))
    x_pass = 0 in merge_axes
    n_earr = 1 + n_pay            # y/z edge arrays per side

    def kernel(*refs):
        qm_ref, occ_ref, refs = refs[0], refs[1], refs[2:]
        mom_scr = refs[-1] if rows_mode else None
        refs = refs[:-1] if rows_mode else refs
        ebc_refs = refs[0:n_ebr]
        refs = refs[n_ebr:]
        a_ref = refs[0]
        refs = refs[1:]
        ig_ref = cl_refs = ch_refs = el_refs = eh_refs = None
        if x_pass:
            ig_ref = refs[0]
            refs = refs[1:]
        p_refs = refs[0:n_pay]
        refs = refs[n_pay:]
        if x_pass:
            cl_refs = refs[0:n_arr]
            ch_refs = refs[n_arr:2 * n_arr]
            el_refs = refs[2 * n_arr:3 * n_arr]
            eh_refs = refs[3 * n_arr:4 * n_arr]
            refs = refs[4 * n_arr:]
        yz_refs = []
        for e in yz_edges:
            if e is None:
                yz_refs.append(None)
            else:
                yz_refs.append((refs[0:n_earr],
                                refs[n_earr:2 * n_earr]))
                refs = refs[2 * n_earr:]
        rims_in_ref = refs[0] if (has_rims_in and tail) else None
        refs = refs[1:] if (has_rims_in and tail) else refs
        out_a = refs[0]
        out_p = refs[1:1 + n_pay]
        out_ig = out_rims = out_chi = out_ig0 = None
        if tail and photon:
            out_ig = refs[1 + n_pay]
            out_m = refs[2 + n_pay]
        elif tail:
            out_ig = refs[1 + n_pay]
            out_rims = refs[2 + n_pay]
            out_m = refs[3 + n_pay]
            out_chi = refs[4 + n_pay] if want_chi else None
            out_ig0 = refs[5 + n_pay] if want_chi else None
        else:
            out_m = refs[1 + n_pay]
        i = pl.program_id(0)
        is_first = i == 0
        is_last = i == nbx - 1

        strip_shape = (1, 1) + tuple(other)
        cdt2 = [jnp.asarray(cc / 2, dtype) for cc in cdt]
        nx_f = jnp.asarray(nx, dtype)

        def main_rows(ref):
            return [ref[a:a + 1] for a in range(cap)]

        def push_rows(al, igr, pay):
            """First position half push (push_position_*, in place on
            the coord entries of ``pay``)."""
            for a in range(cap):
                for k in range(ndim):
                    pay[ci[k]][a] = (pay[ci[k]][a]
                                     + pay[ui[k]][a] * igr[a] * cdt2[k])
            return pay

        def strip_side(col_refs, edge_refs, sel_edge, cell_idx, adj,
                       co):
            """Selected + pushed + coord-adjusted strip rows for one x
            side; returns (key_rows, payload_row_lists). ``co`` = the
            sublane offset of the neighbor column inside the fetched
            block (0 in 3D; 7/0 for the 2D lo/hi 8-row blocks)."""
            al, igr, pays = [], [], [[] for _ in range(n_pay)]
            for a in range(cap):
                # edge alive rides in as int32 (a u8 (cap,1,ny,nz) edge
                # array costs a measured ~4 ms/step (4,1)-packed layout
                # copy on its way into the kernel); columns stay u8
                al.append(jnp.where(
                    sel_edge, edge_refs[0][a:a + 1, 0:1],
                    col_refs[0][a:a + 1, co:co + 1].astype(jnp.int32))
                    .reshape(strip_shape) != 0)
                igr.append(jnp.where(
                    sel_edge, edge_refs[1][a:a + 1, 0:1],
                    col_refs[1][a:a + 1, co:co + 1]).reshape(strip_shape))
                for p in range(n_pay):
                    pays[p].append(jnp.where(
                        sel_edge, edge_refs[2 + p][a:a + 1, 0:1],
                        col_refs[2 + p][a:a + 1, co:co + 1]).reshape(
                            strip_shape))
            pays = push_rows(al, igr, pays)
            keys = []
            adj_v = jnp.where(sel_edge, jnp.asarray(adj, dtype) * nx_f,
                              jnp.asarray(0, dtype))
            for a in range(cap):
                pays[ci[0]][a] = pays[ci[0]][a] + adj_v
                local = pays[ci[0]][a] - jnp.asarray(cell_idx, dtype)
                out_hi = al[a] & (local >= 0.5)
                out_lo = al[a] & (local < -0.5)
                dead = 1 if (a % 2 == 0) else 3
                keys.append(jnp.where(
                    out_hi, 0, jnp.where(out_lo, 4,
                                         jnp.where(al[a], 2, dead))
                ).astype(jnp.int32))
            return keys, pays

        def compute():
            # ------------- read + half push + x keys -------------------
            alive_rows = [a_ref[a:a + 1].astype(jnp.int32) != 0
                          for a in range(cap)]
            pays = [main_rows(r) for r in p_refs]
            keys = []
            if x_pass:
                ig_rows = main_rows(ig_ref)
                pays = push_rows(alive_rows, ig_rows, pays)
                for a in range(cap):
                    pr = pays[ci[0]][a]
                    iota_x = (lax.broadcasted_iota(jnp.int32, pr.shape,
                                                   1)
                              + i * bx).astype(dtype)
                    local = pr - iota_x
                    out_hi = alive_rows[a] & (local >= 0.5)
                    out_lo = alive_rows[a] & (local < -0.5)
                    dead = 1 if (a % 2 == 0) else 3
                    keys.append(jnp.where(
                        out_hi, 0, jnp.where(out_lo, 4,
                                             jnp.where(alive_rows[a], 2,
                                                       dead))
                    ).astype(jnp.int32))

            def edge_strip(side_refs, cell_idx, ax):
                """Strip rows + 5-way keys for a cross-device y/z edge
                (coords pre-adjusted by the caller; keys relative to the
                virtual cell just outside the block along cell axis
                ``ax``)."""
                al_l = [side_refs[0][a:a + 1] != 0 for a in range(cap)]
                pv = [[side_refs[1 + p][a:a + 1] for a in range(cap)]
                      for p in range(n_pay)]
                ks = []
                for a in range(cap):
                    local = pv[ci[ax]][a] - jnp.asarray(cell_idx,
                                                        dtype)
                    out_hi = al_l[a] & (local >= 0.5)
                    out_lo = al_l[a] & (local < -0.5)
                    dead = 1 if (a % 2 == 0) else 3
                    ks.append(jnp.where(
                        out_hi, 0,
                        jnp.where(out_lo, 4,
                                  jnp.where(al_l[a], 2, dead))
                    ).astype(jnp.int32))
                return ks, pv

            # ------------- x pass (columns from neighbors) -------------
            abl = _ablate()

            def write_state(al_rows, py, nm, pack=True):
                """Sanitize + write the post-migration state to the
                output refs. ids/weights are final here; positions,
                momenta and inv_gamma are pre-gather values that
                particle_tail overwrites for active blocks (the refs
                double as the hand-off buffer between the branched merge
                phase and the tail — Mosaic legalizes side-effecting
                scf.if regions only, not value-returning ones)."""
                if rows_mode:
                    if pack:
                        # slot-occupancy packing: one more Batcher pass
                        # keyed alive-first restores the front-packed
                        # invariant the row-gated tail exploits (pure
                        # within-cell slot permutation — physics-
                        # identical). Skipped on the frozen-merge path:
                        # no movement preserves the previous packing.
                        pkeys = [jnp.where(al_rows[a], 0,
                                           1).astype(jnp.int32)
                                 for a in range(cap)]
                        pk, py = _sort_rows(ces, pkeys, py)
                        al_rows = [k == 0 for k in pk]
                    # momenta-any flag for the tail's frozen check (the
                    # row tail never loads full momentum blocks; the
                    # merge rows are already in registers here)
                    mv_ = None
                    for u in ui:
                        for a in range(cap):
                            m_ = al_rows[a] & (py[u][a] != 0)
                            mv_ = m_ if mv_ is None else mv_ | m_
                    mom_scr[0] = jnp.any(mv_).astype(jnp.int32)
                alive_c = jnp.concatenate(al_rows, axis=0)
                out_a[...] = alive_c.astype(jnp.uint8)
                for p in range(n_pay):
                    b = jnp.concatenate(py[p], axis=0)
                    if p in sanitize:
                        b = jnp.where(alive_c, b, jnp.zeros_like(b))
                    out_p[p][...] = b
                prev = jnp.where(is_first, 0, out_m[...])
                out_m[...] = prev + nm

            if "merge" not in abl:
                if x_pass:
                    skl, spl = strip_side(cl_refs, el_refs, is_first,
                                          i * bx - 1, -1, coff_lo)
                    skh, sph = strip_side(ch_refs, eh_refs, is_last,
                                          (i + 1) * bx, +1, 0)
                # cross-device y/z edge strips, hoisted for reuse by the
                # skip check and the merge itself
                yz_strips = []
                for ax in range(1, ndim):
                    if yz_refs[ax - 1] is None or ax not in merge_axes:
                        yz_strips.append(None)
                        continue
                    lo_r, hi_r = yz_refs[ax - 1]
                    klo_e, plo_e = edge_strip(lo_r, -1, ax)
                    khi_e, phi_e = edge_strip(hi_r, other[ax - 1], ax)
                    yz_strips.append((klo_e, plo_e, khi_e, phi_e))

                def run_merge():
                    if x_pass:
                        al, py, nm = _merge_axis(
                            ces, 1, keys, pays, skl, spl, skh, sph,
                            merge_idx, jnp.zeros((), jnp.int32))
                    else:
                        al = list(alive_rows)
                        py = [list(r) for r in pays]
                        nm = jnp.zeros((), jnp.int32)
                    # ------ y (and z) passes: in-block wrap, or cross-
                    # device edge strips when the mesh splits the axis --
                    for ax in range(1, ndim):
                        if ax not in merge_axes:
                            continue
                        axis = 1 + ax
                        kk = _keys_from_pos(py[ci[ax]], al, axis)
                        if yz_refs[ax - 1] is not None:
                            klo, plo, khi, phi = yz_strips[ax - 1]
                        else:
                            klo, khi = _wrap_cols(
                                kk, axis, invalid=not periodic[ax - 1])
                            plo, phi = [], []
                            for p in range(n_pay):
                                adj = other[ax - 1] if p == ci[ax] \
                                    else None
                                lo, hi = _wrap_cols(py[p], axis,
                                                    coord_adj=adj)
                                plo.append(lo)
                                phi.append(hi)
                        al, py, nm = _merge_axis(
                            ces, axis, kk, py, klo, plo, khi, phi,
                            merge_idx, nm)
                    return al, py, nm

                if not _skips_enabled():
                    write_state(*run_merge())
                else:
                    # Frozen-merge skip: when no alive particle crosses a
                    # cell face on ANY axis and neither x strip delivers
                    # an arrival, all three passes reduce to the identity
                    # (sorted-rows fixed point; physics-identical slot
                    # permutation otherwise). Cold species — protons for
                    # most of a laser-solid run, electrons ahead of the
                    # wavefront — skip the whole merge phase. The
                    # reference's mismatch-only sort (CHANGELOG.md:28,
                    # sort/particle_sort.py) exploits the same inactivity
                    # dynamically.
                    # movers along THIS dispatch's axes + strip arrivals
                    mv = None
                    if x_pass:
                        for a in range(cap):
                            m_ = (keys[a] == 0) | (keys[a] == 4)
                            mv = m_ if mv is None else mv | m_
                    for ax in range(1, ndim):
                        if ax not in merge_axes:
                            continue
                        axis = 1 + ax
                        for a in range(cap):
                            pr = pays[ci[ax]][a]
                            idx = lax.broadcasted_iota(
                                jnp.int32, pr.shape,
                                axis).astype(pr.dtype)
                            local = pr - idx
                            m_ = alive_rows[a] & ((local >= 0.5)
                                                  | (local < -0.5))
                            mv = m_ if mv is None else mv | m_
                    arr = None
                    if x_pass:
                        for a in range(cap):
                            s = (skl[a] == 0) | (skh[a] == 4)
                            arr = s if arr is None else arr | s
                    for st in yz_strips:
                        if st is None:
                            continue
                        klo_e, _, khi_e, _ = st
                        for a in range(cap):
                            s = (klo_e[a] == 0) | (khi_e[a] == 4)
                            arr = s if arr is None else arr | s
                    any_mv = jnp.any(mv)
                    if arr is not None:
                        any_mv = any_mv | jnp.any(arr)

                    pl.when(any_mv)(lambda: write_state(*run_merge()))
                    pl.when(jnp.logical_not(any_mv))(
                        lambda: write_state(alive_rows, pays,
                                            jnp.zeros((), jnp.int32),
                                            pack=False))
            else:
                write_state(alive_rows, pays, jnp.zeros((), jnp.int32))

            if not tail:
                return      # dispatch A of the multi-dispatch split path

            if photon:
                # field-free photon tail: inv_gamma = 1/|u| (reference
                # PhotonPusher, core/pusher/photon.py:5-11; dead slots
                # get 1) + the second position half push. No gather, no
                # Boris, no deposit.
                ux0 = out_p[ui[0]][...]
                uy0 = out_p[ui[1]][...]
                uz0 = out_p[ui[2]][...]
                u2 = ux0 * ux0 + uy0 * uy0 + uz0 * uz0
                ig2 = jnp.where(
                    u2 > 0,
                    1.0 / jnp.sqrt(jnp.maximum(
                        u2, jnp.asarray(1e-30, dtype))),
                    jnp.ones_like(u2))
                up = (ux0, uy0, uz0)
                for k in range(ndim):
                    out_p[ci[k]][...] = (
                        out_p[ci[k]][...]
                        + up[k] * ig2 * jnp.asarray(cdt[k] / 2, dtype))
                out_ig[...] = ig2
                return

            # ---- re-read the post-migration state from the output refs
            # (written by exactly one branch above); keeps the merge
            # phase's values out of the tail's live set. Row mode loads
            # slot rows on demand inside the fori_loop instead.
            shp = (cap, bx) + tuple(other)
            q = qm_ref[0]
            m = qm_ref[1]
            frozen_pre = _skips_enabled() and not abl and not with_rho
            if not rows_mode and stream_ns == 1:
                blocks = [out_p[p][...] for p in range(n_pay)]
                pos = [blocks[c] for c in ci]
                ux0, uy0, uz0 = (blocks[u] for u in ui)
                w = blocks[wi] if wi >= 0 else jnp.ones(shp, dtype)
                iota = [
                    (lax.broadcasted_iota(jnp.int32, shp, 1)
                     + i * bx).astype(dtype)
                ] + [lax.broadcasted_iota(jnp.int32, shp,
                                          2 + k).astype(dtype)
                     for k in range(ndim - 1)]
                dl = [pos[k] - iota[k] for k in range(ndim)]
            elif not rows_mode and frozen_pre:
                # streamed tail: strips load their own rows; only the
                # frozen-skip momenta check needs whole-block reads
                # (they die before the first strip's taps go live)
                ux0, uy0, uz0 = (out_p[u][...] for u in ui)

            # ------------- gather + Boris + half push ------------------
            # field window (6, bx+4, ...) assembled from the direct
            # eb_pad refs (no pre-stacked ebwin array in HBM): 3D from
            # bx+4 single columns, 2D from the bx-row main block + the
            # first 4 rows of the 8-row tail block
            if "gather" in abl:
                ebw = None
            elif ndim == 3:
                ebw = jnp.concatenate([r[...] for r in ebc_refs], axis=1)
            else:
                ebw = jnp.concatenate(
                    [ebc_refs[0][...], ebc_refs[1][:, 0:4]], axis=1)

            def rims_seed():
                out_rims[...] = (rims_in_ref[...] if has_rims_in
                                 else jnp.zeros(out_rims.shape, dtype))

            def particle_tail(y0=0, cy=None, seed=True):
                # cy=None: whole-block tail on the preloaded arrays.
                # cy=int (streamed-tap, 3D only): operate on the y-strip
                # [y0, y0+cy) — strips read their own payload rows so
                # the tap live set scales ~1/stream_ns (slab_stream).
                if cy is None:
                    t_shp, t_pos, t_w, t_dl, ylen = shp, pos, w, dl, \
                        other[0]
                    t_u = (ux0, uy0, uz0)
                    t_iota = iota
                else:
                    ylen = cy
                    t_shp = (cap, bx, cy) + tuple(other[1:])
                    t_pos = [out_p[c][:, :, y0:y0 + cy] for c in ci]
                    t_u = tuple(out_p[u][:, :, y0:y0 + cy] for u in ui)
                    t_w = (out_p[wi][:, :, y0:y0 + cy] if wi >= 0
                           else jnp.ones(t_shp, dtype))
                    t_iota = [
                        (lax.broadcasted_iota(jnp.int32, t_shp, 1)
                         + i * bx).astype(dtype),
                        (lax.broadcasted_iota(jnp.int32, t_shp, 2)
                         + y0).astype(dtype),
                        lax.broadcasted_iota(jnp.int32, t_shp,
                                             3).astype(dtype)]
                    t_dl = [t_pos[k] - t_iota[k] for k in range(ndim)]

                def wr(ref, val):
                    if cy is None:
                        ref[...] = val
                    else:
                        ref[:, :, y0:y0 + cy] = val

                if ebw is None:
                    eb = [jnp.zeros(t_shp, dtype) for _ in range(6)]
                else:
                    taps = [{"g": {o: _m2(o - d) for o in _GOFF},
                             "h": {o: _m2(o + 0.5 - d) for o in _HOFF}}
                            for d in t_dl]
                    comps = _COMPS2 if ndim == 2 else _COMPS3
                    eb = []
                    for comp, *stag in comps:
                        acc = jnp.zeros(t_shp, dtype)
                        if ndim == 2:
                            for oy, ty in taps[1][stag[1]].items():
                                for ox, tx in taps[0][stag[0]].items():
                                    f = ebw[comp, g + ox:g + ox + bx,
                                            g + oy:g + oy + other[0]]
                                    acc = acc + tx * ty * f[None]
                        else:
                            for oy, ty in taps[1][stag[1]].items():
                                for oz, tz in taps[2][stag[2]].items():
                                    tyz = ty * tz
                                    for ox, tx in \
                                            taps[0][stag[0]].items():
                                        f = ebw[comp,
                                                g + ox:g + ox + bx,
                                                g + oy + y0:
                                                g + oy + y0 + ylen,
                                                g + oz:g + oz + other[1]]
                                        acc = acc + tx * tyz * f[None]
                        eb.append(acc)

                tux, tuy, tuz = t_u
                if want_chi:
                    # quantum parameter at the reference's _qed stage
                    # point (inline.py:5-13): post-migration pre-push
                    # momenta + gathered fields at the mid-step position
                    ig0 = jax.lax.rsqrt(
                        1.0 + tux * tux + tuy * tuy + tuz * tuz)
                    gam0 = 1.0 / ig0
                    exp_, eyp_, ezp_, bxp_, byp_, bzp_ = eb
                    cc = jnp.asarray(c_light, dtype)
                    val = ((gam0 * exp_ + (tuy * bzp_ - tuz * byp_) * cc)**2
                           + (gam0 * eyp_ + (tuz * bxp_ - tux * bzp_) * cc)**2
                           + (gam0 * ezp_ + (tux * byp_ - tuy * bxp_) * cc)**2
                           - (tux * exp_ + tuy * eyp_ + tuz * ezp_)**2)
                    wr(out_chi, jnp.asarray(_CHI_FACTOR, dtype)
                       * jnp.sqrt(jnp.maximum(val, 0.0)))
                    wr(out_ig0, ig0)

                ux4, uy4, uz4, ig2 = _boris(tux, tuy, tuz, *eb, q, m,
                                            dt, dtype)
                u4 = (ux4, uy4, uz4)
                posn = [t_pos[k] + (0.5 * cdt[k]) * u4[k] * ig2
                        for k in range(ndim)]
                for k in range(ndim):
                    wr(out_p[ci[k]], posn[k])
                for k in range(3):
                    wr(out_p[ui[k]], u4[k])
                wr(out_ig, ig2)

                # --------- Esirkepov deposit ----------------------------
                # seed the accumulator with the previous species' rims
                # when chaining (saves the XLA rims_total add across
                # species); the streamed tail seeds once before strip 0
                if seed:
                    rims_seed()
                v = [u4[k] * ig2 * cdt[k] for k in range(ndim)]
                dln = [posn[k] - t_iota[k] for k in range(ndim)]

                if "deposit" in abl:
                    pass
                elif ndim == 2:
                    f_cd = jnp.asarray(q / vol, dtype) * t_w
                    f_dx = jnp.asarray(q / (deltas[1] * dt), dtype) * t_w
                    f_dy = jnp.asarray(q / (deltas[0] * dt), dtype) * t_w
                    vz_c = uz4 * ig2 * jnp.asarray(c_light, dtype)
                    cvz = f_cd * vz_c
                    # Support pruning, same exact identities as the 3D
                    # branch below: s0*[+-2] == 0 (post-migration position
                    # within +-0.5 of the cell) and the last prefix sum
                    # run*[+2] is analytically zero (sum(ds) = 0), so the
                    # ox/oy = +2 writes of jx/jy carry only fp residue.
                    S0F = _DOFF[1:-1]
                    RUNF = _DOFF[:-1]
                    s0x = {o: _m2(o - (dln[0] - 0.5 * v[0])) for o in S0F}
                    s1x = {o: _m2(o - (dln[0] + 0.5 * v[0])) for o in _DOFF}
                    s0y = {o: _m2(o - (dln[1] - 0.5 * v[1])) for o in S0F}
                    s1y = {o: _m2(o - (dln[1] + 0.5 * v[1])) for o in _DOFF}
                    dsx_d = {o: (s1x[o] - s0x[o] if o in s0x else s1x[o])
                             for o in _DOFF}
                    dsy_d = {o: (s1y[o] - s0y[o] if o in s0y else s1y[o])
                             for o in _DOFF}
                    fx_run = {}
                    acc = None
                    for o in RUNF:
                        acc = dsx_d[o] if acc is None else acc + dsx_d[o]
                        fx_run[o] = -f_dx * acc
                    gy_run = {}
                    acc = None
                    for o in RUNF:
                        acc = dsy_d[o] if acc is None else acc + dsy_d[o]
                        gy_run[o] = -f_dy * acc
                    ny = other[0]

                    def rmw2(comp, ox, oy, val):
                        cur = out_rims[comp, 0, 2 + ox:2 + ox + bx,
                                       g + oy:g + oy + ny]
                        out_rims[comp, 0, 2 + ox:2 + ox + bx,
                                 g + oy:g + oy + ny] = cur + val

                    for ox in _DOFF:
                        dsx = dsx_d[ox]
                        ax_ = s0x[ox] + 0.5 * dsx if ox in s0x else 0.5 * dsx
                        for oy in _DOFF:
                            dsy = dsy_d[oy]
                            by_t = (s0y[oy] + 0.5 * dsy if oy in s0y
                                    else 0.5 * dsy)
                            if ox in RUNF:
                                rmw2(0, ox, oy, (fx_run[ox] * by_t).sum(0))
                            if oy in RUNF:
                                rmw2(1, ox, oy, (ax_ * gy_run[oy]).sum(0))
                            rmw2(2, ox, oy,
                                 (cvz * (ax_ * by_t
                                         + dsx * dsy * (1.0 / 12.0))).sum(0))
                            if with_rho:
                                rmw2(3, ox, oy,
                                     (f_cd * s1x[ox] * s1y[oy]).sum(0))
                else:
                    f_cd = jnp.asarray(q / vol, dtype) * t_w
                    fd = [jnp.asarray(q / (vol / deltas[k]) / dt, dtype)
                          * t_w for k in range(3)]

                    # Support pruning (exact identities, value-preserving):
                    # (1) the S0 endpoint sits within +-0.5 of its cell
                    #     (migration just re-binned to the half-push
                    #     position), so s0*[+-2] == 0 exactly — terms
                    #     multiplied by them are dropped;
                    # (2) Esirkepov telescoping: sum(ds) = sum(S1) - sum(S0)
                    #     = 0, so the last prefix sum run*[+2] is
                    #     analytically zero and the ox/oy/oz = +2 current
                    #     writes of the respective component carry only the
                    #     fp summation residue (~1e-16 f64 / ~1e-7 f32,
                    #     below the 1e-6 charge-conservation target;
                    #     reference current_deposit.h:112-116 makes the same
                    #     |dcell|<=1 support assumption).
                    # Components therefore loop their own offset sets and
                    # write out_rims per component.
                    S0F = _DOFF[1:-1]                      # s0 support
                    RUNF = _DOFF[:-1]                      # run support
                    s0x = {o: _m2(o - (dln[0] - 0.5 * v[0])) for o in S0F}
                    s1x = {o: _m2(o - (dln[0] + 0.5 * v[0])) for o in _DOFF}
                    dsx = {o: (s1x[o] - s0x[o] if o in s0x else s1x[o])
                           for o in _DOFF}
                    ax_ = {o: (s0x[o] + 0.5 * dsx[o] if o in s0x
                               else 0.5 * dsx[o]) for o in _DOFF}
                    cx_ = {o: (0.5 * s0x[o] + dsx[o] * (1.0 / 3.0)
                               if o in s0x else dsx[o] * (1.0 / 3.0))
                           for o in _DOFF}
                    runx = {}
                    acc = None
                    for o in RUNF:
                        acc = dsx[o] if acc is None else acc + dsx[o]
                        runx[o] = acc
                    del s0x, dsx, acc

                    dy_, vy_ = dln[1], v[1]
                    dz_, vz_ = dln[2], v[2]
                    ny, nz = ylen, other[1]

                    # z-tap dictionaries: hoisting them out of the oy loop
                    # saves ~16% of the deposit-phase VPU ops but keeps ~18
                    # block-size arrays live through the whole offset nest —
                    # at bx > 2 that liveness turns into register-allocator
                    # spill slots that blow the 128 MB VMEM budget (measured:
                    # 55 MB of spills at bx=4). The wider-slab configs
                    # therefore rebuild them per oy (same expressions and
                    # accumulation order — bitwise identical values).
                    def build_z():
                        zt = {}
                        acc_z = None
                        for oz in _DOFF:
                            s0z_h = (_m2(oz - (dz_ - 0.5 * vz_))
                                     if oz in S0F else None)
                            s1z_h = _m2(oz - (dz_ + 0.5 * vz_))
                            dsz_h = (s1z_h - s0z_h if s0z_h is not None
                                     else s1z_h)
                            runz_h = None
                            if oz in RUNF:
                                acc_z = (dsz_h if acc_z is None
                                         else acc_z + dsz_h)
                                runz_h = acc_z
                            zt[oz] = (s0z_h, s1z_h, dsz_h, runz_h)
                        return zt

                    z_hoist = _env_int("LAMBDAPIC_SLAB_ZHOIST", 1 if bx <= 2
                                       else 0)
                    z_taps = build_z() if z_hoist else None
                    acc_y = None
                    for oy in _DOFF:
                        s0y = _m2(oy - (dy_ - 0.5 * vy_)) if oy in S0F \
                            else None
                        s1y = _m2(oy - (dy_ + 0.5 * vy_))
                        dsy = s1y - s0y if s0y is not None else s1y
                        ay_ = s0y + 0.5 * dsy if s0y is not None \
                            else 0.5 * dsy
                        cy_ = (0.5 * s0y + dsy * (1.0 / 3.0)
                               if s0y is not None else dsy * (1.0 / 3.0))
                        runy = None
                        if oy in RUNF:
                            acc_y = dsy if acc_y is None else acc_y + dsy
                            runy = acc_y
                        zt = z_taps if z_hoist else build_z()
                        for oz in _DOFF:
                            s0z, s1z, dsz, runz = zt[oz]
                            pyz_jx = (-(ay_ * s0z + cy_ * dsz) * fd[0]
                                      if s0z is not None
                                      else -(cy_ * dsz) * fd[0])
                            pyz_jy = (-(runy * s0z) * fd[1]
                                      if runy is not None and s0z is not None
                                      else None)
                            pyz_jy2 = (-(runy * dsz) * fd[1]
                                       if runy is not None else None)
                            pyz_jz = (-(runz * s0y) * fd[2]
                                      if runz is not None and s0y is not None
                                      else None)
                            pyz_jz2 = (-(runz * dsy) * fd[2]
                                       if runz is not None else None)
                            pyz_r = (s1y * s1z) * f_cd if with_rho else None

                            def rmw(comp, ox, val):
                                cur = out_rims[comp, 0, 2 + ox:2 + ox + bx,
                                               g + oy + y0:
                                               g + oy + y0 + ny,
                                               g + oz:g + oz + nz]
                                out_rims[comp, 0, 2 + ox:2 + ox + bx,
                                         g + oy + y0:g + oy + y0 + ny,
                                         g + oz:g + oz + nz] = cur + val

                            for ox in RUNF:
                                rmw(0, ox, (runx[ox] * pyz_jx).sum(0))
                            if pyz_jy2 is not None:
                                for ox in _DOFF:
                                    jy_c = (ax_[ox] * pyz_jy
                                            + cx_[ox] * pyz_jy2
                                            if pyz_jy is not None
                                            else cx_[ox] * pyz_jy2)
                                    rmw(1, ox, jy_c.sum(0))
                            if pyz_jz2 is not None:
                                for ox in _DOFF:
                                    jz_c = (ax_[ox] * pyz_jz
                                            + cx_[ox] * pyz_jz2
                                            if pyz_jz is not None
                                            else cx_[ox] * pyz_jz2)
                                    rmw(2, ox, jz_c.sum(0))
                            if with_rho:
                                for ox in _DOFF:
                                    rmw(3, ox, (s1x[ox] * pyz_r).sum(0))

            def particle_tail_rows():
                """Row-gated tail (rows_mode): gather + Boris + half
                push + deposit as a fori_loop over slot rows, bounded by
                the last alive slot index. With the merge's
                front-packing, rows beyond the densest cell's occupancy
                are never touched — at the 3D bench's ppc 2 / cap 4 that
                halves the tail's VPU ops and payload I/O outside the
                compressed sheath. Same closed forms as particle_tail,
                on (1, bx, ...) rows; identical accumulation order per
                row, so values match the cap-wide tail bitwise.

                With rows_by > 0 (3D): the tail runs once per BY-row
                y-chunk with a PER-CHUNK bound (static y offsets — the
                chunk loop is a Python loop, so Mosaic sees only
                aligned static sublane slices). Laser-solid compression
                is spot-localized in y: chunks away from the spot keep
                the quiet-plasma occupancy bound, and empty chunks run
                zero rows (the fori trip count is 0)."""
                out_ig[...] = jnp.ones(out_ig.shape, out_ig.dtype)
                if want_chi:
                    out_chi[...] = jnp.zeros(out_chi.shape, dtype)
                    out_ig0[...] = jnp.ones(out_ig0.shape, dtype)
                rims_seed()
                av = out_a[...].astype(jnp.int32)
                occ_idx = av * (lax.broadcasted_iota(
                    jnp.int32, av.shape, 0) + 1)

                def run_rows(y0, yext):
                    if ndim == 3 and yext != other[0]:
                        nrows = jnp.max(occ_idx[:, :, y0:y0 + yext])
                        oth = (yext,) + tuple(other[1:])
                        trail = (slice(None), slice(y0, y0 + yext),
                                 slice(None))
                    else:
                        nrows = jnp.max(occ_idx)
                        oth = tuple(other)
                        # block dims = (cap, bx, *other): dslice on cap
                        # + ndim full trailing slices
                        trail = (slice(None),) * ndim
                    shp_r = (1, bx) + oth
                    iota_r = [
                        (lax.broadcasted_iota(jnp.int32, shp_r, 1)
                         + i * bx).astype(dtype)
                    ] + [(lax.broadcasted_iota(jnp.int32, shp_r,
                                               2 + k)
                          + (y0 if k == 0 else 0)).astype(dtype)
                         for k in range(ndim - 1)]
                    row_body = make_row_body(y0, yext, oth, shp_r,
                                             iota_r, trail)
                    lax.fori_loop(0, nrows, row_body, jnp.int32(0))

                def make_row_body(y0, yext, oth, shp_r, iota_r, trail):
                  def row_body(a, carry):
                    ridx = (pl.dslice(a, 1),) + trail
                    posr = [out_p[c][ridx] for c in ci]
                    ux0r = out_p[ui[0]][ridx]
                    uy0r = out_p[ui[1]][ridx]
                    uz0r = out_p[ui[2]][ridx]
                    wr = (out_p[wi][ridx] if wi >= 0
                          else jnp.ones(shp_r, dtype))
                    dlr = [posr[k] - iota_r[k] for k in range(ndim)]
                    taps = [{"g": {o: _m2(o - d) for o in _GOFF},
                             "h": {o: _m2(o + 0.5 - d) for o in _HOFF}}
                            for d in dlr]
                    comps = _COMPS2 if ndim == 2 else _COMPS3
                    eb = []
                    for comp, *stag in comps:
                        acc = jnp.zeros(shp_r, dtype)
                        if ndim == 2:
                            for oy, ty in taps[1][stag[1]].items():
                                for ox, tx in taps[0][stag[0]].items():
                                    f = ebw[comp, g + ox:g + ox + bx,
                                            g + oy:g + oy + other[0]]
                                    acc = acc + tx * ty * f[None]
                        else:
                            for oy, ty in taps[1][stag[1]].items():
                                for oz, tz in taps[2][stag[2]].items():
                                    tyz = ty * tz
                                    for ox, tx in \
                                            taps[0][stag[0]].items():
                                        f = ebw[comp,
                                                g + ox:g + ox + bx,
                                                y0 + g + oy:
                                                y0 + g + oy + yext,
                                                g + oz:g + oz + other[1]]
                                        acc = acc + tx * tyz * f[None]
                        eb.append(acc)

                    if want_chi:
                        ig0r = jax.lax.rsqrt(
                            1.0 + ux0r * ux0r + uy0r * uy0r
                            + uz0r * uz0r)
                        gam0 = 1.0 / ig0r
                        exp_, eyp_, ezp_, bxp_, byp_, bzp_ = eb
                        cc_ = jnp.asarray(c_light, dtype)
                        val = ((gam0 * exp_
                                + (uy0r * bzp_ - uz0r * byp_) * cc_)**2
                               + (gam0 * eyp_
                                  + (uz0r * bxp_ - ux0r * bzp_) * cc_)**2
                               + (gam0 * ezp_
                                  + (ux0r * byp_ - uy0r * bxp_) * cc_)**2
                               - (ux0r * exp_ + uy0r * eyp_
                                  + uz0r * ezp_)**2)
                        out_chi[ridx] = (
                            jnp.asarray(_CHI_FACTOR, dtype)
                            * jnp.sqrt(jnp.maximum(val, 0.0)))
                        out_ig0[ridx] = ig0r

                    ux4, uy4, uz4, ig2 = _boris(ux0r, uy0r, uz0r, *eb,
                                                q, m, dt, dtype)
                    u4 = (ux4, uy4, uz4)
                    posn = [posr[k] + (0.5 * cdt[k]) * u4[k] * ig2
                            for k in range(ndim)]
                    for k in range(ndim):
                        out_p[ci[k]][ridx] = posn[k]
                    for k in range(3):
                        out_p[ui[k]][ridx] = u4[k]
                    out_ig[ridx] = ig2

                    # --------- Esirkepov deposit (row) ------------------
                    v = [u4[k] * ig2 * cdt[k] for k in range(ndim)]
                    dln = [posn[k] - iota_r[k] for k in range(ndim)]
                    S0F = _DOFF[1:-1]
                    RUNF = _DOFF[:-1]
                    if "deposit" in abl:
                        return carry
                    if ndim == 2:
                        f_cd = jnp.asarray(q / vol, dtype) * wr
                        f_dx = jnp.asarray(q / (deltas[1] * dt),
                                           dtype) * wr
                        f_dy = jnp.asarray(q / (deltas[0] * dt),
                                           dtype) * wr
                        vz_c = uz4 * ig2 * jnp.asarray(c_light, dtype)
                        cvz = f_cd * vz_c
                        s0x = {o: _m2(o - (dln[0] - 0.5 * v[0]))
                               for o in S0F}
                        s1x = {o: _m2(o - (dln[0] + 0.5 * v[0]))
                               for o in _DOFF}
                        s0y = {o: _m2(o - (dln[1] - 0.5 * v[1]))
                               for o in S0F}
                        s1y = {o: _m2(o - (dln[1] + 0.5 * v[1]))
                               for o in _DOFF}
                        dsx_d = {o: (s1x[o] - s0x[o] if o in s0x
                                     else s1x[o]) for o in _DOFF}
                        dsy_d = {o: (s1y[o] - s0y[o] if o in s0y
                                     else s1y[o]) for o in _DOFF}
                        fx_run = {}
                        acc = None
                        for o in RUNF:
                            acc = dsx_d[o] if acc is None \
                                else acc + dsx_d[o]
                            fx_run[o] = -f_dx * acc
                        gy_run = {}
                        acc = None
                        for o in RUNF:
                            acc = dsy_d[o] if acc is None \
                                else acc + dsy_d[o]
                            gy_run[o] = -f_dy * acc
                        ny = other[0]

                        def rmw2(comp, ox, oy, val):
                            cur = out_rims[comp, 0, 2 + ox:2 + ox + bx,
                                           g + oy:g + oy + ny]
                            out_rims[comp, 0, 2 + ox:2 + ox + bx,
                                     g + oy:g + oy + ny] = cur + val

                        for ox in _DOFF:
                            dsx = dsx_d[ox]
                            ax_ = (s0x[ox] + 0.5 * dsx if ox in s0x
                                   else 0.5 * dsx)
                            for oy in _DOFF:
                                dsy = dsy_d[oy]
                                by_t = (s0y[oy] + 0.5 * dsy if oy in s0y
                                        else 0.5 * dsy)
                                if ox in RUNF:
                                    rmw2(0, ox, oy,
                                         (fx_run[ox] * by_t)[0])
                                if oy in RUNF:
                                    rmw2(1, ox, oy,
                                         (ax_ * gy_run[oy])[0])
                                rmw2(2, ox, oy,
                                     (cvz * (ax_ * by_t
                                             + dsx * dsy
                                             * (1.0 / 12.0)))[0])
                                if with_rho:
                                    rmw2(3, ox, oy,
                                         (f_cd * s1x[ox] * s1y[oy])[0])
                        return carry

                    f_cd = jnp.asarray(q / vol, dtype) * wr
                    fd = [jnp.asarray(q / (vol / deltas[k]) / dt,
                                      dtype) * wr for k in range(3)]
                    s0x = {o: _m2(o - (dln[0] - 0.5 * v[0])) for o in S0F}
                    s1x = {o: _m2(o - (dln[0] + 0.5 * v[0]))
                           for o in _DOFF}
                    dsx = {o: (s1x[o] - s0x[o] if o in s0x else s1x[o])
                           for o in _DOFF}
                    ax_ = {o: (s0x[o] + 0.5 * dsx[o] if o in s0x
                               else 0.5 * dsx[o]) for o in _DOFF}
                    cx_ = {o: (0.5 * s0x[o] + dsx[o] * (1.0 / 3.0)
                               if o in s0x else dsx[o] * (1.0 / 3.0))
                           for o in _DOFF}
                    runx = {}
                    acc = None
                    for o in RUNF:
                        acc = dsx[o] if acc is None else acc + dsx[o]
                        runx[o] = acc
                    del s0x, dsx, acc

                    dy_, vy_ = dln[1], v[1]
                    dz_, vz_ = dln[2], v[2]
                    nz = other[1]

                    def build_z():
                        zt = {}
                        acc_z = None
                        for oz in _DOFF:
                            s0z_h = (_m2(oz - (dz_ - 0.5 * vz_))
                                     if oz in S0F else None)
                            s1z_h = _m2(oz - (dz_ + 0.5 * vz_))
                            dsz_h = (s1z_h - s0z_h if s0z_h is not None
                                     else s1z_h)
                            runz_h = None
                            if oz in RUNF:
                                acc_z = (dsz_h if acc_z is None
                                         else acc_z + dsz_h)
                                runz_h = acc_z
                            zt[oz] = (s0z_h, s1z_h, dsz_h, runz_h)
                        return zt

                    # same z-hoist policy as the cap-wide tail: at
                    # bx > 2 the hoisted dictionaries' liveness across
                    # the whole offset nest costs more VMEM than the
                    # recompute costs VPU ops
                    z_hoist_r = _env_int("LAMBDAPIC_SLAB_ZHOIST",
                                         1 if bx <= 2 else 0)
                    z_taps = build_z() if z_hoist_r else None
                    acc_y = None
                    for oy in _DOFF:
                        s0y = _m2(oy - (dy_ - 0.5 * vy_)) if oy in S0F \
                            else None
                        s1y = _m2(oy - (dy_ + 0.5 * vy_))
                        dsy = s1y - s0y if s0y is not None else s1y
                        ay_ = s0y + 0.5 * dsy if s0y is not None \
                            else 0.5 * dsy
                        cy_ = (0.5 * s0y + dsy * (1.0 / 3.0)
                               if s0y is not None
                               else dsy * (1.0 / 3.0))
                        runy = None
                        if oy in RUNF:
                            acc_y = dsy if acc_y is None else acc_y + dsy
                            runy = acc_y
                        zt_r = z_taps if z_hoist_r else build_z()
                        for oz in _DOFF:
                            s0z, s1z, dsz, runz = zt_r[oz]
                            pyz_jx = (-(ay_ * s0z + cy_ * dsz) * fd[0]
                                      if s0z is not None
                                      else -(cy_ * dsz) * fd[0])
                            pyz_jy = (-(runy * s0z) * fd[1]
                                      if runy is not None
                                      and s0z is not None else None)
                            pyz_jy2 = (-(runy * dsz) * fd[1]
                                       if runy is not None else None)
                            pyz_jz = (-(runz * s0y) * fd[2]
                                      if runz is not None
                                      and s0y is not None else None)
                            pyz_jz2 = (-(runz * dsy) * fd[2]
                                       if runz is not None else None)
                            pyz_r = ((s1y * s1z) * f_cd if with_rho
                                     else None)

                            def rmw(comp, ox, val):
                                ysl = slice(y0 + g + oy,
                                            y0 + g + oy + yext)
                                cur = out_rims[comp, 0,
                                               2 + ox:2 + ox + bx,
                                               ysl,
                                               g + oz:g + oz + nz]
                                out_rims[comp, 0, 2 + ox:2 + ox + bx,
                                         ysl,
                                         g + oz:g + oz + nz] = cur + val

                            for ox in RUNF:
                                rmw(0, ox, (runx[ox] * pyz_jx)[0])
                            if pyz_jy2 is not None:
                                for ox in _DOFF:
                                    jy_c = (ax_[ox] * pyz_jy
                                            + cx_[ox] * pyz_jy2
                                            if pyz_jy is not None
                                            else cx_[ox] * pyz_jy2)
                                    rmw(1, ox, jy_c[0])
                            if pyz_jz2 is not None:
                                for ox in _DOFF:
                                    jz_c = (ax_[ox] * pyz_jz
                                            + cx_[ox] * pyz_jz2
                                            if pyz_jz is not None
                                            else cx_[ox] * pyz_jz2)
                                    rmw(2, ox, jz_c[0])
                            if with_rho:
                                for ox in _DOFF:
                                    rmw(3, ox, (s1x[ox] * pyz_r)[0])
                    return carry
                  return row_body

                if ndim == 3 and rows_by and rows_by < other[0]:
                    for ych in range(other[0] // rows_by):
                        run_rows(ych * rows_by, rows_by)
                else:
                    run_rows(0, other[0])

            frozen_ok = (_skips_enabled() and not abl and not with_rho
                         and ebw is not None)
            if rows_mode:
                tail_fn = particle_tail_rows
            elif stream_ns > 1:
                def tail_fn():
                    # streamed-tap tail: seed the rims once, then run
                    # the gather+Boris+deposit strip by strip (static
                    # offsets; liveness bounded by one strip)
                    rims_seed()
                    cyv = other[0] // stream_ns
                    for s_ in range(stream_ns):
                        particle_tail(s_ * cyv, cyv, seed=False)
            else:
                tail_fn = particle_tail
            if not frozen_ok:
                tail_fn()
            else:
                # Frozen-region skip: all alive momenta exactly zero AND
                # the field window exactly zero (a causally untouched
                # region — the Yee update propagates exact zeros) =>
                # Boris is a no-op (ig = 1), positions are unchanged,
                # and every Esirkepov ds vanishes, so the particle tail
                # is an exact identity with zero current contribution.
                if rows_mode:
                    # momenta-any flag stashed by write_state (the row
                    # tail never loads full momentum blocks)
                    act = (mom_scr[0] != 0) | (ebw != 0).any()
                else:
                    act = ((ux0 != 0).any() | (uy0 != 0).any()
                           | (uz0 != 0).any() | (ebw != 0).any())
                pl.when(act)(tail_fn)

                @pl.when(jnp.logical_not(act))
                def _frozen():
                    # positions/momenta already hold the identity values
                    # (write_state); only ig (Boris recomputes 1.0 at
                    # u = 0) and the rim seed remain. chi is exactly 0
                    # in a frozen block (u = 0 AND E,B = 0).
                    out_ig[...] = jnp.ones(out_ig.shape, out_ig.dtype)
                    if want_chi:
                        out_chi[...] = jnp.zeros(out_chi.shape, dtype)
                        out_ig0[...] = jnp.ones(out_ig0.shape, dtype)
                    rims_seed()

        on = occ_ref[i] != 0
        pl.when(on)(compute)

        @pl.when(jnp.logical_not(on))
        def _():
            out_a[...] = jnp.zeros(out_a.shape, jnp.uint8)
            for p in range(n_pay):
                out_p[p][...] = jnp.zeros(out_p[p].shape,
                                          out_p[p].dtype)
            if tail:
                out_ig[...] = jnp.ones(out_ig.shape, out_ig.dtype)
                if want_chi:
                    out_chi[...] = jnp.zeros(out_chi.shape, dtype)
                    out_ig0[...] = jnp.ones(out_ig0.shape, dtype)
                if out_rims is not None:
                    out_rims[...] = (rims_in_ref[...] if has_rims_in
                                     else jnp.zeros(out_rims.shape,
                                                    dtype))
            out_m[...] = jnp.where(is_first, 0, out_m[...])

    blk = (cap, bx) + tuple(other)
    zeros = (0,) * (ndim - 1)
    # index maps take *a so the occ path's trailing scalar-prefetch ref
    # argument is absorbed (PrefetchScalarGridSpec appends it)
    mspec = pl.BlockSpec(blk, lambda *a: (0, a[0]) + zeros)
    # neighbor x-columns read straight from the payload arrays; the
    # kernel selects the edge refs instead at i==0 / i==nbx-1, so the
    # clamped fetches there are dead. 3D: block = one column
    # (element-granular map — x is untiled). 2D: x is the sublane dim,
    # so fetch a legal 8-row block whose row 7 (lo) / row 0 (hi) is the
    # wanted column (bx is 8-divisible in 2D, slab_supported gates).
    if ndim == 2:
        b8 = bx // 8
        colblk = (cap, 8) + tuple(other)
        cspec_lo = pl.BlockSpec(
            colblk, lambda *a: (0, jnp.maximum(a[0] * b8 - 1, 0)) + zeros)
        cspec_hi = pl.BlockSpec(
            colblk,
            lambda *a: (0, jnp.minimum((a[0] + 1) * b8, nx // 8 - 1))
            + zeros)
    else:
        colblk = (cap, 1) + tuple(other)
        cspec_lo = pl.BlockSpec(
            colblk, lambda *a: (0, jnp.maximum(a[0] * bx - 1, 0)) + zeros)
        cspec_hi = pl.BlockSpec(
            colblk, lambda *a: (0, jnp.minimum((a[0] + 1) * bx, nx - 1))
            + zeros)
    espec = pl.BlockSpec((cap, 1) + tuple(other),
                         lambda *a: (0, 0) + zeros)
    # per-slab field windows read DIRECTLY from eb_pad (no pre-stacked
    # ebwin HBM round trip, ~160 MB/step/species at the 3D bench shape).
    # The bx+4 windows overlap between slabs, which one block-granular
    # BlockSpec cannot express. 3D: a fan of bx+4 single-column refs
    # with element-granular index maps (offsets stay in [0, nx+2g): the
    # guard padding covers the +-2 reach, no clamping). 2D: single-row
    # blocks are illegal (x = sublane dim), so one bx-row main block +
    # one 8-row tail block whose first 4 rows complete the window (the
    # tail fetch at the last slab is a legal partial boundary block).
    if ndim == 2:
        ebspecs = [
            pl.BlockSpec((6, bx) + opad, lambda *a: (0, a[0]) + zeros),
            pl.BlockSpec((6, 8) + opad,
                         lambda *a: (0, (a[0] + 1) * (bx // 8)) + zeros),
        ]
    else:
        ebspecs = [pl.BlockSpec(
            (6, 1) + opad,
            lambda *a, _k=k: (0, a[0] * bx + _k) + zeros)
            for k in range(bx + 4)]
    if not tail or photon:
        ebspecs = []      # dispatch A / photon tail: no field refs
    # channel-first rims: the fold's flatten is then a pure reshape
    # (no (nb, C) -> (C, nb) relayout; see cellpallas._fold_cfirst)
    rims_shape = (ncomp, nbx, bx + 4) + opad
    rspec = pl.BlockSpec((ncomp, 1, bx + 4) + opad,
                         lambda *a: (0, a[0], 0) + zeros)
    cnt_spec = pl.BlockSpec((8, 128), lambda *a: (0, 0))

    arrs = [alive8, ig] + [data[nm] for nm in names]
    in_specs = list(ebspecs) + [mspec]
    args = [alive8]
    if x_pass:
        in_specs.append(mspec)
        args.append(ig)
    in_specs += [mspec] * n_pay
    args += [data[nm] for nm in names]
    if x_pass:
        in_specs += ([cspec_lo] * n_arr + [cspec_hi] * n_arr
                     + [espec] * n_arr + [espec] * n_arr)
        args += [*arrs, *arrs, *edges_lo, *edges_hi]
    for ax in range(1, ndim):
        e = yz_edges[ax - 1]
        if e is None:
            continue
        lo_arrs, hi_arrs = e
        eblk = [cap, bx] + list(other)
        eblk[1 + ax] = 1
        zeros_e = (0,) * (ndim - 1)
        yspec = pl.BlockSpec(tuple(eblk),
                             lambda *a: (0, a[0]) + zeros_e)
        in_specs += [yspec] * (2 * n_earr)
        args += list(lo_arrs) + list(hi_arrs)
    if has_rims_in and tail:
        in_specs.append(rspec)
        args.append(rims_in)
    if tail and photon:
        out_specs = [mspec] + [mspec] * n_pay + [mspec, cnt_spec]
        out_shape = ([jax.ShapeDtypeStruct(alive8.shape, jnp.uint8)]
                     + [jax.ShapeDtypeStruct(data[nm].shape,
                                             data[nm].dtype)
                        for nm in names]
                     + [jax.ShapeDtypeStruct(alive8.shape, dtype),
                        jax.ShapeDtypeStruct((8, 128), jnp.int32)])
    elif tail:
        out_specs = ([mspec] + [mspec] * n_pay
                     + [mspec, rspec, cnt_spec]
                     + ([mspec, mspec] if want_chi else []))
        out_shape = ([jax.ShapeDtypeStruct(alive8.shape, jnp.uint8)]
                     + [jax.ShapeDtypeStruct(data[nm].shape,
                                             data[nm].dtype)
                        for nm in names]
                     + [jax.ShapeDtypeStruct(alive8.shape, dtype),
                        jax.ShapeDtypeStruct(rims_shape, dtype),
                        jax.ShapeDtypeStruct((8, 128), jnp.int32)]
                     + ([jax.ShapeDtypeStruct(alive8.shape, dtype)] * 2
                        if want_chi else []))
    else:
        out_specs = [mspec] + [mspec] * n_pay + [cnt_spec]
        out_shape = ([jax.ShapeDtypeStruct(alive8.shape, jnp.uint8)]
                     + [jax.ShapeDtypeStruct(data[nm].shape,
                                             data[nm].dtype)
                        for nm in names]
                     + [jax.ShapeDtypeStruct((8, 128), jnp.int32)])
    in_specs = tuple(in_specs)

    kw = _compile_kwargs()
    if not _use_interpret():
        from jax.experimental.pallas import tpu as pltpu2
        # 120 of the 128 MB physical VMEM: the QED 2D slab (3 extra
        # payloads + chi/ig_pre outputs) sits at 112.3 MB scoped
        kw = {"compiler_params": pltpu2.CompilerParams(
            vmem_limit_bytes=max(120, _env_int("LAMBDAPIC_SLAB_VMEM_MB",
                                               120)) * 1024 * 1024)}
    if occ is None:
        occ = jnp.ones((nbx,), jnp.int32)
    qm = jnp.asarray([q, m], jnp.float64 if dtype == jnp.float64
                     else jnp.float32)
    call_kw = dict(grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(nbx,),
        in_specs=in_specs, out_specs=out_specs,
        # rows mode: SMEM hand-off of the momenta-any flag between the
        # branched merge phase and the row tail's frozen check
        scratch_shapes=([pltpu.SMEM((1,), jnp.int32)]
                        if rows_mode else [])))

    outs = pl.pallas_call(kernel, out_shape=out_shape, **call_kw,
                          **kw)(qm, occ, *([eb_pad] * n_ebr), *args)
    alive_out = outs[0]
    pays_out = list(outs[1:1 + n_pay])
    if not tail:
        return alive_out, pays_out, outs[1 + n_pay][0, 0]
    if photon:
        return (alive_out, pays_out, outs[1 + n_pay],
                outs[2 + n_pay][0, 0])
    ig_out = outs[1 + n_pay]
    rims = outs[2 + n_pay]
    n_merged = outs[3 + n_pay][0, 0]
    if want_chi:
        return (alive_out, pays_out, ig_out, rims, n_merged,
                outs[4 + n_pay], outs[5 + n_pay])
    return alive_out, pays_out, ig_out, rims, n_merged


# ----------------------------------------------------------------------
# XLA prologue/epilogue wrapper — the drop-in species hot path
# ----------------------------------------------------------------------

def slab_species_step(eb_pad, data: Dict[str, jnp.ndarray], alive,
                      plan, *, q: float, m: float, dt: float,
                      deltas: Sequence[float], g: int,
                      skip_empty: bool | None = None, fold: bool = True,
                      rims_in=None, with_rho: bool = True,
                      want_chi: bool = False, photon: bool = False):
    """The fused-path species stage on the slab megakernel. ``plan`` =
    ((nloc, HaloSpec, coord), ...) per cell axis, exactly as
    migrate_cells. ``data`` holds the STORED state (pre-push positions
    and inv_gamma) — the kernel applies the first position half push
    itself. Mesh axes 2.. must have size 1 (checked by the caller via
    slab_supported).

    Returns (data, alive, n_lost, jpad): data holds the fully pushed
    state (positions/momenta/inv_gamma post-Boris), jpad the padded
    Esirkepov currents (4, nx+2g, ...). With ``fold=False`` the raw
    channel-first rim panels (4, nbx, bx+4, ny+2g[, nz+2g]) are returned
    instead, so the caller can sum rims across species and fold once
    (simulation/step.py::make_fold_reduce)."""
    from .cellpallas import _fold_cfirst

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

    nloc0, spec0, coord0 = plan[0]
    alive8 = alive.astype(jnp.uint8)
    ig = data["inv_gamma"]
    arrs = [alive8, ig] + [data[k] for k in names]

    # device-edge columns: the periodic-wrap / cross-device x-neighbor
    # column pair (one column per side per array). ppermute when the
    # mesh splits x (reference mpi/sync_particles_2d.c count+payload
    # exchange); alive zeroed at open global edges. Coordinates are NOT
    # adjusted here — the kernel adds +-nx after the half push.
    edges_lo, edges_hi = [], []
    up = dn = None
    if spec0.size > 1:
        up, dn = _mig_perms(spec0.size)
        i_dev = lax.axis_index(spec0.axis_name)
    for a_i, arr in enumerate(arrs):
        lo = lax.slice_in_dim(arr, nx - 1, nx, axis=1)
        hi = lax.slice_in_dim(arr, 0, 1, axis=1)
        if spec0.size > 1:
            lo = lax.ppermute(lo, spec0.axis_name, up)
            hi = lax.ppermute(hi, spec0.axis_name, dn)
        if a_i == 0 and not spec0.periodic:
            if spec0.size > 1:
                lo = jnp.where(i_dev == 0, jnp.zeros_like(lo), lo)
                hi = jnp.where(i_dev == spec0.size - 1,
                               jnp.zeros_like(hi), hi)
            else:
                lo = jnp.zeros_like(lo)
                hi = jnp.zeros_like(hi)
        if a_i == 0:
            # i32 edge alive: the u8 (cap,1,ny,nz) form pays a measured
            # ~4 ms/step (4,1)-packed layout copy entering the kernel
            lo = lo.astype(jnp.int32)
            hi = hi.astype(jnp.int32)
        edges_lo.append(lo)
        edges_hi.append(hi)

    occ = None
    if skip_empty:
        # conservative block occupancy: any alive slot in the slab, or
        # any alive particle in the single x-columns adjacent to it
        # (a particle can only enter from those post-half-push)
        acols = (alive8 != 0).any(
            axis=(0,) + tuple(range(2, 1 + ndim)))          # (nx,)
        blk_any = acols.reshape(nbx, bx).any(1)
        red_ax = (0,) + tuple(range(1, 1 + ndim))
        lo_any = (edges_lo[0] != 0).any(red_ax)             # scalar
        hi_any = (edges_hi[0] != 0).any(red_ax)
        ext = jnp.concatenate([lo_any.reshape(1), acols,
                               hi_any.reshape(1)])
        occ = (blk_any | ext[0:nx:bx] | ext[bx + 1::bx]).astype(jnp.int32)

    kw = dict(names=names, merge_idx=merge_idx, coords=coords,
              periodic=periodic, q=q, m=m, dt=dt, deltas=deltas, g=g,
              sanitize=sanitize, with_rho=with_rho)
    split_axes = [k for k in range(1, ndim) if plan[k][1].size > 1]
    if not split_axes:
        outs = unified_cell_step(
            eb_pad, alive8, ig, data, edges_lo, edges_hi, occ=occ,
            rims_in=None if photon else rims_in,
            want_chi=want_chi, photon=photon, **kw)
        if photon:
            alive_out, pays_out, ig_out, n_lost = outs
            rims = None
        else:
            alive_out, pays_out, ig_out, rims, n_lost = outs[:5]
    else:
        # Multi-dispatch split path (y/z-split meshes): each split
        # in-block axis starts a new dispatch whose edge strips are
        # ppermuted from the PREVIOUS dispatch's post-merge state —
        # the reference's sequential per-axis neighbor exchange
        # (patch/sync_particles_2d.c) ordering, so corner movers
        # (x then y then z in one step) land exactly.
        groups = [[0]]
        for ax in range(1, ndim):
            if ax in split_axes:
                groups.append([ax])
            else:
                groups[-1].append(ax)

        def _yz_edge(alive8_c, data_c, ax):
            """(lo_arrs, hi_arrs) = the mesh-neighbor edge columns of
            cell axis ``ax``, coordinate-adjusted, alive as int32."""
            spec = plan[ax][1]
            n_ax = plan[ax][0]
            aaxis = 1 + ax
            upP, dnP = _mig_perms(spec.size)
            idev = lax.axis_index(spec.axis_name)
            coord = plan[ax][2]
            los, his = [], []
            for a_i, arr in enumerate(
                    [alive8_c] + [data_c[k] for k in names]):
                lo = lax.slice_in_dim(arr, n_ax - 1, n_ax, axis=aaxis)
                hi = lax.slice_in_dim(arr, 0, 1, axis=aaxis)
                lo = lax.ppermute(lo, spec.axis_name, upP)
                hi = lax.ppermute(hi, spec.axis_name, dnP)
                if a_i == 0:
                    if not spec.periodic:
                        lo = jnp.where(idev == 0, jnp.zeros_like(lo),
                                       lo)
                        hi = jnp.where(idev == spec.size - 1,
                                       jnp.zeros_like(hi), hi)
                    lo = lo.astype(jnp.int32)
                    hi = hi.astype(jnp.int32)
                elif names[a_i - 1] == coord:
                    lo = lo - jnp.asarray(n_ax, lo.dtype)
                    hi = hi + jnp.asarray(n_ax, hi.dtype)
                los.append(lo)
                his.append(hi)
            return los, his

        def _occ_of(alive8_c, extra_cols):
            if not skip_empty:
                return None
            acols_ = (alive8_c != 0).any(
                axis=(0,) + tuple(range(2, 1 + ndim)))
            for col in extra_cols:
                acols_ = acols_ | (col != 0).any(
                    axis=(0,) + tuple(range(2, 1 + ndim)))
            return acols_.reshape(nbx, bx).any(1).astype(jnp.int32)

        n_lost = jnp.int32(0)
        cur_alive8, cur_data, cur_ig = alive8, dict(data), ig
        for gi, grp in enumerate(groups):
            last = gi == len(groups) - 1
            if gi == 0:
                yz = None
                occ_g = occ
            else:
                e_ax = grp[0]
                yz = [None] * (ndim - 1)
                yz[e_ax - 1] = _yz_edge(cur_alive8, cur_data, e_ax)
                occ_g = _occ_of(cur_alive8, yz[e_ax - 1][0][:1]
                                + yz[e_ax - 1][1][:1])
            outs = unified_cell_step(
                eb_pad, cur_alive8, cur_ig, cur_data,
                edges_lo if gi == 0 else [],
                edges_hi if gi == 0 else [],
                occ=occ_g,
                rims_in=rims_in if (last and not photon) else None,
                want_chi=want_chi and last, merge_axes=tuple(grp),
                tail=last, yz_edges=yz, photon=photon, **kw)
            if last and photon:
                alive_out, pays_out, ig_out, nm = outs
                rims = None
            elif last:
                alive_out, pays_out, ig_out, rims, nm = outs[:5]
            else:
                alive_out, pays_out, nm = outs
                cur_alive8 = alive_out
                cur_data = {**cur_data, **dict(zip(names, pays_out))}
            n_lost = n_lost + nm
    data = {**data, **dict(zip(names, pays_out))}
    data["inv_gamma"] = ig_out
    alive = alive_out != 0
    if photon:
        return data, alive, n_lost, None
    jpad = _fold_cfirst(rims, nx, g, bx) if fold else rims
    if want_chi:
        return data, alive, n_lost, jpad, (outs[5], outs[6])
    return data, alive, n_lost, jpad


def fold_pallas_enabled() -> bool:
    import os
    return os.environ.get("LAMBDAPIC_FOLD_PALLAS", "1") != "0"


def _fold_K(nx, b, C, pads, nloc, item):
    """Panels per output block for fold_reduce_slab. Scoped-VMEM
    budget: K+2 double-buffered panel refs + the output block +
    accumulator/concat temporaries of the padded block width; the
    64 MB scoped limit is hit near 2x this estimate, so budget
    conservatively (3D bench at K=8 measured 71.75M > 64M; K=4
    fits)."""
    import numpy as _np
    bp4 = b + 4
    panel_b = C * bp4 * int(_np.prod(pads, dtype=_np.int64)) * item
    acc_row = C * int(_np.prod(pads, dtype=_np.int64)) * item
    extra = -(-2 // b)

    def _vmem_est(k):
        return ((k + 2 * extra) * panel_b * 2  # double-buffered panels
                + C * k * b * int(_np.prod(nloc[1:], dtype=_np.int64))
                * item                          # output block
                + 4 * k * b * acc_row)          # acc + concat temps

    K = max(1, 16 // b)
    while nx % (K * b) or (K > 1 and _vmem_est(K) > 32 * 2**20):
        K -= 1
    return K


def fold_slab_supported(nloc, g: int, cap_c: int = 4,
                        itemsize: int = 4) -> bool:
    """fold_reduce_slab's edge-strip add assumes >= 2 interior rows per
    output block (K*b >= 2). With b == 1 and an nx with no small even
    divisor (e.g. odd nx), K collapses to 1 — the caller must fall back
    to the _fold_cfirst + halo_reduce path then."""
    ndim = len(nloc)
    b = slab_bx(nloc[0], ndim)
    pads = tuple(n + 2 * g for n in nloc[1:])
    K = _fold_K(nloc[0], b, cap_c, pads, nloc, itemsize)
    return K * b >= 2


def fold_reduce_slab(rims, *, nloc, g: int, spec0, periodic):
    """Fold species-summed slab rim panels (4, nbx, b+4, ny+2g[, nz+2g])
    straight into the INTERIOR current (4, *nloc) in one Pallas pass —
    replacing cellpallas._fold_cfirst + parallel.halo.halo_reduce (the
    intermediate padded-J HBM round trip and its dynamic-update-slice /
    layout-copy glue, a measured ~2.6 ms/step at the 3D bench shape).

    Runs INSIDE shard_map on local blocks. The grid tiles the interior
    x axis in K-panel groups; each block reads its K+2 overlapping rim
    panels through element-granular index maps, overlap-adds them at
    static offsets, adds the cross-device / periodic-wrap x strips
    (ppermuted here, like halo_reduce's x pass), folds the y/z guards
    in-block (the slab path requires y/z-unsplit meshes), and writes
    interior rows. Same additive terms as the XLA pair, reassociated
    (fp tolerance; tests/core/test_cellslab.py asserts end-to-end).

    Reference parity anchor: sync_currents patch/sync_fields2d.c:77-84.
    """
    ndim = len(nloc)
    nx = nloc[0]
    C, nbx, bp4 = rims.shape[:3]
    b = bp4 - 4
    pads = rims.shape[3:]
    dtype = rims.dtype
    K = _fold_K(nx, b, C, pads, nloc, dtype.itemsize)
    # the edge-strip concat below needs >= 2 interior rows per output
    # block; callers gate on fold_slab_supported, which guarantees it
    assert K * b >= 2, (K, b)
    bxo = K * b
    nbo = nx // bxo

    # a rim panel reaches 2 rows beyond its block on each side, so a
    # K-panel output group overlaps ceil(2/b) extra panels per side
    # (1 for b>=2, 2 for b=1 slabs)
    extra = -(-2 // b)
    P = lambda k: k + 2 * extra

    # x-guard strips -> neighbor interiors (halo_reduce's x exchange);
    # ppermute is the identity at size 1
    send_lo = rims[:, 0, 0:2]
    send_hi = rims[:, -1, 2 + b:4 + b]
    if b == 1 and nbx >= 2:
        # b=1: the 2-row guard also overlaps the SECOND panel from the
        # edge (panel 1's row 0 lands at global -1, panel nbx-2's row 4
        # at global nx) — same overlap geometry as the interior fold
        z1 = jnp.zeros_like(rims[:, 0, 0:1])
        send_lo = send_lo + jnp.concatenate([z1, rims[:, 1, 0:1]], 1)
        send_hi = send_hi + jnp.concatenate([rims[:, -2, 4:5], z1], 1)
    up = [(k, (k + 1) % spec0.size) for k in range(spec0.size)]
    dn = [(k, (k - 1) % spec0.size) for k in range(spec0.size)]
    elo = lax.ppermute(send_hi, spec0.axis_name, up)
    ehi = lax.ppermute(send_lo, spec0.axis_name, dn)
    if not spec0.periodic:
        idev = lax.axis_index(spec0.axis_name)
        elo = jnp.where(idev == 0, jnp.zeros_like(elo), elo)
        ehi = jnp.where(idev == spec0.size - 1, jnp.zeros_like(ehi), ehi)

    zeros_tr = (0,) * (ndim - 1)
    pspecs = [pl.BlockSpec(
        (C, 1, bp4) + pads,
        lambda i, _p=p: (0, jnp.clip(i * K - extra + _p, 0, nbx - 1), 0)
        + zeros_tr)
        for p in range(P(K))]
    espec = pl.BlockSpec((C, 2) + pads, lambda i: (0, 0) + zeros_tr)
    ospec = pl.BlockSpec((C, bxo) + tuple(nloc[1:]),
                         lambda i: (0, i) + zeros_tr)

    def kernel(*refs):
        prefs = refs[:P(K)]
        elo_r, ehi_r = refs[P(K)], refs[P(K) + 1]
        out = refs[P(K) + 2]
        i = pl.program_id(0)

        acc = None
        for p in range(P(K)):
            ls = (p - extra) * b - 2      # block-local row of panel row 0
            rlo = max(0, -ls)
            rhi = min(bp4, bxo - ls)
            if rhi <= rlo:
                continue
            part = prefs[p][:, 0, rlo:rhi]
            j = i * K - extra + p
            valid = (j >= 0) & (j <= nbx - 1)
            part = jnp.where(valid, part, jnp.zeros_like(part))
            pre = ls + rlo
            post = bxo - pre - (rhi - rlo)
            segs = []
            if pre:
                segs.append(jnp.zeros((C, pre) + pads, dtype))
            segs.append(part)
            if post:
                segs.append(jnp.zeros((C, post) + pads, dtype))
            part = segs[0] if len(segs) == 1 else jnp.concatenate(segs, 1)
            acc = part if acc is None else acc + part

        # cross-device / wrap x strips into the first/last interior rows
        isf = i == 0
        isl = i == nbo - 1
        zfill = jnp.zeros((C, bxo - 2) + pads, dtype)
        ev = jnp.where(isf, elo_r[...], jnp.zeros((C, 2) + pads, dtype))
        acc = acc + jnp.concatenate([ev, zfill], 1)
        ev = jnp.where(isl, ehi_r[...], jnp.zeros((C, 2) + pads, dtype))
        acc = acc + jnp.concatenate([zfill, ev], 1)

        # y (and z) guard folds: local wrap under periodic, drop at open
        # boundaries (reference: edge patches have no neighbor)
        val = acc
        for ax in range(1, ndim):
            axis = 1 + ax
            n_ax = val.shape[axis] - 2 * g

            def cut(a_, b_, _v=val, _axis=axis):
                s = [slice(None)] * _v.ndim
                s[_axis] = slice(a_, b_)
                return _v[tuple(s)]

            mid = cut(g, g + n_ax)
            if periodic[ax]:
                def mcut(a_, b_, _v=mid, _axis=axis):
                    s = [slice(None)] * _v.ndim
                    s[_axis] = slice(a_, b_)
                    return _v[tuple(s)]
                head = mcut(0, g) + cut(g + n_ax, g + n_ax + g)
                tail = mcut(n_ax - g, n_ax) + cut(0, g)
                mid = jnp.concatenate([head, mcut(g, n_ax - g), tail],
                                      axis=axis)
            val = mid
        out[...] = val

    out_shape = jax.ShapeDtypeStruct((C,) + tuple(nloc), dtype)
    return pl.pallas_call(
        kernel, grid=(nbo,), in_specs=pspecs + [espec, espec],
        out_specs=ospec, out_shape=out_shape,
        **_compile_kwargs())(*([rims] * P(K)), elo, ehi)


def slab_reject_reason(plan, nloc, cap, switches, sp, cell_migration: str,
                       qed: bool, split: bool) -> str | None:
    """First failed eligibility predicate for the slab megakernel fused
    path, or None when eligible. The caller logs this (one INFO line per
    species per stepper build) so a config one cell off the fast path
    says WHY it lost 3-5x instead of silently dropping to the per-stage
    kernels."""
    if not slab_enabled():
        return "LAMBDAPIC_SLAB=0 (disabled by env)"
    if split:
        return "split stepping (a host callback occupies an inner stage)"
    if qed and not qed_slab_enabled():
        return "QED slab path disabled (LAMBDAPIC_SLAB_QED=0)"
    if cell_migration == "exact":
        return "cell_migration='exact' (slab merge is the fast scheme)"
    if sp.pusher == "photon":
        # field-free photon slab mode (merge + 1/|u| + half push)
        if qed:
            return ("photon species with QED pair production (chi "
                    "needs the gather; per-stage path)")
        if not photon_slab_enabled():
            return "photon slab path disabled (LAMBDAPIC_SLAB_PHOTON=0)"
        req = ("pusher", "migration")
    elif sp.pusher not in ("boris", "boris+tbmt"):
        return f"pusher {sp.pusher!r} (slab kernel fuses Boris only)"
    elif sp.q == 0.0:
        return "neutral species (slab kernel fuses the Esirkepov deposit)"
    else:
        req = ("pusher", "interpolation", "migration",
               "current_deposition")
    for k in req:
        if not switches[k]:
            return f"component {k!r} disabled via set_enabled"
    # y/z-split meshes: 3D takes the multi-dispatch slab path (one
    # dispatch per split axis, edges ppermuted between); 2D falls back
    # (a (cap, bx, 1) lane-1 edge block buys nothing over the per-stage
    # kernels there)
    if any(p[1].size > 1 for p in plan[1:]):
        ax = next("yz"[i] for i, p in enumerate(plan[1:]) if p[1].size > 1)
        if len(nloc) == 2:
            return (f"2D mesh splits the {ax} axis (slab re-binning "
                    "wraps y in-block; shard x instead, or use the "
                    "per-stage kernels)")
        if not splityz_enabled():
            return (f"mesh splits the {ax} axis and the multi-dispatch "
                    "slab path is disabled (LAMBDAPIC_SLAB_SPLITYZ=0)")
    # 2D neighbor-column/window fetches ride 8-row blocks (x is the
    # sublane dim there): needs 8-divisible slabs
    if len(nloc) == 2 and (nloc[0] % 8 or slab_bx(nloc[0], 2) % 8):
        return (f"2D local nx={nloc[0]} not divisible by 8 (neighbor "
                "columns ride 8-row sublane blocks)")
    if not slab_ok(tuple(nloc), cap, extra_arrays=10 if qed else 0,
                   photon=sp.pusher == "photon"):
        return (f"VMEM estimate over budget at capacity {cap} and local "
                f"grid {tuple(nloc)} (LAMBDAPIC_SLAB_VMEM_MB to override)")
    return None


def qed_slab_enabled() -> bool:
    import os
    return os.environ.get("LAMBDAPIC_SLAB_QED", "1") != "0"


def photon_slab_enabled() -> bool:
    import os
    return os.environ.get("LAMBDAPIC_SLAB_PHOTON", "1") != "0"


def splityz_enabled() -> bool:
    import os
    return os.environ.get("LAMBDAPIC_SLAB_SPLITYZ", "1") != "0"


def slab_supported(plan, nloc, cap, switches, sp, cell_migration: str,
                   qed: bool, split: bool) -> bool:
    """Static eligibility for the slab megakernel fused path."""
    return slab_reject_reason(plan, nloc, cap, switches, sp,
                              cell_migration, qed, split) is None
