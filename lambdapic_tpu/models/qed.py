"""Monte-Carlo LCFA QED: nonlinear Compton photon emission and
Breit-Wheeler pair production.

TPU-native rebuild of the reference QED stack (core/qed/radiation.py:19-276,
pair_production.py:18-277, optical_depth.py:36-130, inline.py:5-192):

- chi computed per particle from the gathered E, B and pre-push momentum
  (inline.py:5-13), at the reference's `_qed` stage (inside the fused
  species block, between gather and momentum push).
- optical-depth method: tau initialized to -log(1-r), decremented by the
  tabulated total event rate * dt/gamma; on crossing zero the energy
  fraction delta is sampled by bisection of the tabulated cumulative
  distribution (optical_depth.py:36-130) — here a vectorized fixed-depth
  binary search with on-the-fly chi interpolation.
- particle creation fills dead slots (inline.py:50-192) via the masked
  slot allocator (parallel/inject.py); photon recoil (u *= 1-delta) and
  photon removal afterwards, matching the reference ordering where
  deposition uses pre-recoil momenta (simulation.py:1052-1065).

Randomness is counter-based jax.random keyed on (step, species, device) —
bitwise reproducible for a fixed seed and mesh.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..constants import c, e, hbar, m_e
from .qed_tables import load_tables

CHI_FACTOR = e * hbar / (m_e**2 * c**3)


def _resolve_sample_mode(mode: Optional[str]) -> str:
    """'chebyshev' (default; gather-free surrogates) or 'table'
    (reference-exact interpolation + bisection, slow on TPU). Defaults
    from LAMBDAPIC_QED_SAMPLING. Orthogonally, the reference's
    LAMBDAPIC_USE_SIGMOID_SAMPLING=1 (optical_depth.py:8-32) selects the
    sigmoid-warped table variant — it applies to both modes here (the
    surrogates are refit from whichever table is loaded)."""
    import os
    if mode is None:
        mode = os.environ.get("LAMBDAPIC_QED_SAMPLING", "chebyshev")
    if mode not in ("chebyshev", "table"):
        raise ValueError(
            f"sample_mode must be 'chebyshev' or 'table', got {mode!r}")
    return mode


def calculate_chi(ex_p, ey_p, ez_p, bx_p, by_p, bz_p, ux, uy, uz, inv_gamma):
    """Quantum parameter chi (reference inline.py:5-13)."""
    gamma = 1.0 / inv_gamma
    val = ((gamma * ex_p + (uy * bz_p - uz * by_p) * c)**2
           + (gamma * ey_p + (uz * bx_p - ux * bz_p) * c)**2
           + (gamma * ez_p + (ux * by_p - uy * bx_p) * c)**2
           - (ux * ex_p + uy * ey_p + uz * ez_p)**2)
    return CHI_FACTOR * jnp.sqrt(jnp.maximum(val, 0.0))


@dataclass(frozen=True)
class _Tables:
    """Device copies of the optical-depth tables + Chebyshev surrogates.

    TPU addendum: the reference samples by bisecting the cumulative
    table with per-particle gathers (optical_depth.py:36-130) — XLA
    gathers run at ~1e8 elem/s on TPU, which made the QED stage seconds
    per step. The tables are smooth Airy-integral functions, so the hot
    path instead evaluates Chebyshev fits (pure VPU, no gathers):
    log10(total rate) vs log10(chi) to ~1e-5, and the r-uniform inverse
    CDF as a 2D fit (log-delta space for photons, ~3e-5; delta space for
    pairs, ~6e-4 — the pair log-CDF is step-like near threshold). The
    exact table path is selectable with sample_mode='table' on the
    process classes or LAMBDAPIC_QED_SAMPLING=table for validation.
    """

    total: jnp.ndarray          # (chi_N,)
    cumulative: jnp.ndarray     # (chi_N, delta_N)
    log_chi_min: float
    log_chi_max: float
    log_chi_delta: float
    log_delta_min: float        # log10 of the smallest grid delta
    chi_N: int
    delta_N: int
    delta_grid: jnp.ndarray     # (delta_N,) the actual delta grid values
    delta_interp_log: bool      # table inversion interpolates in log-delta
                                # (log grid) or delta (sigmoid grid)
    # Chebyshev surrogates (see class docstring)
    rate_coef: jnp.ndarray      # (deg+1,) log10(rate) vs scaled log_chi
    rate_c0: float              # fit domain [rate_c0, log_chi_max]
    inv_coef: jnp.ndarray       # (degc+1, degr+1) inverse CDF fit
    inv_c0: float               # chi-domain start of the inverse fit
    inv_log_space: bool         # fit is log10(delta) (photon) or delta


def _fit_tables(total, cum, lo, hi, delta_grid, log_space,
                deg_rate=24, degc=16, degr=32):
    """Host-side Chebyshev fits of the rate and r-uniform inverse CDF."""
    from numpy.polynomial import chebyshev as C
    N, M = cum.shape
    cgrid = np.linspace(lo, hi, N)
    nz = total > total.max() * 1e-12
    i0 = int(nz.argmax())
    cs = cgrid[i0:]
    cc = 2 * (cs - cs[0]) / (hi - cs[0]) - 1
    rate_coef = C.chebfit(cc, np.log10(np.maximum(total[i0:], 1e-300)),
                          deg_rate)

    ld = np.log10(delta_grid)
    r_grid = np.linspace(0, 1, 513)
    inv = np.zeros((N - i0, r_grid.size))
    for i in range(i0, N):
        y = cum[i]
        y = (y - y[0]) / max(y[-1] - y[0], 1e-300)
        y = np.maximum.accumulate(y)
        v = np.interp(r_grid, y, ld)
        inv[i - i0] = v if log_space else 10.0 ** v
    w = np.arcsin(2 * r_grid - 1) / (np.pi / 2)
    V1 = C.chebvander(cc, degc)
    V2 = C.chebvander(w, degr)
    A = np.linalg.lstsq(V1, inv, rcond=None)[0]
    B = np.linalg.lstsq(V2, A.T, rcond=None)[0].T    # (degc+1, degr+1)
    return rate_coef, float(cs[0]), B


def _make_tables(kind: str, dtype) -> _Tables:
    t = load_tables()
    key_total = f"{kind}_prob_rate_total"
    key_cum = f"integral_{kind}_prob_along_delta"
    lo, hi = [float(v) for v in t["log_chi_range"]]
    delta_N = int(t["delta_N"])
    if "A" in t:
        # sigmoid-warped variant (LAMBDAPIC_USE_SIGMOID_SAMPLING=1;
        # reference optical_depth_tables_sigmoid.py)
        from .qed_tables import sigmoid_delta_grid
        delta_grid = sigmoid_delta_grid(delta_N, float(t["delta_range"][0]))
        interp_log = False
    else:
        dlo = float(t["log_delta_range"][0])
        delta_grid = np.logspace(dlo, 0, delta_N)
        interp_log = True
    total_np = np.asarray(t[key_total], np.float64)
    cum_np = np.asarray(t[key_cum], np.float64)
    log_space = kind == "photon"
    rate_coef, c0, inv_coef = _fit_tables(total_np, cum_np, lo, hi,
                                          delta_grid, log_space)
    return _Tables(
        total=jnp.asarray(t[key_total], dtype),
        cumulative=jnp.asarray(t[key_cum], dtype),
        log_chi_min=lo, log_chi_max=hi,
        log_chi_delta=float(t["log_chi_delta"]),
        log_delta_min=float(np.log10(delta_grid[0])),
        chi_N=int(t["chi_N"]), delta_N=delta_N,
        delta_grid=jnp.asarray(delta_grid, dtype),
        delta_interp_log=interp_log,
        rate_coef=jnp.asarray(rate_coef, dtype),
        rate_c0=c0,
        inv_coef=jnp.asarray(inv_coef, dtype),
        inv_c0=c0,
        inv_log_space=log_space,
    )


def _clenshaw(x, coef):
    """Chebyshev series evaluation; coef entries may be scalars or
    broadcastable arrays."""
    b1 = jnp.zeros_like(x)
    b2 = jnp.zeros_like(x)
    for k in range(len(coef) - 1, 0, -1):
        b1, b2 = 2 * x * b1 - b2 + coef[k], b1
    return x * b1 - b2 + coef[0]


def _total_rate_table(chi, tb: _Tables):
    """Linear interpolation of the total event rate in log10(chi)
    (reference optical_depth_tables.py:44-54): 0 below the table range.
    Validation path — per-particle gathers are slow on TPU."""
    log_chi = jnp.log10(jnp.maximum(chi, 1e-30))
    grid = tb.log_chi_min + tb.log_chi_delta * jnp.arange(
        tb.chi_N, dtype=chi.dtype)
    rate = jnp.interp(log_chi, grid, tb.total)
    return jnp.where(log_chi >= tb.log_chi_min, rate, 0.0)


def _total_rate(chi, tb: _Tables):
    """Chebyshev surrogate of the total event rate (gather-free; see
    _Tables docstring). Matches the table to ~1e-5 relative within the
    fit domain; clamps to the domain edges outside (below the fit start
    the rate is < 1e-12 of max -> treated as 0, matching the reference's
    below-range behavior)."""
    log_chi = jnp.log10(jnp.maximum(chi, 1e-30))
    cc = 2 * (log_chi - tb.rate_c0) / (tb.log_chi_max - tb.rate_c0) - 1
    rate = jnp.power(10.0, _clenshaw(jnp.clip(cc, -1.0, 1.0),
                                     tb.rate_coef))
    lo_cut = max(tb.log_chi_min, tb.rate_c0)
    return jnp.where(log_chi >= lo_cut, rate, 0.0)


def _cheb_basis(x, n):
    """[T_0(x) .. T_{n-1}(x)] by the three-term recurrence."""
    ts = [jnp.ones_like(x), x]
    for _ in range(2, n):
        ts.append(2 * x * ts[-1] - ts[-2])
    return ts[:n]


def _sample_delta(chi, r01, tb: _Tables):
    """Sample the energy fraction delta from the Chebyshev inverse-CDF
    surrogate (gather-free; see _Tables docstring): delta =
    F^-1(log_chi, r) with arcsine-warped r for edge resolution.

    Evaluated as a tensor-product basis sum sum_km C[k,m] T_k(cc)
    T_m(w) — the two basis recurrences plus one scalar-coefficient MAC
    per (k,m) — instead of nested Clenshaw (3 ops per coefficient).
    At the (17, 33) fit this is ~680 vs ~1750 ops per particle; the
    dense per-slot sampler was the QED step's single largest fusion
    (7.4 of 21.2 ms/step, round-5 device trace in docs/BENCH_LOCAL.md).
    Same polynomial, reassociated (fp-level differences only;
    tests/core/test_qed_cheb.py bounds the surrogate against the
    reference tables either way). LAMBDAPIC_QED_CHEB_EVAL=clenshaw
    restores the nested form."""
    import os
    log_chi = jnp.log10(jnp.maximum(chi, 1e-30))
    cc = jnp.clip(2 * (log_chi - tb.inv_c0)
                  / (tb.log_chi_max - tb.inv_c0) - 1, -1.0, 1.0)
    w = jnp.arcsin(2 * jnp.clip(r01, 0.0, 1.0) - 1) / (jnp.pi / 2)
    K, M = tb.inv_coef.shape
    if os.environ.get("LAMBDAPIC_QED_CHEB_EVAL", "basis") == "clenshaw":
        a_rows = [_clenshaw(w, tb.inv_coef[k]) for k in range(K)]
        val = _clenshaw(cc, a_rows)
    else:
        tw = _cheb_basis(w, M)
        tc = _cheb_basis(cc, K)
        coef = np.asarray(tb.inv_coef)
        val = None
        for k in range(K):
            row = None
            for m in range(M):
                c_km = float(coef[k, m])
                if c_km == 0.0:
                    continue
                t = c_km * tw[m]
                row = t if row is None else row + t
            if row is None:
                continue
            t = tc[k] * row
            val = t if val is None else val + t
        if val is None:
            val = jnp.zeros_like(w)
    if tb.inv_log_space:
        return jnp.power(10.0, jnp.minimum(val, 0.0))
    return jnp.clip(val, 10.0 ** tb.log_delta_min, 1.0)


def _sample_delta_table(chi, r01, tb: _Tables):
    """Sample the energy fraction delta by bisecting the chi-interpolated
    cumulative table (reference optical_depth_tables.py:57-90), vectorized
    with a fixed-depth binary search. Validation path (slow on TPU)."""
    log_chi = jnp.log10(jnp.maximum(chi, 1e-30))
    fidx = (log_chi - tb.log_chi_min) / tb.log_chi_delta
    chi_idx = jnp.clip(jnp.floor(fidx).astype(jnp.int32), 0, tb.chi_N - 2)
    t = fidx - chi_idx.astype(chi.dtype)

    # gathering whole (delta_N,) rows per particle would be huge; gather
    # single entries on demand instead:
    def entry(i):
        a = tb.cumulative[chi_idx, i]
        b = tb.cumulative[chi_idx + 1, i]
        return a * (1 - t) + b * t

    ymin = entry(jnp.zeros_like(chi_idx))
    ymax = entry(jnp.full_like(chi_idx, tb.delta_N - 1))
    r = r01 * (ymax - ymin) + ymin

    low = jnp.zeros_like(chi_idx)
    high = jnp.full_like(chi_idx, tb.delta_N - 1)
    for _ in range(int(np.ceil(np.log2(tb.delta_N))) + 1):
        mid = (low + high) // 2
        v = entry(mid)
        go_up = v < r
        low = jnp.where(go_up, mid + 1, low)
        high = jnp.where(go_up, high, mid - 1)
    delta_idx = jnp.clip(high, 0, tb.delta_N - 2)

    y1 = entry(delta_idx)
    y2 = entry(delta_idx + 1)
    frac = (r - y1) / jnp.where(y2 != y1, y2 - y1, 1e-300)
    d1 = tb.delta_grid[delta_idx]
    d2 = tb.delta_grid[delta_idx + 1]
    if tb.delta_interp_log:
        # log grid: interpolate in log10(delta) (reference
        # optical_depth_tables.py:57-90)
        log_delta = (jnp.log10(d1)
                     + frac * (jnp.log10(d2) - jnp.log10(d1)))
        return jnp.power(10.0, jnp.minimum(log_delta, 0.0))
    # sigmoid grid: linear in delta (reference
    # optical_depth_tables_sigmoid.py:90-103)
    return jnp.clip(d1 + frac * (d2 - d1), 0.0, 1.0)


def _sample_delta_sparse(chi, r01, event, tb: _Tables):
    """Event-compacted delta sampling for cell layouts (chi of shape
    (cap, *cells)): compact event slots to the leading K rows per cell
    with one Batcher pass, evaluate the transcendental-heavy inverse
    CDF on those K rows only, and unsort by the carried slot index.
    Cells with more than K events fall back to the dense evaluation
    via lax.cond, so any K is exact. Round-5 device trace: the dense
    sampler fusion is 7.0-7.4 of the 21 ms QED step and its cost is
    per-slot transcendentals, not polynomial degree — sparsity is the
    lever. K = cap // LAMBDAPIC_QED_SPARSE_K_DIV (default 4, floor 2)."""
    import os
    from ..ops.cellpallas import _batcher_network
    from .collision import _sort_cap

    cap = chi.shape[0]
    kdiv = int(os.environ.get("LAMBDAPIC_QED_SPARSE_K_DIV", "4") or 4)
    K = min(cap, max(2, cap // max(kdiv, 1)))
    n2 = 1
    while n2 < cap:
        n2 *= 2
    ces = _batcher_network(n2, cap)
    ev_i = event.astype(jnp.int32)
    n_ev = ev_i.sum(0)

    def dense(_):
        return jnp.where(event, _sample_delta(chi, r01, tb), 0.0)

    def sparse(_):
        key = 1 - ev_i                      # event slots first
        iota = jax.lax.broadcasted_iota(jnp.int32, chi.shape, 0)
        chi_s, r_s, idx_s = _sort_cap(ces, key,
                                      [chi, r01,
                                       iota.astype(chi.dtype)])
        d_top = _sample_delta(chi_s[:K], r_s[:K], tb)
        d_full = jnp.concatenate(
            [d_top, jnp.zeros((cap - K,) + chi.shape[1:], chi.dtype)],
            axis=0)
        (d_back,) = _sort_cap(ces, idx_s.astype(jnp.int32), [d_full])
        return jnp.where(event, d_back, 0.0)

    if K >= cap:
        return dense(None)
    return jax.lax.cond(jnp.max(n_ev) <= K, sparse, dense, None)


def _update_tau(tau, inv_gamma, chi, alive, dt, keys, tb: _Tables,
                strict_less: bool, sample_mode: str = "chebyshev"):
    """Optical-depth decrement + event flag (reference
    optical_depth.py:36-130). strict_less: photon emission uses tau<0,
    pair production tau<=0. sample_mode: 'chebyshev' = gather-free
    surrogates (default, fast on TPU); 'table' = reference-exact linear
    interpolation + CDF bisection (validation, slow on TPU)."""
    chi_min = 10.0 ** tb.log_chi_min
    active = alive & (chi >= chi_min)
    u1 = jax.random.uniform(keys[0], tau.shape, dtype=tau.dtype)
    u2 = jax.random.uniform(keys[1], tau.shape, dtype=tau.dtype)
    u3 = jax.random.uniform(keys[2], tau.shape, dtype=tau.dtype)

    table_mode = sample_mode == "table"
    rate = (_total_rate_table if table_mode else _total_rate)(chi, tb)
    tau_init = jnp.where((tau == 0.0) | jnp.isnan(tau),
                         -jnp.log1p(-u1), tau)
    tau_new = tau_init - rate * dt * inv_gamma
    crossed = tau_new < 0 if strict_less else tau_new <= 0
    event = active & crossed
    tau_out = jnp.where(event, -jnp.log1p(-u2), tau_new)
    tau_out = jnp.where(active, tau_out, tau)
    import os
    sparse_ok = (not table_mode and chi.ndim >= 2
                 and os.environ.get("LAMBDAPIC_QED_SPARSE_SAMPLE",
                                    "1") != "0")
    if sparse_ok:
        delta = _sample_delta_sparse(chi, u3, event, tb)
    else:
        sampler = _sample_delta_table if table_mode else _sample_delta
        delta = jnp.where(event, sampler(chi, u3, tb), 0.0)
    return tau_out, event, delta




class NonlinearComptonLCFA:
    """Photon emission (reference radiation.py:114-239)."""

    creates_particles = True

    def __init__(self, ispec: int, photon_ispec: int, buf: int,
                 dtype=jnp.float32, sample_mode: Optional[str] = None):
        self.ispec = ispec
        self.photon_ispec = photon_ispec
        self.buf = buf
        self.tables = _make_tables("photon", dtype)
        self.sample_mode = _resolve_sample_mode(sample_mode)
        self._disabled_event = False   # test hook: event() stage toggle

    # -- called inside the fused species block (local (cap,) arrays) -----
    def update_chi_and_events(self, data, alive, key, dt):
        data = dict(data)
        chi = calculate_chi(
            data["ex_part"], data["ey_part"], data["ez_part"],
            data["bx_part"], data["by_part"], data["bz_part"],
            data["ux"], data["uy"], data["uz"], data["inv_gamma"])
        return self.update_events_from_chi(data, alive, key, dt, chi,
                                           data["inv_gamma"])

    def update_events_from_chi(self, data, alive, key, dt, chi, ig_pre):
        """Event sampling from a precomputed chi (the slab megakernel
        emits chi + the pre-push inv_gamma in-kernel,
        ops/cellslab.py::unified_cell_step want_chi; same math as
        update_chi_and_events — reference optical_depth.py:36-130)."""
        data = dict(data)
        data["chi"] = jnp.where(alive, chi, 0.0)
        keys = jax.random.split(jax.random.fold_in(key, 101), 3)
        tau, event, delta = _update_tau(
            data["tau"], ig_pre, data["chi"], alive, dt, keys,
            self.tables, strict_less=True, sample_mode=self.sample_mode)
        data["tau"] = tau
        data["event"] = event.astype(data["tau"].dtype)
        data["delta"] = delta
        return data, alive

    # -- elementwise creation pieces (tiled path: newborn values stay at
    # the parent's slot; ops/tiled2d.py::insert_tiled does the insertion) --
    def photon_newborns(self, edata, ndim: int):
        """Newborn photon values at parent slots (same formulas as
        creation_local below / reference qed/cpu.py:283-307)."""
        delta = edata["delta"]
        ux = delta * edata["ux"]
        uy = delta * edata["uy"]
        uz = delta * edata["uz"]
        u2 = ux**2 + uy**2 + uz**2
        new = {"x": edata["x"], "y": edata["y"], "w": edata["w"],
               "ux": ux, "uy": uy, "uz": uz,
               "inv_gamma": jnp.where(u2 > 0, 1.0 / jnp.sqrt(
                   jnp.maximum(u2, 1e-30)), 1.0)}
        if ndim == 3:
            new["z"] = edata["z"]
        return new

    def apply_recoil(self, edata, ev):
        """Parent recoil + event reset (reference qed/cpu.py:308-330)."""
        edata = dict(edata)
        fac = jnp.where(ev, 1.0 - edata["delta"], 1.0)
        edata["ux"] = edata["ux"] * fac
        edata["uy"] = edata["uy"] * fac
        edata["uz"] = edata["uz"] * fac
        edata["inv_gamma"] = 1.0 / jnp.sqrt(
            1.0 + edata["ux"]**2 + edata["uy"]**2 + edata["uz"]**2)
        edata["event"] = jnp.zeros_like(edata["event"])
        return edata

    # -- creation phase (local arrays of parent + child species) ---------
    def creation_local(self, edata, ealive, pdata, palive, pnext, pover,
                       ndim: int):
        from ..parallel.inject import insert_local

        cap_e = ealive.shape[0]
        ev = ealive & (edata["event"] > 0)
        n_ev = jnp.sum(ev)
        # the creation buffer is the CHILD capacity: every event creates
        # its photon as long as slots exist (the reference extends arrays
        # and never drops, qed/cpu.py:283-307; a smaller buffer would
        # silently recoil electrons without emitting — momentum loss)
        k_buf = palive.shape[0]
        idx = jnp.nonzero(ev, size=k_buf, fill_value=cap_e)[0]
        pover = pover + jnp.maximum(n_ev - k_buf, 0).astype(pover.dtype)

        def take(a):
            return jnp.take(a, idx, mode="fill", fill_value=0)

        delta_ev = take(edata["delta"])
        ux = delta_ev * take(edata["ux"])
        uy = delta_ev * take(edata["uy"])
        uz = delta_ev * take(edata["uz"])
        u2 = ux**2 + uy**2 + uz**2
        new = {
            "x": take(edata["x"]), "y": take(edata["y"]),
            "w": take(edata["w"]),
            "ux": ux, "uy": uy, "uz": uz,
            "inv_gamma": jnp.where(u2 > 0, 1.0 / jnp.sqrt(
                jnp.maximum(u2, 1e-30)), 1.0),
        }
        if ndim == 3:
            new["z"] = take(edata["z"])
        pdata, palive, pnext, lost = insert_local(pdata, palive, pnext, new,
                                                  n_ev)

        # photon recoil (reference qed/cpu.py:308-330)
        edata = dict(edata)
        fac = jnp.where(ev, 1.0 - edata["delta"], 1.0)
        edata["ux"] = edata["ux"] * fac
        edata["uy"] = edata["uy"] * fac
        edata["uz"] = edata["uz"] * fac
        edata["inv_gamma"] = 1.0 / jnp.sqrt(
            1.0 + edata["ux"]**2 + edata["uy"]**2 + edata["uz"]**2)
        edata["event"] = jnp.zeros_like(edata["event"])
        return edata, ealive, pdata, palive, pnext, pover + lost


class NonlinearPairProductionLCFA:
    """Breit-Wheeler pair production (reference pair_production.py:110-277)."""

    creates_particles = True

    def __init__(self, ispec: int, electron_ispec: int, positron_ispec: int,
                 buf: int, dtype=jnp.float32, sample_mode: Optional[str] = None):
        self.ispec = ispec                 # photon species
        self.electron_ispec = electron_ispec
        self.positron_ispec = positron_ispec
        self.buf = buf
        self.tables = _make_tables("pair", dtype)
        self.sample_mode = _resolve_sample_mode(sample_mode)

    def update_chi_and_events(self, data, alive, key, dt):
        data = dict(data)
        chi = calculate_chi(
            data["ex_part"], data["ey_part"], data["ez_part"],
            data["bx_part"], data["by_part"], data["bz_part"],
            data["ux"], data["uy"], data["uz"], data["inv_gamma"])
        data["chi"] = jnp.where(alive, chi, 0.0)
        keys = jax.random.split(jax.random.fold_in(key, 202), 3)
        tau, event, delta = _update_tau(
            data["tau"], data["inv_gamma"], data["chi"], alive, dt, keys,
            self.tables, strict_less=False, sample_mode=self.sample_mode)
        data["tau"] = tau
        data["event"] = event.astype(data["tau"].dtype)
        data["delta"] = delta
        return data, alive

    # -- elementwise creation pieces (tiled path) -------------------------
    def pair_newborns(self, phdata, ndim: int):
        """(electron, positron) newborn values at photon slots (same
        formulas as creation_local below / reference inline.py:120-192)."""
        delta = phdata["delta"]
        base = {"x": phdata["x"], "y": phdata["y"], "w": phdata["w"]}
        if ndim == 3:
            base["z"] = phdata["z"]

        def child(frac):
            ux = frac * phdata["ux"]
            uy = frac * phdata["uy"]
            uz = frac * phdata["uz"]
            return dict(base, ux=ux, uy=uy, uz=uz,
                        inv_gamma=1.0 / jnp.sqrt(1 + ux**2 + uy**2 + uz**2))

        return child(delta), child(1.0 - delta)

    def remove_parents(self, phdata, phalive, ev):
        """Converted photons are removed (reference cpu.py:335-347)."""
        phdata = dict(phdata)
        phalive = phalive & ~ev
        phdata["w"] = jnp.where(phalive, phdata["w"], 0.0)
        phdata["event"] = jnp.zeros_like(phdata["event"])
        return phdata, phalive

    def creation_local(self, phdata, phalive,
                       edata, ealive, enext, eover,
                       pdata, palive, pnext, pover, ndim: int):
        """Create e-/e+ pairs from photon events, then remove the photons
        (reference inline.py:120-192, cpu.py:335-347)."""
        from ..parallel.inject import insert_local

        cap_ph = phalive.shape[0]
        ev = phalive & (phdata["event"] > 0)
        n_ev = jnp.sum(ev)
        # buffer = child capacity so no event silently converts without
        # children (see NonlinearComptonLCFA.creation_local)
        k_buf = min(ealive.shape[0], palive.shape[0])
        idx = jnp.nonzero(ev, size=k_buf, fill_value=cap_ph)[0]
        excess = jnp.maximum(n_ev - k_buf, 0)
        eover = eover + excess.astype(eover.dtype)
        pover = pover + excess.astype(pover.dtype)

        def take(a):
            return jnp.take(a, idx, mode="fill", fill_value=0)

        delta_ev = take(phdata["delta"])
        base = {"x": take(phdata["x"]), "y": take(phdata["y"]),
                "w": take(phdata["w"])}
        if ndim == 3:
            base["z"] = take(phdata["z"])
        upx, upy, upz = (take(phdata["ux"]), take(phdata["uy"]),
                         take(phdata["uz"]))

        def child(frac):
            ux, uy, uz = frac * upx, frac * upy, frac * upz
            return dict(base, ux=ux, uy=uy, uz=uz,
                        inv_gamma=1.0 / jnp.sqrt(1 + ux**2 + uy**2 + uz**2))

        edata, ealive, enext, lost_e = insert_local(
            edata, ealive, enext, child(delta_ev), n_ev)
        pdata, palive, pnext, lost_p = insert_local(
            pdata, palive, pnext, child(1.0 - delta_ev), n_ev)

        # remove converted photons
        phdata = dict(phdata)
        phalive = phalive & ~ev
        phdata["w"] = jnp.where(phalive, phdata["w"], 0.0)
        phdata["event"] = jnp.zeros_like(phdata["event"])
        return (phdata, phalive, edata, ealive, enext,
                eover + lost_e, pdata, palive, pnext, pover + lost_p)
