"""QED optical-depth table generation.

Host-side port of the reference table generator
(core/qed/optical_depth_tables.py:111-222): LCFA nonlinear Compton photon
emission and Breit-Wheeler pair production differential probability rates
from Airy-function integrals, tabulated on a 256(chi) x 1024(delta) log-log
grid with the same .npz schema, so tables are interchangeable with the
reference's.

Rates (reference optical_depth_tables.py:124-144):
    dP_photon/d(delta) = -(alpha m c^2 / hbar) [IntAi(z) + (2/z + chi_g sqrt(z)) Ai'(z)],
        z = (chi_g / (chi_e chi_e'))^(2/3), chi_g = delta chi_e
    dP_pair/d(delta)   = +(alpha m c^2 / hbar) [IntAi(z) + (2/z - chi_g sqrt(z)) Ai'(z)],
        z with chi_e = delta chi_g.
"""
from __future__ import annotations

import os
from pathlib import Path

import numpy as np
from scipy.constants import alpha, c, hbar, m_e
from scipy.integrate import quad
from scipy.special import airy

TABLE_PATH = Path(__file__).with_name("optical_depth_tables.npz")
SIGMOID_TABLE_PATH = Path(__file__).with_name(
    "optical_depth_tables_sigmoid.npz")


def _int_Ai(z):
    return quad(lambda t: airy(t)[0], z, np.inf)[0]


def _photon_rate(chi_e):
    factor = -alpha * m_e * c**2 / hbar

    def prob(delta):
        if delta == 1.0 or delta == 0.0:
            return 0.0
        chi_g = delta * chi_e
        chi_ep = chi_e - chi_g
        z = (chi_g / chi_e / chi_ep) ** (2.0 / 3.0)
        return factor * (_int_Ai(z) + (2.0 / z + chi_g * np.sqrt(z))
                         * airy(z)[1])

    return prob


def _pair_rate(chi_g):
    factor = alpha * m_e * c**2 / hbar

    def prob(delta):
        if delta == 1.0 or delta == 0.0:
            return 0.0
        chi_e = delta * chi_g
        chi_ep = chi_g - chi_e
        z = (chi_g / chi_e / chi_ep) ** (2.0 / 3.0)
        return factor * (_int_Ai(z) + (2.0 / z - chi_g * np.sqrt(z))
                         * airy(z)[1])

    return prob


def _total(args):
    kind, chi = args
    P = _photon_rate(chi) if kind == "photon" else _pair_rate(chi)
    return quad(P, 0, 1)[0]


def _cumulative(args):
    """Cumulative integral along the log-delta grid (reference
    optical_depth_tables.py:156-174 — left-point rule on the log grid,
    reproduced exactly for table parity)."""
    kind, chi, delta_N, log_delta_min = args
    P = _photon_rate(chi) if kind == "photon" else _pair_rate(chi)
    delta = np.logspace(log_delta_min, 0, delta_N)
    integ = np.zeros(delta_N)
    integ[0] = quad(P, 0, delta[0])[0]
    for i in range(1, delta_N):
        integ[i] = integ[i - 1] + P(delta[i]) * (delta[i] - delta[i - 1])
    return integ


def sigmoid_delta_grid(delta_N: int, delta_min: float) -> np.ndarray:
    """The sigmoid-warped delta grid (reference
    optical_depth_tables_sigmoid.py:172-177): resolution concentrated at
    both delta -> 0 (soft photons) and delta -> 1 (near-total energy
    transfer), where the log grid only resolves the former."""
    A = np.log(1 / delta_min - 1)
    return 1.0 / (1.0 + np.exp(-A * np.linspace(-1, 1, delta_N)))


def _cumulative_sigmoid(args):
    """Cumulative integral along the sigmoid-warped delta grid (reference
    optical_depth_tables_sigmoid.py:168-193 — same left-point rule)."""
    kind, chi, delta_N, delta_min = args
    P = _photon_rate(chi) if kind == "photon" else _pair_rate(chi)
    delta = sigmoid_delta_grid(delta_N, delta_min)
    integ = np.zeros(delta_N)
    integ[0] = quad(P, 0, delta[0])[0]
    for i in range(1, delta_N):
        integ[i] = integ[i - 1] + P(delta[i]) * (delta[i] - delta[i - 1])
    return integ


def table_gen(out_path: Path = TABLE_PATH, chi_N: int = 256,
              log_chi_min: float = -3.0, log_chi_max: float = 2.0,
              delta_N: int = 1024, log_delta_min: float = -3.0,
              processes: int | None = None):
    import multiprocessing

    chi = np.logspace(log_chi_min, log_chi_max, chi_N)
    with multiprocessing.Pool(processes) as pool:
        photon_total = np.array(pool.map(_total, [("photon", x) for x in chi]))
        pair_total = np.array(pool.map(_total, [("pair", x) for x in chi]))
        photon_cum = np.array(pool.map(
            _cumulative, [("photon", x, delta_N, log_delta_min) for x in chi]))
        pair_cum = np.array(pool.map(
            _cumulative, [("pair", x, delta_N, log_delta_min) for x in chi]))

    np.savez(
        out_path,
        photon_prob_rate_total=photon_total,
        pair_prob_rate_total=pair_total,
        integral_photon_prob_along_delta=photon_cum,
        integral_pair_prob_along_delta=pair_cum,
        chi_N=chi_N,
        log_chi_range=(log_chi_min, log_chi_max),
        log_chi_delta=(log_chi_max - log_chi_min) / (chi_N - 1),
        delta_N=delta_N,
        log_delta_range=(log_delta_min, 0),
        log_delta_delta=(0 - log_delta_min) / (delta_N - 1),
    )
    return out_path


def sigmoid_table_gen(out_path: Path = SIGMOID_TABLE_PATH, chi_N: int = 128,
                      log_chi_min: float = -3.0, log_chi_max: float = 2.0,
                      delta_N: int = 128, delta_min: float = 1.5e-4,
                      processes: int | None = None):
    """Sigmoid-warped sampling table variant (reference
    optical_depth_tables_sigmoid.py:208-242, selected at runtime with
    LAMBDAPIC_USE_SIGMOID_SAMPLING=1): same physics, delta grid warped by
    a sigmoid instead of log-spaced. Schema matches the reference's npz."""
    import multiprocessing

    chi = np.logspace(log_chi_min, log_chi_max, chi_N)
    with multiprocessing.Pool(processes) as pool:
        photon_total = np.array(pool.map(_total, [("photon", x) for x in chi]))
        pair_total = np.array(pool.map(_total, [("pair", x) for x in chi]))
        photon_cum = np.array(pool.map(
            _cumulative_sigmoid,
            [("photon", x, delta_N, delta_min) for x in chi]))
        pair_cum = np.array(pool.map(
            _cumulative_sigmoid,
            [("pair", x, delta_N, delta_min) for x in chi]))

    np.savez(
        out_path,
        photon_prob_rate_total=photon_total,
        pair_prob_rate_total=pair_total,
        integral_photon_prob_along_delta=photon_cum,
        integral_pair_prob_along_delta=pair_cum,
        chi_N=chi_N,
        log_chi_range=(log_chi_min, log_chi_max),
        log_chi_delta=(log_chi_max - log_chi_min) / (chi_N - 1),
        delta_N=delta_N,
        delta_range=(delta_min, 1 - delta_min),
        A=np.log(1 / delta_min - 1),
    )
    return out_path


_cache: dict = {}


def use_sigmoid_tables() -> bool:
    """Reference env switch (optical_depth.py:8-32)."""
    return os.environ.get("LAMBDAPIC_USE_SIGMOID_SAMPLING") == "1"


def load_tables(variant: str | None = None):
    """Load (and lazily generate) the optical-depth tables as numpy arrays.
    variant: 'log' (default) or 'sigmoid'; None reads
    LAMBDAPIC_USE_SIGMOID_SAMPLING."""
    if variant is None:
        variant = "sigmoid" if use_sigmoid_tables() else "log"
    if variant not in _cache:
        path = SIGMOID_TABLE_PATH if variant == "sigmoid" else TABLE_PATH
        if not path.exists():
            import warnings
            warnings.warn("QED tables missing; generating (takes minutes)")
            (sigmoid_table_gen if variant == "sigmoid" else table_gen)()
        f = np.load(path)
        _cache[variant] = {k: f[k] for k in f.files}
    return _cache[variant]


if __name__ == "__main__":
    import sys
    if "--sigmoid" in sys.argv:
        print(f"generating sigmoid QED tables -> {SIGMOID_TABLE_PATH}")
        sigmoid_table_gen()
    else:
        print(f"generating QED tables -> {TABLE_PATH}")
        table_gen()
    print("done")
