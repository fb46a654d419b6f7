"""Sigmoid-warped QED sampling-table variant (reference
optical_depth_tables_sigmoid.py, env LAMBDAPIC_USE_SIGMOID_SAMPLING=1):
same physics as the log-grid tables, different delta discretization —
the two variants must agree on total rates and sampled-delta statistics."""
import numpy as np
import pytest

from lambdapic_tpu.models import qed_tables


@pytest.fixture()
def tables():
    log_t = qed_tables.load_tables("log")
    sig_t = qed_tables.load_tables("sigmoid")
    return log_t, sig_t


def test_sigmoid_schema(tables):
    _, sig = tables
    assert "A" in sig and "delta_range" in sig
    A = float(sig["A"])
    dmin = float(sig["delta_range"][0])
    np.testing.assert_allclose(A, np.log(1 / dmin - 1), rtol=1e-12)
    grid = qed_tables.sigmoid_delta_grid(int(sig["delta_N"]), dmin)
    np.testing.assert_allclose(grid[0], dmin, rtol=1e-12)
    np.testing.assert_allclose(grid[-1], 1 - dmin, rtol=1e-12)
    assert (np.diff(grid) > 0).all()


def test_total_rates_match_log_variant(tables):
    """Total rates are grid-independent (plain quad over [0,1])."""
    log_t, sig_t = tables
    for key in ("photon_prob_rate_total", "pair_prob_rate_total"):
        a = np.asarray(log_t[key])
        b = np.asarray(sig_t[key])
        # different chi_N: compare on the coarser grid via interpolation
        chi_a = np.linspace(*[float(v) for v in log_t["log_chi_range"]],
                            a.size)
        chi_b = np.linspace(*[float(v) for v in sig_t["log_chi_range"]],
                            b.size)
        # rates span many decades: interpolate in log-rate space
        ai = 10.0 ** np.interp(chi_b, chi_a, np.log10(np.maximum(a, 1e-300)))
        sel = b > b.max() * 1e-6
        np.testing.assert_allclose(ai[sel], b[sel], rtol=2e-2)


def _load_qed_variants():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import os

    from lambdapic_tpu.models import qed
    tb_log = qed._make_tables("photon", jnp.float64)
    os.environ["LAMBDAPIC_USE_SIGMOID_SAMPLING"] = "1"
    try:
        tb_sig = qed._make_tables("photon", jnp.float64)
    finally:
        del os.environ["LAMBDAPIC_USE_SIGMOID_SAMPLING"]
    return qed, jnp, tb_log, tb_sig


def _oracle_bisect(row, delta_grid, r01, interp_log):
    """Numpy oracle of the reference bisection sampler at a chi grid node
    (optical_depth_tables_sigmoid.py:60-103 / optical_depth_tables.py:57-90):
    r is normalized to the row's own [cdf_min, cdf_max], bisected, then the
    bracketing interval is interpolated (log-delta on the log grid, linear
    delta on the sigmoid grid)."""
    r = r01 * (row[-1] - row[0]) + row[0]
    hi = np.clip(np.searchsorted(row, r, side="left") - 1, 0,
                 row.size - 2)
    frac = (r - row[hi]) / (row[hi + 1] - row[hi])
    d1, d2 = delta_grid[hi], delta_grid[hi + 1]
    if interp_log:
        return 10.0 ** (np.log10(d1) + frac * (np.log10(d2) - np.log10(d1)))
    return d1 + frac * (d2 - d1)


def test_sampler_matches_reference_bisection():
    """_sample_delta_table (vectorized fixed-depth bisection) reproduces
    the reference's per-particle bisection on BOTH grid variants, evaluated
    at chi grid nodes (so chi interpolation is the identity and the
    log-chi vs linear-chi interpolation divergence does not enter)."""
    qed, jnp, tb_log, tb_sig = _load_qed_variants()
    assert tb_log.delta_interp_log and not tb_sig.delta_interp_log
    r01 = np.linspace(0.01, 0.99, 99)
    for tb in (tb_log, tb_sig):
        cum = np.asarray(tb.cumulative)
        dg = np.asarray(tb.delta_grid)
        for node in (40, tb.chi_N // 2, tb.chi_N - 20):
            chi = 10.0 ** (tb.log_chi_min + node * tb.log_chi_delta)
            want = _oracle_bisect(cum[node], dg, r01, tb.delta_interp_log)
            got = np.asarray(qed._sample_delta_table(
                jnp.full(r01.shape, chi, jnp.float64),
                jnp.asarray(r01), tb))
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-12)


def test_variant_statistics_agree():
    """Each variant samples the distribution conditioned on delta > dmin
    of its OWN grid (reference convention, optical_depth_tables_sigmoid.py:
    60-80): compare each sampler's mean energy fraction <delta> against
    the ground-truth conditional mean from quad — log grid is fine
    (1024 pts), the sigmoid grid carries the reference's coarse 128-pt
    right-point quadrature error (~5%). Total rates are grid-independent
    and must agree across variants."""
    from scipy.integrate import quad

    from lambdapic_tpu.models.qed_tables import _photon_rate
    qed, jnp, tb_log, tb_sig = _load_qed_variants()
    r01 = jnp.asarray(np.linspace(0.0005, 0.9995, 2001))
    for chi in (0.05, 0.5, 5.0):
        chi_arr = jnp.full(r01.shape, chi, jnp.float64)
        P = _photon_rate(chi)
        for tb, rtol in ((tb_log, 0.02), (tb_sig, 0.08)):
            dmin = float(tb.delta_grid[0])
            truth = (quad(lambda d: d * P(d), dmin, 1, limit=200)[0]
                     / quad(P, dmin, 1, limit=200)[0])
            mean = float(np.mean(np.asarray(
                qed._sample_delta_table(chi_arr, r01, tb))))
            np.testing.assert_allclose(mean, truth, rtol=rtol)
        rt_log = float(qed._total_rate(jnp.asarray([chi]), tb_log)[0])
        rt_sig = float(qed._total_rate(jnp.asarray([chi]), tb_sig)[0])
        np.testing.assert_allclose(rt_sig, rt_log, rtol=2e-2)
