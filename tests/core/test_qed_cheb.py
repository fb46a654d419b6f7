"""The Chebyshev QED surrogates (gather-free TPU hot path) must match the
reference-faithful table interpolation/bisection to fit accuracy."""
import numpy as np
import jax.numpy as jnp

from lambdapic_tpu.models.qed import (_make_tables, _sample_delta,
                                      _sample_delta_table, _total_rate,
                                      _total_rate_table)


def test_rate_surrogate_matches_table():
    rng = np.random.default_rng(0)
    for kind in ("photon", "pair"):
        tb = _make_tables(kind, jnp.float64)
        chi = jnp.asarray(10.0 ** rng.uniform(tb.rate_c0 + 0.02, 1.98,
                                              20000))
        r_t = np.asarray(_total_rate_table(chi, tb))
        r_c = np.asarray(_total_rate(chi, tb))
        # table does linear interp between log-grid nodes, the surrogate
        # is smooth: agreement limited by the table's own discretization
        rel = np.abs(r_c - r_t) / np.maximum(r_t, 1e-280)
        assert np.median(rel) < 2e-3, (kind, np.median(rel))
        # restrict the max check to dynamically relevant rates: near the
        # pair threshold the rate falls ~12 decades per table row (and is
        # ~0 physically), so relative error there is meaningless
        active = r_t > r_t.max() * 1e-8
        assert rel[active].max() < 5e-2, (kind, rel[active].max())


def test_sample_surrogate_matches_table():
    rng = np.random.default_rng(1)
    for kind, tol in (("photon", 2e-3), ("pair", 5e-3)):
        tb = _make_tables(kind, jnp.float64)
        chi = jnp.asarray(10.0 ** rng.uniform(tb.inv_c0 + 0.05, 1.95,
                                              20000))
        r = jnp.asarray(rng.uniform(0.02, 0.98, 20000))
        d_t = np.asarray(_sample_delta_table(chi, r, tb))
        d_c = np.asarray(_sample_delta(chi, r, tb))
        # compare in delta space (both in (0, 1])
        err = np.abs(d_c - d_t)
        assert np.median(err) < tol, (kind, np.median(err))
        assert np.quantile(err, 0.99) < 10 * tol, (kind,)


def test_sample_mode_switch():
    """The process classes expose a real sample_mode switch: 'table' routes
    _update_tau through the reference-exact interpolation/bisection path
    (ADVICE r1; reference optical_depth.py:36-130)."""
    import jax
    from lambdapic_tpu.models.qed import (NonlinearComptonLCFA, _Tables,
                                          _update_tau)
    import pytest

    proc_c = NonlinearComptonLCFA(0, 1, 8, jnp.float64)
    assert proc_c.sample_mode == "chebyshev"
    proc_t = NonlinearComptonLCFA(0, 1, 8, jnp.float64, sample_mode="table")
    assert proc_t.sample_mode == "table"
    with pytest.raises(ValueError):
        NonlinearComptonLCFA(0, 1, 8, jnp.float64, sample_mode="exacct")

    # both modes produce statistically matching event rates
    tb = proc_c.tables
    n = 20000
    rng = np.random.default_rng(2)
    chi = jnp.asarray(np.full(n, 1.0))
    tau = jnp.zeros(n)
    ig = jnp.asarray(np.full(n, 1e-3))
    alive = jnp.ones(n, bool)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    dt = 1e-17
    _, ev_c, d_c = _update_tau(tau, ig, chi, alive, dt, keys, tb,
                               strict_less=True, sample_mode="chebyshev")
    _, ev_t, d_t = _update_tau(tau, ig, chi, alive, dt, keys, tb,
                               strict_less=True, sample_mode="table")
    rc, rt = float(jnp.mean(ev_c)), float(jnp.mean(ev_t))
    assert rc > 0.01 and rt > 0.01
    assert abs(rc - rt) / rt < 0.05
    # identical RNG stream: events nearly coincide, deltas closely agree
    both = np.asarray(ev_c & ev_t)
    np.testing.assert_allclose(np.asarray(d_c)[both], np.asarray(d_t)[both],
                               atol=5e-3)
