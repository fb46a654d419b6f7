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
