"""Boris / photon pusher tests (reference tests/core/pusher analogs)."""
import math

import jax.numpy as jnp
import numpy as np

from lambdapic_tpu.constants import c, e as qe, m_e
from lambdapic_tpu.ops.pusher import boris_push, photon_push, push_position_2d


def test_boris_magnetic_rotation():
    """Pure B field: |u| conserved, rotation angle = 2 atan(qB dt / 2 m gamma)."""
    n = 4
    z = jnp.zeros(n)
    b0 = 100.0
    dt = 1e-13
    ux, uy, uz, ig = boris_push(jnp.full(n, 3.0), z, z,
                                z, z, z, z, z, jnp.full(n, b0),
                                -qe, m_e, dt)
    u_mag = np.sqrt(np.asarray(ux)**2 + np.asarray(uy)**2 + np.asarray(uz)**2)
    np.testing.assert_allclose(u_mag, 3.0, rtol=1e-12)
    gamma = math.sqrt(1 + 9)
    t = qe * b0 * dt / (2 * m_e * gamma)
    expected = 2 * math.atan(t)
    angle = math.atan2(float(-uy[0]), float(ux[0]))
    np.testing.assert_allclose(abs(angle), expected, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ig), 1 / gamma, rtol=1e-12)


def test_boris_electric_acceleration():
    """Pure E field: du = qE dt / (m c)."""
    n = 3
    z = jnp.zeros(n)
    e0 = 1e12
    dt = 1e-16
    ux, uy, uz, ig = boris_push(z, z, z, jnp.full(n, e0), z, z, z, z, z,
                                -qe, m_e, dt)
    expected = -qe * e0 * dt / (m_e * c)
    np.testing.assert_allclose(np.asarray(ux), expected, rtol=1e-12)


def test_photon_push():
    ig = photon_push(jnp.asarray([3.0, 0.0]), jnp.asarray([4.0, 0.0]),
                     jnp.asarray([0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(ig), [0.2, 1.0], rtol=1e-12)


def test_position_push():
    x = jnp.asarray([0.0])
    y = jnp.asarray([1.0])
    ux = jnp.asarray([1.0])
    uy = jnp.asarray([-2.0])
    ig = jnp.asarray([0.5])
    xn, yn = push_position_2d(x, y, ux, uy, ig, 0.1, 0.2)
    np.testing.assert_allclose(float(xn[0]), 0.05, rtol=1e-12)
    np.testing.assert_allclose(float(yn[0]), 1.0 - 0.2, rtol=1e-12)
