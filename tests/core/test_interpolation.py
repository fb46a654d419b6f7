"""Field gather tests (reference tests/core/interpolation analogs)."""
import jax.numpy as jnp
import numpy as np

from lambdapic_tpu.ops.interpolation import gather_eb_2d, gather_eb_3d, shape3


def test_shape3_partition_of_unity():
    d = np.linspace(-0.5, 0.5, 41)
    s = np.asarray(shape3(jnp.asarray(d)))
    np.testing.assert_allclose(s.sum(axis=-1), 1.0, atol=1e-14)


def test_gather_2d_linear_exact():
    """Quadratic shapes reproduce linear fields exactly at the particle
    position, respecting Yee staggering (reference interpolation/cpu2d.c
    staggering :62-68)."""
    nx, ny, g = 16, 12, 3
    rng = np.random.default_rng(3)
    x = rng.uniform(-0.49, nx - 0.51, 300)
    y = rng.uniform(-0.49, ny - 0.51, 300)
    X, Y = np.meshgrid(np.arange(nx + 2 * g) - g, np.arange(ny + 2 * g) - g,
                       indexing="ij")
    f = lambda xs, ys: 2.0 * xs + 3.0 * ys + 1.0
    ex = f(X + 0.5, Y)
    ey = f(X, Y + 0.5)
    ez = f(X, Y)
    bx = f(X, Y + 0.5)
    by = f(X + 0.5, Y)
    bz = f(X + 0.5, Y + 0.5)
    out = gather_eb_2d(*[jnp.asarray(a) for a in (ex, ey, ez, bx, by, bz)],
                       jnp.asarray(x), jnp.asarray(y), g)
    for o in out:
        np.testing.assert_allclose(np.asarray(o), f(x, y), rtol=1e-12)


def test_gather_3d_linear_exact():
    nx, ny, nz, g = 10, 8, 6, 3
    rng = np.random.default_rng(4)
    n = 200
    x = rng.uniform(-0.49, nx - 0.51, n)
    y = rng.uniform(-0.49, ny - 0.51, n)
    z = rng.uniform(-0.49, nz - 0.51, n)
    X, Y, Z = np.meshgrid(np.arange(nx + 2 * g) - g,
                          np.arange(ny + 2 * g) - g,
                          np.arange(nz + 2 * g) - g, indexing="ij")
    f = lambda xs, ys, zs: 2.0 * xs + 3.0 * ys - 1.5 * zs + 1.0
    ex = f(X + 0.5, Y, Z)
    ey = f(X, Y + 0.5, Z)
    ez = f(X, Y, Z + 0.5)
    bx = f(X, Y + 0.5, Z + 0.5)
    by = f(X + 0.5, Y, Z + 0.5)
    bz = f(X + 0.5, Y + 0.5, Z)
    out = gather_eb_3d(*[jnp.asarray(a) for a in (ex, ey, ez, bx, by, bz)],
                       jnp.asarray(x), jnp.asarray(y), jnp.asarray(z), g)
    for o in out:
        np.testing.assert_allclose(np.asarray(o), f(x, y, z), rtol=1e-12)
