"""Per-cell Debye length physical correctness (reference
tests/test_debye_length.py:164 analog): a thermal plasma's computed
1/lambda_D^2 matches eps0 kT / (n e^2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lambdapic_tpu.constants import c, e as qe, epsilon_0, m_e
from lambdapic_tpu.core.grid import Grid
from lambdapic_tpu.core.species import _ALL_SPECIES
from lambdapic_tpu.models.collision import (Collision, CollisionConfig,
                                            CollisionPairCfg)


@pytest.fixture(autouse=True)
def clear_species_registry():
    _ALL_SPECIES.clear()
    yield
    _ALL_SPECIES.clear()


def test_debye_length_thermal_plasma():
    nx = ny = 4
    grid = Grid(dimension=2, nx=nx, ny=ny, dx=1e-6, dy=1e-6,
                npatch_x=1, npatch_y=1, n_guard=3, cpml_thickness=6,
                boundary_conditions=(("xmin", "periodic"),
                                     ("xmax", "periodic"),
                                     ("ymin", "periodic"),
                                     ("ymax", "periodic")))
    cell_vol = 1e-12 * 1e-6  # reference uses dx*dy in 2D; pick dx*dy here
    cell_vol = 1e-12
    cfg = CollisionConfig(pairs=(CollisionPairCfg(0, 0),),
                          species_mq=((m_e, -qe),),
                          cell_vol=cell_vol, lnLambda=0.0)
    col = Collision(cfg, grid)

    # non-relativistic maxwellian: <u^2> = 3 theta, T = theta m c^2
    n_per_cell = 2000
    ntot = n_per_cell * nx * ny
    theta = 2e-5          # ~10 eV
    rng = np.random.default_rng(0)
    u = rng.normal(scale=np.sqrt(theta), size=(3, ntot))
    x = rng.uniform(-0.5, nx - 0.5, ntot)
    y = rng.uniform(-0.5, ny - 0.5, ntot)
    w_each = 1e9
    data = {"x": jnp.asarray(x), "y": jnp.asarray(y),
            "w": jnp.full(ntot, w_each),
            "ux": jnp.asarray(u[0]), "uy": jnp.asarray(u[1]),
            "uz": jnp.asarray(u[2]),
            "inv_gamma": jnp.asarray(1 / np.sqrt(1 + (u**2).sum(0)))}
    alive = jnp.ones(ntot, bool)

    key = jax.random.fold_in(jax.random.PRNGKey(0), 1000)
    perm, cell_s, starts, counts = col._sorted_view(data, alive, key)
    inv_d2 = np.asarray(col._debye_field(
        {0: (perm, cell_s, starts, counts, data, alive)}, nx * ny))

    dens = n_per_cell * w_each / cell_vol
    kT = theta * m_e * c**2
    expected = dens * qe**2 / (epsilon_0 * kT)
    # per-cell sampling noise ~ 1/sqrt(n_per_cell)
    np.testing.assert_allclose(inv_d2, expected, rtol=0.15)
