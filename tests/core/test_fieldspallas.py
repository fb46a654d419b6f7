"""Fused Pallas fields half-step parity vs the XLA Maxwell+CPML ops.

The kernel (ops/fieldspallas.py) applies kappa in correction form and
fuses the psi recursion, so results differ from ops/maxwell.py only by
fp reassociation — asserted to 1e-11 relative in f64 (interpret mode on
CPU) at the op level, and 1e-9 relative over a full laser+plasma run.

Reference behavior anchor: core/maxwell/cpu.py:8-158 +
core/boundary/cpml.py:342-729.
"""
import os

import numpy as np
import pytest

from lambdapic_tpu.core.species import _ALL_SPECIES


@pytest.fixture(autouse=True)
def clear_species_registry():
    _ALL_SPECIES.clear()
    yield
    _ALL_SPECIES.clear()


um = 1e-6
l0 = 0.8 * um
nc = 1.742e27


def _seed_fields(grid, cpml, dtype, rng):
    import jax.numpy as jnp

    from lambdapic_tpu.core.state import zeros_fields

    f = zeros_fields(grid, dtype=dtype, with_pml=True, cpml=cpml)
    upd = {nm: jnp.asarray(rng.normal(size=grid.shape) * 1e7, dtype)
           for nm in ("ex", "ey", "ez", "bx", "by", "bz")}
    upd.update({nm: jnp.asarray(rng.normal(size=grid.shape) * 1e3, dtype)
                for nm in ("jx", "jy", "jz")})
    psi = {k: jnp.asarray(rng.normal(size=v.shape) * 1e5, dtype)
           for k, v in f.psi.items()}
    return f.replace(psi=psi, **upd)


def _mk_grid(ndim, periodic_y=False):
    from lambdapic_tpu.core.grid import Grid

    bc = [("xmin", "pml"), ("xmax", "pml")]
    yk = "periodic" if periodic_y else "pml"
    bc += [("ymin", yk), ("ymax", yk)]
    kw = {}
    if ndim == 3:
        bc += [("zmin", "pml"), ("zmax", "pml")]
        kw = dict(nz=24, dz=5e-8, npatch_z=1)
    return Grid(dimension=ndim, nx=48, ny=32, dx=5e-8, dy=5e-8,
                npatch_x=1, npatch_y=1, n_guard=2, cpml_thickness=5,
                boundary_conditions=tuple(bc), **kw)


@pytest.mark.parametrize("ndim,periodic_y", [(2, False), (2, True),
                                             (3, False)])
def test_op_level_parity(ndim, periodic_y):
    import jax.numpy as jnp

    from lambdapic_tpu.ops.cpml import CPMLParams, build_cpml
    from lambdapic_tpu.ops.fieldspallas import (fields_pallas_ok,
                                                update_bfield_pl,
                                                update_efield_pl)
    from lambdapic_tpu.ops.maxwell import update_bfield, update_efield

    grid = _mk_grid(ndim, periodic_y)
    dt = 1e-16
    cpml = build_cpml(grid, dt, CPMLParams(thickness=5))
    rng = np.random.default_rng(7)
    f0 = _seed_fields(grid, cpml, jnp.float64, rng)
    assert fields_pallas_ok(f0, grid, cpml)

    fa = fb = f0
    for _ in range(5):
        fa = update_efield(fa, grid, dt, cpml)
        fa = update_bfield(fa, grid, dt, cpml)
        fb = update_efield_pl(fb, grid, dt, cpml)
        fb = update_bfield_pl(fb, grid, dt, cpml)

    for nm in ("ex", "ey", "ez", "bx", "by", "bz"):
        a, b = np.asarray(getattr(fa, nm)), np.asarray(getattr(fb, nm))
        scale = np.abs(a).max() + 1e-30
        np.testing.assert_allclose(b, a, atol=1e-11 * scale, rtol=0,
                                   err_msg=nm)
    for k in fa.psi:
        a, b = np.asarray(fa.psi[k]), np.asarray(fb.psi[k])
        scale = np.abs(a).max() + 1e-30
        np.testing.assert_allclose(b, a, atol=1e-11 * scale, rtol=0,
                                   err_msg=k)


def test_all_periodic_no_cpml():
    """Pure Yee path (cpml=None, fully periodic): the kernel must agree
    with the XLA ops and carry an empty psi dict through."""
    import jax.numpy as jnp

    from lambdapic_tpu.core.grid import Grid
    from lambdapic_tpu.core.state import zeros_fields
    from lambdapic_tpu.ops.fieldspallas import (update_bfield_pl,
                                                update_efield_pl)
    from lambdapic_tpu.ops.maxwell import update_bfield, update_efield

    bc = tuple((k + s, "periodic") for k in "xy" for s in ("min", "max"))
    grid = Grid(dimension=2, nx=48, ny=32, dx=5e-8, dy=5e-8, npatch_x=1,
                npatch_y=1, n_guard=2, cpml_thickness=0,
                boundary_conditions=bc)
    rng = np.random.default_rng(3)
    f = zeros_fields(grid, dtype=jnp.float64, with_pml=False)
    f = f.replace(**{nm: jnp.asarray(rng.normal(size=grid.shape) * 1e7)
                     for nm in ("ex", "ey", "ez", "bx", "by", "bz")})
    dt = 1e-16
    fa = update_bfield(update_efield(f, grid, dt, None), grid, dt, None)
    fb = update_bfield_pl(update_efield_pl(f, grid, dt, None),
                          grid, dt, None)
    for nm in ("ex", "ey", "ez", "bx", "by", "bz"):
        a, b = np.asarray(getattr(fa, nm)), np.asarray(getattr(fb, nm))
        scale = np.abs(a).max() + 1e-30
        np.testing.assert_allclose(b, a, atol=1e-12 * scale, rtol=0,
                                   err_msg=nm)


def _run_sim(pallas: bool, monkeypatch, nsteps=10):
    from lambdapic_tpu import Electron, Simulation, SimpleLaser2D

    monkeypatch.setenv("LAMBDAPIC_FIELDS_PALLAS", "1" if pallas else "0")
    _ALL_SPECIES.clear()
    dx = l0 / 16
    Lx = 48 * dx

    def density(x, y):
        return np.where(x > Lx / 2, 2 * nc, 0.0)

    ele = Electron(density=density, ppc=2)
    sim = Simulation(nx=48, ny=32, dx=dx, dy=dx, npatch_x=1, npatch_y=1,
                     precision="double", random_seed=3, tiling="cell",
                     cpml_thickness=6)
    sim.add_species([ele])
    sim.initialize()
    sim.run(nsteps=nsteps,
            callbacks=[SimpleLaser2D(a0=5, w0=3 * um, ctau=3 * um)])
    return {nm: sim.get_field(nm)
            for nm in ("ex", "ey", "ez", "bx", "by", "bz", "rho")}


def test_full_sim_parity(monkeypatch):
    ref = _run_sim(False, monkeypatch)
    new = _run_sim(True, monkeypatch)
    for nm in ref:
        scale = np.abs(ref[nm]).max() + 1e-30
        np.testing.assert_allclose(new[nm], ref[nm], atol=1e-9 * scale,
                                   rtol=0, err_msg=nm)
