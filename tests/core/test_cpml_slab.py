"""Slab-restricted CPML psi storage parity.

The psi recursion is exactly zero outside the PML slabs (c=0, b=1 there),
so storing psi slab-only (ops/cpml.py::psi_regions) is mathematically
equivalent to the full-size arrays — the raw update ops are bitwise
identical (verified un-jitted), but inside jit the two program shapes may
fuse multiply-adds into FMAs differently, so full-simulation parity is
asserted to 1e-9 relative (ulp-level differences amplified over steps).
Tests cover 2D and 3D laser+plasma steps, a mesh split along the PML
axis, and a moving-window run (where psi_*_x is inert after PML removal).

Reference behavior anchor: core/boundary/cpml.py:135-230 stores psi on
per-face slabs of exactly pml thickness — the full-size variant was this
rebuild's SPMD-uniform simplification; the slab variant restores the
reference's storage footprint.
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


def _run(slab: bool, monkeypatch, ndim=2, nsteps=8, window=False):
    from lambdapic_tpu import (Electron, MovingWindow, Simulation,
                               Simulation3D, SimpleLaser2D, SimpleLaser3D)
    from lambdapic_tpu.constants import c

    monkeypatch.setenv("LAMBDAPIC_CPML_SLAB", "1" if slab else "0")
    _ALL_SPECIES.clear()
    dx = l0 / 16
    cbs = []
    if ndim == 2:
        Lx = 48 * dx

        def density(x, y):
            return np.where(x > Lx / 2, 2 * nc, 0.0)

        ele = Electron(density=density, ppc=2)
        sim = Simulation(nx=48, ny=32, dx=dx, dy=dx, npatch_x=2,
                         npatch_y=2, precision="double", random_seed=3,
                         tiling="cell", cpml_thickness=6)
        sim.add_species([ele])
        cbs = [SimpleLaser2D(a0=5, w0=3 * um, ctau=3 * um)]
        if window:
            cbs.append(MovingWindow(velocity=c, start_time=4 * dx / c))
    else:
        Lx = 24 * dx

        def density(x, y, z):
            return np.where(x > Lx / 2, 2 * nc, 0.0)

        ele = Electron(density=density, ppc=2)
        sim = Simulation3D(nx=24, ny=16, nz=16, dx=dx, dy=dx, dz=dx,
                           npatch_x=2, npatch_y=1, npatch_z=1,
                           precision="double", random_seed=3,
                           tiling="cell", cpml_thickness=5)
        sim.add_species([ele])
        cbs = [SimpleLaser3D(a0=5, w0=3 * um, ctau=3 * um)]
    sim.initialize()
    sim.run(nsteps=nsteps, callbacks=cbs)
    fields = {nm: sim.get_field(nm)
              for nm in ("ex", "ey", "ez", "bx", "by", "bz", "rho")}
    psi_shapes = {k: v.shape for k, v in sim.state.fields.psi.items()}
    return fields, psi_shapes


def test_psi_regions_cover_nonzero_rows():
    from lambdapic_tpu.ops.cpml import CPMLParams, _face_profiles, psi_regions

    n, t = 64, 6
    ke, be, ce, kb, bb, cb = _face_profiles(n, 1e-7, 1e-16,
                                            CPMLParams(thickness=t),
                                            lo=True, hi=True)
    prof = dict(kappa_e=ke, b_e=be, c_e=ce, kappa_b=kb, b_b=bb, c_b=cb)
    regions = psi_regions(prof)
    covered = np.zeros(n, bool)
    for s, w in regions:
        covered[s:s + w] = True
    nz = (ce != 0) | (cb != 0)
    assert (covered >= nz).all()
    # lo slab [0, t); hi slab includes the B rows shifted one inward
    assert covered[:t].all()
    assert covered[n - t - 1:].all()
    assert not covered[t:n - t - 1].any()


@pytest.mark.parametrize("ndim", [2, 3])
def test_slab_psi_bitwise_parity(monkeypatch, ndim):
    nsteps = 8 if ndim == 2 else 5
    full, shapes_full = _run(False, monkeypatch, ndim=ndim, nsteps=nsteps)
    slab, shapes_slab = _run(True, monkeypatch, ndim=ndim, nsteps=nsteps)
    # slab arrays actually are smaller along their axis
    for k, shp in shapes_slab.items():
        ax = "xyz".index(k[-1])
        assert shp[ax] < shapes_full[k][ax], (k, shp)
    for name in full:
        scale = np.abs(full[name]).max() + 1e-30
        np.testing.assert_allclose(slab[name], full[name],
                                   atol=1e-9 * scale, rtol=0,
                                   err_msg=f"slab-psi parity: {name}")


def test_slab_psi_unjitted_bitwise():
    """Outside jit (no cross-op fusion), the slab update is bitwise equal
    to the full-array update over repeated E/B half steps."""
    import jax.numpy as jnp

    from lambdapic_tpu.core.grid import Grid
    from lambdapic_tpu.core.state import zeros_fields
    from lambdapic_tpu.ops.cpml import CPMLParams, build_cpml
    from lambdapic_tpu.ops.maxwell import update_bfield, update_efield

    bc = tuple((k, "pml") for k in ("xmin", "xmax", "ymin", "ymax"))
    grid = Grid(dimension=2, nx=48, ny=32, dx=5e-8, dy=5e-8, npatch_x=1,
                npatch_y=1, n_guard=2, cpml_thickness=6,
                boundary_conditions=bc)
    dt = 1e-16
    cpml = build_cpml(grid, dt, CPMLParams(thickness=6))
    rng = np.random.default_rng(0)
    seed = {nm: rng.normal(size=(48, 32)) * 1e7
            for nm in ("ex", "ey", "ez", "bx", "by", "bz")}

    def run(slab, monkey=os.environ):
        monkey["LAMBDAPIC_CPML_SLAB"] = "1" if slab else "0"
        f = zeros_fields(grid, dtype=jnp.float64, with_pml=True, cpml=cpml)
        f = f.replace(**{k: jnp.asarray(v) for k, v in seed.items()})
        for _ in range(5):
            f = update_efield(f, grid, dt, cpml)
            f = update_bfield(f, grid, dt, cpml)
        return f

    prev = os.environ.get("LAMBDAPIC_CPML_SLAB")
    try:
        f1, f2 = run(False), run(True)
    finally:
        if prev is None:
            os.environ.pop("LAMBDAPIC_CPML_SLAB", None)
        else:
            os.environ["LAMBDAPIC_CPML_SLAB"] = prev
    for nm in ("ex", "ey", "ez", "bx", "by", "bz"):
        np.testing.assert_array_equal(np.asarray(getattr(f1, nm)),
                                      np.asarray(getattr(f2, nm)),
                                      err_msg=nm)


def test_slab_psi_moving_window_parity(monkeypatch):
    full, _ = _run(False, monkeypatch, ndim=2, nsteps=14, window=True)
    slab, _ = _run(True, monkeypatch, ndim=2, nsteps=14, window=True)
    for name in full:
        scale = np.abs(full[name]).max() + 1e-30
        np.testing.assert_allclose(slab[name], full[name],
                                   atol=1e-9 * scale, rtol=0,
                                   err_msg=f"window slab-psi: {name}")
