"""Tiled engine == untiled engine, end-to-end through the Simulation.

The tile-binned MXU path (ops/tiled2d.py) must reproduce the
reference-faithful scatter/gather path over full multi-step, multi-device
runs: fields match and the particle phase space is the same multiset.
"""
import numpy as np
import pytest

from lambdapic_tpu import Electron, Proton, SimpleLaser2D, Simulation
from lambdapic_tpu.core.species import _ALL_SPECIES

um = 1e-6
l0 = 0.8 * um
nc = 1.742e27


@pytest.fixture(autouse=True)
def clear_species_registry():
    _ALL_SPECIES.clear()
    yield
    _ALL_SPECIES.clear()


def run_case(tiling, periodic, nsteps=6, mesh=(2, 2), seed=11,
             backend="auto", **kw):
    _ALL_SPECIES.clear()
    if periodic:
        bc = {k: "periodic" for k in ("xmin", "xmax", "ymin", "ymax")}
    else:
        bc = {k: "pml" for k in ("xmin", "xmax", "ymin", "ymax")}

    def density(x, y):
        return np.where((x > 1.2 * um) & (x < 4 * um), 3 * nc, 0.0)

    ele = Electron(density=density, ppc=3)
    pro = Proton(density=density, ppc=3)
    sim = Simulation(nx=64, ny=64, dx=l0 / 10, dy=l0 / 10,
                     npatch_x=mesh[0], npatch_y=mesh[1],
                     boundary_conditions=bc, random_seed=seed,
                     precision="double", tiling=tiling,
                     tiling_backend=backend, **kw)
    sim.add_species([ele, pro])
    laser = SimpleLaser2D(a0=8, w0=2 * um, ctau=2 * um)
    cbs = [] if periodic else [laser]
    sim.run(nsteps=nsteps, callbacks=cbs)
    fields = {n: sim.get_field(n) for n in
              ("ex", "ey", "ez", "bx", "by", "bz", "jx", "jy", "jz", "rho")}
    parts = [sim.get_particles(i) for i in range(2)]
    return fields, parts


@pytest.mark.parametrize("periodic", [True, False])
def test_tiled_matches_untiled(periodic):
    f_ref, p_ref = run_case(None, periodic)
    f_til, p_til = run_case((16, 16), periodic)
    for name in f_ref:
        scale = np.abs(f_ref[name]).max() + 1e-30
        np.testing.assert_allclose(f_til[name], f_ref[name],
                                   atol=1e-9 * scale, err_msg=name)
    for i in range(2):
        for k in ("x", "y", "ux", "uy", "uz", "w"):
            a = np.sort(p_ref[i][k])
            b = np.sort(p_til[i][k])
            assert a.shape == b.shape, (i, k)
            np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-12,
                                       err_msg=f"species {i} {k}")


def test_pallas_backend_matches_xla_backend():
    """The pallas tiled kernels (interpret mode on CPU) must reproduce the
    XLA tiled path end-to-end through the full sharded step."""
    f_ref, p_ref = run_case((16, 16), False, backend="xla")
    f_pl, p_pl = run_case((16, 16), False, backend="pallas")
    for name in f_ref:
        scale = np.abs(f_ref[name]).max() + 1e-30
        np.testing.assert_allclose(f_pl[name], f_ref[name],
                                   atol=1e-9 * scale, err_msg=name)
    for i in range(2):
        for k in ("x", "y", "ux", "uy", "uz", "w"):
            np.testing.assert_allclose(np.sort(p_pl[i][k]),
                                       np.sort(p_ref[i][k]),
                                       rtol=1e-9, atol=1e-12,
                                       err_msg=f"species {i} {k}")


@pytest.mark.parametrize("rebin,chunk", [(2, 1), (4, 1), (4, 4)])
def test_rebin_interval_matches_every_step(rebin, chunk):
    """rebin_interval=R (migration sorts every R steps, wider tile halo)
    must reproduce the every-step re-binning run — also through the
    chunked lax.scan dispatch (R-step blocks inside the scan body)."""
    f_ref, p_ref = run_case((16, 16), False, nsteps=8)
    f_r, p_r = run_case((16, 16), False, nsteps=8, n_guard=rebin + 3,
                        rebin_interval=rebin, step_chunk=chunk)
    for name in f_ref:
        scale = np.abs(f_ref[name]).max() + 1e-30
        np.testing.assert_allclose(f_r[name], f_ref[name],
                                   atol=1e-9 * scale, err_msg=name)
    for i in range(2):
        for k in ("x", "y", "ux", "uy", "w"):
            np.testing.assert_allclose(np.sort(p_r[i][k]),
                                       np.sort(p_ref[i][k]),
                                       rtol=1e-9, atol=1e-12,
                                       err_msg=f"species {i} {k}")


@pytest.mark.parametrize("periodic,migration,backend", [
    (True, "exact", "xla"),
    (False, "exact", "xla"),
    (False, "fast", "xla"),
    (False, "fast", "pallas"),
])
def test_cell_engine_matches_untiled(periodic, migration, backend):
    """The cell-binned engine (ops/cell2d.py, opt-in tiling='cell') must
    reproduce the scatter path end-to-end through the sharded step —
    through both the XLA kernels and the fused pallas kernels
    (ops/cellpallas.py, interpret mode on CPU). The fast overwrite-merge
    re-binning is lossless in this mild setup (no positional
    collisions), so it must match exactly too."""
    f_ref, p_ref = run_case(None, periodic)
    f_cel, p_cel = run_case("cell", periodic, cell_migration=migration,
                            backend=backend)
    for name in f_ref:
        scale = np.abs(f_ref[name]).max() + 1e-30
        np.testing.assert_allclose(f_cel[name], f_ref[name],
                                   atol=1e-9 * scale, err_msg=name)
    for i in range(2):
        for k in ("x", "y", "ux", "uy", "uz", "w"):
            a = np.sort(p_ref[i][k])
            b = np.sort(p_cel[i][k])
            assert a.shape == b.shape, (i, k)
            np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-12,
                                       err_msg=f"species {i} {k}")


def test_cell_engine_matches_scatter_3d():
    """3D cell engine (ops/cell3d.py) == 3D scatter path end-to-end,
    sharded over a 2x2x2 device mesh."""
    from lambdapic_tpu import Simulation3D, SimpleLaser3D

    def run3d(tiling, **kw):
        _ALL_SPECIES.clear()

        def density(x, y, z):
            return np.where((x > 0.8 * um) & (x < 2 * um), 2 * nc, 0.0)

        ele = Electron(density=density, ppc=2)
        pro = Proton(density=density, ppc=2)
        sim = Simulation3D(nx=24, ny=16, nz=16, dx=l0 / 8, dy=l0 / 8,
                           dz=l0 / 8, npatch_x=2, npatch_y=2, npatch_z=2,
                           random_seed=3, precision="double",
                           tiling=tiling, **kw)
        sim.add_species([ele, pro])
        laser = SimpleLaser3D(a0=4, w0=1 * um, ctau=1 * um)
        sim.run(nsteps=5, callbacks=[laser])
        fields = {n: sim.get_field(n) for n in
                  ("ex", "ey", "ez", "bx", "by", "bz", "jx", "jy", "jz",
                   "rho")}
        parts = [sim.get_particles(i) for i in range(2)]
        return fields, parts

    f_ref, p_ref = run3d(None)
    f_cel, p_cel = run3d("cell", cell_migration="exact")
    for name in f_ref:
        scale = np.abs(f_ref[name]).max() + 1e-30
        np.testing.assert_allclose(f_cel[name], f_ref[name],
                                   atol=1e-9 * scale, err_msg=name)
    for i in range(2):
        for k in ("x", "y", "z", "ux", "uy", "uz", "w"):
            a = np.sort(p_ref[i][k])
            b = np.sort(p_cel[i][k])
            assert a.shape == b.shape, (i, k)
            np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-12,
                                       err_msg=f"species {i} {k}")


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_cell_engine_fast_drift_matches_scatter(backend):
    """Relativistic bulk drift: mid-step positions cross cell boundaries
    every step, exercising the mid-step re-binning contract (gather
    deltas must stay within the 3/4-tap stencils; regression for the
    truncated-tap bug where boundary-crossing particles got E/B weights
    off by up to 20%)."""
    def run(tiling):
        _ALL_SPECIES.clear()

        def density(x, y):
            return np.where((x > 1.2 * um) & (x < 4 * um), 1 * nc, 0.0)

        ele = Electron(density=density, ppc=2,
                       momentum=(lambda x, y: 2.0,
                                 lambda x, y: 0.7,
                                 None))
        sim = Simulation(nx=64, ny=64, dx=l0 / 10, dy=l0 / 10,
                         npatch_x=2, npatch_y=2, random_seed=4,
                         boundary_conditions={k: "periodic" for k in
                                              ("xmin", "xmax",
                                               "ymin", "ymax")},
                         precision="double", tiling=tiling,
                         tiling_backend=backend,
                         cell_migration="exact",
                         particle_capacity_factor=4.0,
                         migration_buffer=8192)
        sim.add_species([ele])
        sim.run(nsteps=8)
        fields = {n: sim.get_field(n) for n in ("ex", "ey", "jx", "rho")}
        return fields, sim.get_particles(0)

    f_ref, p_ref = run(None)
    f_cel, p_cel = run("cell")
    for name in f_ref:
        scale = np.abs(f_ref[name]).max() + 1e-30
        np.testing.assert_allclose(f_cel[name], f_ref[name],
                                   atol=1e-9 * scale, err_msg=name)
    for k in ("x", "y", "ux", "uy", "w"):
        np.testing.assert_allclose(np.sort(p_cel[k]), np.sort(p_ref[k]),
                                   rtol=1e-9, atol=1e-12, err_msg=k)
