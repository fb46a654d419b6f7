"""Pallas tiled kernels (ops/tiled2d_pallas.py) must match the XLA tiled
formulation (ops/tiled2d.py) — same contract as the reference gather
(interpolation/cpu2d.c:32-69) and Esirkepov deposit
(current_deposit.h:124-144). Runs in interpret mode on CPU.

Layout note: the pallas path uses the MXU extract/fold window layout
(C, ntx, wx, nty, wy); the XLA path uses (C, ntx, nty, wx, wy)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lambdapic_tpu.ops.tiled2d import (TileCfg, deposit_tiled,
                                       extract_windows, fold_windows,
                                       gather_tiled)
from lambdapic_tpu.ops.tiled2d_pallas import (deposit_tiled_pallas,
                                              extract_windows_mxu,
                                              fold_windows_mxu,
                                              gather_tiled_pallas)

CFG = TileCfg(tx=8, ty=8, ntx=3, nty=2, cap_t=64, h=3)


def _particles(rng, cfg, dtype=jnp.float64):
    ox = np.arange(cfg.ntx)[:, None, None] * cfg.tx
    oy = np.arange(cfg.nty)[None, :, None] * cfg.ty
    shape = (cfg.ntx, cfg.nty, cfg.cap_t)
    x = rng.uniform(-0.5, cfg.tx - 0.5, shape) + ox
    y = rng.uniform(-0.5, cfg.ty - 0.5, shape) + oy
    return jnp.asarray(x, dtype), jnp.asarray(y, dtype)


def _windows(rng, cfg, dtype=jnp.float64):
    """(xla_layout, mxu_layout) random field windows."""
    w = rng.standard_normal((6, cfg.ntx, cfg.nty, cfg.wx, cfg.wy))
    return jnp.asarray(w, dtype), jnp.asarray(
        w.transpose(0, 1, 3, 2, 4), dtype)


def test_extract_fold_mxu_match_xla():
    rng = np.random.default_rng(4)
    fpad = jnp.asarray(rng.standard_normal(
        (6, CFG.ntx * CFG.tx + 2 * CFG.h, CFG.nty * CFG.ty + 2 * CFG.h)))
    ref = extract_windows(fpad, CFG)
    new = extract_windows_mxu(fpad, CFG)
    np.testing.assert_allclose(np.asarray(new),
                               np.asarray(ref).transpose(0, 1, 3, 2, 4),
                               atol=1e-14)
    win = jnp.asarray(rng.standard_normal(
        (4, CFG.ntx, CFG.nty, CFG.wx, CFG.wy)))
    f_ref = fold_windows(win, CFG)
    f_new = fold_windows_mxu(
        jnp.asarray(np.asarray(win).transpose(0, 1, 3, 2, 4)), CFG)
    np.testing.assert_allclose(np.asarray(f_new), np.asarray(f_ref),
                               atol=1e-12)


def test_gather_pallas_matches_xla():
    rng = np.random.default_rng(0)
    x, y = _particles(rng, CFG)
    win_x, win_m = _windows(rng, CFG)
    ref = gather_tiled(win_x, x, y, CFG)
    out = jax.jit(lambda w, a, b: gather_tiled_pallas(w, a, b, CFG))(
        win_m, x, y)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-12, atol=1e-12)


def test_deposit_pallas_matches_xla():
    rng = np.random.default_rng(1)
    x, y = _particles(rng, CFG)
    shape = (CFG.ntx, CFG.nty, CFG.cap_t)
    ux, uy, uz = [jnp.asarray(rng.standard_normal(shape)) for _ in range(3)]
    ig = 1.0 / jnp.sqrt(1.0 + ux**2 + uy**2 + uz**2)
    w = jnp.asarray(rng.uniform(0.0, 1.0, shape))
    kw = dict(q=-1.6e-19, dx=1e-6, dy=1e-6, dt=2e-15)
    ref = deposit_tiled(x, y, ux, uy, uz, ig, w, CFG, **kw)
    out = jax.jit(lambda *a: deposit_tiled_pallas(*a, CFG, **kw))(
        x, y, ux, uy, uz, ig, w)
    scale = np.abs(np.asarray(ref)).max()
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref).transpose(0, 1, 3, 2, 4),
                               rtol=1e-10, atol=scale * 1e-12)
    # the folded currents agree too (different overlap-add formulations)
    np.testing.assert_allclose(np.asarray(fold_windows_mxu(out, CFG)),
                               np.asarray(fold_windows(ref, CFG)),
                               atol=scale * 1e-11)


def test_deposit_pallas_zero_velocity_zero_current():
    """v=0 must give exactly zero jx/jy (the S1-S0 bitwise identity —
    the FMA-fusion hazard class; see ops/deposition.py::_axis_shapes)."""
    rng = np.random.default_rng(2)
    x, y = _particles(rng, CFG)
    shape = (CFG.ntx, CFG.nty, CFG.cap_t)
    z = jnp.zeros(shape)
    w = jnp.asarray(rng.uniform(0.5, 1.0, shape))
    out = jax.jit(lambda *a: deposit_tiled_pallas(
        *a, CFG, q=-1.6e-19, dx=1e-6, dy=1e-6, dt=2e-15))(
        x, y, z, z, z, jnp.ones(shape), w)
    assert np.abs(np.asarray(out[0])).max() == 0.0
    assert np.abs(np.asarray(out[1])).max() == 0.0


def test_pallas_f32():
    rng = np.random.default_rng(3)
    x, y = _particles(rng, CFG, dtype=jnp.float32)
    win_x, win_m = _windows(rng, CFG, dtype=jnp.float32)
    ref = gather_tiled(win_x, x, y, CFG)
    out = gather_tiled_pallas(win_m, x, y, CFG)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-6, atol=1e-6)
