"""Shifted-neighbor access for global stencils.

The reference reads Yee-stencil neighbors through guard cells that are either
synced from the periodic wrap or left at zero on open (PML) boundaries
(reference core/fields.py:24-26, core/maxwell/cpu.py:18-35). On the globally
sharded arrays we express the same with roll (periodic) or zero-pad + slice
(open); XLA SPMD lowers both to thin halo collectives over ICI.
"""
from __future__ import annotations

import jax.numpy as jnp


def shift(f: jnp.ndarray, axis: int, by: int, periodic: bool) -> jnp.ndarray:
    """Return g with ``g[..., i, ...] = f[..., i+by, ...]`` along ``axis``.

    Out-of-range reads wrap when periodic, else read zero (matching the
    reference's zeroed guard cells on open boundaries).
    """
    if by == 0:
        return f
    if periodic:
        return jnp.roll(f, -by, axis=axis)
    n = f.shape[axis]
    zeros_shape = list(f.shape)
    zeros_shape[axis] = abs(by)
    z = jnp.zeros(zeros_shape, dtype=f.dtype)
    if by > 0:
        body = jnp.take(f, jnp.arange(by, n), axis=axis)
        return jnp.concatenate([body, z], axis=axis)
    body = jnp.take(f, jnp.arange(0, n + by), axis=axis)
    return jnp.concatenate([z, body], axis=axis)


def diff_lo(f: jnp.ndarray, axis: int, periodic: bool) -> jnp.ndarray:
    """f[i] - f[i-1] along axis (backward difference)."""
    return f - shift(f, axis, -1, periodic)


def diff_hi(f: jnp.ndarray, axis: int, periodic: bool) -> jnp.ndarray:
    """f[i+1] - f[i] along axis (forward difference)."""
    return shift(f, axis, +1, periodic) - f
