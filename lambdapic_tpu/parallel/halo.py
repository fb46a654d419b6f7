"""Guard-cell halo exchange and current rim reduction inside shard_map.

TPU-native equivalent of the reference intra-rank + MPI guard sync
(core/patch/sync_fields2d.c:43-257, core/mpi/sync_fields2d.c:200-660):

- ``halo_pad``   = sync_guard_fields: copy neighbor interiors into my guard
  cells. Implemented as ppermute of g-wide strips along each mesh axis in
  order, so corner/edge guards are carried by the second (third) exchange.
- ``halo_reduce`` = sync_currents: my guard-rim deposits are added into the
  neighbor interiors (a scatter-reduce), in reverse axis order.

Open (non-periodic) global boundaries read zero guards / drop rim charge,
matching the reference where edge patches have no neighbor
(patch/patch.py:446-592).

All functions run *inside* shard_map on per-device local blocks.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


@dataclass(frozen=True)
class HaloSpec:
    """Static exchange description for one mesh axis."""

    axis_name: str       # 'px' | 'py' | 'pz'
    size: int            # number of devices along the axis
    periodic: bool       # global boundary condition on this axis


def _perms(size: int):
    up = [(i, (i + 1) % size) for i in range(size)]    # send to higher index
    dn = [(i, (i - 1) % size) for i in range(size)]    # send to lower index
    return up, dn


def _slice_ax(f: jnp.ndarray, axis: int, start: int, stop: int) -> jnp.ndarray:
    sl = [slice(None)] * f.ndim
    sl[axis] = slice(start, stop)
    return f[tuple(sl)]


def exchange_strips(strip_lo, strip_hi, spec: HaloSpec):
    """Swap boundary strips with both neighbors along one mesh axis.

    Returns (lo_halo, hi_halo): what this device's guards should contain —
    lo_halo is the lower neighbor's high strip, hi_halo the upper neighbor's
    low strip. Non-periodic edges get zeros.
    """
    up, dn = _perms(spec.size)
    lo_halo = lax.ppermute(strip_hi, spec.axis_name, up)
    hi_halo = lax.ppermute(strip_lo, spec.axis_name, dn)
    if not spec.periodic:
        i = lax.axis_index(spec.axis_name)
        lo_halo = jnp.where(i == 0, jnp.zeros_like(lo_halo), lo_halo)
        hi_halo = jnp.where(i == spec.size - 1, jnp.zeros_like(hi_halo),
                            hi_halo)
    return lo_halo, hi_halo


def halo_pad(f: jnp.ndarray, g: int, spatial_axes: Tuple[int, ...],
             specs: Tuple[HaloSpec, ...]) -> jnp.ndarray:
    """Pad a local block with g guard cells per side along each spatial axis,
    filled from neighbor interiors (reference sync_guard_fields)."""
    for axis, spec in zip(spatial_axes, specs):
        n = f.shape[axis]
        strip_lo = _slice_ax(f, axis, 0, g)
        strip_hi = _slice_ax(f, axis, n - g, n)
        lo_halo, hi_halo = exchange_strips(strip_lo, strip_hi, spec)
        f = jnp.concatenate([lo_halo, f, hi_halo], axis=axis)
    return f


def halo_reduce(f: jnp.ndarray, g: int, spatial_axes: Tuple[int, ...],
                specs: Tuple[HaloSpec, ...]) -> jnp.ndarray:
    """Fold the g-wide guard rims of a padded local block onto the neighbor
    interiors and return the interior block (reference sync_currents,
    patch/sync_fields2d.c:77-84). Inverse traversal order of halo_pad so
    corner rims fold correctly."""
    up, dn = _perms(1)  # placeholder, rebuilt per axis below
    for axis, spec in reversed(list(zip(spatial_axes, specs))):
        n_pad = f.shape[axis]
        n = n_pad - 2 * g
        rim_lo = _slice_ax(f, axis, 0, g)
        rim_hi = _slice_ax(f, axis, n_pad - g, n_pad)
        up, dn = _perms(spec.size)
        # my low rim belongs to the lower neighbor's interior tail
        recv_from_hi = lax.ppermute(rim_lo, spec.axis_name, dn)
        recv_from_lo = lax.ppermute(rim_hi, spec.axis_name, up)
        if not spec.periodic:
            i = lax.axis_index(spec.axis_name)
            recv_from_hi = jnp.where(i == spec.size - 1,
                                     jnp.zeros_like(recv_from_hi),
                                     recv_from_hi)
            recv_from_lo = jnp.where(i == 0, jnp.zeros_like(recv_from_lo),
                                     recv_from_lo)
        core = _slice_ax(f, axis, g, n_pad - g)
        # zero-extended adds (not slice concat): correct even when the
        # interior is narrower than 2g and the head/tail windows overlap
        zshape = list(core.shape)
        zshape[axis] = n - g
        z = jnp.zeros(zshape, dtype=core.dtype)
        add_lo = jnp.concatenate([recv_from_lo, z], axis=axis)
        add_hi = jnp.concatenate([z, recv_from_hi], axis=axis)
        f = core + add_lo + add_hi
    return f


def halo_pad_stack(fields, g: int, specs: Tuple[HaloSpec, ...]) -> jnp.ndarray:
    """Stack several same-shape local fields along a leading axis and pad all
    of them with one exchange per mesh axis (amortizes ppermute latency —
    the analog of the reference batching all attrs into one MPI sync)."""
    stacked = jnp.stack(fields, axis=0)
    spatial_axes = tuple(range(1, stacked.ndim))
    return halo_pad(stacked, g, spatial_axes, specs)
