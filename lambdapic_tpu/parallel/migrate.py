"""Particle migration between device shards inside shard_map.

TPU-native equivalent of the reference particle sync
(core/patch/sync_particles_2d.c:36-540, core/mpi/sync_particles_2d.c):
out-of-range particles are packed into fixed-capacity per-direction buffers,
ppermute'd to the neighbor shard, and unpacked into dead slots. Migration is
done axis by axis (x then y then z) so corner-crossing particles take two
hops within the same step — 2 ppermutes per axis instead of 8/26 neighbor
exchanges.

Divergences from the reference, by design (SURVEY.md §7 hard part 2):
- Buffers are fixed-size (XLA static shapes); overflow (more leavers than
  buffer slots, or more arrivals than dead slots) drops particles and
  increments ``ParticlesState.overflow`` so the host can warn / re-capacity.
- Non-periodic boundaries kill leavers (reference
  sync_particles_2d.c:184-198 mark_out_of_bound_as_dead); periodic axes wrap
  through the circular ppermute with the coordinate shift applied on send.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .halo import HaloSpec, _perms


def migrate_axis(data: Dict[str, jnp.ndarray], alive: jnp.ndarray,
                 spec: HaloSpec, coord: str, nloc: int, buf: int
                 ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray, jnp.ndarray]:
    """Migrate along one mesh axis. Arrays are local (cap,). Returns
    (data, alive, n_lost) with n_lost an int32 scalar of dropped particles."""
    cap = alive.shape[0]
    x = data[coord]
    dtype = x.dtype
    out_lo = alive & (x < -0.5)
    out_hi = alive & (x >= nloc - 0.5)

    n_lo = jnp.sum(out_lo)
    n_hi = jnp.sum(out_hi)
    idx_lo = jnp.nonzero(out_lo, size=buf, fill_value=cap)[0]
    idx_hi = jnp.nonzero(out_hi, size=buf, fill_value=cap)[0]

    def pack(idx):
        return {k: jnp.take(v, idx, mode="fill", fill_value=0)
                for k, v in data.items()}

    send_lo = pack(idx_lo)
    send_hi = pack(idx_hi)
    # shift into the receiving shard's local frame
    send_lo[coord] = send_lo[coord] + jnp.asarray(nloc, dtype)
    send_hi[coord] = send_hi[coord] - jnp.asarray(nloc, dtype)
    iot = jnp.arange(buf)
    valid_lo = iot < n_lo
    valid_hi = iot < n_hi

    up, dn = _perms(spec.size)
    # leavers to the lower neighbor travel dn; we receive the upper
    # neighbor's lo-buffer, and vice versa.
    recv_from_hi = jax.tree.map(lambda a: lax.ppermute(a, spec.axis_name, dn),
                                (send_lo, valid_lo))
    recv_from_lo = jax.tree.map(lambda a: lax.ppermute(a, spec.axis_name, up),
                                (send_hi, valid_hi))
    in_hi, valid_in_hi = recv_from_hi
    in_lo, valid_in_lo = recv_from_lo
    if not spec.periodic:
        i = lax.axis_index(spec.axis_name)
        valid_in_hi = valid_in_hi & (i != spec.size - 1)
        valid_in_lo = valid_in_lo & (i != 0)

    # kill leavers locally (edge leavers on open boundaries die here and are
    # masked on the receive side above)
    alive = alive & ~(out_lo | out_hi)
    lost = (jnp.maximum(n_lo - buf, 0) + jnp.maximum(n_hi - buf, 0)
            ).astype(jnp.int32)

    # unpack arrivals into dead slots
    in_data = {k: jnp.concatenate([in_lo[k], in_hi[k]]) for k in data}
    in_valid = jnp.concatenate([valid_in_lo, valid_in_hi])
    slots = jnp.nonzero(~alive, size=2 * buf, fill_value=cap)[0]
    rank = jnp.cumsum(in_valid.astype(jnp.int32)) - 1
    slot_for = jnp.take(slots, jnp.clip(rank, 0, 2 * buf - 1))
    target = jnp.where(in_valid, slot_for, cap)
    lost = lost + jnp.sum(in_valid & (slot_for >= cap)).astype(jnp.int32)
    for k in data:
        data[k] = data[k].at[target].set(in_data[k], mode="drop")
    alive = alive.at[target].set(True, mode="drop")
    return data, alive, lost


def sanitize_dead(data: Dict[str, jnp.ndarray], alive: jnp.ndarray
                  ) -> Dict[str, jnp.ndarray]:
    """Clamp dead slots so downstream kernels are no-ops.

    Only the attributes kernels actually read from dead slots need
    clamping: w=0 (all deposits scale with w), in-range positions (gather/
    deposit indexing), unit inv_gamma and zero momentum (velocity products,
    QED chi). Stale field/QED attributes on dead slots are harmless and
    skipping them halves the memory traffic of this pass."""
    out = dict(data)
    for k in ("x", "y", "z", "w", "ux", "uy", "uz", "tau", "event"):
        if k in data:
            out[k] = jnp.where(alive, data[k], jnp.zeros_like(data[k]))
    out["inv_gamma"] = jnp.where(alive, data["inv_gamma"],
                                 jnp.ones_like(data["inv_gamma"]))
    return out


def migrate_2d(data, alive, specs: Tuple[HaloSpec, HaloSpec],
               nx_loc: int, ny_loc: int, buf: int):
    data = dict(data)
    data, alive, lost_x = migrate_axis(data, alive, specs[0], "x", nx_loc, buf)
    data, alive, lost_y = migrate_axis(data, alive, specs[1], "y", ny_loc, buf)
    data = sanitize_dead(data, alive)
    return data, alive, lost_x + lost_y


def migrate_3d(data, alive, specs, nx_loc: int, ny_loc: int, nz_loc: int,
               buf: int):
    data = dict(data)
    data, alive, l0 = migrate_axis(data, alive, specs[0], "x", nx_loc, buf)
    data, alive, l1 = migrate_axis(data, alive, specs[1], "y", ny_loc, buf)
    data, alive, l2 = migrate_axis(data, alive, specs[2], "z", nz_loc, buf)
    data = sanitize_dead(data, alive)
    return data, alive, l0 + l1 + l2
