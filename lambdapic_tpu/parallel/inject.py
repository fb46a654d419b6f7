"""In-step particle creation into dead slots.

Shared primitive for the moving-window refill and QED pair/photon creation
(reference fills dead slots after extend(), qed/cpu.py create_*_patches and
callback/utils.py MovingWindow._fill_particles). Under XLA's static shapes,
creation = masked scatter into the first n free slots, with overflow counted
instead of growing arrays.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp


def insert_local(data: Dict[str, jnp.ndarray], alive: jnp.ndarray,
                 next_id: jnp.ndarray, new_vals: Dict[str, jnp.ndarray],
                 n_new: jnp.ndarray
                 ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray, jnp.ndarray,
                            jnp.ndarray]:
    """Insert up to K=len(new_vals[...]) new particles; the first ``n_new``
    entries of each new_vals array are valid.

    Arrays are local (cap,) / (K,). Returns (data, alive, next_id, n_lost).
    New particles get sequential ids from next_id (the reference's
    _npart_created counter, particles.py:91-139).
    """
    cap = alive.shape[0]
    k = next(iter(new_vals.values())).shape[0]
    valid = jnp.arange(k) < n_new
    slots = jnp.nonzero(~alive, size=k, fill_value=cap)[0]
    target = jnp.where(valid, slots, cap)
    n_lost = jnp.sum(valid & (slots >= cap)).astype(jnp.int32)

    data = dict(data)
    for key, arr in data.items():
        if key == "id_lo":
            ids = (next_id + jnp.arange(k, dtype=jnp.uint32))
            data[key] = arr.at[target].set(ids, mode="drop")
        elif key == "id_hi":
            continue  # device id stays
        elif key in new_vals:
            data[key] = arr.at[target].set(
                new_vals[key].astype(arr.dtype), mode="drop")
        elif key == "inv_gamma":
            data[key] = arr.at[target].set(1.0, mode="drop")
        else:
            data[key] = arr.at[target].set(0.0, mode="drop")
    alive = alive.at[target].set(True, mode="drop")
    next_id = next_id + n_new.astype(jnp.uint32)
    return data, alive, next_id, n_lost
