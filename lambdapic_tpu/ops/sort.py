"""Per-cell particle bucket sort.

TPU-native replacement for the reference counting/bucket sort
(core/sort/particle_sort.py:8-350, sort/cpu2d.c:9-324): a single argsort of
integer cell keys. Dead particles go to a trailing bucket (the reference
assigns out-of-bound/dead particles to the last bucket, sort/cpu2d.c:46-52).

Two variants:
- ``sort_perm``: deterministic (argsort is stable) — used by the optional
  locality sorter.
- ``shuffled_sort_perm``: random order *within* each cell by packing random
  low bits into the sort key — the vectorized analog of the reference's
  per-cell shuffle for collision pairing (collision/cpu.py:23-31).
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def cell_ids_2d(x, y, alive, nx: int, ny: int) -> jnp.ndarray:
    ix = jnp.clip(jnp.floor(x + 0.5).astype(jnp.int32), 0, nx - 1)
    iy = jnp.clip(jnp.floor(y + 0.5).astype(jnp.int32), 0, ny - 1)
    cid = ix * ny + iy
    return jnp.where(alive, cid, nx * ny)


def cell_ids_3d(x, y, z, alive, nx: int, ny: int, nz: int) -> jnp.ndarray:
    ix = jnp.clip(jnp.floor(x + 0.5).astype(jnp.int32), 0, nx - 1)
    iy = jnp.clip(jnp.floor(y + 0.5).astype(jnp.int32), 0, ny - 1)
    iz = jnp.clip(jnp.floor(z + 0.5).astype(jnp.int32), 0, nz - 1)
    cid = (ix * ny + iy) * nz + iz
    return jnp.where(alive, cid, nx * ny * nz)


def sort_perm(cell: jnp.ndarray) -> jnp.ndarray:
    return jnp.argsort(cell, stable=True)


def shuffled_sort_perm(cell: jnp.ndarray, key, ncells: int) -> jnp.ndarray:
    """Sort by cell with a random permutation within each cell."""
    kbits = max(1, 30 - int(math.ceil(math.log2(ncells + 2))))
    K = 1 << kbits
    r = jax.random.randint(key, cell.shape, 0, K, dtype=jnp.int32)
    return jnp.argsort(cell * K + r)


def bucket_bounds(cell_sorted: jnp.ndarray, ncells: int
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(starts, counts) per cell from the sorted cell-id array
    (the reference's bucket_bound_min/max, sort/cpu2d.c:108-190)."""
    edges = jnp.searchsorted(cell_sorted, jnp.arange(ncells + 1),
                             side="left")
    return edges[:-1], jnp.diff(edges)
