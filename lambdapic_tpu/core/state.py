"""Simulation state pytrees.

The reference stores per-patch ``Fields2D/3D`` numpy arrays and variable-size
SoA particle arrays with a dead-slot free list (reference core/fields.py:6-171,
core/particles.py:8-284). The TPU rebuild keeps everything in one immutable
pytree of globally-sharded jax arrays:

- Fields are **interior-only** global arrays of shape (nx, ny[, nz]) sharded
  P('px','py'[,'pz']). Guard cells are materialized transiently by halo
  exchange inside the step (parallel/halo.py), never stored — so there is no
  stale-guard state and checkpoints are minimal.
- Particles are fixed-capacity SoA arrays of shape (npx, npy[, npz], cap),
  sharded over the mesh axes with the trailing capacity axis replicated.
  Dead slots have ``alive=False`` and ``w=0`` (kernels are written so dead
  slots are no-ops: deposition weights by w, gathers are masked to the local
  shard). The reference's dynamic ``extend()/prune()`` becomes host-side
  re-capacity between jitted steps (XLA needs static shapes).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .grid import Grid
from .species import Species


@struct.dataclass
class FieldsState:
    """Global EM field arrays, interior only (no guard cells)."""

    ex: jax.Array
    ey: jax.Array
    ez: jax.Array
    bx: jax.Array
    by: jax.Array
    bz: jax.Array
    jx: jax.Array
    jy: jax.Array
    jz: jax.Array
    rho: jax.Array
    # CPML auxiliary currents (reference core/boundary/cpml.py:135-230).
    # Keys like 'psi_ey_x'; empty dict when all boundaries are periodic.
    psi: Dict[str, jax.Array] = struct.field(default_factory=dict)

    @property
    def e(self):
        return (self.ex, self.ey, self.ez)

    @property
    def b(self):
        return (self.bx, self.by, self.bz)

    @property
    def j(self):
        return (self.jx, self.jy, self.jz)


@struct.dataclass
class ParticlesState:
    """Fixed-capacity SoA particle arrays for one species.

    ``data`` maps attribute name -> array of shape mesh_shape + (cap,).
    Attribute set mirrors the reference (particles.py:63-67) plus
    'id_lo'/'id_hi' (uint32 pair replacing the packed float64 id,
    particles.py:91-116).
    """

    data: Dict[str, jax.Array]
    alive: jax.Array                      # bool, mesh_shape + (cap,)
    next_id: jax.Array                    # uint32, mesh_shape — local id counter
    overflow: jax.Array                   # int32, mesh_shape — lost-particle count

    @property
    def cap(self) -> int:
        return self.alive.shape[-1]


@struct.dataclass
class SimulationState:
    """Complete dynamic state advanced by the jitted step.

    Per-step PRNG keys are host-folded (counter-based) and passed via the
    step's scalars argument, not stored here.
    """

    fields: FieldsState
    particles: Tuple[ParticlesState, ...]


# ---------------------------------------------------------------------------
# constructors
# ---------------------------------------------------------------------------

def zeros_fields(grid: Grid, dtype=jnp.float32, with_pml: bool = True,
                 cpml=None) -> FieldsState:
    """``cpml``: optional CPMLCoeffs. When given and cpml_slab_enabled(),
    psi arrays are slab-restricted along their PML axis (rows where c != 0
    only — they are exactly zero elsewhere); the Maxwell update detects
    the shape and runs the matching path (ops/maxwell.py)."""
    shape = grid.shape
    z = lambda: jnp.zeros(shape, dtype=dtype)
    psi = {}
    if with_pml:
        from ..ops.cpml import cpml_slab_enabled
        slab = cpml is not None and cpml_slab_enabled()
        bc = grid.bc
        axes = "xy" + ("z" if grid.dimension == 3 else "")
        # One psi pair per transverse E/B component per PML axis
        # (reference cpml.py:138-141, 171-174, 208-212).
        comps = {
            "x": ("ey", "ez", "by", "bz"),
            "y": ("ex", "ez", "bx", "bz"),
            "z": ("ex", "ey", "bx", "by"),
        }
        for axis, ax in enumerate(axes):
            if bc.get(ax + "min") == "pml" or bc.get(ax + "max") == "pml":
                pshape = shape
                if slab:
                    w = cpml.psi_width(ax)
                    pshape = shape[:axis] + (w,) + shape[axis + 1:]
                for comp in comps[ax]:
                    psi[f"psi_{comp}_{ax}"] = jnp.zeros(pshape, dtype=dtype)
    return FieldsState(
        ex=z(), ey=z(), ez=z(), bx=z(), by=z(), bz=z(),
        jx=z(), jy=z(), jz=z(), rho=z(), psi=psi,
    )


def empty_particles(grid: Grid, species: Species, cap: int,
                    dtype=jnp.float32) -> ParticlesState:
    """Allocate an all-dead particle container for one species."""
    mshape = grid.mesh_shape
    shape = mshape + (cap,)
    data: Dict[str, jax.Array] = {}
    for attr in species.attrs():
        data[attr] = jnp.zeros(shape, dtype=dtype)
    data["inv_gamma"] = jnp.ones(shape, dtype=dtype)
    data["id_lo"] = jnp.zeros(shape, dtype=jnp.uint32)
    data["id_hi"] = jnp.zeros(shape, dtype=jnp.uint32)
    return ParticlesState(
        data=data,
        alive=jnp.zeros(shape, dtype=bool),
        next_id=jnp.zeros(mshape, dtype=jnp.uint32),
        overflow=jnp.zeros(mshape, dtype=jnp.int32),
    )


def particles_from_numpy(grid: Grid, species: Species, arrays: Dict[str, np.ndarray],
                         counts: np.ndarray, cap: int, dtype=jnp.float32,
                         ) -> ParticlesState:
    """Build a ParticlesState from per-device ragged numpy arrays.

    ``arrays[attr]`` has shape mesh_shape + (cap,) already zero-padded;
    ``counts`` has shape mesh_shape giving the number of alive particles
    packed at the head of each device's slice.
    """
    mshape = grid.mesh_shape
    data = {}
    for attr in species.attrs():
        a = arrays.get(attr)
        if a is None:
            a = np.zeros(mshape + (cap,), dtype=np.float64)
        data[attr] = jnp.asarray(a, dtype=dtype)
    iota = np.arange(cap, dtype=np.uint32)
    alive_np = iota[None, None] < counts[..., None] if grid.dimension == 2 else \
        iota[None, None, None] < counts[..., None]
    data["id_lo"] = jnp.asarray(
        np.broadcast_to(iota, mshape + (cap,)) * alive_np.astype(np.uint32))
    # id_hi encodes the flattened device index (analog of the reference's
    # rank/ipatch bit fields, particles.py:91-116).
    dev = np.arange(int(np.prod(mshape)), dtype=np.uint32).reshape(mshape)
    data["id_hi"] = jnp.asarray(
        np.broadcast_to(dev[..., None], mshape + (cap,)).copy())
    return ParticlesState(
        data=data,
        alive=jnp.asarray(alive_np),
        next_id=jnp.asarray(counts.astype(np.uint32)),
        overflow=jnp.zeros(mshape, dtype=jnp.int32),
    )
