"""Multi-host (multi-process) support.

The reference goes multi-node through MPI (core/mpi/mpi_manager.py:9-298,
mpicc extensions). The TPU rebuild's analog is JAX's multi-controller
runtime: every host runs the same script, ``jax.distributed.initialize()``
connects them, ``jax.devices()`` becomes the GLOBAL device list, and the
same ``shard_map`` step runs unchanged — XLA routes halo ppermutes over
ICI within a host/pod slice and over DCN across hosts. No application-level
communication code changes: the only multi-host-aware pieces are

- :func:`init_distributed` — one call before building a Simulation;
- :func:`put_global` — build a globally-sharded array from a host value
  (every process provides the full value; only addressable shards are
  materialized);
- :func:`to_host` — fetch a (possibly non-addressable) global array to
  every host, resharding to replicated first;
- :func:`is_main_process` — gate file I/O callbacks (the reference's
  rank-0 writer pattern, callback/hdf5.py gather-to-rank-0).

CONTRACT: collective-backed accessors (``get_field``, ``get_particles``,
``npart_alive``, anything calling :func:`to_host` on a sharded array)
must run on EVERY process; calling them inside an
``if is_main_process():`` block deadlocks the mesh. Gather first, then
gate the file write — the built-in writers do exactly that.

Smoke-tested with two CPU processes in
tests/parallel/test_multiprocess.py.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np

_initialized = False


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None) -> None:
    """Idempotent wrapper around ``jax.distributed.initialize``.

    With no arguments, JAX auto-detects the cluster environment (TPU pods,
    SLURM, Open MPI). Call before any other JAX API touches the backend.
    """
    global _initialized
    if _initialized:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    _initialized = True


def is_distributed() -> bool:
    return jax.process_count() > 1


def is_main_process() -> bool:
    return jax.process_index() == 0


def put_global(value, sharding):
    """Globally-sharded device array from a host value available on every
    process (the init path builds global numpy arrays everywhere, like the
    reference's rank-0 create + scatter, simulation.py:321-365)."""
    if jax.process_count() == 1:
        return jax.device_put(value, sharding)
    arr = np.asarray(value)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx])


def warm_collectives(mesh) -> None:
    """Pre-establish every communicator clique the step will use.

    Gloo (CPU multi-process) sub-group rendezvous has a ~30 s window; the
    first PIC step is a multi-minute compile per process, and per-process
    compile-duration skew can exceed the window, killing the first halo
    ppermute. Running tiny collectives over the same cliques right after
    mesh construction (cheap, aligned) initializes the communicators once;
    XLA caches them per device set, so the real step finds them ready.
    No-op in single-process runs.
    """
    if jax.process_count() == 1:
        return
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    names = mesh.axis_names
    shape = tuple(mesh.shape[n] for n in names)
    sh = NamedSharding(mesh, P(*names))
    x = put_global(np.zeros(shape, np.float32), sh)

    def local(v):
        for name in names:
            n = mesh.shape[name]
            if n > 1:
                # the step's halo pairs (+1 ring) and reductions
                v = lax.ppermute(v, name,
                                 [(j, (j + 1) % n) for j in range(n)])
                v = lax.ppermute(v, name,
                                 [(j, (j - 1) % n) for j in range(n)])
                v = v + 0.0 * lax.psum(v, name)
        return v

    out = shard_map(local, mesh=mesh, in_specs=P(*names),
                    out_specs=P(*names))(x)
    jax.block_until_ready(out)
    # the host-gather (to_host/process_allgather) clique
    multihost_utils.process_allgather(out, tiled=True)


def to_host(arr) -> np.ndarray:
    """Full host copy of a global array on every process."""
    if not hasattr(arr, "is_fully_addressable") or arr.is_fully_addressable:
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    # Align processes first: Gloo sub-group rendezvous has a ~30 s window,
    # and independent per-process jit compiles can skew arrival beyond it.
    # The global device group is established at backend init, so this
    # barrier is safe even as the first collective.
    multihost_utils.sync_global_devices("lambdapic-to-host")
    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))
