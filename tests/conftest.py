"""Test configuration: force the CPU backend with 8 virtual devices so
multi-device sharding is exercised without TPU hardware (SURVEY.md §7 phase 6),
and enable x64 so double-precision physics checks match the reference's
float64 kernels."""
import os

import jax

# must happen before the backend is initialized
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# 8 virtual devices on few host cores: device threads can miss the default
# 40 s collective rendezvous under load, and XLA aborts the process
# ("Termination timeout for collective permute") — raise the timeouts.
if "collective_call_terminate" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
              " --xla_cpu_collective_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags.strip()
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache, shared across the xdist workers AND
# across suite runs: the kernel-parity tests compile multi-minute
# interpret-mode executables, and every worker process would otherwise
# recompile them from scratch (a cold full suite is ~1.5 h; warm ~
# minutes). The cache dir is gitignored.
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          os.pardir, ".jax_test_cache")
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", _cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

os.environ.setdefault("LAMBDAPIC_LOG_LEVEL", "WARNING")

import gc

import pytest

# Default test profile (round-4 verdict #6: the full 239-test serial run
# exceeds 90 min on this 1-core host once a round of kernel-source
# changes invalidates the interpret-mode compile caches). The modules
# below compile multi-minute interpret-mode Pallas kernels and are
# auto-marked `slow`; pytest.ini deselects `slow` by default.
#
#   pytest                     fast profile (default, < ~25 min warm)
#   pytest -m slow             the kernel-parity / long integration set
#   pytest -m ""               everything (CI-style full run)
_SLOW_KERNEL_MODULES = (
    "test_cellslab.py", "test_cellslab_skips.py", "test_cellpallas.py",
    "test_fieldspallas.py", "test_tiled_pallas.py", "test_cpml_slab.py",
    "test_mig_fused.py",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        p = str(item.fspath)
        if any(p.endswith(m) for m in _SLOW_KERNEL_MODULES):
            item.add_marker(pytest.mark.slow)
        # pallas-backend parametrizations elsewhere also compile the
        # interpret-mode kernels
        elif "pallas" in item.name and "tiled_parity" in p:
            item.add_marker(pytest.mark.slow)


def pytest_xdist_auto_num_workers(config):
    """-n auto budget: each worker runs an 8-virtual-device XLA client
    whose collective rendezvous starves under CPU oversubscription
    (observed as worker aborts in sim.run) — one worker per real core."""
    return max(1, os.cpu_count() or 1)


@pytest.fixture(autouse=True)
def _xdist_cpu_budget():
    """Under an explicit -n N with N > the core budget, serialize test
    bodies through a cross-process flock semaphore: 8 workers x 8 device
    threads on one core miss even the raised collective timeouts above.
    Workers still pipeline collection/setup; only test bodies queue."""
    if not os.environ.get("PYTEST_XDIST_WORKER"):
        yield
        return
    import fcntl
    import tempfile
    import time as _time
    budget = max(1, os.cpu_count() or 1)
    base = os.path.join(tempfile.gettempdir(),
                        "lambdapic_xdist_slot")
    fd = None
    while fd is None:
        for slot in range(budget):
            f = open(f"{base}{slot}.lock", "a+")
            try:
                fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
                fd = f
                break
            except OSError:
                f.close()
        else:
            _time.sleep(0.05)
    try:
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        fd.close()


@pytest.fixture(autouse=True)
def _clear_jax_caches():
    """Every Simulation test compiles fresh multi-device executables; without
    freeing them the suite eventually aborts in XLA (host memory)."""
    yield
    jax.clear_caches()
    gc.collect()
