"""Multi-host smoke test: two CPU processes, Gloo collectives (the DCN
analog; reference core/mpi/mpi_manager.py:9-298). Each process contributes
4 virtual devices; the 4x2 device mesh spans both processes, so every halo
exchange along y crosses the process boundary. The run must match a
single-process run of the same configuration bit-for-near-bit.

Spawned as subprocesses because jax.distributed cannot be initialized
inside the already-initialized test process.
"""
import os
import pickle
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = r"""
import os, pickle, sys
pid = int(sys.argv[1])
nproc = int(sys.argv[2])
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={8 // nproc}")
os.environ.setdefault("LAMBDAPIC_LOG_LEVEL", "WARNING")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

out = sys.argv[3]
port = sys.argv[4]

from lambdapic_tpu.parallel import distributed as dist
if nproc > 1:
    dist.init_distributed(coordinator_address=f"localhost:{port}",
                          num_processes=nproc, process_id=pid)
assert jax.device_count() == 8

import numpy as np
from lambdapic_tpu import Simulation, Species
from lambdapic_tpu.core.species import _ALL_SPECIES

_ALL_SPECIES.clear()
ele = Species(name="e", charge=-1, mass=1.0)
bc = {k: "periodic" for k in ("xmin", "xmax", "ymin", "ymax")}
sim = Simulation(nx=32, ny=32, dx=1e-6, dy=1e-6, npatch_x=4, npatch_y=2,
                 boundary_conditions=bc, precision="double", random_seed=7)
sim.add_species([ele])
sim.initialize()

rng = np.random.default_rng(5)
L = 32e-6
n = 400
coords = {"x": rng.uniform(0, L * 0.999, n) - 0.49e-6,
          "y": rng.uniform(0, L * 0.999, n) - 0.49e-6}
attrs = {"w": rng.uniform(0.5, 2.0, n) * 1e6,
         "ux": rng.normal(size=n) * 2,
         "uy": rng.normal(size=n) * 2,
         "uz": rng.normal(size=n)}
attrs["inv_gamma"] = 1 / np.sqrt(
    1 + attrs["ux"]**2 + attrs["uy"]**2 + attrs["uz"]**2)
sim.set_particles_global(0, coords, attrs)
sim.set_field("ey", np.sin(2 * np.pi * np.arange(32) / 32)[:, None]
              * np.ones((32, 32)) * 1e11)
sim.run(nsteps=4)

fields = {nm: sim.get_field(nm) for nm in ("ex", "ey", "ez", "bz", "jx",
                                           "rho")}
parts = sim.get_particles(0)
# collective-backed accessors must run on EVERY process (one-sided calls
# deadlock the mesh) — gather before the main-process-only file write
n_alive = sim.npart_alive[0]
if pid == 0:
    with open(out, "wb") as f:
        pickle.dump({"fields": fields,
                     "n_alive": n_alive,
                     "x": np.sort(parts["x"])}, f)
if nproc > 1:
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("worker-done")
    jax.distributed.shutdown()
"""


def _run_worker(pid, nproc, out, port, tmp_path):
    script = tmp_path / f"worker_{nproc}_{pid}.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, str(script), str(pid), str(nproc), out, str(port)],
        env=env, cwd="/root/repo", stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT)


@pytest.mark.slow
def test_two_process_matches_single(tmp_path):
    out1 = str(tmp_path / "single.pkl")
    out2 = str(tmp_path / "multi.pkl")

    p = _run_worker(0, 1, out1, 45991, tmp_path)
    o, _ = p.communicate(timeout=900)
    assert p.returncode == 0, o.decode()[-3000:]

    ps = [_run_worker(i, 2, out2, 45992, tmp_path) for i in range(2)]
    outs = []
    for p in ps:
        o, _ = p.communicate(timeout=900)
        outs.append(o.decode()[-3000:])
    assert all(p.returncode == 0 for p in ps), "\n---\n".join(outs)

    with open(out1, "rb") as f:
        ref = pickle.load(f)
    with open(out2, "rb") as f:
        got = pickle.load(f)
    assert got["n_alive"] == ref["n_alive"] == 400
    for nm, a in ref["fields"].items():
        scale = np.abs(a).max() + 1e-30
        np.testing.assert_allclose(got["fields"][nm], a,
                                   atol=1e-9 * scale, err_msg=nm)
    np.testing.assert_allclose(got["x"], ref["x"], rtol=1e-9, atol=1e-12)
