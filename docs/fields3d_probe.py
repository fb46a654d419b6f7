"""Measure the fields-only (Maxwell + CPML + laser, no species) 3D step
cost on the real TPU — the XLA glue floor under the particle kernels.

Usage: python docs/fields3d_probe.py [n=128] [steps=200]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("LAMBDAPIC_LOG_LEVEL", "WARNING")

import numpy as np
import jax

from lambdapic_tpu import Simulation3D, SimpleLaser3D

n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 200
um = 1e-6
dx = 0.8 * um / 12

sim = Simulation3D(nx=n, ny=n, nz=n, dx=dx, dy=dx, dz=dx,
                   npatch_x=1, npatch_y=1, npatch_z=1,
                   random_seed=0, precision="single", tiling="cell",
                   rebin_interval=1)
cbs = [SimpleLaser3D(a0=10, w0=3 * um, ctau=5 * um)]
sim.step_chunk = 1
sim.recap_interval = 0
sim.run(nsteps=8, callbacks=cbs)
jax.block_until_ready(sim.state)
_ = np.asarray(sim.state.fields.ey).ravel()[0]

t0 = time.perf_counter()
sim.run(nsteps=steps, callbacks=cbs)
jax.block_until_ready(sim.state)
_ = np.asarray(sim.state.fields.ey).ravel()[0]
el = time.perf_counter() - t0
print(f"fields-only {n}^3: {el / steps * 1e3:.2f} ms/step "
      f"({steps / el:.1f} steps/s, slab_psi="
      f"{os.environ.get('LAMBDAPIC_CPML_SLAB', '1')})")
