"""Profile the real 3D bench step on TPU with jax.profiler and print the
top device ops by total time (parsed from the xplane via
tensorboard_plugin_profile). Attribution for the laser-target-3d config.

Usage: python docs/prof3d_trace.py [config] [steps]
"""
import glob
import gzip
import json
import os
import sys
import time
import types

sys.path.insert(0, "/root/repo")
os.environ.setdefault("LAMBDAPIC_LOG_LEVEL", "WARNING")

import numpy as np
import jax

import bench as B

CONFIG = sys.argv[1] if len(sys.argv) > 1 else "laser-target-3d"
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
LOGDIR = "/tmp/jaxtrace"

args = types.SimpleNamespace(nx=None, ny=None, ppc=None, tiling="cell",
                             rebin=4, steps=STEPS, warmup=2, chunk=1,
                             capacity_factor=1.6, migration="fast",
                             nspecies=2, nguard=None)
args.nx = args.nx or (512 if CONFIG == "laser-target-3d" else 768)
args.ny = args.ny or args.nx
args.ppc = args.ppc or (2 if CONFIG == "laser-target-3d" else 10)
sim, cbs = B.build(CONFIG, args)
sim.recap_interval = 0
sim.step_chunk = 1

sim.run(nsteps=2, callbacks=cbs)
jax.block_until_ready(sim.state)
_ = np.asarray(sim.state.fields.ey).ravel()[0]

os.system(f"rm -rf {LOGDIR}")
t0 = time.perf_counter()
with jax.profiler.trace(LOGDIR):
    sim.run(nsteps=STEPS, callbacks=cbs)
    jax.block_until_ready(sim.state)
el = time.perf_counter() - t0
print(f"wall: {el / STEPS * 1e3:.1f} ms/step ({STEPS} steps)", flush=True)

# ---- parse the xplane: sum durations per op on the device planes ----
from tensorflow.tsl.profiler.protobuf import xplane_pb2

paths = sorted(glob.glob(f"{LOGDIR}/plugins/profile/*/*.xplane.pb"))
assert paths, LOGDIR
print("xplane:", paths[-1], flush=True)
xspace = xplane_pb2.XSpace()
with open(paths[-1], "rb") as f:
    xspace.ParseFromString(f.read())

for plane in xspace.planes:
    if "TPU" not in plane.name and "Device" not in plane.name:
        continue
    stats = {}
    ev_meta = plane.event_metadata
    for line in plane.lines:
        for ev in line.events:
            name = ev_meta[ev.metadata_id].name
            # async copy-start/done spans cover whole-step intervals and
            # double-count massively — drop them from the attribution
            if name.startswith(("%copy-start", "%slice-start",
                                "%copy-done", "%slice-done")):
                continue
            dur = ev.duration_ps / 1e9   # ms
            agg = stats.setdefault(name, [0.0, 0])
            agg[0] += dur
            agg[1] += 1
    total = sum(v[0] for v in stats.values())
    print(f"\n== plane {plane.name}: {total / STEPS:.2f} ms/step device "
          f"busy (sum over lines; overlaps double-count)")
    for name, (ms, n) in sorted(stats.items(),
                                key=lambda kv: -kv[1][0])[:60]:
        print(f"  {ms / STEPS:8.3f} ms/step  x{n:4d}  {name[:110]}")
