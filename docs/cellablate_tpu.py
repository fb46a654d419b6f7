"""Step-cost ablation for the cell engine on TPU: times the bench
laser-target config with operator groups toggled off to attribute
per-step cost. Usage: python docs/cellablate_tpu.py [steps]"""
import sys, time, types, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("LAMBDAPIC_LOG_LEVEL", "WARNING")
import numpy as np
import jax

import bench as B


CONFIG = os.environ.get("ABL_CONFIG", "laser-target")


def run_case(label, steps=int(os.environ.get("ABL_STEPS", 15)), **switches):
    args = types.SimpleNamespace(nx=768, ny=768, ppc=10, tiling="cell",
                                 rebin=1, steps=steps, warmup=2, chunk=1,
                                 capacity_factor=1.6, migration="fast",
                                 nspecies=int(os.environ.get("ABL_NSPECIES",
                                                             2)))
    if CONFIG == "laser-target-3d":
        args.nx = 512          # build() maps to n3 = 128
        args.ppc = 8
    sim, cbs = B.build(CONFIG, args)
    sim.recap_interval = 0
    sim.step_chunk = 1     # per-step dispatch: ablation timings stay comparable
    for k, v in switches.items():
        sim.set_enabled(k, v)
    sim.run(nsteps=2, callbacks=cbs)
    jax.block_until_ready(sim.state)
    _ = np.asarray(sim.state.fields.ey).ravel()[0]
    t0 = time.perf_counter()
    sim.run(nsteps=steps, callbacks=cbs)
    jax.block_until_ready(sim.state)
    _ = np.asarray(sim.state.fields.ey).ravel()[0]
    el = time.perf_counter() - t0
    print(f"{label}: {el/steps*1e3:.1f} ms/step", flush=True)
    return el / steps


import sys
cases = sys.argv[1:] or ["full", "nomig", "bare"]
if "full" in cases:
    run_case("full")
if "nomig" in cases:
    run_case("no migration", migration=False)
if "bare" in cases:
    run_case("bare (fields+glue only)", migration=False, pusher=False,
             interpolation=False, current_deposition=False)
if "nodep" in cases:
    run_case("no deposit", current_deposition=False)
if "noblock" in cases:
    run_case("no species block", species_block=False)
