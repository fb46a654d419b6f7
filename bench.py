#!/usr/bin/env python
"""Benchmark: macroparticle pushes/sec/chip on the 2D laser-target config
(BASELINE.md: example/laser-target.py analog; target >= 1e9 pushes/s/chip).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
"""
import argparse
import json
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=768)
    ap.add_argument("--ny", type=int, default=768)
    ap.add_argument("--ppc", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--cpu-fallback-size", type=int, default=128,
                    help="problem size if no accelerator is present")
    ap.add_argument("--tiling", type=str, default="16,16",
                    help="'TX,TY' tile-binned dense path (default), or "
                         "'none' for the scatter/gather path")
    args = ap.parse_args()
    tiling = None if args.tiling == "none" else tuple(
        int(v) for v in args.tiling.split(","))

    os.environ.setdefault("LAMBDAPIC_LOG_LEVEL", "WARNING")
    os.environ.setdefault("LAMBDAPIC_COMPILE_CACHE", "1")
    import jax
    on_accel = jax.default_backend() not in ("cpu",)
    if not on_accel:
        # keep the smoke-run tractable on CPU
        args.nx = args.ny = args.cpu_fallback_size
        args.ppc = 4
        args.steps = 5
        args.warmup = 1

    from lambdapic_tpu import Electron, Proton, Simulation, SimpleLaser2D

    um = 1e-6
    l0 = 0.8 * um
    nc = 1.742e27
    dx = l0 / 16
    Lx = args.nx * dx

    def density(x, y):
        return np.where(x > Lx / 3, 10 * nc, 0.0)

    ele = Electron(density=density, ppc=args.ppc)
    pro = Proton(density=density, ppc=args.ppc)
    sim = Simulation(nx=args.nx, ny=args.ny, dx=dx, dy=dx,
                     npatch_x=1, npatch_y=1, random_seed=0,
                     precision="single", tiling=tiling)
    sim.add_species([ele, pro])
    laser = SimpleLaser2D(a0=30, w0=3 * um, ctau=8 * um)

    sim.run(nsteps=args.warmup, callbacks=[laser])
    jax.block_until_ready(sim.state)
    npart = sum(sim.npart_alive)

    t0 = time.perf_counter()
    sim.run(nsteps=args.steps, callbacks=[laser])
    jax.block_until_ready(sim.state)
    elapsed = time.perf_counter() - t0

    pushes_per_sec = npart * args.steps / elapsed
    steps_per_sec = args.steps / elapsed
    result = {
        "metric": "macroparticle-pushes/sec/chip (2D laser-target)",
        "value": float(f"{pushes_per_sec:.4g}"),
        "unit": "pushes/s",
        "vs_baseline": float(f"{pushes_per_sec / 1e9:.4g}"),
        "extra": {
            "backend": jax.default_backend(),
            "nx": args.nx, "ny": args.ny, "npart": int(npart),
            "steps_per_sec": float(f"{steps_per_sec:.4g}"),
            "tiling": args.tiling,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
