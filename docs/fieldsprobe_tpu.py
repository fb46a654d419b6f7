"""Chain-timed TPU cost of the 3D field segments and particle-stage glue
(diagnosing the 76 ms 'bare' ablation reading)."""
import os, sys, time, types
sys.path.insert(0, "/root/repo")
os.environ.setdefault("LAMBDAPIC_LOG_LEVEL", "WARNING")
import numpy as np
import jax, jax.numpy as jnp
import bench as B

args = types.SimpleNamespace(nx=512, ny=768, ppc=8, tiling="cell",
                             rebin=1, steps=1, warmup=1, chunk=1,
                             capacity_factor=1.6, migration="fast")
sim, cbs = B.build("laser-target-3d", args)
sim.initialize()
sim._build_stepper([])
builder = sim._builder
state = sim.state
sc = {"key": jax.random.PRNGKey(0)}


def timeit(name, fn, state, n=6):
    # donate the carry: without donation every call copies the ~GB state
    f = jax.jit(lambda s: fn(fn(s)), donate_argnums=(0,))
    s = f(state)
    _ = np.asarray(s.fields.ey).ravel()[0]
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        s = f(s)
        _ = np.asarray(s.fields.ey).ravel()[0]
        best = min(best, (time.perf_counter() - t0) / 2)
    print(f"{name}: {best*1e3:.1f} ms", flush=True)


def fresh():
    # donation invalidates the input buffers: hand each probe its own copy
    return jax.tree.map(lambda a: a + 0 if hasattr(a, "dtype") else a,
                        sim.state)


timeit("seg1 (E+B half updates, CPML)",
       lambda s: builder.seg_fields_1(s, sc), fresh())
timeit("seg3 (B+laser+E)", lambda s: builder.seg_fields_2(s, sc), fresh())

# particle-stage glue with all operators off
for k in ("pusher", "interpolation", "current_deposition", "migration"):
    builder.switches[k] = False
timeit("seg2 glue (operators off)", lambda s: builder.seg_particles(s, sc),
       fresh())
builder.switches["migration"] = True
timeit("seg2 +migration", lambda s: builder.seg_particles(s, sc), fresh())
