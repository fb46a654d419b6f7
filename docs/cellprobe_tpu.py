"""TPU throughput probe for the cell-binned VPU engine primitives.

Times the two risky primitives of the round-2 cell-binned design
(docs/PARITY.md): (a) sublane sorts for migration, (b) the static
3x3-offset gather/deposit loops. All big arrays are passed as jit
arguments (NOT closure constants) — the axon relay rejects compile
requests with embedded multi-MB constants (HTTP 413).
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
sys.path.insert(0, "/root/repo")

# cell-binned layout probe: slots on sublanes, cells on lanes
CAP = 16
NX = NY = 768
N = NX * NY
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(-0.5, 0.5, (CAP, N)), jnp.float32)  # cell-local
y = jnp.asarray(rng.uniform(-0.5, 0.5, (CAP, N)), jnp.float32)
w = jnp.asarray(rng.uniform(0, 1, (CAP, N)), jnp.float32)
alive = jnp.asarray(rng.uniform(0, 1, (CAP, N)) < 0.5)
pay = [jnp.asarray(rng.standard_normal((CAP, N)), jnp.float32) for _ in range(6)]
F = jnp.asarray(rng.standard_normal((6, NX, NY)), jnp.float32)
ARGS = dict(x=x, y=y, w=w, alive=alive, pay=pay, F=F)
npart = CAP * N

def chain(name, body, n_iter=8):
    """Time body(args)->(CAP,N)-reducible scalar chained n_iter times."""
    def loop(a):
        def it(i, xx):
            a2 = dict(a); a2["x"] = xx
            s = body(a2)
            return xx + s * 1e-30
        return lax.fori_loop(0, n_iter, it, a["x"])[0, 0]
    f = jax.jit(loop)
    r = f(ARGS); _ = np.asarray(r)
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        _ = np.asarray(f(ARGS))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best/n_iter*1e3:.2f} ms/iter ({npart/(best/n_iter)/1e6:.0f} Mslot/s)", flush=True)

print("slots", npart, "backend", jax.default_backend(), flush=True)

# (a) sublane sort: 3cap-wide merge key sort along axis 0 with 9 payloads
def merge_sort(a):
    xx, yy, ww, al = a["x"], a["y"], a["w"], a["alive"]
    key = jnp.where(al, 0, 2).astype(jnp.int32)
    key3 = jnp.concatenate([key, key + 1, key + 1], axis=0)   # (3CAP, N)
    ops = [jnp.concatenate([p, p, p], axis=0) for p in [xx, yy, ww] + a["pay"]]
    out = lax.sort([key3] + ops, dimension=0, num_keys=1)
    return out[1][:CAP]
chain("sublane 3cap-merge sort (9 payloads)", merge_sort)

# (a2) single-cap key sort (the slab scheme)
def slab_sort(a):
    xx, yy, ww, al = a["x"], a["y"], a["w"], a["alive"]
    key = jnp.where(al, 2, 1).astype(jnp.int32)
    ops = [xx, yy, ww] + a["pay"]
    out = lax.sort([key] + ops, dimension=0, num_keys=1)
    return out[1]
chain("sublane cap-wide sort (9 payloads)", slab_sort)

# (b) 9-offset gather o-loop: 6 components, 4 tap combos
def gather_oloop(a):
    xx, yy, F = a["x"], a["y"], a["F"]
    Fp = jnp.pad(F, ((0, 0), (2, 3), (2, 3)))
    gx = [0.75 - xx * xx, 0.5 * (0.5 + xx) ** 2, 0.5 * (0.5 - xx) ** 2]
    hx = [0.75 - (xx - 0.5) ** 2, 0.5 * (xx) ** 2, 0.5 * (1.0 - xx) ** 2]
    gy = [0.75 - yy * yy, 0.5 * (0.5 + yy) ** 2, 0.5 * (0.5 - yy) ** 2]
    hy = [0.75 - (yy - 0.5) ** 2, 0.5 * (yy) ** 2, 0.5 * (1.0 - yy) ** 2]
    acc = [jnp.zeros_like(xx) for _ in range(6)]
    for ox in range(3):
        for oy in range(3):
            fg = [lax.dynamic_slice(Fp[c], (2 + ox - 1, 2 + oy - 1),
                                    (NX, NY)).reshape(N) for c in range(6)]
            whh = hx[ox] * hy[oy]
            wgh = gx[ox] * hy[oy]
            whg = hx[ox] * gy[oy]
            wgg = gx[ox] * gy[oy]
            acc[0] += whg * fg[0][None, :]
            acc[1] += wgh * fg[1][None, :]
            acc[2] += wgg * fg[2][None, :]
            acc[3] += wgh * fg[3][None, :]
            acc[4] += whg * fg[4][None, :]
            acc[5] += whh * fg[5][None, :]
    return acc[0] + acc[1] + acc[2] + acc[3] + acc[4] + acc[5]
chain("gather o-loop 3x3 (6 comps)", gather_oloop)

# (c) deposit o-loop: per-offset weights, sublane-reduce, shift-add
def deposit_oloop(a):
    xx, yy, ww = a["x"], a["y"], a["w"]
    s0x = [0.75 - xx * xx, 0.5 * (0.5 + xx) ** 2, 0.5 * (0.5 - xx) ** 2]
    s0y = [0.75 - yy * yy, 0.5 * (0.5 + yy) ** 2, 0.5 * (0.5 - yy) ** 2]
    out = jnp.zeros((4, NX + 5, NY + 5), jnp.float32)
    for ox in range(3):
        for oy in range(3):
            vals = s0x[ox] * s0y[oy] * ww
            cell = vals.sum(0).reshape(NX, NY)     # sublane reduce
            for ch in range(4):
                out = lax.dynamic_update_slice(
                    out, lax.dynamic_slice(out, (ch, ox, oy), (1, NX, NY))
                    + cell[None], (ch, ox, oy))
    return out[:1, :CAP, :N // NX * 0 + NY].reshape(CAP, -1)[:, :N // CAP * 0 + 1] * 0 + xx * 1e-30 + out[0, 0, 0]
chain("deposit o-loop 3x3 (4 ch)", deposit_oloop)
