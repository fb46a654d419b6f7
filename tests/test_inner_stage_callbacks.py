"""Host callbacks at inner stages (_push_position_1 .. _push_position_2)
force the split particle path: one jitted sub-segment per stage with host
callbacks between (reference disables the unified pusher then,
simulation.py:896-911). The split path must reproduce the fused step."""
import numpy as np
import pytest

from lambdapic_tpu import Electron, Proton, SimpleLaser2D, Simulation
from lambdapic_tpu.simulation.callbacks import callback
from lambdapic_tpu.core.species import _ALL_SPECIES

um = 1e-6
l0 = 0.8 * um
nc = 1.742e27


@pytest.fixture(autouse=True)
def clear_species_registry():
    _ALL_SPECIES.clear()
    yield
    _ALL_SPECIES.clear()


def run_case(tiling, inner_cb=None, nsteps=4):
    _ALL_SPECIES.clear()

    def density(x, y):
        return np.where((x > 1.2 * um) & (x < 3 * um), 2 * nc, 0.0)

    ele = Electron(density=density, ppc=3)
    pro = Proton(density=density, ppc=3)
    sim = Simulation(nx=48, ny=32, dx=l0 / 10, dy=l0 / 10,
                     npatch_x=2, npatch_y=2, random_seed=7,
                     precision="double", tiling=tiling)
    sim.add_species([ele, pro])
    cbs = [SimpleLaser2D(a0=5, w0=2 * um, ctau=2 * um)]
    if inner_cb is not None:
        cbs.append(inner_cb)
    sim.run(nsteps=nsteps, callbacks=cbs)
    fields = {n: sim.get_field(n) for n in ("ex", "ey", "rho", "jx")}
    return sim, fields, [sim.get_particles(i) for i in range(2)]


@pytest.mark.parametrize("tiling", [None, "cell"])
def test_inner_stage_callback_runs_and_matches(tiling):
    seen = []

    @callback(stage="_interpolator", interval=1)
    def probe(sim):
        # gathered fields are fresh at this stage (reference stage _qed
        # reads them next)
        seen.append(sim.itime)

    _, f_ref, p_ref = run_case(tiling)
    _, f_spl, p_spl = run_case(tiling, inner_cb=probe)
    assert seen == [0, 1, 2, 3]
    for name in f_ref:
        scale = np.abs(f_ref[name]).max() + 1e-30
        np.testing.assert_allclose(f_spl[name], f_ref[name],
                                   atol=1e-9 * scale, err_msg=name)
    for i in range(2):
        for k in ("x", "y", "ux", "uy", "w"):
            np.testing.assert_allclose(np.sort(p_spl[i][k]),
                                       np.sort(p_ref[i][k]),
                                       rtol=1e-9, atol=1e-12,
                                       err_msg=f"species {i} {k}")


def test_inner_stage_callback_can_mutate_state():
    """A host hook at _push_momentum that zeroes uz must take effect
    (the reference contract: callbacks may mutate sim state between
    stages)."""
    import jax.numpy as jnp

    @callback(stage="_push_momentum", interval=1)
    def kill_uz(sim):
        parts = list(sim.state.particles)
        p0 = parts[0]
        parts[0] = p0.replace(data={**p0.data,
                                    "uz": jnp.zeros_like(p0.data["uz"])})
        sim.state = sim.state.replace(particles=tuple(parts))

    sim, _, parts = run_case("cell", inner_cb=kill_uz, nsteps=3)
    assert np.abs(parts[0]["uz"]).max() == 0.0
