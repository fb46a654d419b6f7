"""Jitted step construction.

Builds the TPU-native analog of the reference main loop
(simulation/simulation.py:937-1141). One simulation step is composed of
three segments so host callbacks can run at stage boundaries:

    seg_fields_1   : E += dt/2 ; B += dt/2            («maxwell_1» boundary)
    seg_particles  : per species fused block =
                     pos(dt/2) -> gather -> push -> pos(dt/2) -> Esirkepov
                     -> halo-reduce J -> migrate     (the unified pusher,
                     reference unified_pusher_2d.c:157-365, in one shard_map)
    seg_fields_2   : B += dt/2 ; lasers ; E += dt/2   («maxwell_2» boundary)

When no host callback is due at an interior boundary the fully fused
``full_step`` (jit of all three) runs — the analog of the reference's
unified-pusher auto-selection (simulation.py:896-911).

Guard-cell traffic: ONE stacked halo-pad of the 6 EM components feeds every
species' gather; per-species padded J/rho deposits are summed and folded
back with ONE halo-reduce (reference does this with n_guard-wide MPI syncs,
core/mpi/sync_fields2d.c).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from ..core.grid import Grid
from ..core.state import FieldsState, ParticlesState, SimulationState
from ..ops.cpml import CPMLCoeffs
from ..ops.deposition import deposit_2d, deposit_3d
from ..ops.interpolation import gather_eb_2d, gather_eb_3d
from ..ops.maxwell import update_bfield, update_efield
from ..ops.pusher import (boris_push, photon_push, push_position_2d,
                          push_position_3d)
from ..ops.tiled2d import (TileCfg, _roll_with_edge_exchange,
                           deposit_tiled, extract_windows,
                           fold_windows, gather_tiled, migrate_tiled)
from ..parallel.halo import HaloSpec, halo_pad, halo_reduce
from ..parallel.migrate import migrate_2d, migrate_3d
from ..constants import c as c_light

try:
    from jax import shard_map as _shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map


@dataclass(frozen=True)
class SpeciesStatic:
    """Static (trace-time) per-species info."""

    name: str
    q: float
    m: float
    pusher: str          # 'boris' | 'photon' | 'boris+tbmt'
    cap: int
    migration_buf: int
    has_qed: bool = False
    tile_cap: int = 0    # per-tile capacity when the tiled path is active


def donation_argnums() -> tuple:
    """Buffer donation for the step functions (in-place state reuse).

    Default OFF since round 3: the slab megakernel passes every payload
    array as three operands (main blocks + lo/hi neighbor-column refs),
    and with donated in-place buffers XLA inserts defensive full-array
    copies to keep the duplicate reads valid — a measured ~1.5 ms/step
    of %copy ops at the 3D bench shape (380 -> 437 Mpush/s when
    disabled). Round 1, before the slab kernel, donation measured
    FASTER (2D bench 180 vs 98 Mpush/s) — re-evaluate if the operand
    structure changes. Peak HBM roughly doubles for the particle state
    without donation; override with LAMBDAPIC_DONATE=1 when memory
    headroom matters more than step time.
    """
    import os
    v = os.environ.get("LAMBDAPIC_DONATE")
    if v is not None:
        return (0,) if v.lower() in ("1", "on", "true") else ()
    return ()


class StepBuilder:
    def __init__(self, grid: Grid, mesh, cpml: Optional[CPMLCoeffs],
                 dt: float, species: Sequence[SpeciesStatic],
                 lasers: Sequence = (), qed_processes: Sequence = (),
                 sorters: Sequence = (), collisions=None,
                 switches: Optional[Dict[str, bool]] = None,
                 tile_cfg: Optional[TileCfg] = None,
                 tile_backend: str = "xla",
                 rebin_interval: int = 1,
                 cell_layout: bool = False,
                 cell_migration: str = "fast",
                 with_rho: bool = True):
        # tile-binned dense particle path (ops/tiled2d.py); None = the
        # reference-layout scatter/gather path
        self.tile_cfg = tile_cfg
        # "xla": dense tap matrices in HBM (ops/tiled2d.py);
        # "pallas": taps fused into per-tile VMEM contractions
        # (ops/tiled2d_pallas.py)
        self.tile_backend = tile_backend
        # tiled path: re-bin every R steps instead of every step (the tile
        # halo h = n_guard must cover R steps of CFL drift; validated by
        # Simulation). The migration sorts are the dominant step cost, so
        # this divides them by R.
        self.rebin_interval = rebin_interval
        # per-CELL slot layout (ops/cell2d.py): slots on the sublane axis,
        # cells on the lane axes — the round-2 engine, opt-in
        self.cell_layout = cell_layout
        # "fast" overwrite-merge vs "exact" 3*cap concat-merge re-binning
        self.cell_migration = cell_migration
        # deposit rho in the hot loop (reference current_deposit.h
        # deposits jx,jy,jz,rho every step). False = the slab kernel
        # deposits J only and Simulation recomputes rho on demand
        # (get_field("rho") / diagnostics) — rho is never consumed by
        # the field update itself.
        self.with_rho = with_rho
        # runtime operator toggles (reference EnableMixin,
        # core/utils/enable_mixin.py:4-38): maxwell, pusher,
        # current_deposition, qed, collisions, interpolation
        self.switches = dict(maxwell=True, pusher=True,
                             current_deposition=True, qed=True,
                             collisions=True, interpolation=True,
                             migration=True,
                             # timing-ablation only: skip the species
                             # shard_map block entirely
                             species_block=True)
        if switches:
            self.switches.update(switches)
        self.grid = grid
        self.mesh = mesh
        self.cpml = cpml
        self.dt = dt
        self.species = tuple(species)
        self.lasers = tuple(lasers)
        self.qed_processes = tuple(qed_processes)
        self.sorters = tuple(sorters)
        self.collisions = collisions
        names = grid.axis_names
        shape = grid.mesh_shape
        periodic = [grid.periodic(ax) for ax in ("x", "y", "z")[:grid.dimension]]
        self.halo_specs = tuple(
            HaloSpec(names[i], shape[i], periodic[i])
            for i in range(grid.dimension))
        self._p_field = P(*names)
        self._p_stack = P(None, *names)
        self._p_part = P(*names)      # (npx, npy[, npz], cap): cap replicated
        # slab rim panels (4, nbx, bx+4, ny+2g[, nz+2g]): panel axis
        # follows the x mesh split; trailing padded dims replicated (the
        # slab path requires y/z-unsplit meshes)
        self._p_rims = P(None, names[0])
        # fused Pallas fields half-updates (ops/fieldspallas.py) are not
        # SPMD-partitionable: only eligible on a one-device mesh
        import numpy as _np
        self._fields_pl_mesh = int(_np.prod(grid.mesh_shape)) == 1
        self._damping = None          # masked-domain sponge (mask_simulation)
        self._domain_mask = None
        # ispec -> True when the species block refreshes the gathered-field
        # slots (ex_part..bz_part) each step; plain fused species leave them
        # stale (see make_species_block out_keys) and diagnostics must not
        # expose them
        self.transients_valid: Dict[int, bool] = {}

    def _log_engine(self, ispec, sp, cell_layout, use_pallas_cell,
                    fused_static, use_slab, slab_reason, split):
        """One INFO line per species per stepper build naming the
        engaged particle engine and, when the slab fast path is NOT
        engaged, the first failed eligibility predicate — fast-path
        cliffs (nx%8, y/z-split meshes, exact migration, ...) cost 3-5x
        and must never be silent."""
        from ..utils.logger import logger as _log
        if not cell_layout:
            if self.tile_cfg is not None:
                engine = f"tiled-{self.tile_backend}"
            else:
                engine = "scatter (reference-layout XLA)"
        elif use_slab:
            engine = "slab megakernel (fused pallas)"
        elif fused_static and use_pallas_cell:
            engine = "cell per-stage pallas (fused push)"
        elif use_pallas_cell:
            engine = "cell per-stage pallas"
        else:
            engine = "cell XLA kernels"
        msg = f"species {sp.name}: engine = {engine}"
        if cell_layout and not use_slab:
            if slab_reason is None and split:
                slab_reason = ("split stepping (host callback on an "
                               "inner stage)")
            elif slab_reason is None and not use_pallas_cell:
                slab_reason = ("pallas cell kernels unavailable "
                               "(CPU backend or VMEM shape limits)")
            elif slab_reason is None:
                slab_reason = "slab preconditions (see slab_reject_reason)"
            msg += f" [slab fast path off: {slab_reason}]"
        # one line per (species, reason) per build — the split path
        # rebuilds sub-segments repeatedly and must not spam
        key = (ispec, msg)
        seen = getattr(self, "_engine_logged", None)
        if seen is None:
            seen = self._engine_logged = set()
        if key not in seen:
            seen.add(key)
            _log.info(msg)

    def set_domain_mask(self, domain_mask, damping):
        """Enable masked-domain mode (simulation/mask_simulation.py): fields
        are damped by `damping` each half-update and particles die outside
        `domain_mask`."""
        self._domain_mask = jnp.asarray(domain_mask)
        self._damping = jnp.asarray(damping, dtype=jnp.float32)

    # ------------------------------------------------------------------
    def _smap(self, fn, in_specs, out_specs):
        # check_vma=False: blocks legitimately mix device-varying data with
        # freshly-created (invariant) accumulators, e.g. the chunked
        # deposition scan carry
        try:
            return _shard_map(fn, mesh=self.mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=False)
        except TypeError:
            return _shard_map(fn, mesh=self.mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False)

    # ------------------------------------------------------------------
    def make_pad_eb(self) -> Callable:
        g = self.grid.n_guard
        specs = self.halo_specs
        ndim = self.grid.dimension

        def pad(stacked):
            return halo_pad(stacked, g, tuple(range(1, 1 + ndim)), specs)

        return self._smap(pad, (self._p_stack,), self._p_stack)

    def make_reduce_j(self) -> Callable:
        g = self.grid.n_guard
        specs = self.halo_specs
        ndim = self.grid.dimension

        def red(jpad):
            return halo_reduce(jpad, g, tuple(range(1, 1 + ndim)), specs)

        return self._smap(red, (self._p_stack,), self._p_stack)

    def make_fold_reduce(self) -> Callable:
        """Fold species-summed slab rim panels into the padded J and
        reduce the guard rims — one pass for all slab species instead of
        a per-species fold (reference sync_currents,
        patch/sync_fields2d.c:77-84)."""
        g = self.grid.n_guard
        specs = self.halo_specs
        ndim = self.grid.dimension
        grid = self.grid
        nloc = (grid.nx_loc, grid.ny_loc, grid.nz_loc)[:ndim]

        def red(rims):
            from ..ops.cellslab import (fold_pallas_enabled,
                                        fold_reduce_slab,
                                        fold_slab_supported)
            if fold_pallas_enabled() and fold_slab_supported(
                    nloc, g, rims.shape[0], rims.dtype.itemsize):
                return fold_reduce_slab(
                    rims, nloc=nloc, g=g, spec0=specs[0],
                    periodic=tuple(s.periodic for s in specs))
            from ..ops.cellpallas import _fold_cfirst
            from ..ops.cellslab import slab_bx
            b = slab_bx(nloc[0], ndim)
            jpad = _fold_cfirst(rims, nloc[0], g, b)
            return halo_reduce(jpad, g, tuple(range(1, 1 + ndim)), specs)

        return self._smap(red, (self._p_rims,), self._p_stack)

    # ------------------------------------------------------------------
    ALL_SUBSTAGES = frozenset(
        {"p1", "interp", "qed", "mom", "p2", "deposit"})

    def make_species_block(self, ispec: int, migrate: bool = True,
                           stages: frozenset = ALL_SUBSTAGES) -> Callable:
        """Fused per-species particle stage (reference stage sequence
        «_push_position_1 .. current_deposition» plus migration,
        simulation.py:983-1077). ``migrate=False`` (tiled path only) skips
        the re-binning pass — legal for up to rebin_interval-1 consecutive
        steps when the tile halo covers the accumulated drift.

        ``stages`` restricts the block to a subset of the sub-stages
        {p1, interp, qed, mom, p2, deposit} — the split path used when a
        host callback occupies an inner stage (the analog of the
        reference disabling the unified pusher, simulation.py:896-911).
        Sub-segments communicate through the particle arrays themselves:
        p1/p2 write the half-pushed positions back into data['x'...],
        interp writes the gathered fields into data['ex_part'...]."""
        grid = self.grid
        sp = self.species[ispec]
        g = grid.n_guard
        dt = self.dt
        ndim = grid.dimension
        specs = self.halo_specs
        qed = [p for p in self.qed_processes if p.ispec == ispec]

        cdt = [c_light * dt / d
               for d in (grid.dx, grid.dy, grid.dz)[:ndim]]
        nloc = (grid.nx_loc, grid.ny_loc, grid.nz_loc)[:ndim]

        axis_names = grid.axis_names
        mesh_shape = grid.mesh_shape

        tile_cfg = self.tile_cfg
        if tile_cfg is not None:
            import dataclasses as _dc
            tile_cfg = _dc.replace(tile_cfg, cap_t=sp.tile_cap)
        if self.tile_backend == "pallas":
            from ..ops.tiled2d_pallas import (deposit_tiled_pallas as
                                              _dep_tiled,
                                              extract_windows_mxu as
                                              _ext_win,
                                              fold_windows_mxu as _fold_win,
                                              gather_tiled_pallas as
                                              _gat_tiled)
        else:
            _dep_tiled, _gat_tiled = deposit_tiled, gather_tiled
            _ext_win, _fold_win = extract_windows, fold_windows

        cell_layout = self.cell_layout
        if cell_layout:
            from ..ops.cellpallas import pallas_cell_ok
            use_pallas_cell = (self.tile_backend == "pallas"
                               and pallas_cell_ok(nloc, sp.tile_cap))
        else:
            use_pallas_cell = False
        split = stages != self.ALL_SUBSTAGES

        # static slab-megakernel decision (identical logic re-derived
        # inside `local`): the wrapper needs it to pick the payload out
        # spec — slab species return raw rim panels so seg_particles can
        # sum rims across species and fold+reduce ONCE
        fused_static = (not split and use_pallas_cell
                        and self.switches["pusher"]
                        and self.switches["interpolation"]
                        and sp.pusher in ("boris", "boris+tbmt"))
        # photon species take the field-free slab mode (merge + 1/|u| +
        # half push, no gather/deposit) — the per-stage pipeline costs
        # a full migration pass over a mostly-dead cap-16 child array
        photon_candidate = (not split and use_pallas_cell
                            and self.switches["pusher"]
                            and sp.pusher == "photon")
        use_slab_static = False
        slab_reason = None
        if cell_layout and (fused_static or photon_candidate) \
                and self.switches["migration"]:
            from ..ops.cellslab import slab_reject_reason
            plan_static = tuple((nloc[i], specs[i], ("x", "y", "z")[i])
                                for i in range(ndim))
            slab_reason = slab_reject_reason(
                plan_static, nloc, sp.tile_cap, self.switches, sp,
                self.cell_migration, bool(qed), split)
            use_slab_static = slab_reason is None
        photon_slab = use_slab_static and sp.pusher == "photon"
        self._log_engine(ispec, sp, cell_layout, use_pallas_cell,
                         fused_static, use_slab_static, slab_reason,
                         split)

        def local(eb_pad, data, alive, next_id, overflow, key, *extra):
            # trailing positional extras: [domain_mask?] [rims_in?]
            rims_in_loc = None
            mask_args = list(extra)
            if getattr(self, "_block_rims_in", False):
                rims_in_loc = mask_args.pop()
            lead = alive.shape[:ndim]        # (1,) * ndim device axes
            if cell_layout:
                shape = (sp.tile_cap,) + tuple(nloc)
            elif tile_cfg is not None:
                shape = (tile_cfg.ntx, tile_cfg.nty, tile_cfg.cap_t)
            else:
                shape = (alive.shape[-1],)
            cap = alive.shape[-1]
            data = {k: v.reshape(shape) for k, v in data.items()}
            alive = alive.reshape(shape)
            next_id = next_id.reshape(())
            overflow = overflow.reshape(())
            # per-device RNG stream (analog of per-patch rng.spawn,
            # reference simulation.py:700-716)
            didx = jnp.int32(0)
            for name, size in zip(axis_names, mesh_shape):
                didx = didx * size + jax.lax.axis_index(name)
            key = jax.random.fold_in(key, didx)

            # fused pallas path: gather/Boris/pos in one VMEM-resident
            # kernel (ops/cellpallas.py) after the XLA half push +
            # re-binning below. QED chi/events run AFTER it on the
            # pre-push momenta still held in ``data`` — order-equivalent
            # to the reference _interpolator -> _qed -> _push_momentum
            # sequence.
            fused = (not split and use_pallas_cell
                     and self.switches["pusher"]
                     and self.switches["interpolation"]
                     and sp.pusher in ("boris", "boris+tbmt"))

            # slab megakernel: the ENTIRE particle stage (re-binning +
            # gather + Boris + push + deposit) in one pallas kernel over
            # x-slabs (ops/cellslab.py — the full TPU analog of the
            # reference unified pusher + sort + sync_particles). Engages
            # on the plain fused path; QED/split/exact-migration/photon
            # species and y/z-sharded meshes use the per-stage kernels.
            plan = tuple((nloc[i], specs[i], ("x", "y", "z")[i])
                         for i in range(ndim)) if cell_layout else None
            use_slab = use_slab_static       # hoisted static decision

            # position half push (reference stage _push_position_1).
            # The slab megakernel applies it in-kernel (v2) — skip the
            # XLA pass entirely on that path.
            ig = data["inv_gamma"]
            if use_slab or not (self.switches["pusher"]
                                and "p1" in stages):
                pos = (data["x"], data["y"]) if ndim == 2 else (
                    data["x"], data["y"], data["z"])
            elif ndim == 2:
                x, y = push_position_2d(data["x"], data["y"], data["ux"],
                                        data["uy"], ig, cdt[0] / 2, cdt[1] / 2)
                pos = (x, y)
            else:
                pos = push_position_3d(data["x"], data["y"], data["z"],
                                       data["ux"], data["uy"], data["uz"], ig,
                                       cdt[0] / 2, cdt[1] / 2, cdt[2] / 2)

            # cell layout: re-bin at the MID-step position, between the
            # first half push and the gather. This keeps the gather
            # deltas in [-0.5, 0.5) (the 3/4-tap stencils are exact
            # there) AND keeps both Esirkepov segment endpoints
            # delta -+ v/2 within the 5-tap deposit stencil; it also
            # means open-boundary absorption happens BEFORE a particle's
            # step rather than between its push and its deposit, so the
            # final half-step current of an exiting particle is never
            # dropped. Drift since the previous (mid-step) re-binning is
            # v_prev/2 + v_this/2 <= CFL < 1, so one +-1-cell hop
            # suffices.
            cell_lost = jnp.int32(0)
            if cell_layout and not self.switches["migration"]:
                # ablation-only escape hatch: without re-binning the
                # stencil contract degrades (set_enabled docstring)
                from ..utils.logger import logger as _log
                _log.warning("cell engine running with migration "
                             "disabled: physics is invalid (timing "
                             "ablations only)")
            slab_done = False
            if cell_layout and self.switches["migration"] \
                    and "p1" in stages and use_slab and photon_slab:
                # field-free photon slab: merge + inv_gamma=1/|u| +
                # second half push in one kernel; no J contribution
                from ..ops.cellslab import slab_species_step
                data, alive, cell_lost, _ = slab_species_step(
                    eb_pad, data, alive, plan, q=sp.q, m=sp.m, dt=dt,
                    deltas=(grid.dx, grid.dy, grid.dz)[:ndim], g=g,
                    fold=False, with_rho=self.with_rho, photon=True)
                jpad = jnp.zeros(lead, data["x"].dtype)
                pos = tuple(data[c] for c in ("x", "y", "z")[:ndim])
                ux, uy, uz = data["ux"], data["uy"], data["uz"]
                ig = data["inv_gamma"]
                slab_done = True
            elif cell_layout and self.switches["migration"] \
                    and "p1" in stages and use_slab:
                # stored (pre-push) positions + inv_gamma go straight
                # into the kernel; it applies the first half push
                from ..ops.cellslab import slab_species_step
                want_chi = bool(qed) and self.switches["qed"]
                outs = slab_species_step(
                    eb_pad, data, alive, plan, q=sp.q, m=sp.m, dt=dt,
                    deltas=(grid.dx, grid.dy, grid.dz)[:ndim], g=g,
                    fold=False,       # jpad = raw rim panels here
                    rims_in=rims_in_loc,  # chain prev species' rims
                    with_rho=self.with_rho, want_chi=want_chi)
                data, alive, cell_lost, jpad = outs[:4]
                if want_chi:
                    # QED events from the in-kernel chi + pre-push
                    # inv_gamma (reference _qed stage inputs); the
                    # tau/event/delta updates are elementwise XLA
                    chi_k, ig0_k = outs[4]
                    for proc in qed:
                        data, alive = proc.update_events_from_chi(
                            data, alive, key, dt, chi_k, ig0_k)
                pos = tuple(data[c] for c in ("x", "y", "z")[:ndim])
                ux, uy, uz = data["ux"], data["uy"], data["uz"]
                ig = data["inv_gamma"]
                slab_done = True
            elif cell_layout and self.switches["migration"] \
                    and "p1" in stages:
                data["x"] = pos[0]
                data["y"] = pos[1]
                if ndim == 3:
                    data["z"] = pos[2]
                import os as _os
                want_fused = _os.environ.get(
                    "LAMBDAPIC_MIG_FUSED", "1") != "0"
                if use_pallas_cell and want_fused \
                        and self.cell_migration != "exact":
                    # fused per-axis kernel: in-VMEM sort + neighbor
                    # exchange + merge, one HBM round-trip per payload
                    # (replaces sort kernel + 6 rolls + merge selects)
                    from ..ops.cellpallas import migrate_cells_fused
                    data, alive, cell_lost = migrate_cells_fused(
                        data, alive, plan,
                        recompute_ig=(sp.pusher != "photon"))
                else:
                    sort_fn = None
                    if use_pallas_cell and self.cell_migration != "exact":
                        from ..ops.cellpallas import sort_cells_pallas
                        sort_fn = sort_cells_pallas
                    from ..ops.cell2d import migrate_cells
                    data, alive, cell_lost = migrate_cells(
                        data, alive, plan,
                        recompute_ig=(sp.pusher != "photon"),
                        exact=(self.cell_migration == "exact"),
                        sort_fn=sort_fn)
                pos = tuple(data[c] for c in ("x", "y", "z")[:ndim])
                ig = data["inv_gamma"]

            # block-occupancy skipping for the pallas kernels: vacuum
            # blocks (no alive slot) cost one SMEM scalar read instead of
            # the full tap/sort work — exact, since particles only ever
            # touch their home block post-re-bin. Recomputed fresh before
            # each consumer (alive can shrink via QED between K1 and the
            # deposit; callbacks can mutate it on the split path).
            def _occ():
                from ..ops.cellpallas import (block_occupancy,
                                              occ_skip_enabled)
                if not occ_skip_enabled():
                    return None
                return block_occupancy(alive)

            if slab_done:
                pass                     # pushed + deposited in-kernel
            elif fused:
                from ..ops.cellpallas import (fused_push_cell_2d,
                                              fused_push_cell_3d)
                want_eb = bool(qed)
                if ndim == 2:
                    outs = fused_push_cell_2d(
                        eb_pad, pos[0], pos[1], data["ux"],
                        data["uy"], data["uz"], q=sp.q, m=sp.m, dt=dt,
                        dx=grid.dx, dy=grid.dy, g=g, want_eb=want_eb,
                        do_pos1=False, occ=_occ())
                    new_pos, new_u = outs[:2], outs[2:5]
                    new_ig, ebs = outs[5], outs[6:]
                else:
                    outs = fused_push_cell_3d(
                        eb_pad, pos[0], pos[1], pos[2],
                        data["ux"], data["uy"], data["uz"], q=sp.q,
                        m=sp.m, dt=dt, dx=grid.dx, dy=grid.dy,
                        dz=grid.dz, g=g, want_eb=want_eb, do_pos1=False,
                        occ=_occ())
                    new_pos, new_u = outs[:3], outs[3:6]
                    new_ig, ebs = outs[6], outs[7:]
                if want_eb:
                    for name, v in zip(("ex_part", "ey_part", "ez_part",
                                        "bx_part", "by_part", "bz_part"),
                                       ebs):
                        data[name] = v
                if self.switches["qed"]:
                    for proc in qed:
                        data, alive = proc.update_chi_and_events(
                            data, alive, key, dt)
                ux, uy, uz = new_u
                ig = new_ig
                pos = tuple(new_pos)

            # gather (reference stage _interpolator)
            if fused or slab_done:
                pass
            elif self.switches["interpolation"] and "interp" in stages:
                if cell_layout and ndim == 2:
                    from ..ops.cell2d import gather_cell_2d
                    eb_p = gather_cell_2d(eb_pad, pos[0], pos[1], g)
                elif cell_layout:
                    from ..ops.cell3d import gather_cell_3d
                    eb_p = gather_cell_3d(eb_pad, pos[0], pos[1], pos[2], g)
                elif tile_cfg is not None:
                    windows = _ext_win(eb_pad, tile_cfg)
                    eb_p = _gat_tiled(windows, pos[0], pos[1], tile_cfg)
                elif ndim == 2:
                    eb_p = gather_eb_2d(*[eb_pad[i] for i in range(6)],
                                        *pos, g)
                else:
                    eb_p = gather_eb_3d(*[eb_pad[i] for i in range(6)],
                                        *pos, g)
                # the stored copies feed the QED chi update and the split
                # path's later sub-stages; for a plain fused species they
                # are dead weight (6 full-array outputs per step), so the
                # slots go stale instead
                if qed or split:
                    for name, v in zip(("ex_part", "ey_part", "ez_part",
                                        "bx_part", "by_part", "bz_part"),
                                       eb_p):
                        data[name] = v
            else:
                eb_p = tuple(data[name] for name in
                             ("ex_part", "ey_part", "ez_part",
                              "bx_part", "by_part", "bz_part"))

            # QED chi update + event sampling (reference stage _qed)
            if self.switches["qed"] and not fused and "qed" in stages:
                for proc in qed:
                    data, alive = proc.update_chi_and_events(data, alive,
                                                             key, dt)

            # momentum push (reference stage _push_momentum)
            if fused:
                pass
            elif not (self.switches["pusher"] and "mom" in stages):
                ux, uy, uz = data["ux"], data["uy"], data["uz"]
                ig = data["inv_gamma"]
            elif sp.pusher in ("boris", "boris+tbmt"):
                # 'boris+tbmt': momentum pushed with Boris; TBMT spin
                # precession is a stub in the reference too
                # (pusher/pusher.py:149-168 BorisTBMTPusher.__call__ = ...)
                ux, uy, uz, ig = boris_push(
                    data["ux"], data["uy"], data["uz"], *eb_p,
                    sp.q, sp.m, dt)
            elif sp.pusher == "photon":
                ux, uy, uz = data["ux"], data["uy"], data["uz"]
                ig = photon_push(ux, uy, uz)
            else:
                raise NotImplementedError(f"pusher {sp.pusher}")

            # position half push (reference stage _push_position_2)
            if fused or not (self.switches["pusher"] and "p2" in stages):
                pass
            elif ndim == 2:
                x, y = push_position_2d(pos[0], pos[1], ux, uy, ig,
                                        cdt[0] / 2, cdt[1] / 2)
                pos = (x, y)
            else:
                pos = push_position_3d(*pos, ux, uy, uz, ig,
                                       cdt[0] / 2, cdt[1] / 2, cdt[2] / 2)

            data["ux"], data["uy"], data["uz"] = ux, uy, uz
            data["inv_gamma"] = ig
            data["x"] = pos[0]
            data["y"] = pos[1]
            if ndim == 3:
                data["z"] = pos[2]

            # Esirkepov deposition (reference stage current_deposition)
            if slab_done:
                pass                     # jpad produced in-kernel
            elif sp.q != 0.0 and self.switches["current_deposition"] \
                    and "deposit" in stages:
                w = jnp.where(alive, data["w"], 0.0)
                if cell_layout and ndim == 2:
                    if use_pallas_cell:
                        from ..ops.cellpallas import \
                            deposit_cell_2d_pallas as _dep2
                        dep_kw = {"occ": _occ()}
                    else:
                        from ..ops.cell2d import deposit_cell_2d as _dep2
                        dep_kw = {}
                    jpad = _dep2(
                        pos[0], pos[1], ux, uy, uz, ig, w, q=sp.q,
                        dx=grid.dx, dy=grid.dy, dt=dt, g=g, **dep_kw)
                elif cell_layout:
                    if use_pallas_cell:
                        from ..ops.cellpallas import \
                            deposit_cell_3d_pallas as _dep3
                        dep_kw = {"occ": _occ()}
                    else:
                        from ..ops.cell3d import deposit_cell_3d as _dep3
                        dep_kw = {}
                    jpad = _dep3(
                        pos[0], pos[1], pos[2], ux, uy, uz, ig, w, q=sp.q,
                        dx=grid.dx, dy=grid.dy, dz=grid.dz, dt=dt, g=g,
                        **dep_kw)
                elif tile_cfg is not None:
                    win = _dep_tiled(pos[0], pos[1], ux, uy, uz, ig, w,
                                     tile_cfg, q=sp.q, dx=grid.dx,
                                     dy=grid.dy, dt=dt)
                    jpad = _fold_win(win, tile_cfg)
                else:
                    if ndim == 2:
                        j4 = deposit_2d(pos[0], pos[1], ux, uy, uz, ig, w,
                                        q=sp.q, dx=grid.dx, dy=grid.dy,
                                        dt=dt, nx_loc=nloc[0],
                                        ny_loc=nloc[1], g=g)
                    else:
                        j4 = deposit_3d(*pos, ux, uy, uz, ig, w,
                                        q=sp.q, dx=grid.dx, dy=grid.dy,
                                        dz=grid.dz, dt=dt, nx_loc=nloc[0],
                                        ny_loc=nloc[1], nz_loc=nloc[2], g=g)
                    jpad = jnp.stack(j4, axis=0)
            else:
                pshape = tuple(n + 2 * g for n in nloc)
                jpad = jnp.zeros((4,) + pshape, dtype=pos[0].dtype)

            # migration (reference patches.sync_particles + MPI variant)
            if cell_layout or not self.switches["migration"] \
                    or "deposit" not in stages:
                lost = cell_lost          # cell path re-bins above
            elif tile_cfg is not None and not migrate:
                lost = jnp.int32(0)
            elif tile_cfg is not None:
                data, alive, lost = migrate_tiled(
                    data, alive, tile_cfg, specs, nloc[0], nloc[1],
                    recompute_ig=(sp.pusher != "photon"))
            elif ndim == 2:
                data, alive, lost = migrate_2d(data, alive, specs,
                                               nloc[0], nloc[1],
                                               sp.migration_buf)
            else:
                data, alive, lost = migrate_3d(data, alive, specs,
                                               nloc[0], nloc[1], nloc[2],
                                               sp.migration_buf)
            overflow = overflow + lost

            # masked-domain particle absorption (mask_simulation)
            if mask_args:
                mask_loc = mask_args[0]
                if cell_layout:
                    # broadcast fast path: post-re-bin, a slot's home
                    # cell IS its array position, so the per-particle
                    # mask lookup is a rank-broadcast instead of a
                    # gather (XLA TPU gathers run at ~1e8 elem/s). The
                    # final half push can carry a particle <=0.5 cells
                    # past its home bin, so absorption at a mask edge
                    # lands one step later than the instantaneous-
                    # position check — far finer than the reference,
                    # which absorbs at whole-patch granularity
                    # (_mask_simulation.py:14-102 simply never creates
                    # patches outside the mask).
                    inside = jnp.broadcast_to(mask_loc[None], alive.shape)
                else:
                    ix = jnp.clip(
                        jnp.floor(data["x"] + 0.5).astype(jnp.int32),
                        0, nloc[0] - 1)
                    iy = jnp.clip(
                        jnp.floor(data["y"] + 0.5).astype(jnp.int32),
                        0, nloc[1] - 1)
                    inside = mask_loc[ix, iy]
                alive = alive & inside
                data["w"] = jnp.where(alive, data["w"], 0.0)

            # return only the keys this block may have mutated: the
            # gathered-field copies of a plain fused species pass through
            # untouched, and returning them from the shard_map forces six
            # full-array output buffers per species per step
            out_keys = getattr(self, "_block_out_keys", None)
            if out_keys is not None:
                data = {k: data[k] for k in out_keys}
            data = {k: v.reshape(lead + shape) for k, v in data.items()}
            alive = alive.reshape(lead + shape)
            next_id = next_id.reshape(lead)
            overflow = overflow.reshape(lead)
            return data, alive, next_id, overflow, jpad

        data_spec_tree = None  # filled per call; dict spec matches keys

        def wrapper(eb_pad, pstate: ParticlesState, key, rims_in=None):
            transient = {"ex_part", "ey_part", "ez_part",
                         "bx_part", "by_part", "bz_part"}
            if (qed and not use_slab_static) or split:
                out_keys = sorted(pstate.data)
            else:
                # slab QED species compute chi IN-kernel: the gathered-
                # field slots stay stale pass-throughs like any fused
                # species (returning them would cost 6 output buffers)
                out_keys = sorted(k for k in pstate.data
                                  if k not in transient)
            # record whether this species' gathered-field slots are
            # refreshed each step: plain fused species pass them through
            # stale, and Simulation.get_particles must not expose them
            self.transients_valid[ispec] = (bool(qed)
                                            and not use_slab_static) \
                or split
            self._block_out_keys = out_keys
            dspec = {k: self._p_part for k in pstate.data}
            ospec = {k: self._p_part for k in out_keys}
            in_specs = [self._p_stack, dspec, self._p_part, self._p_field,
                        self._p_field, P()]
            args = [eb_pad, pstate.data, pstate.alive, pstate.next_id,
                    pstate.overflow, key]
            if self._domain_mask is not None:
                in_specs.append(self._p_field)
                args.append(self._domain_mask)
            self._block_rims_in = rims_in is not None
            if rims_in is not None:
                in_specs.append(self._p_rims)
                args.append(rims_in)
            if photon_slab:
                pay_spec = self._p_field      # dummy zeros, shape lead
            elif use_slab_static:
                pay_spec = self._p_rims
            else:
                pay_spec = self._p_stack
            fn = self._smap(
                local, tuple(in_specs),
                (ospec, self._p_part, self._p_field, self._p_field,
                 pay_spec),
            )
            data, alive, next_id, overflow, jpad = fn(*args)
            data = {**pstate.data, **data}
            return ParticlesState(data=data, alive=alive, next_id=next_id,
                                  overflow=overflow), jpad

        # slab species return raw rim panels as the payload (fold once
        # across species in seg_particles); photon-slab species deposit
        # nothing and return a dummy payload the caller must ignore
        wrapper.returns_rims = use_slab_static and not photon_slab
        wrapper.no_j = photon_slab
        return wrapper

    # ------------------------------------------------------------------
    def make_species_rho(self, ispec: int) -> Callable:
        """Jitted single-species charge-density deposit (diagnostics;
        reference SaveSpeciesDensityToHDF5._compute_density,
        callback/hdf5.py:517-563)."""
        grid = self.grid
        sp = self.species[ispec]
        g = grid.n_guard
        ndim = grid.dimension
        specs = self.halo_specs
        nloc = (grid.nx_loc, grid.ny_loc, grid.nz_loc)[:ndim]
        dt = self.dt
        q = sp.q if sp.q != 0.0 else 1.0   # photons: use unit charge

        def local(data, alive):
            # flatten any sub-device structure (tiles) — positions are
            # device-local in both layouts
            d = {k: v.reshape(-1) for k, v in data.items()}
            alive = alive.reshape(-1)
            w = jnp.where(alive, d["w"], 0.0)
            if ndim == 2:
                j4 = deposit_2d(d["x"], d["y"], d["ux"], d["uy"], d["uz"],
                                d["inv_gamma"], w, q=q, dx=grid.dx,
                                dy=grid.dy, dt=dt, nx_loc=nloc[0],
                                ny_loc=nloc[1], g=g)
            else:
                j4 = deposit_3d(d["x"], d["y"], d["z"], d["ux"], d["uy"],
                                d["uz"], d["inv_gamma"], w, q=q, dx=grid.dx,
                                dy=grid.dy, dz=grid.dz, dt=dt,
                                nx_loc=nloc[0], ny_loc=nloc[1],
                                nz_loc=nloc[2], g=g)
            jpad = jnp.stack(j4, axis=0)
            return halo_reduce(jpad, g, tuple(range(1, 1 + ndim)), specs)

        def wrapper(pstate: ParticlesState):
            dspec = {k: self._p_part for k in pstate.data}
            fn = self._smap(local, (dspec, self._p_part), self._p_stack)
            return fn(pstate.data, pstate.alive)

        return jax.jit(wrapper), q

    # ------------------------------------------------------------------
    def make_total_rho(self) -> Callable:
        """On-demand total charge density (interior layout, matching
        fields.rho) summed over charged species. Used when the hot loop
        skips the every-step rho deposit (Simulation.deposit_rho): the
        reference deposits jx,jy,jz,rho together every step
        (current/current_deposit.h), but only J feeds Maxwell — rho
        equals a fresh S1 shape deposit at the current (post-step)
        positions, so recomputing it at diagnostic time is identical up
        to fp association."""
        grid = self.grid
        g = grid.n_guard
        ndim = grid.dimension
        specs = self.halo_specs
        nloc = (grid.nx_loc, grid.ny_loc, grid.nz_loc)[:ndim]
        dt = self.dt
        charged = [i for i, sp in enumerate(self.species)
                   if sp.q != 0.0]

        def local(*flat):
            jtot = None
            for k, ispec in enumerate(charged):
                sp = self.species[ispec]
                d = {kk: v.reshape(-1)
                     for kk, v in flat[2 * k].items()}
                al = flat[2 * k + 1].reshape(-1)
                w = jnp.where(al, d["w"], 0.0)
                if ndim == 2:
                    j4 = deposit_2d(d["x"], d["y"], d["ux"], d["uy"],
                                    d["uz"], d["inv_gamma"], w, q=sp.q,
                                    dx=grid.dx, dy=grid.dy, dt=dt,
                                    nx_loc=nloc[0], ny_loc=nloc[1], g=g)
                else:
                    j4 = deposit_3d(d["x"], d["y"], d["z"], d["ux"],
                                    d["uy"], d["uz"], d["inv_gamma"], w,
                                    q=sp.q, dx=grid.dx, dy=grid.dy,
                                    dz=grid.dz, dt=dt, nx_loc=nloc[0],
                                    ny_loc=nloc[1], nz_loc=nloc[2], g=g)
                jpad = jnp.stack(j4, axis=0)
                jtot = jpad if jtot is None else jtot + jpad
            return halo_reduce(jtot, g, tuple(range(1, 1 + ndim)),
                               specs)[3]

        if not charged:
            return None                # caller falls back to zeros

        def wrapper(particles):
            args: list = []
            in_specs: list = []
            for ispec in charged:
                p = particles[ispec]
                args += [p.data, p.alive]
                in_specs += [{k: self._p_part for k in p.data},
                             self._p_part]
            fn = self._smap(local, tuple(in_specs), self._p_field)
            return fn(*args)

        return jax.jit(wrapper)

    # ------------------------------------------------------------------
    def _apply_collisions(self, parts: List[ParticlesState], key
                          ) -> List[ParticlesState]:
        """shard_map wrapper for the collision stage (models/collision.py):
        runs before the pusher on the pre-push momenta (reference
        simulation.py:974-978)."""
        col = self.collisions
        ispecs = col.ispecs
        axis_names = self.grid.axis_names
        mesh_shape = self.grid.mesh_shape
        dt = self.dt
        cell = self.cell_layout

        nm = len(mesh_shape)

        def local(key, *flat):
            didx = jnp.int32(0)
            for name, size in zip(axis_names, mesh_shape):
                didx = didx * size + jax.lax.axis_index(name)
            dkey = jax.random.fold_in(key, didx)
            species_data = {}
            caps = {}
            for k, ispec in enumerate(ispecs):
                data, alive = flat[2 * k], flat[2 * k + 1]
                shp = alive.shape[nm:]
                caps[ispec] = (alive.shape[:nm], shp)
                if cell:
                    # cell layout: keep the (cap_c, *cells) binning —
                    # apply_cell pairs within slot columns directly
                    # (no argsort, no flat gathers)
                    species_data[ispec] = (
                        {kk: v.reshape(shp) for kk, v in data.items()},
                        alive.reshape(shp))
                else:
                    # flatten every non-mesh axis: collisions only modify
                    # momenta in place, so the tiled (ntx, nty, cap_t)
                    # layout can run the flat per-device pairing unchanged
                    species_data[ispec] = (
                        {kk: v.reshape(-1) for kk, v in data.items()},
                        alive.reshape(-1))
            out = (col.apply_cell if cell else col.apply_local)(
                species_data, dt, dkey)
            result = []
            for ispec in ispecs:
                lead, shp = caps[ispec]
                result.append({kk: v.reshape(lead + shp)
                               for kk, v in out[ispec].items()})
            return tuple(result)

        in_specs = [P()]
        out_specs = []
        args = [key]
        for ispec in ispecs:
            dspec = {k: self._p_part for k in parts[ispec].data}
            in_specs += [dspec, self._p_part]
            out_specs.append(dspec)
            args += [parts[ispec].data, parts[ispec].alive]
        fn = self._smap(local, tuple(in_specs), tuple(out_specs))
        new_data = fn(*args)
        parts = list(parts)
        for k, ispec in enumerate(ispecs):
            parts[ispec] = parts[ispec].replace(data=new_data[k])
        return parts

    # ------------------------------------------------------------------
    def _apply_qed_creation(self, proc, parts: List[ParticlesState]
                            ) -> List[ParticlesState]:
        """shard_map wrapper around a QED process's creation_local
        (models/qed.py): photon emission or pair production into dead
        slots of the child species."""
        from ..models.qed import (NonlinearComptonLCFA,
                                  NonlinearPairProductionLCFA)

        ndim = self.grid.dimension
        parts = list(parts)
        tiled = self.tile_cfg is not None
        cell = self.cell_layout
        # (ntx, nty, cap_t) / (cap_c, *cells) / (cap,)
        nlocal = (1 + ndim) if cell else (3 if tiled else 1)
        g_axes = self.grid.axis_names
        g_mesh = self.grid.mesh_shape

        def device_index():
            didx = jnp.int32(0)
            for name, size in zip(g_axes, g_mesh):
                didx = didx * size + jax.lax.axis_index(name)
            return didx

        def squeeze(d, a, *rest):
            shp = a.shape[-nlocal:]
            lead = a.shape[:-nlocal]
            return ({k: v.reshape(v.shape[-nlocal:]) for k, v in d.items()},
                    a.reshape(shp),
                    [r.reshape(()) for r in rest], lead, shp)

        if isinstance(proc, NonlinearComptonLCFA):
            e = parts[proc.ispec]
            ph = parts[proc.photon_ispec]

            def local(edata, ealive, phdata, phalive, phnext, phover):
                edata, ealive, _, lead, cap_e = squeeze(edata, ealive)
                phdata, phalive, (phnext, phover), _, cap_p = squeeze(
                    phdata, phalive, phnext, phover)
                if tiled or cell:
                    if cell:
                        from ..ops.cell2d import insert_cells as _insert
                    else:
                        from ..ops.tiled2d import insert_tiled as _insert
                    ev = ealive & (edata["event"] > 0)
                    new = proc.photon_newborns(edata, ndim)
                    phdata, phalive, phnext, lost = _insert(
                        phdata, phalive, phnext, new, ev,
                        device_id=device_index())
                    phover = phover + lost
                    edata = proc.apply_recoil(edata, ev)
                else:
                    out = proc.creation_local(edata, ealive, phdata, phalive,
                                              phnext, phover, ndim)
                    edata, ealive, phdata, phalive, phnext, phover = out
                return ({k: v.reshape(lead + cap_e)
                         for k, v in edata.items()},
                        ealive.reshape(lead + cap_e),
                        {k: v.reshape(lead + cap_p)
                         for k, v in phdata.items()},
                        phalive.reshape(lead + cap_p),
                        phnext.reshape(lead), phover.reshape(lead))

            edspec = {k: self._p_part for k in e.data}
            pdspec = {k: self._p_part for k in ph.data}
            fn = self._smap(
                local,
                (edspec, self._p_part, pdspec, self._p_part, self._p_field,
                 self._p_field),
                (edspec, self._p_part, pdspec, self._p_part, self._p_field,
                 self._p_field))
            edata, ealive, phdata, phalive, phnext, phover = fn(
                e.data, e.alive, ph.data, ph.alive, ph.next_id, ph.overflow)
            parts[proc.ispec] = e.replace(data=edata, alive=ealive)
            parts[proc.photon_ispec] = ph.replace(
                data=phdata, alive=phalive, next_id=phnext, overflow=phover)
            return parts

        if isinstance(proc, NonlinearPairProductionLCFA):
            ph = parts[proc.ispec]
            el = parts[proc.electron_ispec]
            po = parts[proc.positron_ispec]

            def local(phdata, phalive, edata, ealive, enext, eover,
                      pdata, palive, pnext, pover):
                phdata, phalive, _, lead, cap_ph = squeeze(phdata, phalive)
                edata, ealive, (enext, eover), _, cap_e = squeeze(
                    edata, ealive, enext, eover)
                pdata, palive, (pnext, pover), _, cap_p = squeeze(
                    pdata, palive, pnext, pover)
                if tiled or cell:
                    if cell:
                        from ..ops.cell2d import insert_cells as _insert
                    else:
                        from ..ops.tiled2d import insert_tiled as _insert
                    ev = phalive & (phdata["event"] > 0)
                    new_e, new_p = proc.pair_newborns(phdata, ndim)
                    didx = device_index()
                    edata, ealive, enext, lost_e = _insert(
                        edata, ealive, enext, new_e, ev, device_id=didx)
                    pdata, palive, pnext, lost_p = _insert(
                        pdata, palive, pnext, new_p, ev, device_id=didx)
                    eover = eover + lost_e
                    pover = pover + lost_p
                    phdata, phalive = proc.remove_parents(phdata, phalive,
                                                          ev)
                else:
                    out = proc.creation_local(
                        phdata, phalive, edata, ealive, enext, eover,
                        pdata, palive, pnext, pover, ndim)
                    (phdata, phalive, edata, ealive, enext, eover,
                     pdata, palive, pnext, pover) = out
                return ({k: v.reshape(lead + cap_ph)
                         for k, v in phdata.items()},
                        phalive.reshape(lead + cap_ph),
                        {k: v.reshape(lead + cap_e)
                         for k, v in edata.items()},
                        ealive.reshape(lead + cap_e),
                        enext.reshape(lead), eover.reshape(lead),
                        {k: v.reshape(lead + cap_p)
                         for k, v in pdata.items()},
                        palive.reshape(lead + cap_p),
                        pnext.reshape(lead), pover.reshape(lead))

            phspec = {k: self._p_part for k in ph.data}
            espec = {k: self._p_part for k in el.data}
            pspec = {k: self._p_part for k in po.data}
            fn = self._smap(
                local,
                (phspec, self._p_part, espec, self._p_part, self._p_field,
                 self._p_field, pspec, self._p_part, self._p_field,
                 self._p_field),
                (phspec, self._p_part, espec, self._p_part, self._p_field,
                 self._p_field, pspec, self._p_part, self._p_field,
                 self._p_field))
            out = fn(ph.data, ph.alive, el.data, el.alive, el.next_id,
                     el.overflow, po.data, po.alive, po.next_id, po.overflow)
            (phdata, phalive, edata, ealive, enext, eover,
             pdata, palive, pnext, pover) = out
            parts[proc.ispec] = ph.replace(data=phdata, alive=phalive)
            parts[proc.electron_ispec] = el.replace(
                data=edata, alive=ealive, next_id=enext, overflow=eover)
            parts[proc.positron_ispec] = po.replace(
                data=pdata, alive=palive, next_id=pnext, overflow=pover)
            return parts

        raise NotImplementedError(f"unknown QED process {proc!r}")

    # ------------------------------------------------------------------
    def make_window_shift(self, direction: int = 1) -> Callable:
        """Jitted one-cell moving-window shift: roll fields one cell along
        x (left for direction=+1, right for -1), zero the incoming column,
        shift particle x by -direction cells, immediately re-migrate along
        x, and inject new particles on the incoming device column (last
        for +1, first for -1 — the reference's _shift_right/_shift_left,
        callback/utils.py:567-572).

        TPU-native divergence from the reference MovingWindow
        (callback/utils.py:471-840): the reference recycles whole *patch*
        columns; here the shift granularity is one cell, which maps to a
        cheap roll of the sharded arrays and avoids patch-topology
        rebuilds."""
        if direction not in (1, -1):
            raise ValueError(f"direction must be +1 or -1, got {direction}")
        grid = self.grid
        ndim = grid.dimension
        specs = self.halo_specs
        nloc = (grid.nx_loc, grid.ny_loc, grid.nz_loc)[:ndim]
        fwd = direction > 0

        def shift_fields(arr):
            arr = jnp.roll(arr, -direction, axis=0)
            return arr.at[-1 if fwd else 0].set(0.0)

        tile_cfg = self.tile_cfg

        cell_layout = self.cell_layout
        axis_names = grid.axis_names
        mesh_shape = grid.mesh_shape

        def species_shift(pstate: ParticlesState, new_vals, n_new, buf,
                          tcfg=None):
            from ..parallel.inject import insert_local
            from ..parallel.migrate import migrate_axis, sanitize_dead

            def local_cell(data, alive, next_id, overflow, nv, nalive):
                """Cell layout: the window shift IS a roll of the slot
                arrays one cell along x (content of cell i+direction moves
                to cell i; device edges ppermute), x -= direction
                uniformly, and the host-injected edge column (already
                cell-binned) overwrites the (dead) incoming column on the
                edge device."""
                nd = 1 + ndim                    # cap + cell axes
                shp = alive.shape[-nd:]
                lead = alive.shape[:-nd]
                data = {k: v.reshape(v.shape[-nd:]) for k, v in data.items()}
                alive = alive.reshape(shp)
                next_id = next_id.reshape(())
                overflow = overflow.reshape(())
                nv = {k: v.reshape(v.shape[-(nd - 1):]) for k, v in nv.items()}
                nalive = nalive.reshape(nalive.shape[-(nd - 1):])

                names = sorted(data)
                spec = specs[0]
                moved, valid = _roll_with_edge_exchange(
                    ({k: data[k] for k in names}, alive), 1, -direction,
                    spec)
                # device-crossing entries came from the neighbor's edge
                # column and land at the opposite local edge: their x is
                # neighbor-local there, adjust by +-nx_loc then the
                # uniform -direction below
                wrap_col = shp[1] - 1 if fwd else 0
                to_wrap = (jnp.arange(shp[1]) == wrap_col).reshape(
                    (1, shp[1]) + (1,) * (ndim - 1))
                moved = dict(moved)
                moved["x"] = jnp.where(to_wrap,
                                       moved["x"] + direction * nloc[0],
                                       moved["x"])
                i = lax.axis_index(spec.axis_name)
                is_edge = (i == spec.size - 1) if fwd else (i == 0)
                # window x boundary is open: nothing wraps around
                valid = valid & ~(to_wrap & is_edge)
                data = moved
                alive = valid
                data["x"] = jnp.where(alive, data["x"] - direction,
                                      data["x"])

                # injection into the incoming edge column of the edge
                # device
                inj = nalive & is_edge
                ncol = jnp.cumsum(
                    inj[:, None].reshape(-1).astype(jnp.uint32)).reshape(
                        inj.shape) - jnp.uint32(1)
                didx = jnp.int32(0)
                for name, size in zip(axis_names, mesh_shape):
                    didx = didx * size + jax.lax.axis_index(name)
                col = {}
                for k in names:
                    if k == "id_lo":
                        v = next_id + ncol
                    elif k == "id_hi":
                        v = jnp.full(inj.shape, didx.astype(jnp.uint32))
                    elif k in nv:
                        v = nv[k]
                    else:
                        v = jnp.zeros(inj.shape, data[k].dtype)
                    col[k] = v.astype(data[k].dtype)
                eidx = -1 if fwd else 0
                for k in names:
                    edge = jnp.where(inj, col[k], data[k][:, eidx])
                    body = data[k][:, :-1] if fwd else data[k][:, 1:]
                    parts = ([body, edge[:, None]] if fwd
                             else [edge[:, None], body])
                    data[k] = jnp.concatenate(parts, axis=1)
                edge_alive = jnp.where(inj, True, alive[:, eidx])
                abody = alive[:, :-1] if fwd else alive[:, 1:]
                aparts = ([abody, edge_alive[:, None]] if fwd
                          else [edge_alive[:, None], abody])
                alive = jnp.concatenate(aparts, axis=1)
                next_id = next_id + jnp.sum(inj).astype(jnp.uint32)

                return ({k: v.reshape(lead + shp) for k, v in data.items()},
                        alive.reshape(lead + shp),
                        next_id.reshape(lead), overflow.reshape(lead))

            def local_tiled(data, alive, next_id, overflow, nv, nn):
                """Tiled layout: x -= direction, re-bin along x
                (migrate_tiled), then merge the host-injected edge column —
                binned by y-tile on the host — into the incoming tile
                column (ntx-1 for +1, 0 for -1) via insert_tiled."""
                from ..ops.tiled2d import insert_tiled, migrate_tiled
                shp = alive.shape[-3:]
                lead = alive.shape[:-3]
                data = {k: v.reshape(v.shape[-3:]) for k, v in data.items()}
                alive = alive.reshape(shp)
                next_id = next_id.reshape(())
                overflow = overflow.reshape(())
                nv = {k: v.reshape(v.shape[-2:]) for k, v in nv.items()}
                nn = nn.reshape(nn.shape[-1])            # (nty,)

                data["x"] = jnp.where(alive, data["x"] - direction,
                                      data["x"])
                data, alive, lost = migrate_tiled(
                    data, alive, tcfg, specs[:2], nloc[0], nloc[1],
                    axes=(0,))
                kb = next(iter(nv.values())).shape[-1]
                valid = (jnp.arange(kb)[None, None, :]
                         < nn[None, :, None])            # (1, nty, kb)
                tsl = (slice(tcfg.ntx - 1, None) if fwd else slice(0, 1))
                sl = {k: v[tsl] for k, v in data.items()}
                sal = alive[tsl]
                newv = {k: v[None] for k, v in nv.items()}
                didx = jnp.int32(0)
                for name, size in zip(grid.axis_names, grid.mesh_shape):
                    didx = didx * size + jax.lax.axis_index(name)
                sl, sal, next_id, lost2 = insert_tiled(
                    sl, sal, next_id, newv, valid, device_id=didx)
                if fwd:
                    data = {k: jnp.concatenate([v[:tcfg.ntx - 1], sl[k]],
                                               axis=0)
                            for k, v in data.items()}
                    alive = jnp.concatenate([alive[:tcfg.ntx - 1], sal],
                                            axis=0)
                else:
                    data = {k: jnp.concatenate([sl[k], v[1:]], axis=0)
                            for k, v in data.items()}
                    alive = jnp.concatenate([sal, alive[1:]], axis=0)
                overflow = overflow + lost + lost2
                return ({k: v.reshape(lead + shp) for k, v in data.items()},
                        alive.reshape(lead + shp),
                        next_id.reshape(lead), overflow.reshape(lead))

            def local_flat(data, alive, next_id, overflow, nv, nn):
                lead = alive.shape[:-1]
                cap = alive.shape[-1]
                data = {k: v.reshape(cap) for k, v in data.items()}
                alive = alive.reshape(cap)
                next_id = next_id.reshape(())
                overflow = overflow.reshape(())
                nv = {k: v.reshape(v.shape[-1]) for k, v in nv.items()}
                nn = nn.reshape(())

                data["x"] = jnp.where(alive, data["x"] - direction,
                                      data["x"])
                data, alive, lost = migrate_axis(data, alive, specs[0], "x",
                                                 nloc[0], buf)
                data, alive, next_id, lost2 = insert_local(
                    data, alive, next_id, nv, nn)
                data = sanitize_dead(data, alive)
                overflow = overflow + lost + lost2
                return ({k: v.reshape(lead + (cap,)) for k, v in data.items()},
                        alive.reshape(lead + (cap,)),
                        next_id.reshape(lead), overflow.reshape(lead))

            if cell_layout:
                local = local_cell
            elif tcfg is not None:
                local = local_tiled
            else:
                local = local_flat

            dspec = {k: self._p_part for k in pstate.data}
            nvspec = {k: self._p_part for k in new_vals}
            fn = self._smap(
                local,
                (dspec, self._p_part, self._p_field, self._p_field, nvspec,
                 self._p_field),
                (dspec, self._p_part, self._p_field, self._p_field))
            data, alive, next_id, overflow = fn(
                pstate.data, pstate.alive, pstate.next_id, pstate.overflow,
                new_vals, n_new)
            return ParticlesState(data=data, alive=alive, next_id=next_id,
                                  overflow=overflow)

        def shift(state: SimulationState, injections):
            f = state.fields
            updates = {name: shift_fields(getattr(f, name))
                       for name in ("ex", "ey", "ez", "bx", "by", "bz",
                                    "jx", "jy", "jz", "rho")}
            # slab-restricted psi_*_x arrays (axis 0 = slab rows, not x)
            # are NOT shifted: the x PML is removed before the window
            # starts (models/moving_window.py) so they are inert zeros.
            # psi_*_y / psi_*_z keep their full x extent and shift along.
            psi = {k: (v if (k.endswith("_x")
                             and v.shape[0] != f.ex.shape[0])
                       else shift_fields(v))
                   for k, v in f.psi.items()}
            f = f.replace(psi=psi, **updates)
            parts = []
            for ispec, sp in enumerate(self.species):
                inj = injections[ispec]
                tcfg = None
                if tile_cfg is not None:
                    import dataclasses as _dc
                    tcfg = _dc.replace(tile_cfg, cap_t=sp.tile_cap)
                parts.append(species_shift(state.particles[ispec],
                                           inj["vals"], inj["n"],
                                           sp.migration_buf, tcfg))
            return state.replace(fields=f, particles=tuple(parts))

        return jax.jit(shift, donate_argnums=donation_argnums())

    # ------------------------------------------------------------------
    # segments
    # ------------------------------------------------------------------
    def _apply_damping(self, f: FieldsState) -> FieldsState:
        if self._damping is None:
            return f
        d = self._damping.astype(f.ex.dtype)
        return f.replace(ex=f.ex * d, ey=f.ey * d, ez=f.ez * d,
                         bx=f.bx * d, by=f.by * d, bz=f.bz * d)

    def _maxwell_fns(self, f: FieldsState):
        """(update_efield, update_bfield) — the fused Pallas pair when
        eligible (one-device mesh + ops/fieldspallas.py static checks),
        else the XLA ops."""
        from ..ops.fieldspallas import (fields_pallas_ok, update_bfield_pl,
                                        update_efield_pl)
        if self._fields_pl_mesh and fields_pallas_ok(f, self.grid,
                                                     self.cpml):
            return update_efield_pl, update_bfield_pl
        return update_efield, update_bfield

    def set_scalar_blob(self, treedef, dtypes) -> None:
        """Register the packed-scalars layout (Simulation._scalars packs
        every per-step host scalar — itime, laser gates/phases — into
        ONE device transfer; a dict of ~10 separate tiny leaves paid
        one relay round trip each)."""
        self._blob_treedef = treedef
        self._blob_dtypes = tuple(dtypes)

    def _unpack_scalars(self, scalars):
        if not isinstance(scalars, dict) or "blob" not in scalars:
            return scalars
        blob = scalars["blob"]
        leaves = [blob[i].astype(dt)
                  for i, dt in enumerate(self._blob_dtypes)]
        out = jax.tree.unflatten(self._blob_treedef, leaves)
        for k in ("key", "itime"):
            if k in scalars:
                out[k] = scalars[k]
        return out

    def seg_fields_1(self, state: SimulationState, scalars) -> SimulationState:
        """E += dt/2 ; B += dt/2 (reference simulation.py:946-960)."""
        scalars = self._unpack_scalars(scalars)
        f = state.fields
        if self.switches["maxwell"]:
            ue, ub = self._maxwell_fns(f)
            f = ue(f, self.grid, self.dt / 2, self.cpml)
            f = ub(f, self.grid, self.dt / 2, self.cpml)
            f = self._apply_damping(f)
        return state.replace(fields=f)

    def seg_particles(self, state: SimulationState, scalars,
                      migrate: bool = True) -> SimulationState:
        """sort/collisions/species blocks/current reduction
        (reference simulation.py:966-1080)."""
        scalars = self._unpack_scalars(scalars)
        key = jax.random.fold_in(
            scalars.get("key", jax.random.PRNGKey(0)),
            scalars.get("itime", 0))
        particles = list(state.particles)
        if self.collisions is not None and self.switches["collisions"]:
            particles = self._apply_collisions(particles, key)

        pad_eb = self.make_pad_eb()
        f = state.fields
        eb = jnp.stack([f.ex, f.ey, f.ez, f.bx, f.by, f.bz], axis=0)
        eb_pad = pad_eb(eb)

        jpad_total = None
        rims_total = None
        new_parts: List[ParticlesState] = []
        for ispec in range(len(self.species)):
            if not self.switches["species_block"]:
                new_parts.append(particles[ispec])
                continue
            block = self.make_species_block(ispec, migrate=migrate)
            kspec = jax.random.fold_in(key, ispec)
            if getattr(block, "no_j", False):
                # photon-slab species: no current contribution at all —
                # skip the zeros-jpad reduce the per-stage path paid
                pnew, _ = block(eb_pad, particles[ispec], kspec)
                new_parts.append(pnew)
            elif getattr(block, "returns_rims", False):
                # chain the running rim panels through the slab kernel:
                # it seeds its deposit accumulator with them, so the
                # cross-species rims sum costs no separate XLA add.
                # LAMBDAPIC_SLAB_CHAIN_RIMS=0 sums in XLA instead —
                # the chained rims_in ref costs a double-buffered
                # window (~8 MB scoped VMEM at 128^3), which is the
                # margin when a config sits within ~1 MB of the limit
                # (bx=4 probes, docs/BENCH_LOCAL.md round 5)
                import os as _os
                chain = _os.environ.get("LAMBDAPIC_SLAB_CHAIN_RIMS",
                                        "1") != "0"
                pnew, jpad = block(eb_pad, particles[ispec], kspec,
                                   rims_in=rims_total if chain else None)
                new_parts.append(pnew)
                rims_total = (jpad if (chain or rims_total is None)
                              else rims_total + jpad)
            else:
                pnew, jpad = block(eb_pad, particles[ispec], kspec)
                new_parts.append(pnew)
                jpad_total = (jpad if jpad_total is None
                              else jpad_total + jpad)

        # QED particle creation into dead slots, after all species pushed
        # and deposited (reference simulation.py:1052-1065: deposition uses
        # pre-recoil momenta; created particles are first pushed next step)
        if self.switches["qed"]:
            for proc in self.qed_processes:
                new_parts = self._apply_qed_creation(proc, new_parts)

        jred = None
        if rims_total is not None:
            jred = self.make_fold_reduce()(rims_total)
        if jpad_total is not None:
            j2 = self.make_reduce_j()(jpad_total)
            if jred is None:
                jred = j2
            else:
                # with_rho=False slab rims carry 3 components; scatter
                # species still produce 4 — drop their rho too (rho is
                # recomputed on demand in that mode)
                jred = jred + j2[:jred.shape[0]]
        if jred is not None:
            rep = dict(jx=jred[0], jy=jred[1], jz=jred[2])
            if jred.shape[0] == 4:
                rep["rho"] = jred[3]
            f = f.replace(**rep)
        return state.replace(fields=f, particles=tuple(new_parts))

    def seg_particles_sub(self, state: SimulationState, scalars,
                          stages: frozenset) -> SimulationState:
        """One sub-segment of the SPLIT particle path (host callbacks at
        inner stages; the reference's non-unified pusher sequence,
        simulation.py:993-1041). Sub-segments communicate through the
        particle arrays (positions/gathered fields written back)."""
        scalars = self._unpack_scalars(scalars)
        key = jax.random.fold_in(
            scalars.get("key", jax.random.PRNGKey(0)),
            scalars.get("itime", 0))
        particles = list(state.particles)
        if "p1" in stages and self.collisions is not None \
                and self.switches["collisions"]:
            particles = self._apply_collisions(particles, key)

        pad_eb = self.make_pad_eb()
        f = state.fields
        eb = jnp.stack([f.ex, f.ey, f.ez, f.bx, f.by, f.bz], axis=0)
        eb_pad = pad_eb(eb)

        jpad_total = None
        new_parts: List[ParticlesState] = []
        for ispec in range(len(self.species)):
            block = self.make_species_block(ispec, stages=stages)
            kspec = jax.random.fold_in(key, ispec)
            pnew, jpad = block(eb_pad, particles[ispec], kspec)
            new_parts.append(pnew)
            jpad_total = jpad if jpad_total is None else jpad_total + jpad

        if "deposit" in stages:
            if self.switches["qed"]:
                for proc in self.qed_processes:
                    new_parts = self._apply_qed_creation(proc, new_parts)
            if jpad_total is not None:
                jred = self.make_reduce_j()(jpad_total)
                f = f.replace(jx=jred[0], jy=jred[1], jz=jred[2],
                              rho=jred[3])
        return state.replace(fields=f, particles=tuple(new_parts))

    def seg_fields_2(self, state: SimulationState, scalars) -> SimulationState:
        """B += dt/2 ; lasers ; E += dt/2 (reference simulation.py:1097-1118)."""
        scalars = self._unpack_scalars(scalars)
        f = state.fields
        ue, ub = self._maxwell_fns(f)
        if self.switches["maxwell"]:
            f = ub(f, self.grid, self.dt / 2, self.cpml)
        for i, laser in enumerate(self.lasers):
            f = laser.apply(f, self.grid, self.dt,
                            scalars.get(f"laser{i}", {}))
        if self.switches["maxwell"]:
            f = ue(f, self.grid, self.dt / 2, self.cpml)
            f = self._apply_damping(f)
        return state.replace(fields=f)

    def full_step(self, state: SimulationState, scalars,
                  migrate: bool = True) -> SimulationState:
        state = self.seg_fields_1(state, scalars)
        state = self.seg_particles(state, scalars, migrate=migrate)
        state = self.seg_fields_2(state, scalars)
        return state

    def multi_step(self, state: SimulationState, scalars_stacked
                   ) -> SimulationState:
        """K steps fused into one executable via lax.scan — the TPU-native
        analog of running without per-step host dispatch. ``scalars_stacked``
        is the per-step scalars pytree with a leading K axis.

        With rebin_interval R > 1 the scan iterates over R-step blocks
        (K must be a multiple of R and the entry state freshly binned,
        i.e. itime % R == 0 — the run loop guarantees both): only the last
        step of each block migrates."""
        R = self.rebin_interval
        if R <= 1:
            def body(s, sc):
                return self.full_step(s, sc), None

            return jax.lax.scan(body, state, scalars_stacked)[0]

        k = jax.tree.leaves(scalars_stacked)[0].shape[0]
        assert k % R == 0, (k, R)

        def body(s, sc_block):
            for j in range(R):
                scj = jax.tree.map(lambda a: a[j], sc_block)
                s = self.full_step(s, scj, migrate=(j == R - 1))
            return s, None

        blocked = jax.tree.map(
            lambda a: a.reshape((k // R, R) + a.shape[1:]), scalars_stacked)
        return jax.lax.scan(body, state, blocked)[0]

    def multi_step_unrolled(self, state: SimulationState, scalars_stacked
                            ) -> SimulationState:
        """K steps fused into one executable by straight-line unrolling
        (``step_chunk="unroll:K"``). Unlike the lax.scan form, XLA can
        alias every intermediate buffer freely inside the single
        program, so there are no per-iteration carry copies of the
        particle state (the scan form costs ~4 ms/step at the 3D bench
        shape); the price is a ~K-times longer compile. Per-step host
        dispatch overhead amortizes by 1/K either way. rebin_interval
        must divide K (migration on the last step of each R block,
        matching multi_step)."""
        R = max(self.rebin_interval, 1)
        k = jax.tree.leaves(scalars_stacked)[0].shape[0]
        assert k % R == 0, (k, R)
        for j in range(k):
            scj = jax.tree.map(lambda a, _j=j: a[_j], scalars_stacked)
            state = self.full_step(state, scj,
                                   migrate=(j % R == R - 1))
        return state

    def compile(self):
        """Return (full, seg1, seg2, seg3) jitted (donation per backend)."""
        jopts = dict(donate_argnums=donation_argnums())
        return (jax.jit(self.full_step, **jopts),
                jax.jit(self.seg_fields_1, **jopts),
                jax.jit(self.seg_particles, **jopts),
                jax.jit(self.seg_fields_2, **jopts))
