"""Moving window along x (forward for velocity > 0, backward for < 0).

Port of the reference MovingWindow (callback/utils.py:471-840) with a
TPU-native shift algorithm: instead of recycling whole patch columns and
rebuilding neighbor topology, the window advances one *cell* at a time via a
jitted roll of the sharded global arrays (StepBuilder.make_window_shift).
Semantics kept from the reference:

- stage "start"; velocity constant or f(time); start_time defaults to Lx/c
- the x PML is removed when the window starts (lasers auto-disable,
  reference laser.py:119-127)
- new cells are filled from the species density/ppc profiles; injection can
  be disabled or stopped at stop_inject_time
- negative accumulated shift recycles the other edge (reference
  _shift_left, utils.py:570-572)
"""
from __future__ import annotations

from typing import Callable, Optional, Union

import numpy as np

from ..constants import c
from ..core.species import Species
from ..simulation.callbacks import Callback
from ..utils.logger import logger


class MovingWindow(Callback):
    stage = "start"
    rho_free = True      # rolls field arrays; never reads rho values

    def __init__(self, velocity: Union[float, Callable[[float], float]] = c,
                 start_time: Optional[float] = None,
                 inject_particles: bool = True,
                 stop_inject_time: Optional[float] = None):
        super().__init__(interval=1, stage="start")
        self.velocity = velocity
        self.start_time = start_time
        self.inject_particles = inject_particles
        self.stop_inject_time = stop_inject_time
        self.cell_this_shift: Optional[float] = None
        self.num_shifts = 0
        self._k_inject: Optional[list] = None

    def _call(self, sim) -> None:
        if self.start_time is None:
            self.start_time = sim.Lx / c
        if self.cell_this_shift is None:
            # reference quirk: first active call shifts immediately
            # (utils.py:534-540 initializes the accumulator full)
            self.cell_this_shift = sim.dx

        if sim.time < self.start_time:
            return

        if self.num_shifts == 0:
            logger.info("MovingWindow starts: removing x PML")
            sim._disable_x_pml()

        v = self.velocity(sim.time) if callable(self.velocity) \
            else self.velocity
        self.cell_this_shift += v * sim.dt
        self.num_shifts += 1

        while self.cell_this_shift >= sim.dx:
            self._shift_once(sim, +1)
            self.cell_this_shift -= sim.dx
        while self.cell_this_shift <= -sim.dx:
            # backward window (reference _shift_left, utils.py:570-572)
            self._shift_once(sim, -1)
            self.cell_this_shift += sim.dx

    # ------------------------------------------------------------------
    def _estimate_k(self, sim) -> list:
        """Static injection-buffer size per species: max particles a
        rightmost-column device can receive per shift."""
        ks = []
        for sp in sim.species:
            if sp.density is None or (isinstance(sp.ppc, int) and sp.ppc == 0):
                ks.append(128)
                continue
            ppc_fn = Species.vectorized_profile(sp.ppc, sim.dimension)
            ny_loc = sim.grid.ny_loc
            nz_loc = sim.grid.nz_loc if sim.dimension == 3 else 1
            # bound ppc by sampling the profile over the domain face
            ys = np.arange(sim.ny) * sim.dy
            if sim.dimension == 2:
                ppc_max = ppc_fn(np.zeros_like(ys), ys).max()
            else:
                zs = np.arange(sim.nz) * sim.dz
                Y, Z = np.meshgrid(ys, zs, indexing="ij")
                ppc_max = ppc_fn(np.zeros_like(Y), Y, Z).max()
            k = int(np.ceil(max(ppc_max, 1) * ny_loc * nz_loc * 1.25))
            ks.append(int(np.ceil(k / 128) * 128))
        return ks

    def _column_particles(self, sim, ispec: int, k: int,
                          direction: int = 1):
        """Host-side fill of the incoming column (global x index
        nx+offset for a forward shift, offset-1 for a backward one) for
        one species; returns mesh-shaped buffers."""
        grid = sim.grid
        sp = sim.species[ispec]
        mshape = grid.mesh_shape
        vals = {a: np.zeros(mshape + (k,), dtype=np.float64)
                for a in ("x", "y", "z", "w", "ux", "uy", "uz", "inv_gamma")
                if a in sp.attrs()}
        vals["inv_gamma"][...] = 1.0
        n = np.zeros(mshape, dtype=np.int32)
        inject = (self.inject_particles and sp.density is not None
                  and not (isinstance(sp.ppc, int) and sp.ppc == 0))
        if self.stop_inject_time is not None and \
                sim.time >= self.stop_inject_time:
            inject = False
        if not inject:
            return {"vals": vals, "n": n}

        dens_fn = Species.vectorized_profile(sp.density, grid.dimension)
        ppc_fn = Species.vectorized_profile(sp.ppc, grid.dimension)
        mom_fns = [None if prof is None
                   else Species.vectorized_profile(prof, grid.dimension)
                   for prof in (sp.momentum or (None, None, None))]
        dV = grid.dx * grid.dy * (grid.dz if grid.dimension == 3 else 1.0)
        # global index of the incoming column; the RNG is keyed on it so
        # any column's fill is deterministic per seed regardless of the
        # shift history that exposed it
        col_glob = (sim.nx + sim._window_offset if direction > 0
                    else sim._window_offset - 1)
        x_glob = col_glob * grid.dx
        npx = grid.npatch_x
        edge_dev = npx - 1 if direction > 0 else 0
        x_loc = grid.nx_loc - 1 if direction > 0 else 0
        # seed entries must be non-negative; backward columns go below 0
        rng = np.random.default_rng(
            [sim._seed_effective, 23, ispec, col_glob + (1 << 31)])

        for dev in np.ndindex(mshape):
            if dev[0] != edge_dev:
                continue
            ys = (dev[1] * grid.ny_loc + np.arange(grid.ny_loc)) * grid.dy
            if grid.dimension == 2:
                coords = (np.full_like(ys, x_glob), ys)
                cell_idx = (np.arange(grid.ny_loc),)
            else:
                zs = (dev[2] * grid.nz_loc + np.arange(grid.nz_loc)) * grid.dz
                Y, Z = np.meshgrid(ys, zs, indexing="ij")
                coords = (np.full_like(Y, x_glob), Y, Z)
                cell_idx = np.meshgrid(np.arange(grid.ny_loc),
                                       np.arange(grid.nz_loc), indexing="ij")
            dens = dens_fn(*coords)
            ppc = ppc_fn(*coords).astype(np.int64)
            n_per_cell = np.where(dens > sp.density_min,
                                  np.maximum(ppc, 0), 0)
            total = int(n_per_cell.sum())
            if total == 0:
                continue
            if total > k:
                logger.warning(
                    f"moving window: injection buffer overflow for species "
                    f"{sp.name} ({total} > {k}); truncating")
                sim.count_host_loss(ispec, total - k)
                total = k
            flat_n = n_per_cell.reshape(-1)
            cell_ids = np.repeat(np.arange(flat_n.size), flat_n)[:total]
            w = (dens.reshape(-1)[cell_ids] * dV
                 / np.maximum(ppc.reshape(-1)[cell_ids], 1))
            vals["w"][dev][:total] = w
            vals["x"][dev][:total] = x_loc + rng.uniform(-0.5, 0.5, total)
            cy = np.unravel_index(cell_ids, n_per_cell.shape)
            y_loc = cy[0] + rng.uniform(-0.5, 0.5, total)
            vals["y"][dev][:total] = y_loc
            pos_si = [np.full(total, x_glob),
                      (dev[1] * grid.ny_loc + y_loc) * grid.dy]
            if grid.dimension == 3:
                z_loc = cy[1] + rng.uniform(-0.5, 0.5, total)
                vals["z"][dev][:total] = z_loc
                pos_si.append((dev[2] * grid.nz_loc + z_loc) * grid.dz)
            u3 = []
            for fn in mom_fns:
                u3.append(np.zeros(total) if fn is None
                          else fn(*pos_si[: grid.dimension]))
            vals["ux"][dev][:total] = u3[0]
            vals["uy"][dev][:total] = u3[1]
            vals["uz"][dev][:total] = u3[2]
            vals["inv_gamma"][dev][:total] = 1.0 / np.sqrt(
                1 + u3[0]**2 + u3[1]**2 + u3[2]**2)
            n[dev] = total
        return {"vals": vals, "n": n}

    def _rebin_injection(self, sim, inj, kb: int, ispec: int):
        """Tiled layout: bin the flat right-edge injection buffers by
        y-tile — the device-side insert (ops/tiled2d.py::insert_tiled)
        merges them into tile column ntx-1."""
        grid = sim.grid
        ty = sim.tiling[1]
        nty = grid.ny_loc // ty
        mshape = grid.mesh_shape
        vals, n = inj["vals"], inj["n"]
        out = {a: np.zeros(mshape + (nty, kb), v.dtype)
               for a, v in vals.items()}
        if "inv_gamma" in out:
            out["inv_gamma"][...] = 1.0
        out_n = np.zeros(mshape + (nty,), np.int32)
        for dev in np.ndindex(mshape):
            tot = int(n[dev])
            if tot == 0:
                continue
            y = vals["y"][dev][:tot]
            tj = np.clip((np.floor(y + 0.5) // ty).astype(int), 0, nty - 1)
            for t in range(nty):
                sel = np.nonzero(tj == t)[0]
                if len(sel) > kb:
                    logger.warning(
                        f"moving window: per-tile injection overflow "
                        f"({len(sel)} > {kb}); truncating")
                    sim.count_host_loss(ispec, len(sel) - kb)
                    sel = sel[:kb]
                for a in vals:
                    out[a][dev][t][:len(sel)] = vals[a][dev][sel]
                out_n[dev][t] = len(sel)
        return {"vals": out, "n": out_n}

    def _rebin_injection_cells(self, sim, inj, ispec: int):
        """Cell layout: bin the flat right-edge injection buffers by
        cell into slot arrays mesh + (cap_c, ny_loc[, nz_loc]); the
        device-side shift overwrites the incoming (dead) x column."""
        grid = sim.grid
        cap = sim._species_static[ispec].cap
        mshape = grid.mesh_shape
        cells = (grid.ny_loc,) if grid.dimension == 2 else (
            grid.ny_loc, grid.nz_loc)
        ncells = int(np.prod(cells))
        vals, n = inj["vals"], inj["n"]
        out = {a: np.zeros(mshape + (cap,) + cells, v.dtype)
               for a, v in vals.items()}
        if "inv_gamma" in out:
            out["inv_gamma"][...] = 1.0
        alive = np.zeros(mshape + (cap,) + cells, bool)
        for dev in np.ndindex(mshape):
            tot = int(n[dev])
            if tot == 0:
                continue
            cj = np.clip(np.floor(vals["y"][dev][:tot] + 0.5).astype(int),
                         0, grid.ny_loc - 1)
            if grid.dimension == 3:
                ck = np.clip(np.floor(vals["z"][dev][:tot] + 0.5).astype(int),
                             0, grid.nz_loc - 1)
                flat = cj * grid.nz_loc + ck
            else:
                flat = cj
            order = np.argsort(flat, kind="stable")
            fs = flat[order]
            slot = np.arange(tot) - np.searchsorted(fs, fs, side="left")
            keep = slot < cap
            if not keep.all():
                logger.warning(
                    f"moving window: per-cell injection overflow for "
                    f"species {sim.species[ispec].name}; truncating")
                sim.count_host_loss(ispec, int((~keep).sum()))
            for a, v in vals.items():
                out[a][dev].reshape(cap, ncells)[slot[keep], fs[keep]] = \
                    v[dev][:tot][order][keep]
            alive[dev].reshape(cap, ncells)[slot[keep], fs[keep]] = True
        return {"vals": out, "n": alive}

    def _shift_once(self, sim, direction: int = 1) -> None:
        if self._k_inject is None:
            self._k_inject = self._estimate_k(sim)
            if sim.tiling is not None and sim.tiling != "cell":
                ty = sim.tiling[1]
                self._kb_inject = [
                    max(128, int(np.ceil(k * ty / sim.grid.ny_loc / 128)
                                 * 128))
                    for k in self._k_inject]
        # cache the jitted shift on the builder: host-side re-capacity
        # rebuilds the builder (new species statics), which must also
        # invalidate the shift closure
        cache = getattr(sim._builder, "_window_shift_fns", None)
        if cache is None:
            cache = sim._builder._window_shift_fns = {}
        if direction not in cache:
            cache[direction] = sim._builder.make_window_shift(direction)
        injections = []
        for ispec in range(len(sim.species)):
            inj = self._column_particles(sim, ispec, self._k_inject[ispec],
                                         direction)
            if sim.tiling == "cell":
                inj = self._rebin_injection_cells(sim, inj, ispec)
            elif sim.tiling is not None:
                inj = self._rebin_injection(sim, inj,
                                            self._kb_inject[ispec], ispec)
            injections.append(inj)
        sim.state = cache[direction](sim.state, injections)
        sim._window_offset += direction
