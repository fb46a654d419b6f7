"""Simulation drivers (2D and 3D).

TPU-native rebuild of the reference orchestration layer
(simulation/simulation.py:50-1509). The public surface mirrors the
reference: construct with grid/boundary/timing parameters, add Species,
call run() with callbacks. Internally the per-step stage sequence is
compiled into jitted segments over a globally sharded SimulationState
(see simulation/step.py); host callbacks run between segments.

Deliberate TPU divergences (SURVEY.md §5.8, §7):
- patches == devices: npatch_x/npatch_y name the device mesh; auto-patching
  picks one patch per available chip (parallel/mesh.py::auto_patches).
- No MPI manager / METIS / load balancer: XLA SPMD + static sharding.
- Particle arrays have fixed capacity with host-side re-capacity between
  steps instead of extend()/prune().
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Literal, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from pydantic import BaseModel, Field, model_validator

from ..constants import c as c_light
from ..core.grid import Grid
from ..core.species import Species, _ALL_SPECIES
from ..core.state import (FieldsState, ParticlesState, SimulationState,
                          particles_from_numpy, zeros_fields)
from ..ops.cpml import CPMLCoeffs, CPMLParams, build_cpml
from ..parallel import distributed as dist
from ..parallel import mesh as pmesh
from ..utils.logger import configure_logger, logger
from ..utils.timer import Timer, set_timer_enabled
from ..utils.progress import ProgressBar
from .callbacks import (DEFAULT_STAGE, HOST_STAGES, INNER_STAGES,
                        INNER_SUBSTAGES, STAGES, JaxCallback,
                        SimulationCallbacks)
from .initfill import count_macro_particles, fill_species, pick_capacity
from .step import SpeciesStatic, StepBuilder


def _grow_minor(a: np.ndarray, cap: int) -> np.ndarray:
    """Zero-pad the minor (slot) axis of a host array up to ``cap``."""
    if a.shape[-1] >= cap:
        return a
    pad = [(0, 0)] * (a.ndim - 1) + [(0, cap - a.shape[-1])]
    return np.pad(a, pad)


class SimulationConfig(BaseModel):
    """Validation model (reference simulation.py:50-100) + TPU extras."""

    nx: int = Field(..., gt=0)
    ny: int = Field(..., gt=0)
    dx: float = Field(..., gt=0)
    dy: float = Field(..., gt=0)
    npatch_x: int = Field(..., ge=0)
    npatch_y: int = Field(..., ge=0)
    nsteps: Optional[int] = Field(None, gt=0)
    sim_time: Optional[float] = Field(None, gt=0)
    dt_cfl: float = Field(0.95, gt=0, le=1)
    n_guard: int = Field(3, gt=0)
    cpml_thickness: int = Field(6, gt=0)
    log_file: Optional[str] = None
    truncate_log: bool = True
    enable_timer: bool = False
    boundary_conditions: Dict[str, str] = Field(
        default_factory=lambda: {"xmin": "pml", "xmax": "pml",
                                 "ymin": "pml", "ymax": "pml"})
    random_seed: Optional[int] = None
    # TPU-native extras
    precision: Literal["single", "double"] = "single"
    particle_capacity_factor: float = Field(2.0, gt=1.0)
    migration_buffer: Optional[int] = Field(None)

    @model_validator(mode="after")
    def validate_mutual_exclusion(self):
        if self.nsteps is not None and self.sim_time is not None:
            raise ValueError(
                "Cannot specify both nsteps and sim_time. Use only one.")
        return self


class Simulation3DConfig(SimulationConfig):
    nz: int = Field(..., gt=0)
    dz: float = Field(..., gt=0)
    npatch_z: int = Field(..., ge=0)
    boundary_conditions: Dict[str, str] = Field(
        default_factory=lambda: {"xmin": "pml", "xmax": "pml",
                                 "ymin": "pml", "ymax": "pml",
                                 "zmin": "pml", "zmax": "pml"})


@dataclass
class Simulation:
    """2D PIC simulation (reference simulation.py:118-1216).

    Parameters mirror the reference; see class docstring there. TPU extras:
        precision: 'single' (default) or 'double' (requires jax x64)
        particle_capacity_factor: headroom over the initial per-device count
        migration_buffer: per-direction migration buffer size (auto if None)
    """

    nx: int
    ny: int
    dx: float
    dy: float
    npatch_x: int = 0
    npatch_y: int = 0
    nsteps: Optional[int] = None
    sim_time: Optional[float] = None
    dt_cfl: float = 0.95
    n_guard: int = 3
    boundary_conditions: Optional[Dict[str, str]] = None
    cpml_thickness: int = 6
    log_file: Optional[str] = None
    truncate_log: bool = True
    enable_timer: bool = False
    random_seed: Optional[int] = None
    precision: str = "single"
    particle_capacity_factor: float = 2.0
    migration_buffer: Optional[int] = None
    # TPU extra: tile-binned dense particle path (ops/tiled2d.py).
    # (TX, TY) cells per tile; None = reference-layout scatter/gather path.
    tiling: Optional[tuple] = None
    # "auto" = pallas kernels on TPU (taps fused in VMEM,
    # ops/tiled2d_pallas.py), XLA dense taps on CPU; or force
    # "pallas" / "xla"
    tiling_backend: str = "auto"
    # tiled path: re-bin particles to tiles every R steps instead of every
    # step. The migration sorts dominate the step cost, so this divides
    # them by R; requires n_guard wide enough to cover R steps of CFL
    # drift (validated at initialize)
    rebin_interval: int = 1
    # cell engine (tiling="cell") re-binning scheme:
    #   "fast"  = single cap-wide sort + overwrite-merge. ~2x faster
    #             migration; simultaneous slot collisions and capacity
    #             overflow MERGE particles weight-conservingly (charge
    #             and momentum exactly preserved; the merge count rides
    #             in the overflow counters and is warned about — the
    #             reference never merges, it grows arrays instead,
    #             particles.py:141-168).
    #   "exact" = 3*cap concat-merge: no merging at all while a cell's
    #             total stays within capacity (ops/cell2d.py
    #             migrate_cells); overflow beyond capacity still merges.
    # Use "exact" for runs where per-particle identity matters (e.g.
    # tracking studies); "fast" for throughput. Both conserve total
    # charge/momentum; merges only coarsen the in-cell distribution.
    cell_migration: str = "fast"
    # every-step rho deposit. The reference deposits jx,jy,jz,rho
    # together (current/current_deposit.h) but only J feeds the Maxwell
    # update — rho is diagnostics-only. "auto" (default) keeps the
    # reference behavior unless EVERY registered callback declares
    # itself rho-free (our callback classes do; plain user functions
    # are conservatively assumed to read rho), in which case the hot
    # loop deposits J only and get_field("rho") recomputes rho on
    # demand from the current particle positions (identical up to fp
    # association). True/False force either mode.
    deposit_rho: object = "auto"
    # TPU extra: fuse up to N steps into one lax.scan dispatch when no host
    # callback is due (amortizes dispatch latency; costs one extra compile
    # per chunk size). "auto" (default) = CHUNK_SIZES[0] on accelerator
    # backends, off on CPU (where dispatch is cheap and the scan compile
    # isn't); 1 = off. Host callbacks are always honored: steps with one
    # due fall back to the per-step path (_steps_until_host_event).
    step_chunk: object = "auto"
    # host-side re-capacity (the reference's ParticlesBase.extend analog,
    # particles.py:141-168): every N steps read slot occupancy + overflow
    # counters (device scalars) and grow a species' capacity 1.5x before
    # it overflows. 0 = off (fixed capacities). Growth rebuilds the
    # stepper (one recompile per growth event).
    recap_interval: int = 10
    # grow when the fullest device/cell exceeds this occupancy fraction
    recap_threshold: float = 0.75

    dimension = 2

    def __post_init__(self):
        if self.boundary_conditions is None:
            self.boundary_conditions = {"xmin": "pml", "xmax": "pml",
                                        "ymin": "pml", "ymax": "pml"}
        cfgcls = SimulationConfig if self.dimension == 2 else Simulation3DConfig
        extra = {} if self.dimension == 2 else dict(
            nz=self.nz, dz=self.dz, npatch_z=self.npatch_z)
        cfg = cfgcls(
            nx=self.nx, ny=self.ny, dx=self.dx, dy=self.dy,
            npatch_x=self.npatch_x, npatch_y=self.npatch_y,
            nsteps=self.nsteps, sim_time=self.sim_time, dt_cfl=self.dt_cfl,
            n_guard=self.n_guard, cpml_thickness=self.cpml_thickness,
            log_file=self.log_file, truncate_log=self.truncate_log,
            enable_timer=self.enable_timer,
            boundary_conditions=self.boundary_conditions,
            random_seed=self.random_seed, precision=self.precision,
            particle_capacity_factor=self.particle_capacity_factor,
            migration_buffer=self.migration_buffer, **extra)
        self._config = cfg

        # dt from CFL (reference simulation.py:219)
        inv2 = self.dx**-2 + self.dy**-2
        if self.dimension == 3:
            inv2 += self.dz**-2
        self.dt = cfg.dt_cfl * inv2**-0.5 / c_light

        configure_logger(sink=cfg.log_file,
                         truncate_existing=cfg.truncate_log,
                         enable_timer=cfg.enable_timer)
        set_timer_enabled(cfg.enable_timer)

        self.species: List[Species] = []
        self.itime = 0
        self.time = 0.0
        self.initialized = False
        self.state: Optional[SimulationState] = None
        self._xmin_pml_removed = False
        self._collision_groups = None
        # reference semantics (tests/test_random_seed.py:10-107): a fixed
        # random_seed gives bitwise-reproducible runs; no seed draws fresh
        # OS entropy so repeated runs differ
        if cfg.random_seed is not None:
            self._seed_effective = int(cfg.random_seed)
        else:
            import numpy as _np
            self._seed_effective = int(
                _np.random.SeedSequence().generate_state(1)[0])
        self._base_key = jax.random.PRNGKey(self._seed_effective)
        self._occ_fns: Dict[int, object] = {}
        self._overflow_seen: Dict[int, int] = {}
        self._occ_seen: Dict[int, int] = {}
        # host-side particle losses (e.g. moving-window injection-buffer
        # truncation) — folded into the overflow report so no loss path
        # is silent (reference never loses particles: extend() grows)
        self._host_lost: Dict[int, int] = {}
        self._loss_reported: Dict[tuple, int] = {}
        self._window_offset = 0   # moving-window cells shifted (host int)
        logger.info("Simulation instance created")

    # ------------------------------------------------------------------
    @property
    def dtype(self):
        if self._config.precision == "double":
            if not jax.config.jax_enable_x64:
                raise RuntimeError(
                    "precision='double' requires jax_enable_x64; set "
                    "jax.config.update('jax_enable_x64', True) before use")
            return jnp.float64
        return jnp.float32

    @property
    def Lx(self):
        return self.nx * self.dx

    @property
    def Ly(self):
        return self.ny * self.dy

    @property
    def nx_per_patch(self):
        return self.grid.nx_loc

    @property
    def ny_per_patch(self):
        return self.grid.ny_loc

    # ------------------------------------------------------------------
    def add_species(self, species: Sequence[Species]):
        for s in species:
            if not isinstance(s, Species):
                raise TypeError(f"not a Species: {s!r}")
            if s not in self.species:
                s.ispec = len(self.species)
                self.species.append(s)
        return self

    def _add_default_species_if_empty(self):
        """Auto-register user-created species (reference species.py:112,
        simulation.py _add_default_species_if_empty)."""
        if self.species:
            return
        compatible = [s for s in _ALL_SPECIES if s.is_compatible(self.dimension)]
        if compatible:
            logger.info(
                f"Auto-adding {len(compatible)} species created in script: "
                f"{[s.name for s in compatible]}")
            self.add_species(compatible)

    def set_enabled(self, component: str, enabled: bool = True):
        """Runtime operator toggle (reference EnableMixin,
        core/utils/enable_mixin.py:4-38): component in {'maxwell',
        'pusher', 'interpolation', 'current_deposition', 'qed',
        'collisions', 'migration'}. Takes effect on the next run()
        (recompiles the step).

        Warning: disabling 'migration' under the cell engine breaks the
        home-binning contract (deltas grow without bound and shape
        weights decay to zero) — it exists for timing ablations only."""
        valid = {"maxwell", "pusher", "interpolation", "current_deposition",
                 "qed", "collisions", "migration", "species_block"}
        if component not in valid:
            raise ValueError(f"component must be one of {sorted(valid)}")
        if not hasattr(self, "_switches"):
            self._switches = {}
        self._switches[component] = enabled
        if hasattr(self, "_full_step"):
            del self._full_step  # force stepper rebuild on next run

    def add_collision(self, groups, lnLambda: float = 0.0):
        """Register collision groups (reference Collision,
        core/collision/collision.py:22-63): every unordered pair of species
        within a group collides; a species listed twice collides with
        itself. lnLambda=0 selects the varying Coulomb log."""
        self._collision_groups = groups
        self._collision_lnLambda = lnLambda

    # ------------------------------------------------------------------
    def _make_grid(self) -> Grid:
        extra = {} if self.dimension == 2 else dict(
            nz=self.nz, dz=self.dz, npatch_z=self.npatch_z)
        g = Grid(
            dimension=self.dimension, nx=self.nx, ny=self.ny,
            dx=self.dx, dy=self.dy, npatch_x=self.npatch_x,
            npatch_y=self.npatch_y, n_guard=self.n_guard,
            cpml_thickness=self.cpml_thickness,
            boundary_conditions=tuple(sorted(self.boundary_conditions.items())),
            **extra)
        g.validate()
        return g

    def _auto_patch(self):
        if self.dimension == 2:
            if self.npatch_x == 0 or self.npatch_y == 0:
                self.npatch_x, self.npatch_y = pmesh.auto_patches(
                    self.nx, self.ny)
                logger.info(
                    f"Auto patches: {self.npatch_x} x {self.npatch_y}")
        else:
            if 0 in (self.npatch_x, self.npatch_y, self.npatch_z):
                self.npatch_x, self.npatch_y, self.npatch_z = \
                    pmesh.auto_patches(self.nx, self.ny, self.nz)
                logger.info(f"Auto patches: {self.npatch_x} x "
                            f"{self.npatch_y} x {self.npatch_z}")

    def initialize(self, devices=None):
        """Build grid, mesh, fields and particles (reference
        simulation.py:284-423)."""
        self._add_default_species_if_empty()
        self._auto_patch()
        self.grid = self._make_grid()
        self.mesh = pmesh.make_mesh(self.grid, devices)
        logger.info(f"Domain: {self.grid.shape} cells, mesh "
                    f"{self.grid.mesh_shape}, dt={self.dt:.3e}s")

        any_pml = any(v == "pml" for v in self.grid.bc.values())
        self.cpml = build_cpml(self.grid, self.dt,
                               CPMLParams(thickness=self.cpml_thickness)) \
            if any_pml else None

        dtype = self.dtype
        fields = zeros_fields(self.grid, dtype=dtype, with_pml=any_pml,
                              cpml=self.cpml)
        from jax.sharding import NamedSharding, PartitionSpec as _P
        g_shape = self.grid.shape

        def _field_put(a):
            # slab-restricted psi arrays replicate their (tiny) slab axis
            # instead of sharding it over the mesh
            names = [n if a.shape[i] == g_shape[i] else None
                     for i, n in enumerate(self.mesh.axis_names)]
            return dist.put_global(a, NamedSharding(self.mesh, _P(*names)))

        fields = jax.tree.map(_field_put, fields)

        if self.cell_migration not in ("fast", "exact"):
            raise ValueError(
                f"cell_migration must be 'fast' or 'exact', got "
                f"{self.cell_migration!r}")
        if self.tiling is not None:
            self._validate_tiling()
        elif self.rebin_interval != 1:
            raise ValueError(
                "rebin_interval requires the tiled engine (tiling=); the "
                "scatter path migrates with fixed-width guards every step")
        seed = self._seed_effective
        parts = []
        self._species_static = []
        psh = pmesh.particle_sharding(self.mesh)
        ssh = pmesh.scalar_sharding(self.mesh)
        for ispec, sp in enumerate(self.species):
            counts = count_macro_particles(self.grid, sp)
            cap = pick_capacity(counts, self._config.particle_capacity_factor)
            if sp.capacity is not None:
                cap = max(cap, int(np.ceil(sp.capacity / 128) * 128))
            arrays, counts = fill_species(self.grid, sp, seed, ispec, cap)
            tile_cap = 0
            if self.tiling == "cell":
                from .initfill import bin_cells
                cap_c = None
                if sp.capacity is not None:
                    # Species(capacity=) = per-device floor, spread
                    # uniformly over cells (QED child headroom)
                    ncells = int(np.prod(
                        (self.grid.nx_loc, self.grid.ny_loc,
                         self.grid.nz_loc)[:self.dimension]))
                    cap_c = max(4, int(np.ceil(
                        sp.capacity / ncells / 2) * 2))
                arrays, alive_np, tile_cap = bin_cells(
                    arrays, counts, self.grid,
                    factor=self._config.particle_capacity_factor,
                    cap_c=cap_c)
                pst = self._tiled_state(sp, arrays, alive_np, dtype)
                cap = tile_cap
            elif self.tiling is not None:
                from .initfill import bin_tiled
                arrays, alive_np, tile_cap = bin_tiled(
                    arrays, counts, self.grid, *self.tiling,
                    factor=self._config.particle_capacity_factor)
                if sp.capacity is not None:
                    # interpret Species(capacity=) as a per-device floor,
                    # spread uniformly over tiles (QED child headroom)
                    ntiles = ((self.grid.nx_loc // self.tiling[0])
                              * (self.grid.ny_loc // self.tiling[1]))
                    want = int(np.ceil(sp.capacity / ntiles / 128) * 128)
                    if want > tile_cap:
                        old = tile_cap
                        tile_cap = want
                        arrays = {k: _grow_minor(v, tile_cap)
                                  for k, v in arrays.items()}
                        if "inv_gamma" in arrays:
                            arrays["inv_gamma"][..., old:] = 1.0
                        alive_np = _grow_minor(alive_np, tile_cap)
                pst = self._tiled_state(sp, arrays, alive_np, dtype)
                cap = tile_cap
            else:
                pst = particles_from_numpy(self.grid, sp, arrays, counts,
                                           cap, dtype=dtype)
            pst = ParticlesState(
                data={k: dist.put_global(v, psh) for k, v in pst.data.items()},
                alive=dist.put_global(pst.alive, psh),
                next_id=dist.put_global(pst.next_id, ssh),
                overflow=dist.put_global(pst.overflow, ssh))
            parts.append(pst)
            buf = self._config.migration_buffer
            if buf is None:
                per_axis = max(self.grid.nx_loc, self.grid.ny_loc)
                buf = max(256, int(8 * cap / max(per_axis, 1)))
                buf = int(np.ceil(buf / 128) * 128)
            self._species_static.append(SpeciesStatic(
                name=sp.name, q=sp.q, m=sp.m, pusher=sp.pusher, cap=cap,
                migration_buf=min(buf, cap), has_qed=sp.has_qed,
                tile_cap=tile_cap))
            logger.info(f"Species {sp.name}: {int(counts.sum()):,} macro "
                        f"particles, capacity {cap}/"
                        + ("tile" if self.tiling else
                           f"device, migration buffer {min(buf, cap)}"))

        self.state = SimulationState(fields=fields, particles=tuple(parts))
        # re-initialization rebuilds the overflow counters from zero: the
        # loss watermarks must restart with them or post-re-init losses
        # would be silently swallowed up to the stale high-water mark
        self._loss_reported.clear()
        self._overflow_seen.clear()
        self._occ_seen.clear()
        self._host_lost.clear()
        self._init_qed()
        self._sync_qed_child_caps()
        dist.warm_collectives(self.mesh)
        self.initialized = True
        logger.info("Initialization complete")

    def _sync_qed_child_caps(self):
        """QED child species (the photons of a radiating electron; the
        e-/e+ of a converting photon) receive newborns in bursts that
        scale with the parent population. An empty child starts at the
        128-slot capacity floor, so a first-step burst can overflow
        before the between-step re-capacity ever observes an occupancy
        trend (the reference extends arrays inside the step and never
        loses, particles.py:141-168). Floor every child's capacity at
        its parent's."""
        from ..core.species import Electron, Photon
        pairs = []
        for sp in self.species:
            if isinstance(sp, Electron) and sp.radiation == "photons" \
                    and sp.photon is not None:
                pairs.append((sp.ispec, sp.photon.ispec))
            if isinstance(sp, Photon) and sp.electron is not None:
                pairs.append((sp.ispec, sp.electron.ispec))
                pairs.append((sp.ispec, sp.positron.ispec))
        for parent, child in pairs:
            pst = self._species_static[parent]
            cst = self._species_static[child]
            pcap = pst.tile_cap if self.tiling is not None else pst.cap
            ccap = cst.tile_cap if self.tiling is not None else cst.cap
            if ccap < pcap:
                self._grow_capacity(child, pcap)

    def _validate_tiling(self):
        if self.tiling == "cell":
            g = self.grid
            if g.n_guard < 2:
                raise ValueError("cell binning needs n_guard >= 2 (the "
                                 "post-rebin deposit stencil spans +-2)")
            if self.rebin_interval != 1:
                raise NotImplementedError(
                    "cell binning re-bins every step (rebin_interval=1)")
            return
        tx, ty = self.tiling
        g = self.grid
        if g.dimension != 2:
            raise NotImplementedError("tiling is 2D-only for now")
        if g.nx_loc % tx or g.ny_loc % ty:
            raise ValueError(
                f"per-device grid ({g.nx_loc}x{g.ny_loc}) must be divisible "
                f"by the tile size ({tx}x{ty})")
        if tx < 2 * g.n_guard or ty < 2 * g.n_guard:
            raise ValueError("tile size must be >= 2*n_guard")
        if self.rebin_interval > 1:
            import math
            max_cdt = c_light * self.dt / min(self.dx, self.dy)
            need = 2 + math.ceil(self.rebin_interval * max_cdt - 1e-12)
            if g.n_guard < need:
                raise ValueError(
                    f"rebin_interval={self.rebin_interval} needs n_guard >="
                    f" {need} (tile halo must cover the accumulated CFL "
                    f"drift); got {g.n_guard}")

    def _tiled_state(self, sp, arrays, alive_np, dtype):
        """Build a ParticlesState from tiled host arrays
        (mesh_shape + (ntx, nty, cap_t))."""
        mshape = self.grid.mesh_shape
        data = {}
        for attr in sp.attrs():
            a = arrays.get(attr)
            if a is None:
                a = np.zeros(alive_np.shape, dtype=np.float64)
            data[attr] = jnp.asarray(a, dtype=dtype)
        shape = alive_np.shape
        iota = np.arange(int(np.prod(shape[len(mshape):])),
                         dtype=np.uint32).reshape(shape[len(mshape):])
        data["id_lo"] = jnp.asarray(np.broadcast_to(iota, shape).copy())
        dev = np.arange(int(np.prod(mshape)), dtype=np.uint32).reshape(mshape)
        dev = dev.reshape(mshape + (1,) * (len(shape) - len(mshape)))
        data["id_hi"] = jnp.asarray(np.broadcast_to(dev, shape).copy())
        return ParticlesState(
            data=data, alive=jnp.asarray(alive_np),
            next_id=jnp.asarray(
                alive_np.reshape(mshape + (-1,)).sum(-1).astype(np.uint32)),
            overflow=jnp.zeros(mshape, dtype=jnp.int32))

    def _init_qed(self):
        """Build QED processes from species wiring (reference
        simulation.py _init_qed; species.py set_photon/set_bw_pair)."""
        from ..core.species import Electron, Photon
        from ..models.qed import (NonlinearComptonLCFA,
                                  NonlinearPairProductionLCFA)
        self._qed_processes = []
        dtype = self.dtype
        for sp in self.species:
            if isinstance(sp, Electron):
                if sp.radiation == "photons" and sp.photon is not None:
                    buf = self._species_static[sp.ispec].migration_buf
                    self._qed_processes.append(NonlinearComptonLCFA(
                        sp.ispec, sp.photon.ispec, buf, dtype))
                elif sp.radiation == "ll":
                    logger.warning(
                        "continuous (LL) radiation is a stub (as in the "
                        "reference, radiation.py:240-276); ignored")
            if isinstance(sp, Photon) and sp.electron is not None:
                buf = self._species_static[sp.ispec].migration_buf
                self._qed_processes.append(NonlinearPairProductionLCFA(
                    sp.ispec, sp.electron.ispec, sp.positron.ispec, buf,
                    dtype))
        if self._qed_processes:
            logger.info(f"QED processes: {len(self._qed_processes)}")

    def _disable_x_pml(self):
        """Remove the x-axis PML (moving-window start; reference
        callback/utils.py:543-556). Recompiles the step without the x CPML
        profiles; psi_x arrays stay in the state pytree but become inert."""
        if self._xmin_pml_removed:
            return
        self._xmin_pml_removed = True
        if self.cpml is not None and "x" in self.cpml.profiles:
            profiles = dict(self.cpml.profiles)
            profiles.pop("x")
            self.cpml = CPMLCoeffs(profiles=profiles)
        # zero the now-inert psi_x arrays
        f = self.state.fields
        psi = dict(f.psi)
        for k in list(psi):
            if k.endswith("_x"):
                psi[k] = jnp.zeros_like(psi[k])
        self.state = self.state.replace(fields=f.replace(psi=psi))
        self._build_stepper(getattr(self, "_active_lasers", []))

    # ------------------------------------------------------------------
    def _build_stepper(self, lasers: Sequence[JaxCallback]):
        collisions = None
        if self._collision_groups:
            from itertools import combinations

            from ..models.collision import (Collision, CollisionConfig,
                                            CollisionPairCfg)
            pairs = []
            seen = set()
            for group in self._collision_groups:
                for s1, s2 in combinations(group, 2):
                    p = tuple(sorted((s1.ispec, s2.ispec)))
                    if p not in seen:
                        seen.add(p)
                        pairs.append(CollisionPairCfg(*p))
            cell_vol = self.dx * self.dy * (
                self.dz if self.dimension == 3 else 1.0)
            cfg = CollisionConfig(
                pairs=tuple(pairs),
                species_mq=tuple((s.m, s.q) for s in self.species),
                cell_vol=cell_vol,
                lnLambda=getattr(self, "_collision_lnLambda", 0.0))
            collisions = Collision(cfg, self.grid)
            logger.info(f"collisions: {len(pairs)} species pairs")
        tile_cfg = None
        cell_layout = self.tiling == "cell"
        if self.tiling is not None and not cell_layout:
            from ..ops.tiled2d import TileCfg
            tx, ty = self.tiling
            tile_cfg = TileCfg(tx=tx, ty=ty, ntx=self.grid.nx_loc // tx,
                               nty=self.grid.ny_loc // ty, cap_t=0,
                               h=self.grid.n_guard)
        tile_backend = self.tiling_backend
        if tile_backend == "auto":
            tile_backend = ("xla" if jax.default_backend() == "cpu"
                            else "pallas")
        builder = StepBuilder(
            grid=self.grid, mesh=self.mesh, cpml=self.cpml, dt=self.dt,
            species=self._species_static, lasers=lasers,
            qed_processes=getattr(self, "_qed_processes", ()),
            collisions=collisions,
            switches=getattr(self, "_switches", None),
            tile_cfg=tile_cfg, tile_backend=tile_backend,
            rebin_interval=self.rebin_interval,
            cell_layout=cell_layout,
            cell_migration=self.cell_migration,
            with_rho=getattr(self, "_with_rho", True))
        self._builder = builder
        self._rho_fns = {}
        self._total_rho_fn = False      # lazy (None = no charged species)
        self._multi_steps = {}
        self._sub_segs = {}
        self._full_step_nm = None
        (self._full_step, self._seg1, self._seg2, self._seg3) = \
            builder.compile()

    def _scalars(self, lasers) -> dict:
        # Two dispatch-path rules shaped this (3D bench, device step
        # ~7.7 ms vs ~12.8 ms wall):
        # - the per-step key fold rides INSIDE the jitted step (step.py
        #   seg_particles folds base_key with "itime"): folding here
        #   dispatched two extra tiny device programs per step;
        # - every per-step host scalar (itime, laser gates/phases) is
        #   packed into ONE f64 "blob" array so the step takes a single
        #   small host->device transfer instead of ~10 separate leaves,
        #   each paying a relay round trip.
        raw = {}
        for i, laser in enumerate(lasers):
            raw[f"laser{i}"] = laser.host_scalars(self)
        sc = {"key": self._base_key, "itime": np.uint32(self.itime)}
        if raw:
            leaves, treedef = jax.tree.flatten(raw)
            for v in leaves:
                a = np.asarray(v)
                # the blob canonicalizes to f32 on device (x64 off): a
                # non-scalar, complex, or >2^24 integer leaf would be
                # silently corrupted rather than transferred
                if a.ndim != 0 or a.dtype.kind not in "fiub":
                    raise TypeError(
                        "host_scalars leaves must be real 0-d scalars; "
                        f"got {a.dtype} with shape {a.shape}")
                if a.dtype.kind in "iu" and abs(int(a)) > (1 << 24):
                    raise ValueError(
                        f"host scalar {int(a)} exceeds f32 integer "
                        "exactness (2^24); pass it as a static config "
                        "value instead")
            self._builder.set_scalar_blob(
                treedef, [np.asarray(v).dtype for v in leaves])
            sc["blob"] = np.array([float(v) for v in leaves], np.float64)
        return sc

    # -- chunked stepping (lax.scan over K steps, one dispatch) ----------
    CHUNK_SIZES = (16, 4)

    def _chunk_limit(self) -> int:
        """Resolve step_chunk: "auto" fuses up to CHUNK_SIZES[0] steps per
        dispatch on accelerator backends for 2D runs (the sub-10-ms 2D /
        vacuum / LWFA steps are host-dispatch bound otherwise: 506 ->
        907 Mpush/s on the 2D bench) and stays per-step in 3D, where the
        scan's per-iteration carry copies of the ~GB particle state cost
        more than the dispatch they save (435 -> 334 Mpush/s measured).
        CPU stays per-step: dispatch is cheap and scan compiles are not."""
        v = self.step_chunk
        if v == "auto":
            import jax as _jax
            if _jax.default_backend() == "cpu":
                return 1
            return self.CHUNK_SIZES[0] \
                if self.dimension == 2 else 1
        if isinstance(v, str) and v.startswith("unroll:"):
            n = int(v.split(":", 1)[1])
            if n < 1:
                raise ValueError(f"unroll chunk must be >= 1, got {n}")
            R = self.rebin_interval
            if n % R:
                # without this the run-loop candidate filter would
                # silently reject K forever and fall back to per-step
                # dispatch (multi_step_unrolled requires K % R == 0)
                raise ValueError(
                    f"step_chunk='unroll:{n}' requires K to be a "
                    f"multiple of rebin_interval={R} (the unrolled "
                    "chunk re-bins only at R-step boundaries)")
            return n
        if not isinstance(v, int) or isinstance(v, bool) or v < 1:
            raise ValueError(
                "step_chunk must be 'auto', 'unroll:K' or an int >= 1, "
                f"got {v!r}")
        return v

    def _chunk_unrolled(self) -> bool:
        return (isinstance(self.step_chunk, str)
                and self.step_chunk.startswith("unroll:"))

    def _steps_until_host_event(self, cbs, max_k: int,
                                stop_callback) -> int:
        """How many upcoming steps are free of host callbacks, so they can
        be fused into one scanned kernel."""
        if stop_callback is not None:
            return 1
        if any(cbs.by_stage[s] for s in
               ("start", "maxwell_1", "current_deposition",
                "qed_create_particles", "maxwell_2", "end")
               + tuple(sorted(INNER_STAGES))):
            # conservative: simulate the trigger check per step
            class _Shim:
                pass
            shim = _Shim()
            shim.dt = self.dt
            for k in range(max_k):
                shim.itime = self.itime + k
                shim.time = self.time + k * self.dt
                for s in (("start", "maxwell_1", "current_deposition",
                           "qed_create_particles", "maxwell_2", "end")
                          + tuple(sorted(INNER_STAGES))):
                    for cb in cbs.by_stage[s]:
                        try:
                            if cb._interval_triggered(shim):
                                return max(k, 1)
                        except Exception:
                            return 1
            return max_k
        return max_k

    def _get_sub_seg(self, sub: str):
        """Jitted split-path sub-segment (cached per sub-stage)."""
        if not hasattr(self, "_sub_segs"):
            self._sub_segs = {}
        if sub not in self._sub_segs:
            from functools import partial
            from .step import donation_argnums
            self._sub_segs[sub] = jax.jit(
                partial(self._builder.seg_particles_sub,
                        stages=frozenset({sub})),
                donate_argnums=donation_argnums())
        return self._sub_segs[sub]

    def _full_step_nomigrate(self):
        if getattr(self, "_full_step_nm", None) is None:
            from functools import partial
            from .step import donation_argnums
            self._full_step_nm = jax.jit(
                partial(self._builder.full_step, migrate=False),
                donate_argnums=donation_argnums())
        return self._full_step_nm

    def _get_multi_step(self, k: int):
        if not hasattr(self, "_multi_steps"):
            self._multi_steps = {}
        key = (k, self._chunk_unrolled())
        if key not in self._multi_steps:
            from .step import donation_argnums
            fn = (self._builder.multi_step_unrolled
                  if self._chunk_unrolled() else self._builder.multi_step)
            self._multi_steps[key] = jax.jit(
                fn, donate_argnums=donation_argnums())
        return self._multi_steps[key]

    def _stacked_scalars(self, lasers, k: int) -> dict:
        itime0, time0 = self.itime, self.time
        scs = []
        try:
            for j in range(k):
                self.itime = itime0 + j
                self.time = time0 + j * self.dt
                scs.append(self._scalars(lasers))
        finally:
            self.itime, self.time = itime0, time0
        return jax.tree.map(lambda *xs: jnp.stack(xs), *scs)

    def _handle_nsteps(self, nsteps, sim_time):
        """(reference simulation.py:1190-1210)"""
        if nsteps is not None and sim_time is not None:
            raise ValueError("Cannot specify both nsteps and sim_time")
        if nsteps is None and sim_time is None:
            if self.nsteps is not None:
                return self.nsteps
            if self.sim_time is not None:
                return int(self.sim_time / self.dt)
            raise ValueError("Must provide either nsteps or sim_time")
        if sim_time is not None:
            return int(sim_time / self.dt)
        return nsteps + self.itime

    def run(self, nsteps: Optional[int] = None,
            sim_time: Optional[float] = None,
            callbacks: Optional[Sequence] = None,
            stop_callback=None):
        """Main loop (reference simulation.py:858-1141)."""
        callbacks = list(callbacks or [])
        if not self.initialized:
            self.initialize()

        lasers = [cb for cb in callbacks
                  if getattr(cb, "is_jax_callback", False)]
        cbs = SimulationCallbacks(callbacks, self)
        with_rho = self._resolve_deposit_rho(callbacks)
        # (re)build the stepper only when the traced-callback set changes —
        # rebuilding recompiles the whole step
        if getattr(self, "_active_lasers", None) != lasers or \
                getattr(self, "_with_rho", None) != with_rho or \
                not hasattr(self, "_full_step"):
            self._active_lasers = lasers
            self._with_rho = with_rho
            self._build_stepper(lasers)

        nsteps_total = self._handle_nsteps(nsteps, sim_time)

        cbs.run("init")

        pbar = ProgressBar(total=nsteps_total, initial=self.itime,
                           desc="Progress")
        try:
            while self.itime < nsteps_total:
                self.istep = self.itime

                # chunked fast path: scan K host-callback-free steps in one
                # dispatch (default-on for accelerator backends; VERDICT r1
                # item 8 — dispatch-bound configs)
                chunk_limit = self._chunk_limit()
                if chunk_limit > 1:
                    free = self._steps_until_host_event(
                        cbs, min(chunk_limit,
                                 nsteps_total - self.itime), stop_callback)
                    R = self.rebin_interval
                    k = 1
                    sizes = ((chunk_limit,) if self._chunk_unrolled()
                             else self.CHUNK_SIZES)
                    for cand in sizes:
                        if cand <= free and cand <= chunk_limit and \
                                cand % R == 0 and self.itime % R == 0:
                            k = cand
                            break
                    if k > 1:
                        sc_stack = self._stacked_scalars(lasers, k)
                        with Timer(f"scan x{k}"):
                            self.state = self._get_multi_step(k)(
                                self.state, sc_stack)
                        self.time += k * self.dt
                        self.itime += k
                        pbar.update(k)
                        if self.recap_interval and \
                                (self.itime // self.recap_interval
                                 != (self.itime - k) // self.recap_interval):
                            self._maybe_recap()
                        continue

                pbar.update(1)
                with Timer("Callbacks: start stage"):
                    cbs.run("start")

                sc = self._scalars(lasers)
                INNER = INNER_SUBSTAGES
                split_due = any(cbs.due(st) for _, st in INNER
                                if st is not None)
                inner_host = (cbs.due("maxwell_1")
                              or cbs.due("current_deposition")
                              or cbs.due("qed_create_particles"))
                if split_due:
                    # SPLIT particle path: one jitted sub-segment per
                    # inner stage with host callbacks between (the
                    # reference's non-unified pusher, simulation.py:896)
                    with Timer("fields 1"):
                        self.state = self._seg1(self.state, sc)
                    cbs.run("maxwell_1")
                    for sub, cbstage in INNER:
                        with Timer(f"particles:{sub}"):
                            self.state = self._get_sub_seg(sub)(
                                self.state, sc)
                        if cbstage is not None:
                            cbs.run(cbstage)
                    cbs.run("current_deposition")
                    cbs.run("qed_create_particles")
                    with Timer("fields 2"):
                        self.state = self._seg3(self.state, sc)
                elif not inner_host:
                    # tiled R-step re-binning: skip the migration sorts on
                    # steps that are not at the end of an R-block (the
                    # split path below always migrates — early re-binning
                    # is always safe)
                    R = self.rebin_interval
                    if R > 1 and (self.itime % R) != R - 1:
                        fn = self._full_step_nomigrate()
                    else:
                        fn = self._full_step
                    with Timer("full step", sync=None):
                        self.state = fn(self.state, sc)
                else:
                    with Timer("fields 1"):
                        self.state = self._seg1(self.state, sc)
                    cbs.run("maxwell_1")
                    with Timer("particles"):
                        self.state = self._seg2(self.state, sc)
                    cbs.run("current_deposition")
                    cbs.run("qed_create_particles")
                    with Timer("fields 2"):
                        self.state = self._seg3(self.state, sc)

                with Timer("Callbacks: maxwell_2 + end stage"):
                    cbs.run("maxwell_2")
                    cbs.run("end")

                self.time += self.dt
                self.itime += 1

                if self.recap_interval and \
                        self.itime % self.recap_interval == 0:
                    self._maybe_recap()

                if stop_callback is not None and stop_callback():
                    pbar.close()
                    return "stop by callback"
        finally:
            pbar.close()

        jax.block_until_ready(self.state)
        # overflow accounting outside the hot loop: host reads while the
        # async dispatch queue is deep serialize execution on some backends
        self._check_overflow()
        with Timer("Callbacks: final stage"):
            cbs.run("final")

    # -- host-side re-capacity (reference particles.py:141-193) ---------
    def _slot_axis(self, p: ParticlesState) -> int:
        """Axis of the slot (capacity) dimension for the active layout."""
        if self.tiling == "cell":
            return len(self.grid.mesh_shape)   # (mesh..., cap_c, *cells)
        return p.alive.ndim - 1                # flat / tiled: cap last

    def _occupancy(self, ispec: int) -> tuple:
        """(max alive per slot-axis group, total alive) — device-side
        reductions, only two scalars cross to host."""
        p = self.state.particles[ispec]
        axis = self._slot_axis(p)
        fn = self._occ_fns.get((ispec, axis, p.alive.shape))
        if fn is None:
            fn = jax.jit(lambda alive: (
                alive.sum(axis=axis, dtype=jnp.int32).max(),
                alive.sum(dtype=jnp.int32)))
            self._occ_fns[(ispec, axis, p.alive.shape)] = fn
        mx, tot = fn(p.alive)
        return int(mx), int(tot)

    def _maybe_recap(self):
        """Grow capacities before (threshold) or at (overflow) need —
        the between-jit-segments analog of the reference's on-demand
        ParticlesBase.extend (particles.py:141-168)."""
        grew = False
        for ispec, p in enumerate(self.state.particles):
            st = self._species_static[ispec]
            cap = st.tile_cap if self.tiling is not None else st.cap
            ov = int(dist.to_host(p.overflow).sum())
            occ, total = self._occupancy(ispec)
            seen = self._overflow_seen.get(ispec, 0)
            # predictive trigger: extrapolate the occupancy growth over the
            # last interval so the next interval's influx fits (the
            # reference grows inside the step and never loses,
            # particles.py:141-168; between-step growth must look ahead)
            influx = max(0, occ - self._occ_seen.get(ispec, 0))
            self._occ_seen[ispec] = occ
            new_ov = ov - seen
            if self.tiling == "cell":
                # per-CELL capacity: single hot cells reaching cap are
                # routine and handled by weight-conserving merges; grow
                # only under sustained merge pressure (>0.5% of the
                # population per interval), where merging would start to
                # degrade the distribution statistics
                trigger = new_ov > 0.005 * max(total, 1)
            else:
                trigger = new_ov > 0 or \
                    occ + 2 * influx > self.recap_threshold * cap
            if new_ov > 0:
                self._overflow_seen[ispec] = ov
                verb = ("merged" if self.tiling == "cell"
                        else "lost to capacity overflow")
                log = (logger.warning if trigger else logger.debug)
                log(f"species {self.species[ispec].name}: {new_ov} "
                    f"particles {verb} (occupancy {occ}/{cap}, "
                    f"alive {total})")
            if trigger:
                new_cap = max(int(math.ceil(cap * 1.5)),
                              occ + 4 * max(influx, 1))
                self._grow_capacity(ispec, new_cap)
                grew = True
        if grew:
            self._build_stepper(getattr(self, "_active_lasers", None) or [])

    def _grow_capacity(self, ispec: int, new_cap: int):
        """Pad the slot axis with dead slots and update the static config.
        Slot order within a device/cell has no physical meaning, so
        padding preserves the simulation state exactly."""
        import dataclasses
        p = self.state.particles[ispec]
        axis = self._slot_axis(p)
        old = p.alive.shape[axis]
        new_cap = int(new_cap) + (int(new_cap) & 1)   # keep it even
        if new_cap <= old:
            return
        widths = [(0, 0)] * p.alive.ndim
        widths[axis] = (0, new_cap - old)
        psh = pmesh.particle_sharding(self.mesh)
        # release old device buffers array-by-array: holding the full old
        # AND new population doubles peak HBM and OOMs large 3D runs
        fields_keep = self.state.fields
        parts = list(self.state.particles)
        parts[ispec] = None
        self.state = None
        data_old = dict(p.data)
        alive_old, next_id, overflow = p.alive, p.next_id, p.overflow
        del p
        data = {}
        for k in sorted(data_old):
            v = data_old.pop(k)
            fill = 1 if k == "inv_gamma" else 0
            a = np.pad(dist.to_host(v), widths, constant_values=fill)
            del v
            data[k] = dist.put_global(jnp.asarray(a), psh)
        alive = dist.put_global(
            jnp.asarray(np.pad(dist.to_host(alive_old), widths,
                               constant_values=False)), psh)
        del alive_old
        parts[ispec] = ParticlesState(data=data, alive=alive,
                                      next_id=next_id, overflow=overflow)
        self.state = SimulationState(fields=fields_keep,
                                     particles=tuple(parts))
        st = self._species_static[ispec]
        if self.tiling == "cell":
            st = dataclasses.replace(st, cap=new_cap, tile_cap=new_cap)
        elif self.tiling is not None:
            st = dataclasses.replace(st, tile_cap=new_cap)
        else:
            st = dataclasses.replace(
                st, cap=new_cap,
                migration_buf=min(max(st.migration_buf, old), new_cap))
        self._species_static[ispec] = st
        logger.info(f"species {self.species[ispec].name}: capacity grown "
                    f"{old} -> {new_cap} (slot axis {axis})")

    # ------------------------------------------------------------------
    def count_host_loss(self, ispec: int, n: int):
        """Record host-side particle losses (injection-buffer truncation
        etc.) so they surface in the overflow report alongside the
        device-side counters."""
        if n > 0:
            self._host_lost[ispec] = self._host_lost.get(ispec, 0) + int(n)

    def _check_overflow(self):
        # Counters are cumulative across run() segments; warn only when a
        # counter advances past the last-reported watermark so repeated
        # run() calls don't re-announce old losses as new ones.
        for ispec, p in enumerate(self.state.particles):
            host = self._host_lost.get(ispec, 0)
            if host > self._loss_reported.get(("host", ispec), 0):
                self._loss_reported[("host", ispec)] = host
                logger.warning(
                    f"species {self.species[ispec].name}: {host} "
                    "particles dropped host-side so far (cumulative; "
                    "injection-buffer truncation) — raise "
                    "particle_capacity_factor or report if unexpected")
            ov = int(dist.to_host(p.overflow).sum())
            if ov > self._loss_reported.get(("dev", ispec), 0):
                self._loss_reported[("dev", ispec)] = ov
                if self.tiling == "cell":
                    logger.warning(
                        f"species {self.species[ispec].name}: {ov} "
                        "particle merges so far (cumulative) from per-cell "
                        "capacity pressure (charge/momentum conserved; "
                        "raise particle_capacity_factor or keep "
                        "recap_interval on to avoid merging)")
                else:
                    logger.warning(
                        f"species {self.species[ispec].name}: {ov} "
                        "particles lost so far (cumulative) to "
                        "migration-buffer/capacity overflow — increase "
                        "particle_capacity_factor or migration_buffer")

    def _resolve_deposit_rho(self, callbacks) -> bool:
        """Resolve the deposit_rho setting against the registered
        callbacks: "auto" keeps the every-step rho deposit unless every
        callback is provably rho-free (Callback.rho_free; plain user
        functions can read sim.state.fields.rho, so they conservatively
        keep it on)."""
        v = self.deposit_rho
        if v == "auto":
            return not all(getattr(cb, "rho_free", False)
                           for cb in callbacks)
        return bool(v)

    # -- data access for callbacks/diagnostics -------------------------
    def get_field(self, name: str) -> np.ndarray:
        """Assembled global field array on host (reference
        callback/utils.py get_fields). When the hot loop runs with the
        rho deposit off (deposit_rho), rho is recomputed on demand from
        the current particle positions."""
        # drain the dispatch queue through the fast path before the host
        # read (raw reads against a deep queue serialize on the TPU relay)
        jax.block_until_ready(self.state)
        if name == "rho" and not getattr(self, "_with_rho", True):
            if getattr(self, "_total_rho_fn", False) is False:
                if not hasattr(self, "_builder"):
                    self._build_stepper([])
                self._total_rho_fn = self._builder.make_total_rho()
            if self._total_rho_fn is not None:
                return dist.to_host(
                    self._total_rho_fn(self.state.particles))
            # photon-only runs: total charge density is identically 0
        return dist.to_host(getattr(self.state.fields, name))

    def set_field(self, name: str, value: np.ndarray):
        f = self.state.fields
        sh = pmesh.field_sharding(self.mesh)
        arr = dist.put_global(jnp.asarray(value, dtype=self.dtype), sh)
        self.state = self.state.replace(
            fields=f.replace(**{name: arr}))

    def get_particles(self, ispec: int) -> Dict[str, np.ndarray]:
        """Flattened host copies of alive particles of one species."""
        jax.block_until_ready(self.state)
        p = self.state.particles[ispec]
        grid = self.grid
        nd = grid.dimension
        alive = dist.to_host(p.alive).reshape(-1)
        # gathered-field slots are only refreshed by QED/split species
        # blocks; for plain fused species they hold stale, slot-misaligned
        # values and must not be exposed as diagnostics
        transients = {"ex_part", "ey_part", "ez_part",
                      "bx_part", "by_part", "bz_part"}
        builder = getattr(self, "_builder", None)
        transients_ok = (builder is not None
                         and builder.transients_valid.get(ispec, False))
        out = {}
        for k, v in p.data.items():
            if k in transients and not transients_ok:
                continue
            # flatten any sub-device structure (e.g. tiles) into one axis
            a = dist.to_host(v).reshape(v.shape[:nd] + (-1,))
            if k in ("x", "y", "z")[: grid.dimension]:
                # convert local cell units to global SI
                ax = {"x": 0, "y": 1, "z": 2}[k]
                nloc = (grid.nx_loc, grid.ny_loc, grid.nz_loc)[ax]
                d = (grid.dx, grid.dy, grid.dz)[ax]
                idx = np.arange(np.prod(grid.mesh_shape)).reshape(
                    grid.mesh_shape)
                dev_off = np.unravel_index(idx, grid.mesh_shape)[ax]
                a = (a + dev_off[..., None] * nloc) * d
                # cell engine: stored positions can trail the mid-step
                # re-binning by up to CFL/2 cells, so seam particles may
                # sit marginally past a periodic edge until the next
                # re-bin; report them wrapped into the domain (the
                # reference syncs before the end stage, so its dumps are
                # always in-range)
                if self.grid.periodic(("x", "y", "z")[ax]):
                    L = (self.nx, self.ny,
                         getattr(self, "nz", 0))[ax] * d
                    a = (a + 0.5 * d) % L - 0.5 * d
                if k == "x":
                    a = a + self._window_offset * grid.dx
            out[k] = a.reshape(-1)[alive]
        return out

    def set_particles_global(self, ispec: int,
                             coords_si: Dict[str, np.ndarray],
                             attrs: Dict[str, np.ndarray]):
        """Replace one species' population from globally-specified particles
        (SI coordinates). Host-side analog of LoadParticles
        (reference callback/utils.py:1051-1178)."""
        import dataclasses

        from .initfill import distribute_global_particles, pick_capacity
        sp = self.species[ispec]
        st = self._species_static[ispec]
        arrays, counts, cap = distribute_global_particles(
            self.grid, sp, coords_si, attrs, cap=None,
            factor=self._config.particle_capacity_factor)
        cap = max(cap, st.cap)
        arrays, counts, cap = distribute_global_particles(
            self.grid, sp, coords_si, attrs, cap=cap)
        if self.tiling == "cell":
            from .initfill import bin_cells
            arrays, alive_np, cap_c = bin_cells(
                arrays, counts, self.grid,
                factor=self._config.particle_capacity_factor,
                cap_c=None if st.tile_cap == 0 else max(
                    st.tile_cap, 8))
            if cap_c != st.tile_cap:
                self._species_static[ispec] = dataclasses.replace(
                    st, cap=cap_c, tile_cap=cap_c)
            pst = self._tiled_state(sp, arrays, alive_np, self.dtype)
        elif self.tiling is not None:
            from .initfill import bin_tiled
            arrays, alive_np, tile_cap = bin_tiled(
                arrays, counts, self.grid, *self.tiling,
                factor=self._config.particle_capacity_factor)
            tile_cap = max(tile_cap, st.tile_cap)
            if tile_cap != arrays["x"].shape[-1]:
                old = arrays["x"].shape[-1]
                arrays = {k: _grow_minor(v, tile_cap)
                          for k, v in arrays.items()}
                arrays["inv_gamma"][..., old:] = 1.0
                alive_np = _grow_minor(alive_np, tile_cap)
            if tile_cap != st.tile_cap:
                self._species_static[ispec] = dataclasses.replace(
                    st, cap=tile_cap, tile_cap=tile_cap)
            pst = self._tiled_state(sp, arrays, alive_np, self.dtype)
        else:
            if cap != st.cap:
                self._species_static[ispec] = dataclasses.replace(
                    st, cap=cap, migration_buf=min(st.migration_buf, cap))
            pst = particles_from_numpy(self.grid, sp, arrays, counts, cap,
                                       dtype=self.dtype)
        psh = pmesh.particle_sharding(self.mesh)
        ssh = pmesh.scalar_sharding(self.mesh)
        pst = ParticlesState(
            data={k: dist.put_global(v, psh) for k, v in pst.data.items()},
            alive=dist.put_global(pst.alive, psh),
            next_id=dist.put_global(pst.next_id, ssh),
            overflow=dist.put_global(pst.overflow, ssh))
        parts = list(self.state.particles)
        parts[ispec] = pst
        self.state = self.state.replace(particles=tuple(parts))
        # a grown parent population raises its QED children's burst sizes
        self._sync_qed_child_caps()

    @property
    def npart_alive(self) -> List[int]:
        return [int(dist.to_host(p.alive).sum()) for p in self.state.particles]

    def load_imbalance(self) -> float:
        """(max - min) / mean of per-device alive-particle counts — the
        metric the reference's LoadBalancer triggers on (reference
        core/mpi/load_balancer.py:32-52). This framework shards patches
        statically (device = patch), so imbalance is surfaced for the user
        to act on (choose npatch_*, domain split) rather than rebalanced by
        shipping patches between ranks."""
        ndev = len(self.mesh.devices.flat)
        per_dev = np.zeros(ndev)
        for p in self.state.particles:
            a = dist.to_host(p.alive)
            per_dev += a.reshape(ndev, -1).sum(axis=1)
        mean = per_dev.mean()
        if mean == 0:
            return 0.0
        return float((per_dev.max() - per_dev.min()) / mean)

    def _species_deposit(self, ispec: int) -> np.ndarray:
        if not hasattr(self, "_rho_fns"):
            self._rho_fns = {}
        if ispec not in self._rho_fns:
            if not hasattr(self, "_builder"):
                self._build_stepper([])
            self._rho_fns[ispec] = self._builder.make_species_rho(ispec)
        fn, q = self._rho_fns[ispec]
        jax.block_until_ready(self.state)
        return dist.to_host(fn(self.state.particles[ispec])), q

    def species_density(self, ispec: int) -> np.ndarray:
        """Global number-density array of one species (host numpy).
        Reference ExtractSpeciesDensity (callback/utils.py:240-464)."""
        j4, q = self._species_deposit(ispec)
        return j4[3] / q

    def species_current(self, ispec: int):
        """Species-resolved (jx, jy, jz, rho) (reference
        example/species-resolved-ex.py's current_deposition-stage
        extraction)."""
        j4, q = self._species_deposit(ispec)
        return j4[0], j4[1], j4[2], j4[3]


@dataclass
class Simulation3D(Simulation):
    """3D PIC simulation (reference simulation.py:1218+)."""

    nz: int = 0
    dz: float = 0.0
    npatch_z: int = 0

    dimension = 3

    def __post_init__(self):
        if self.nz <= 0 or self.dz <= 0:
            raise ValueError("Simulation3D requires nz and dz")
        if self.boundary_conditions is None:
            self.boundary_conditions = {
                "xmin": "pml", "xmax": "pml", "ymin": "pml", "ymax": "pml",
                "zmin": "pml", "zmax": "pml"}
        super().__post_init__()

    @property
    def Lz(self):
        return self.nz * self.dz

    @property
    def nz_per_patch(self):
        return self.grid.nz_loc


Simulation2D = Simulation
