"""Mask-driven irregular domains.

Port of the reference _MaskSimulation (simulation/_mask_simulation.py:14-102):
only the region where ``mask(x, y)`` is True is simulated; open faces absorb.

TPU-native divergence (documented): the reference *excludes* patches outside
the mask and attaches per-face CPML at patch granularity — irregular patch
ownership is a poor fit for SPMD sharding, so here the full rectangle is
computed and the masked-out region becomes an absorbing *sponge*:

- fields are multiplicatively damped outside the mask with a cubic-graded
  profile over ``cpml_thickness`` cells (a standard masked sponge layer);
- particles are killed when they enter the masked region (the reference
  never creates patches there);
- species density profiles are zeroed outside the mask at init;
- ``domain_mask`` is exposed and ``get_field`` NaN-masks outputs like the
  reference's diagnostics.

The ``mask`` is evaluated at virtual patch centers on the
(npatch_x x npatch_y) grid like the reference, so scripts port unchanged;
npatch_* here names the *mask tiling*, while the device mesh is chosen
automatically (mask_device_mesh parameter).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

from ..utils.logger import logger
from .simulation import Simulation


@dataclass
class MaskSimulation2D(Simulation):
    """2D simulation on an irregular masked domain."""

    mask: Optional[Callable[[float, float], bool]] = field(default=None)
    mask_device_mesh: tuple = field(default=(1, 1))

    def __post_init__(self):
        super().__post_init__()
        if self.mask is None:
            raise ValueError("mask must be provided")
        # the reference ignores boundary_conditions: all open faces absorb
        self.boundary_conditions = {"xmin": "pml", "xmax": "pml",
                                    "ymin": "pml", "ymax": "pml"}
        # npatch_* define the mask tiling (reference patch grid); the device
        # mesh is separate
        self._mask_tiles = (max(self.npatch_x, 1), max(self.npatch_y, 1))
        self.npatch_x, self.npatch_y = self.mask_device_mesh

    def _build_domain_mask(self) -> np.ndarray:
        tx, ty = self._mask_tiles
        nx_t = self.nx // tx
        ny_t = self.ny // ty
        domain = np.zeros((self.nx, self.ny), dtype=bool)
        kept = 0
        for i in range(tx):
            for j in range(ty):
                xc = (i + 0.5) * self.Lx / tx
                yc = (j + 0.5) * self.Ly / ty
                if self.mask(xc, yc):
                    domain[i * nx_t:(i + 1) * nx_t,
                           j * ny_t:(j + 1) * ny_t] = True
                    kept += 1
        if kept == 0:
            raise ValueError("mask produced no patches")
        logger.info(f"mask keeps {kept}/{tx * ty} tiles")
        return domain

    def _damping_profile(self, domain: np.ndarray) -> np.ndarray:
        """Per-step multiplicative sponge outside the mask, cubic-graded
        over cpml_thickness cells (analog of the reference per-face CPML
        grading m=3, cpml.py:119-125)."""
        from scipy.ndimage import distance_transform_edt
        dist = distance_transform_edt(~domain)
        th = float(self.cpml_thickness)
        depth = np.clip(dist / th, 0.0, 1.0)
        # amplitude damping per step; ~60% per cpml_thickness crossing
        return np.where(domain, 1.0, 1.0 - 0.3 * depth**3)

    def initialize(self, devices=None):
        self.domain_mask = self._build_domain_mask()

        # zero density profiles outside the mask
        domain = self.domain_mask
        dx, dy = self.dx, self.dy
        nx, ny = self.nx, self.ny

        def masked_profile(fn):
            def wrapped(x, y):
                vals = np.asarray(fn(x, y), dtype=np.float64)
                ix = np.clip((np.asarray(x) / dx + 0.5).astype(int), 0,
                             nx - 1)
                iy = np.clip((np.asarray(y) / dy + 0.5).astype(int), 0,
                             ny - 1)
                return np.where(domain[ix, iy], vals, 0.0)
            return wrapped

        from ..core.species import Species
        for sp in self.species:
            if sp.density is not None:
                sp.density = masked_profile(
                    Species.vectorized_profile(sp.density, 2))

        super().initialize(devices)

    def _build_stepper(self, lasers):
        super()._build_stepper(lasers)
        # inject sponge damping + particle mask into the builder
        self._builder.set_domain_mask(self.domain_mask,
                                      self._damping_profile(self.domain_mask))
        (self._full_step, self._seg1, self._seg2, self._seg3) = \
            self._builder.compile()

    def get_field(self, name: str) -> np.ndarray:
        out = super().get_field(name).copy()
        out[~self.domain_mask] = np.nan
        return out
