"""Species declarations.

TPU-native rebuild of the reference species layer (reference:
src/lambdapic/core/species.py:18-245). Differences by design:

- Density / ppc profiles are plain Python callables evaluated **on host with
  numpy** during initialization (and moving-window refill); there is no numba
  JIT. Profiles must be numpy-vectorizable (operate on arrays of coordinates);
  scalar-only profiles are wrapped with ``np.vectorize`` automatically.
- Particle storage is a fixed-capacity SoA pytree (see core/state.py), so
  ``create_particles`` here only decides the *attribute set* of the species.
"""
from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Callable, Literal, Optional, Union

import numpy as np
from pydantic import BaseModel, Field

from ..constants import e, m_e, m_p

Profile = Union[Callable, float, int, None]

# Auto-registry: species created by a user script are picked up by the
# Simulation if none are added explicitly (reference species.py:112,
# simulation.py _add_default_species_if_empty).
_ALL_SPECIES: list["Species"] = []


class SpeciesConfig(BaseModel):
    """Validation model (reference species.py:21-48)."""

    name: str = Field(..., description="Name of the particle species")
    charge: int = Field(..., description="Charge number (e.g. -1 for electron)")
    mass: float = Field(..., description="Mass in units of electron mass")
    density: Optional[Callable] = Field(None)
    density_min: float = Field(0.0)
    ppc: Union[int, Callable] = Field(0)
    momentum: Optional[tuple] = Field((None, None, None))
    polarization: Optional[tuple] = Field(None)
    pusher: Literal["boris", "photon", "boris+tbmt"] = Field("boris")
    capacity: Optional[int] = Field(
        None, description="TPU extra: minimum per-device particle capacity "
        "(for species populated at runtime, e.g. QED photons/pairs)")

    model_config = {"arbitrary_types_allowed": True}


# Base attribute set of every species. Mirrors ParticlesBase.attrs
# (reference particles.py:63-67) minus the float64-packed id (we use two
# uint32 arrays id_lo/id_hi instead, TPU has no native 64-bit ints by default).
BASE_ATTRS = (
    "x", "y", "z", "w", "ux", "uy", "uz", "inv_gamma",
    "ex_part", "ey_part", "ez_part", "bx_part", "by_part", "bz_part",
)
# reference particles.py:219-241; 'event' is a separate bool array there,
# here a float (0/1) attribute so it migrates with the particle
QED_ATTRS = ("chi", "tau", "delta", "event")
SPIN_ATTRS = ("sx", "sy", "sz")              # reference particles.py:273-279


@dataclass(kw_only=True)
class Species:
    """Base species (reference species.py:50-182).

    Parameters:
        name: species name
        charge: charge number (multiples of e)
        mass: mass in units of electron mass
        density: density profile, callable of (x, y[, z]) in SI meters -> m^-3
        density_min: minimum density threshold
        ppc: particles per cell (int or callable of coordinates)
        momentum: tuple of profiles for initial ux, uy, uz
        polarization: spin polarization vector (enables spin attrs)
        pusher: "boris" | "photon" | "boris+tbmt"
    """

    name: str
    charge: int
    mass: float

    density: Optional[Callable] = field(default=None)
    density_min: float = field(default=0.0)
    ppc: Union[int, Callable] = field(default=0)
    momentum: Optional[tuple] = field(default=(None, None, None))
    polarization: Optional[tuple] = field(default=None)
    pusher: Literal["boris", "photon", "boris+tbmt"] = field(default="boris")
    capacity: Optional[int] = field(default=None)

    def __post_init__(self):
        SpeciesConfig(
            name=self.name, charge=self.charge, mass=self.mass,
            density=self.density, density_min=self.density_min, ppc=self.ppc,
            momentum=self.momentum, polarization=self.polarization,
            pusher=self.pusher, capacity=self.capacity,
        )
        # SI units
        self.m = self.mass * m_e
        self.q = self.charge * e

        self._aux_attrs: list[str] = []
        self._ispec: int | None = None
        _ALL_SPECIES.append(self)

    # -- profile helpers -------------------------------------------------
    def is_compatible(self, dimension: int) -> bool:
        """True if density/ppc profile arity fits `dimension` (reference
        species.py:114-127)."""
        for func in (self.density, self.ppc):
            if func is None or not inspect.isfunction(func):
                continue
            if func.__code__.co_argcount != dimension:
                return False
        return True

    @staticmethod
    def vectorized_profile(func_or_val, dimension: int) -> Callable:
        """Return a numpy-vectorized profile of `dimension` coordinate args.

        Host-side analog of the reference's ``compile_jit``
        (species.py:140-169): constants become constant fields; callables are
        probed with array inputs and wrapped in np.vectorize if they are
        scalar-only.
        """
        if isinstance(func_or_val, (int, float)):
            val = float(func_or_val)

            def const(*coords):
                return np.full(np.broadcast(*coords).shape, val)

            return const
        if not callable(func_or_val):
            raise ValueError(f"Invalid profile {func_or_val!r}")
        narg = getattr(func_or_val, "__code__", None)
        if narg is not None and func_or_val.__code__.co_argcount != dimension:
            raise ValueError(
                f"profile {func_or_val} must have {dimension} arguments")

        def wrapped(*coords):
            try:
                out = func_or_val(*coords)
                out = np.asarray(out, dtype=np.float64)
                if out.shape != np.broadcast(*coords).shape:
                    raise ValueError
                return out
            except Exception:
                return np.vectorize(func_or_val, otypes=[np.float64])(*coords)

        return wrapped

    @property
    def ispec(self) -> int:
        if self._ispec is None:
            raise ValueError(
                "Species index is not set. Maybe not added via Simulation")
        return self._ispec

    @ispec.setter
    def ispec(self, value: int):
        self._ispec = value

    # -- attribute set ---------------------------------------------------
    def attrs(self) -> tuple[str, ...]:
        """Per-particle float attributes carried by this species."""
        return BASE_ATTRS + tuple(self._aux_attrs)

    @property
    def has_qed(self) -> bool:
        return False

    @property
    def has_spin(self) -> bool:
        return self.polarization is not None


@dataclass(kw_only=True)
class Electron(Species):
    """Electron (reference species.py:184-208)."""

    name: str = field(default="electron")
    radiation: Optional[Literal["ll", "photons"]] = field(default=None)
    charge: int = field(default=-1, init=False)
    mass: float = field(default=1.0, init=False)

    def __post_init__(self):
        super().__post_init__()
        self.photon: Optional[Species] = None

    def set_photon(self, photon: "Species"):
        if self.radiation != "photons":
            raise ValueError("radiation must be 'photons'")
        assert isinstance(photon, Species)
        self.photon = photon

    @property
    def has_qed(self) -> bool:
        return self.photon is not None

    def attrs(self) -> tuple[str, ...]:
        out = super().attrs()
        if self.has_qed:
            out = out + QED_ATTRS
        if self.has_spin:
            out = out + SPIN_ATTRS
        return out


@dataclass(kw_only=True)
class Positron(Electron):
    name: str = field(default="positron")
    charge: int = field(default=1, init=False)


@dataclass(kw_only=True)
class Proton(Species):
    name: str = field(default="proton")
    charge: int = field(default=1, init=False)
    mass: float = field(default=m_p / m_e, init=False)


@dataclass(kw_only=True)
class Photon(Species):
    """Photon species for QED (reference species.py:222-245)."""

    name: str = field(default="photon")
    charge: int = field(default=0, init=False)
    mass: float = field(default=0.0, init=False)
    pusher: Literal["boris", "photon", "boris+tbmt"] = field(
        default="photon", init=False)

    def __post_init__(self):
        super().__post_init__()
        self.electron: Optional[Species] = None
        self.positron: Optional[Species] = None

    def set_bw_pair(self, *, electron: Species, positron: Species):
        assert isinstance(electron, Species)
        assert isinstance(positron, Species)
        self.electron = electron
        self.positron = positron

    @property
    def has_qed(self) -> bool:
        return self.electron is not None

    def attrs(self) -> tuple[str, ...]:
        out = super().attrs()
        if self.has_qed:
            out = out + QED_ATTRS
        return out
