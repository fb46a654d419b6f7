"""Init-state and data-access callbacks.

Ports of the reference callback/utils.py: get_fields (:26-237),
SetMomentum/SetTemperature/SetMomentumAndTemperature (:842-1049, including
the 3-regime Maxwell-Jüttner sampler), LoadParticles (:1051-1178).

These are host callbacks: they pull the (small, init-time) particle arrays
to host, modify them with numpy, and push them back.
"""
from __future__ import annotations

from pathlib import Path
from typing import Callable, List, Optional, Union

import numpy as np

from ..constants import c, e
from ..core.species import Species
from ..simulation.callbacks import Callback


def get_fields(sim, fields: List[str]):
    """Assembled global field arrays (reference callback/utils.py:26-237;
    trivial in the single-controller design)."""
    return [sim.get_field(f) for f in fields]


def _modify_particles(sim, ispec: int, fn):
    """Pull one species to host, apply fn(data_dict, alive_mask) in place,
    push back."""
    import jax

    from ..parallel import distributed as dist
    from ..parallel import mesh as pmesh

    p = sim.state.particles[ispec]
    data = {k: dist.to_host(v).copy() for k, v in p.data.items()}
    alive = dist.to_host(p.alive)
    fn(data, alive)
    psh = pmesh.particle_sharding(sim.mesh)
    import jax.numpy as jnp
    new_data = {}
    for k, v in p.data.items():
        new_data[k] = dist.put_global(
            jnp.asarray(data[k], dtype=v.dtype), psh)
    parts = list(sim.state.particles)
    parts[ispec] = p.replace(data=new_data)
    sim.state = sim.state.replace(particles=tuple(parts))


class SetMomentum(Callback):
    """Set/add bulk momentum (reference callback/utils.py:842-891)."""

    stage = "init"
    rho_free = True

    def __init__(self, species: Species, momentum: List[float],
                 interval=None, add: bool = False) -> None:
        super().__init__(
            interval=(lambda sim: sim.itime == 0) if interval is None
            else interval, stage="init")
        self.species = species
        self.momentum = momentum
        self.add = add

    def _call(self, sim) -> None:
        ux_t, uy_t, uz_t = self.momentum

        def fn(data, alive):
            if self.add:
                data["ux"][alive] += ux_t
                data["uy"][alive] += uy_t
                data["uz"][alive] += uz_t
            else:
                data["ux"][alive] = ux_t
                data["uy"][alive] = uy_t
                data["uz"][alive] = uz_t
            data["inv_gamma"][alive] = 1.0 / np.sqrt(
                1 + data["ux"][alive]**2 + data["uy"][alive]**2
                + data["uz"][alive]**2)

        _modify_particles(sim, self.species.ispec, fn)


class SetTemperature(Callback):
    """Maxwell-Jüttner thermal momenta (reference callback/utils.py:931-1049).

    Temperature in eV; anisotropy via per-axis stretching of an isotropic
    sample drawn at T_x.
    """

    stage = "init"
    rho_free = True

    def __init__(self, species: Species,
                 temperature: Union[float, List[float]],
                 interval=None, add: bool = False) -> None:
        super().__init__(
            interval=(lambda sim: sim.itime == 0) if interval is None
            else interval, stage="init")
        self.species = species
        if isinstance(temperature, (int, float)):
            temperature = [float(temperature)] * 3
        self.temperature = temperature
        self.add = add

    @staticmethod
    def maxwell_juttner_pdf(gamma: np.ndarray, theta: float) -> np.ndarray:
        from scipy.special import kn
        beta = np.sqrt(1 - 1 / gamma**2)
        return (gamma**2 * beta) / (theta * kn(2, 1 / theta)) * np.exp(
            -gamma / theta)

    @staticmethod
    def sample_maxwell_juttner(size: int, theta: float,
                               rand_gen: Optional[np.random.Generator] = None):
        """3-regime sampler (reference utils.py:973-1049):
        theta<=0.01 Gamma approx; <=0.5 bounded rejection; else Gamma
        proposal with beta acceptance."""
        import scipy.optimize
        import scipy.stats
        rand_gen = rand_gen or np.random.default_rng()
        gamma = np.zeros(size)
        if theta <= 0.01:
            gamma[:] = scipy.stats.gamma(a=1.5, scale=theta).rvs(
                size=size, random_state=rand_gen) + 1
        elif theta <= 0.5:
            gamma_max = 1 + 10 * theta
            res = scipy.optimize.minimize_scalar(
                lambda g: -SetTemperature.maxwell_juttner_pdf(g, theta),
                bounds=(1, gamma_max), method="bounded")
            M = -res.fun * 1.1 + 1e-10
            count = 0
            while count < size:
                prop = rand_gen.uniform(1, gamma_max, size - count)
                fv = SetTemperature.maxwell_juttner_pdf(prop, theta)
                acc = prop[rand_gen.uniform(0, M, size - count) < fv]
                gamma[count:count + len(acc)] = acc
                count += len(acc)
        else:
            gdist = scipy.stats.gamma(a=3, scale=theta)
            count = 0
            while count < size:
                prop = gdist.rvs(size - count, random_state=rand_gen)
                with np.errstate(invalid="ignore", divide="ignore"):
                    beta_val = np.sqrt(1 - 1 / np.maximum(prop, 1.0)**2)
                acc_mask = (rand_gen.uniform(size=size - count) < beta_val) \
                    & (prop >= 1)
                acc = prop[acc_mask]
                gamma[count:count + len(acc)] = acc
                count += len(acc)
        u = np.sqrt(gamma**2 - 1)
        phi = rand_gen.uniform(0, 2 * np.pi, size)
        costh = rand_gen.uniform(-1, 1, size)
        sinth = np.sqrt(1 - costh**2)
        return u * sinth * np.cos(phi), u * sinth * np.sin(phi), u * costh

    def _call(self, sim) -> None:
        seed = sim._seed_effective
        rand_gen = np.random.default_rng([seed, 17, self.species.ispec,
                                          sim.itime])
        Tx, Ty, Tz = self.temperature
        theta = Tx * e / (self.species.m * c**2)

        def fn(data, alive):
            n = int(alive.sum())
            if n == 0:
                return
            ux, uy, uz = self.sample_maxwell_juttner(n, theta, rand_gen)
            uy = uy * Ty / Tx
            uz = uz * Tz / Tx
            if self.add:
                data["ux"][alive] += ux
                data["uy"][alive] += uy
                data["uz"][alive] += uz
            else:
                data["ux"][alive] = ux
                data["uy"][alive] = uy
                data["uz"][alive] = uz
            data["inv_gamma"][alive] = 1.0 / np.sqrt(
                1 + data["ux"][alive]**2 + data["uy"][alive]**2
                + data["uz"][alive]**2)

        _modify_particles(sim, self.species.ispec, fn)


class SetMomentumAndTemperature(Callback):
    """Bulk momentum + thermal spread (reference utils.py:893-929)."""

    stage = "init"
    rho_free = True

    def __init__(self, species: Species, momentum: List[float],
                 temperature: Union[float, List[float]],
                 interval=None, add: bool = False) -> None:
        super().__init__(
            interval=(lambda sim: sim.itime == 0) if interval is None
            else interval, stage="init")
        self._set_momentum = SetMomentum(species, momentum, interval, add=add)
        self._set_temperature = SetTemperature(species, temperature, interval,
                                               add=True)

    def _call(self, sim) -> None:
        self._set_momentum._call(sim)
        self._set_temperature._call(sim)


class LoadParticles(Callback):
    """Load particles from arrays or an HDF5 file into a species
    (reference callback/utils.py:1051-1178)."""

    stage = "init"
    rho_free = True

    def __init__(self, species: Species,
                 file: Optional[Union[str, Path]] = None,
                 coords: Optional[dict] = None,
                 attrs: Optional[dict] = None,
                 interval=None) -> None:
        super().__init__(
            interval=(lambda sim: sim.itime == 0) if interval is None
            else interval, stage="init")
        self.species = species
        self.file = file
        self.coords = coords
        self.attrs = attrs or {}

    def _call(self, sim) -> None:
        coords, attrs = self.coords, dict(self.attrs)
        if self.file is not None:
            import h5py
            with h5py.File(self.file, "r") as f:
                coords = {k: f[k][...] for k in ("x", "y", "z") if k in f}
                attrs = {k: f[k][...] for k in f.keys()
                         if k not in ("x", "y", "z", "id")}
        if "inv_gamma" not in attrs:
            ux = attrs.get("ux", 0.0)
            uy = attrs.get("uy", 0.0)
            uz = attrs.get("uz", 0.0)
            attrs["inv_gamma"] = 1.0 / np.sqrt(
                1 + np.asarray(ux)**2 + np.asarray(uy)**2
                + np.asarray(uz)**2) * np.ones_like(coords["x"])
        sim.set_particles_global(self.species.ispec, coords, attrs)
