"""lambdapic_tpu — a TPU-native particle-in-cell framework.

Ground-up rebuild of the capabilities of xsgeng/lambdapic (callback-centric
laser-plasma PIC: Yee FDTD + CPML, quadratic gather, Boris push, Esirkepov
deposition, QED, collisions, moving window, HDF5 diagnostics) designed for
JAX/XLA on TPU: one jitted step over a globally sharded SimulationState,
shard_map + ppermute halo exchange instead of MPI, fixed-capacity SoA
particles, counter-based RNG.

Public API mirrors the reference (src/lambdapic/__init__.py:1-25) so user
scripts port with the same species/laser/grid setup.
"""
import os as _os

import jax as _jax

# Persistent compilation cache: PIC steps are large XLA programs and every
# process would otherwise pay the full compile. Opt IN with
# LAMBDAPIC_COMPILE_CACHE=1 (bench.py does); kept off by default because
# XLA:CPU AOT cache entries can be rejected/crash on machine-feature
# mismatches.
if _os.environ.get("LAMBDAPIC_COMPILE_CACHE") \
        and _jax.config.jax_compilation_cache_dir is None:
    # an already-configured cache (bench.py points it at the repo-local
    # .jax_cache, whose entries ship with the repo so a fresh clone
    # skips the 5-20 min kernel compiles) is left untouched — including
    # its min-compile-time threshold: the axon relay compiles
    # asynchronously server-side, so the CLIENT-measured compile time
    # of even 20-minute kernels is under a second and any nonzero
    # threshold filters everything out.
    try:
        _cache_dir = _os.environ.get(
            "LAMBDAPIC_CACHE_DIR",
            _os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                _os.path.join(_os.path.expanduser("~"), ".cache",
                              "lambdapic_tpu_jax")))
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           0.0)
    except Exception:
        pass

from .constants import c, e, epsilon_0, h, hbar, k_B, m_e, m_p, mu_0, pi
from .core.species import Electron, Photon, Positron, Proton, Species
from .io.hdf5 import (ExtractSpeciesDensity, SaveFieldsToHDF5,
                      SaveParticlesToHDF5, SaveSpeciesDensityToHDF5)
from .io.plot import PlotFields
from .io.restart import RestartDump
from .io.utils import (LoadParticles, SetMomentum, SetMomentumAndTemperature,
                       SetTemperature, get_fields)
from .models.laser import (GaussianLaser, GaussianLaser2D, GaussianLaser3D,
                           Laser, SimpleLaser, SimpleLaser2D, SimpleLaser3D)
from .models.moving_window import MovingWindow
from .simulation.callbacks import Callback, JaxCallback, callback
from .simulation.mask_simulation import MaskSimulation2D
from .simulation.simulation import (Simulation, Simulation2D, Simulation3D,
                                    SimulationConfig)

__version__ = "0.1.0"

__all__ = [
    "Simulation", "Simulation2D", "Simulation3D", "SimulationConfig",
    "Species", "Electron", "Positron", "Proton", "Photon",
    "Laser", "SimpleLaser", "SimpleLaser2D", "SimpleLaser3D",
    "GaussianLaser", "GaussianLaser2D", "GaussianLaser3D",
    "MovingWindow", "MaskSimulation2D",
    "SaveFieldsToHDF5", "SaveSpeciesDensityToHDF5", "SaveParticlesToHDF5",
    "ExtractSpeciesDensity", "PlotFields", "RestartDump",
    "SetMomentum", "SetTemperature", "SetMomentumAndTemperature",
    "LoadParticles", "get_fields",
    "callback", "Callback", "JaxCallback",
    "c", "e", "m_e", "m_p", "epsilon_0", "mu_0", "pi", "h", "hbar", "k_B",
]
