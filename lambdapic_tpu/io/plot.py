"""PlotFields callback (reference callback/plot.py:15-194): overlay
rendering of multiple fields with custom alpha colormaps to PNG files."""
from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, List, Union

import numpy as np

from ..simulation.callbacks import Callback
from ..utils.logger import logger


def _alpha_cmap(name: str):
    """Colormaps like 'bwr_alpha': base cmap with alpha ramping from the
    midpoint (reference plot.py custom alpha colormaps)."""
    import matplotlib.pyplot as plt
    from matplotlib.colors import ListedColormap
    base = name[:-6] if name.endswith("_alpha") else name
    cmap = plt.get_cmap(base)
    colors = cmap(np.linspace(0, 1, 256))
    x = np.linspace(-1, 1, 256)
    colors[:, 3] = np.abs(x)
    return ListedColormap(colors)


class PlotFields(Callback):
    """Render fields to prefix/{itime:06d}.png.

    Each entry of ``fields`` is a dict:
        field: component name (str) or ndarray reference (e.g.
               ExtractSpeciesDensity.density)
        scale: multiplier
        cmap: matplotlib colormap name; '*_alpha' adds an alpha ramp
        vmin/vmax: color limits
    """

    stage = "end"
    rho_free = True      # reads via sim.get_field (on-demand rho safe)

    def __init__(self, fields: List[Dict], prefix: Union[str, Path] = "",
                 interval: Union[int, float, Callable] = 100,
                 dpi: int = 150) -> None:
        super().__init__(interval=interval)
        self.fields = fields
        self.prefix = Path(prefix)
        self.prefix.mkdir(parents=True, exist_ok=True)
        self.dpi = dpi

    def _call(self, sim) -> None:
        from ..parallel import distributed as dist

        # gather on every process (collective), render on main only
        gathered = []
        for spec in self.fields:
            data = spec["field"]
            if isinstance(data, str):
                data = sim.get_field(data)
            gathered.append(np.asarray(data))
        if not dist.is_main_process():
            return
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            logger.warning("matplotlib unavailable; PlotFields skipped")
            return

        fig, ax = plt.subplots(figsize=(8, 6))
        extent = [0, sim.Lx * 1e6, 0, sim.Ly * 1e6]
        for spec, data in zip(self.fields, gathered):
            data = data * spec.get("scale", 1.0)
            if data.ndim == 3:
                data = data[:, :, data.shape[2] // 2]
            cmap_name = spec.get("cmap", "viridis")
            cmap = _alpha_cmap(cmap_name) if cmap_name.endswith("_alpha") \
                else cmap_name
            im = ax.imshow(data.T, origin="lower", extent=extent,
                           cmap=cmap, vmin=spec.get("vmin"),
                           vmax=spec.get("vmax"), aspect="auto")
        ax.set_xlabel("x (um)")
        ax.set_ylabel("y (um)")
        ax.set_title(f"t = {sim.time:.3e} s (step {sim.itime})")
        fig.colorbar(im, ax=ax)
        fig.savefig(self.prefix / f"{sim.itime:06d}.png", dpi=self.dpi)
        plt.close(fig)
