"""Device mesh construction for the secondary-analysis pipeline."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def make_mesh(n_devices: Optional[int] = None,
              axes: Tuple[str, str] = ("dp", "gn"),
              gn_size: Optional[int] = None):
    """A 2D mesh: ``dp`` shards reads (contig groups), ``gn`` shards the
    genome. With an odd device count the mesh collapses to 1 on ``gn``."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if len(devs) < n_devices:
        raise RuntimeError(f"need {n_devices} devices, have {len(devs)}")
    if gn_size is None:
        gn_size = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    dp = n_devices // gn_size
    return Mesh(np.array(devs[:n_devices]).reshape(dp, gn_size), axes)
