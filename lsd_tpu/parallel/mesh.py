"""Device mesh helpers.

The reference is single-node with host-thread parallelism only (SURVEY.md
§2.5); here scale-out is first-class: residual/voxel work is sharded over a
1-D "dp" axis (scan points, keyframes, Hessian blocks), with XLA collectives
over ICI/DCN.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp",
              devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))
