"""Device mesh construction (the TPU analogue of the reference's
`--devices` / `--fake-devices` device selection, reference:
src/context.cc device filtering)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(shape: str = "", devices: Optional[Sequence] = None,
              axis_name: str = "dev") -> Mesh:
    """Build a 1-D render mesh. `shape` is the --mesh-shape option: '' uses
    all devices; 'N' uses the first N."""
    devs = list(devices if devices is not None else jax.devices())
    if shape:
        dims = [int(x) for x in shape.split(",") if x]
        n = int(np.prod(dims))
        devs = devs[:n]
    return Mesh(np.array(devs), (axis_name,))
