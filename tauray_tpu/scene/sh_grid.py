"""3D grid of spherical-harmonics light probes (reference: src/sh_grid.hh).

Coefficient layout: order-`o` SH has (o+1)^2 coefficients per probe, stored
as a stacked array (res_z, res_y, res_x, coef, 4) — RGB radiance plus
the probe-visibility distance channel (reference: sh_path_tracer.rgen:88-95
stores vec4 with .w = voxel-unit hit distance) — the analogue of the
reference's coefficient-stacked 3D texture (reference: src/sh_grid.hh:10-56).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


class SHGrid:
    def __init__(self, resolution: Tuple[int, int, int] = (1, 1, 1),
                 order: int = 2):
        self.resolution = tuple(int(r) for r in resolution)
        self.order = order
        self.radius = 0.0
        rx, ry, rz = self.resolution
        self.coefficients = np.zeros(
            (rz, ry, rx, self.coef_count(), 4), dtype=np.float32)

    def coef_count(self) -> int:
        return (self.order + 1) ** 2

    def set_order(self, order: int):
        if order != self.order:
            self.order = order
            rx, ry, rz = self.resolution
            self.coefficients = np.zeros(
                (rz, ry, rx, self.coef_count(), 4), dtype=np.float32)

    def probe_count(self) -> int:
        rx, ry, rz = self.resolution
        return rx * ry * rz

    def probe_positions(self, transform) -> np.ndarray:
        """World-space probe centers; the grid spans [-1,1]^3 in local space."""
        rx, ry, rz = self.resolution
        xs = (np.arange(rx) + 0.5) / rx * 2 - 1
        ys = (np.arange(ry) + 0.5) / ry * 2 - 1
        zs = (np.arange(rz) + 0.5) / rz * 2 - 1
        grid = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), axis=-1)
        local = grid.reshape(-1, 3).astype(np.float32)
        m = transform.get_global_transform()
        return (local @ m[:3, :3].T + m[:3, 3]).astype(np.float32)
