"""glTF metallic-roughness material (reference: src/material.hh,
shader/material.glsl:9-22)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

MATERIAL_FLAG_DOUBLE_SIDED = 1 << 0
MATERIAL_FLAG_TRANSIENT = 1 << 1


@dataclass
class Material:
    name: str = ""
    albedo_factor: np.ndarray = field(
        default_factory=lambda: np.ones(4, dtype=np.float32))
    metallic_factor: float = 1.0
    roughness_factor: float = 1.0
    emission_factor: np.ndarray = field(
        default_factory=lambda: np.zeros(3, dtype=np.float32))
    transmittance: float = 0.0
    ior: float = 1.45  # reference default (reference: src/gltf.cc:220)
    normal_factor: float = 1.0
    double_sided: bool = False
    transient: bool = False
    alpha_cutoff: float = -1.0  # >= 0 enables MASK mode
    blend: bool = False         # glTF alphaMode BLEND
    albedo_tex: int = -1
    metallic_roughness_tex: int = -1
    normal_tex: int = -1
    emission_tex: int = -1

    @property
    def flags(self) -> int:
        f = 0
        if self.double_sided:
            f |= MATERIAL_FLAG_DOUBLE_SIDED
        if self.transient:
            f |= MATERIAL_FLAG_TRANSIENT
        return f

    def is_emissive(self) -> bool:
        return bool(np.any(self.emission_factor != 0))
