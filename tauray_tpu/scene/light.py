"""Light components (reference: src/light.hh:9-85).

Packed GPU parameters (dir_cutoff etc.) are computed at flatten time in
scene/arrays.py, mirroring scene_stage's light upload
(reference: src/scene_stage.cc:54-95).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np


@dataclass
class AmbientLight:
    color: np.ndarray = field(default_factory=lambda: np.zeros(3, dtype=np.float32))


class Light:
    def __init__(self, color=(1, 1, 1)):
        self.color = np.asarray(color, dtype=np.float32)

    def set_color(self, c):
        self.color = np.asarray(c, dtype=np.float32)


class DirectionalLight(Light):
    def __init__(self, color=(1, 1, 1), angle=0.0):
        super().__init__(color)
        self.angle = angle  # angular radius, degrees

    @property
    def dir_cutoff(self):
        return math.cos(math.radians(self.angle))


class PointLight(Light):
    def __init__(self, color=(1, 1, 1), radius=0.0,
                 cutoff_brightness=5.0 / 256.0):
        super().__init__(color)
        self.radius = radius
        self.cutoff_brightness = cutoff_brightness

    def get_cutoff_radius(self) -> float:
        radius2 = self.color / self.cutoff_brightness
        return float(np.sqrt(max(radius2.max(), 0.0)))


class Spotlight(PointLight):
    def __init__(self, color=(1, 1, 1), cutoff_angle=30.0,
                 falloff_exponent=1.0, radius=0.0):
        super().__init__(color, radius)
        self.cutoff_angle = cutoff_angle
        self.falloff_exponent = falloff_exponent

    def set_inner_angle(self, inner_angle: float, ratio: float = 4 / 255.0):
        if inner_angle <= 0:
            self.falloff_exponent = 1.0
        else:
            inner = math.cos(math.radians(inner_angle))
            outer = math.cos(math.radians(self.cutoff_angle))
            self.falloff_exponent = math.log(ratio) / math.log(
                max(1.0 - inner, 0.0) / (1.0 - outer))
