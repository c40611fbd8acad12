"""Renderer interface (reference: src/renderer.hh:9-20)."""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..scene.arrays import SceneArrays
from ..scene.camera import Camera
from ..scene.scene import Scene
from ..scene.transformable import Transformable


class Renderer:
    def __init__(self, opt):
        self.opt = opt
        self.scene: Optional[Scene] = None
        self.arrays: Optional[SceneArrays] = None

    def set_scene(self, scene: Scene):
        self.scene = scene
        self.arrays = SceneArrays(scene, self.opt)
        self._scene_changed()

    def _scene_changed(self):
        pass

    def viewports(self) -> List[Tuple[Camera, Transformable]]:
        cams = [(e.camera, e.transform) for e in self.scene.entities
                if e.camera is not None and e.camera_enabled]
        if not cams:
            raise RuntimeError("No enabled camera in scene")
        return cams

    def render(self) -> np.ndarray:
        """Returns (V, H, W, 4) float32 for the current frame."""
        raise NotImplementedError

    def reset_accumulation(self, keep_samples: bool = False):
        pass

    def set_device_workloads(self, ratios):
        pass

    def get_timing(self):
        return {}
