"""ECS-lite entity store (reference: external/monkeroecs.hh + src/scene.hh).

The reference uses a full ECS; here entities are lightweight component bags
iterated by type. The per-frame device representation is built separately
(scene/arrays.py), so this store only needs to be convenient, not fast.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional, Tuple, Type

import numpy as np

from .camera import Camera
from .light import AmbientLight, DirectionalLight, PointLight, Spotlight
from .mesh import Model
from .transformable import Transformable


class Entity:
    def __init__(self, name: str = ""):
        self.name = name
        self.transform: Optional[Transformable] = None
        self.model: Optional[Model] = None
        self.camera: Optional[Camera] = None
        self.camera_enabled = False
        self.camera_index = -1
        self.camera_actively_rendered = True
        self.light: Optional[Any] = None  # Directional/Point/Spotlight
        self.environment_map: Optional[Any] = None
        self.sh_grid: Optional[Any] = None
        self.animations: Dict[str, Any] = {}  # name -> AnimationPool entry
        self.static = False


class Scene:
    def __init__(self):
        self.entities: List[Entity] = []
        self.ambient = np.zeros(3, dtype=np.float32)
        self.total_ticks = 0  # animation time, microseconds

    def add(self, name: str = "") -> Entity:
        e = Entity(name)
        self.entities.append(e)
        return e

    # -- component iteration --------------------------------------------
    def models(self) -> Iterator[Entity]:
        return (e for e in self.entities if e.model is not None)

    def cameras(self) -> Iterator[Entity]:
        return (e for e in self.entities if e.camera is not None)

    def enabled_cameras(self) -> List[Entity]:
        return [e for e in self.entities
                if e.camera is not None and e.camera_enabled]

    def lights(self, cls=None) -> Iterator[Entity]:
        for e in self.entities:
            if e.light is not None and (cls is None or isinstance(e.light, cls)):
                yield e

    def point_lights(self) -> List[Entity]:
        return [e for e in self.lights(PointLight)]

    def directional_lights(self) -> List[Entity]:
        return [e for e in self.lights(DirectionalLight)]

    def environment_maps(self) -> List[Entity]:
        return [e for e in self.entities if e.environment_map is not None]

    def sh_grids(self) -> List[Entity]:
        return [e for e in self.entities if e.sh_grid is not None]

    def find(self, name: str) -> Optional[Entity]:
        for e in self.entities:
            if e.name == name:
                return e
        return None

    # -- stats (reference: src/tauray.cc:729-765 --scene-stats) ---------
    def stats(self) -> Dict[str, int]:
        tris = sum(e.model.num_triangles() for e in self.models())
        instances = sum(len(e.model.groups) for e in self.models())
        return dict(
            triangles=tris,
            instances=instances,
            models=sum(1 for _ in self.models()),
            point_lights=len(self.point_lights()),
            directional_lights=len(self.directional_lights()),
            cameras=sum(1 for _ in self.cameras()),
            sh_grids=len(self.sh_grids()),
        )

    def apply_transform(self, m: np.ndarray):
        """Re-root the scene under a global transform (up-axis rotation,
        reference: src/tauray.cc:179-196)."""
        root = Transformable()
        root.set_transform(m)
        for e in self.entities:
            if e.transform is not None and e.transform.parent is None:
                e.transform.set_parent(root)
