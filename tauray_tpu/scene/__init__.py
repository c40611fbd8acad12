"""Scene layer: ECS-lite entity store, assets, and scene→device flattening.

TPU-native counterpart of the reference's L4 scene layer (monkeroecs +
scene_stage; reference: src/scene.hh, src/scene_stage.hh). Instead of an ECS
with per-frame GPU uploads, the scene graph is plain Python objects that are
flattened once per frame into a pytree of flat jnp arrays
(`tauray_tpu.scene.arrays.SceneArrays`) — the analogue of everything
scene_stage uploads (reference: src/scene_stage.cc:1026-1496).
"""

from .scene import Scene, Entity
from .transformable import Transformable
from .camera import Camera
from .light import AmbientLight, DirectionalLight, PointLight, Spotlight
from .material import Material
from .mesh import Mesh, Model, VertexGroup
