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

    def device_update_frame(self, bvh, perm):
        """Per-frame scene refresh with skinning/world-transforms on
        DEVICE (reference: scene_stage dispatching skinning.comp +
        pre_transform.comp each frame, src/scene_stage.cc:1543,1685).
        Host work is limited to walking the transform hierarchy and the
        (tiny) light tables. Returns the refit tracer; patches
        self.device_scene in place."""
        import os
        from ..ops.cluster import (InstancedClusterTracer,
                                   refit_instanced_tracer)
        if os.environ.get("TAURAY_HOST_UPDATE") == "1":
            from ..ops.cluster import refit_cluster_tracer
            from ..scene.device import to_device_scene
            self.arrays.update(keep_prev=True)
            self.device_scene = to_device_scene(
                self.arrays, self.opt.transparent_background)
            if isinstance(bvh, InstancedClusterTracer):
                return refit_instanced_tracer(bvh, self.arrays.inst_model)
            return refit_cluster_tracer(bvh, self.arrays.tri_pos, perm)
        import jax.numpy as jnp
        from ..ops.cluster import refit_cluster_tracer
        from ..scene.device_update import (apply_frame_update,
                                           build_geom_static,
                                           host_frame_inputs,
                                           update_geometry)
        if getattr(self, "_geom_static", None) is None:
            self._geom_static, self._has_skin = build_geom_static(
                self.arrays)
            self._prev_geom = None
        self.arrays._update_lights()
        models, normals, joints = host_frame_inputs(self.arrays)
        g = update_geometry(self._geom_static, jnp.asarray(models),
                            jnp.asarray(normals), jnp.asarray(joints),
                            self._has_skin)
        self.device_scene = apply_frame_update(
            self.device_scene, self._geom_static, g, self._prev_geom,
            self.arrays)
        self._prev_geom = g
        if isinstance(bvh, InstancedClusterTracer):
            # TLAS refit: a moving instance re-uploads ONLY its
            # transform; triangle blocks are untouched
            return refit_instanced_tracer(bvh, jnp.asarray(models))
        return refit_cluster_tracer(bvh, g.tri_pos, perm)

    def viewports(self) -> List[Tuple[Camera, Transformable]]:
        cams = [(e.camera, e.transform) for e in self.scene.entities
                if e.camera is not None and e.camera_enabled]
        if not cams:
            raise RuntimeError("No enabled camera in scene")
        return cams

    def render_device(self):
        """Renders the current frame and returns it as a (V, H, W, 4)
        float32 DEVICE array — no host readback. The frame loop keeps
        images on device and only pulls pixels when a file is actually
        written (reference analogue: headless.cc's async readback worker
        threads keep saving off the render path, headless.hh:127-134).
        On the dev tunnel a 1080p pull alone costs ~1.2 s (27 MB/s), so
        readback must never sit inside the render path."""
        raise NotImplementedError

    def render(self) -> np.ndarray:
        """Returns (V, H, W, 4) float32 for the current frame (host)."""
        import jax
        return np.asarray(jax.device_get(self.render_device()))

    def reset_accumulation(self, keep_samples: bool = False):
        pass

    def set_device_workloads(self, ratios):
        pass

    def get_timing(self):
        return {}
