"""Feature/AOV renderer stage (reference: src/feature_stage.cc,
shader/rt_feature.rgen/.rchit/.rmiss).

Renders albedo / normals / positions / distance / motion / instance-id
buffers with one primary ray per pixel (no AA offset, pixel centers)."""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.bvh import DeviceBVH
from ..ops.shading import (VertexData, get_camera_projection,
                           get_screen_camera_ray, interpolate_vertex,
                           normalize, sample_material)
from ..scene.device import CameraUniforms, DeviceScene

FEATURES = ("albedo", "world-normal", "view-normal", "world-pos", "view-pos",
            "distance", "world-motion", "view-motion", "screen-motion",
            "instance-id")


@partial(jax.jit, static_argnames=("feature", "width", "height", "n_views",
                                   "has_alpha"))
def render_feature(scene: DeviceScene, bvh: DeviceBVH, cam: CameraUniforms,
                   prev_cam: CameraUniforms, feature: str, width: int,
                   height: int, n_views: int, default_value: float,
                   min_ray_dist: float, has_alpha: bool = False
                   ) -> jnp.ndarray:
    """Returns (V, H, W, 4) AOV image."""
    from ..ops.trace_utils import trace_alpha
    V, H, W = n_views, height, width
    R = V * H * W
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    pix = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
    pix = jnp.tile(pix, (V, 1))
    vp = jnp.repeat(jnp.arange(V), H * W)
    size = jnp.array([W, H], jnp.float32)

    origin, d = get_screen_camera_ray(cam, vp, pix, size)
    # alpha cutoff 1e-4 matches the feature any-hit shader (reference:
    # shader/rt_feature.rahit is_material_skippable(.., 0.0001))
    hit = trace_alpha(scene, bvh, origin, d,
                      jnp.full(R, min_ray_dist, jnp.float32),
                      jnp.full(R, jnp.inf, jnp.float32),
                      1e-4, has_alpha)
    miss = hit.tri_id < 0

    v = interpolate_vertex(scene, hit.tri_id, hit.u, hit.v, d)
    mat, v = sample_material(scene, v)

    view = cam.view[vp]
    prev_view = prev_cam.view[vp]

    def viewt(m, p):
        return jnp.einsum("rij,rj->ri", m[:, :3, :3], p) + m[:, :3, 3]

    def viewd(m, p):
        return jnp.einsum("rij,rj->ri", m[:, :3, :3], p)

    one = jnp.ones((R, 1), jnp.float32)
    if feature == "albedo":
        out = mat.albedo
    elif feature == "world-normal":
        out = jnp.concatenate([v.mapped_normal, one], axis=-1)
    elif feature == "view-normal":
        out = jnp.concatenate([viewd(view, v.mapped_normal), one], axis=-1)
    elif feature == "world-pos":
        out = jnp.concatenate([v.pos, one], axis=-1)
    elif feature == "view-pos":
        out = jnp.concatenate([viewt(view, v.pos), one], axis=-1)
    elif feature == "distance":
        out = jnp.concatenate(
            [jnp.repeat(hit.t[:, None], 3, axis=-1), one], axis=-1)
    elif feature == "world-motion":
        out = jnp.concatenate([v.pos - v.prev_pos, one], axis=-1)
    elif feature == "view-motion":
        out = jnp.concatenate(
            [viewt(view, v.pos) - viewt(prev_view, v.prev_pos), one], axis=-1)
    elif feature == "screen-motion":
        out = jnp.concatenate(
            [get_camera_projection(prev_cam, vp, v.prev_pos), one], axis=-1)
    elif feature == "instance-id":
        out = jnp.concatenate(
            [v.instance_id[:, None].astype(jnp.float32),
             v.primitive_id[:, None].astype(jnp.float32),
             jnp.zeros((R, 1), jnp.float32), one], axis=-1)
    else:
        raise ValueError(f"unknown feature {feature}")

    default = jnp.full((R, 4), jnp.float32(default_value))
    out = jnp.where(miss[:, None], default, out)
    return out.reshape(V, H, W, 4)
