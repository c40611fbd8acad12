"""Shadow map generation + PCF filtering
(reference: src/shadow_map_stage.cc, src/shadow_map.cc,
shader/shadow_mapping.glsl, src/atlas.cc).

TPU-native: the depth maps are produced by the same cluster tracer used
for everything else (one ray wave per map), stored as a stacked array (the
analogue of the reference's shadow-map atlas). Directional lights get an
ortho map sized by --shadow-map-radius/depth; spotlights a perspective
map with fov = 2x cutoff angle; point lights 6 cube faces. PCF uses a
fixed Poisson-ish disk of --pcf taps."""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sampling import normalize


class ShadowMaps(NamedTuple):
    depth: jnp.ndarray       # (L, Res, Res) linear depth along light ray
    view: jnp.ndarray        # (L, 4, 4)
    proj_kind: jnp.ndarray   # (L,) 0=ortho, 1=perspective
    params: jnp.ndarray      # (L, 4): ortho (rx, ry, near, far) /
    #                                  persp (tan_half_fov, _, near, far)
    light_index: jnp.ndarray  # (L,) index into point-light array; -1 = dir
    bias: jnp.ndarray        # (L,)
    resolution: int


def _look_at(origin, direction):
    """Light view matrix (world -> light space, -z forward)."""
    f = -np.asarray(direction, np.float32)
    f = f / np.linalg.norm(f)
    up = np.array([0, 1, 0], np.float32)
    if abs(np.dot(up, f)) > 0.99:
        up = np.array([1, 0, 0], np.float32)
    s = np.cross(up, f)
    s /= np.linalg.norm(s)
    u = np.cross(f, s)
    m = np.eye(4, dtype=np.float32)
    m[0, :3] = s
    m[1, :3] = u
    m[2, :3] = f
    m[:3, 3] = -m[:3, :3] @ np.asarray(origin, np.float32)
    return m


def build_shadow_maps(arrays, tracer, opt, scene_center=None) -> Optional[ShadowMaps]:
    """Ray-cast depth maps for all shadow-casting lights."""
    res = min(opt.shadow_map_resolution, 1024)
    views, kinds, params, lidx, biases = [], [], [], [], []
    center = (np.zeros(3, np.float32) if scene_center is None
              else np.asarray(scene_center, np.float32))

    for i in range(arrays.dir_count):
        d = arrays.dl_dir[i]
        origin = center - d * opt.shadow_map_depth * 0.5
        views.append(_look_at(origin, d))
        kinds.append(0)
        params.append([opt.shadow_map_radius, opt.shadow_map_radius,
                       0.0, opt.shadow_map_depth])
        lidx.append(-1 - i)  # encode directional as -(i+1)
        biases.append(opt.shadow_map_bias)

    for i in range(arrays.point_count):
        if arrays.pl_spot_radius[i] >= 0:  # spotlight
            cutoff = float(arrays.pl_dir_cutoff[i])
            half = math.acos(min(max(cutoff, -1), 1))
            views.append(_look_at(arrays.pl_pos[i], arrays.pl_dir[i]))
            kinds.append(1)
            far = max(float(arrays.pl_cutoff_radius[i]), 1e-2)
            params.append([math.tan(max(half, 1e-3)), 0.0, 0.01, far])
            lidx.append(i)
            biases.append(opt.shadow_map_bias)
        else:  # omni point light: 6 cube faces
            dirs = [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                    (0, 0, 1), (0, 0, -1)]
            far = max(float(arrays.pl_cutoff_radius[i]), 1e-2)
            for d in dirs:
                views.append(_look_at(arrays.pl_pos[i], np.array(d, np.float32)))
                kinds.append(1)
                params.append([1.0, 0.0, 0.01, far])  # 90 deg faces
                lidx.append(i)
                biases.append(opt.shadow_map_bias)

    if not views:
        return None
    L = len(views)
    views = np.stack(views)
    params = np.array(params, np.float32)
    kinds = np.array(kinds, np.int32)

    # generate rays per map and trace depth
    js, is_ = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    u = (is_.reshape(-1) + 0.5) / res * 2 - 1
    v = (js.reshape(-1) + 0.5) / res * 2 - 1
    depths = []
    for li in range(L):
        inv_view = np.linalg.inv(views[li])
        if kinds[li] == 0:
            ox = u * params[li, 0]
            oy = -v * params[li, 1]
            o_local = np.stack([ox, oy, np.zeros_like(ox)], axis=-1)
            d_local = np.tile(np.array([0, 0, -1.0], np.float32),
                              (len(u), 1))
        else:
            t = params[li, 0]
            d_local = np.stack([u * t, -v * t, -np.ones_like(u)], axis=-1)
            d_local /= np.linalg.norm(d_local, axis=-1, keepdims=True)
            o_local = np.zeros_like(d_local)
        o = o_local @ inv_view[:3, :3].T + inv_view[:3, 3]
        d = d_local @ inv_view[:3, :3].T
        hit = tracer.trace(jnp.asarray(o, jnp.float32),
                           jnp.asarray(d, jnp.float32),
                           jnp.zeros(len(u), jnp.float32),
                           jnp.full(len(u), params[li, 3], jnp.float32))
        depth = jnp.where(hit.tri_id >= 0, hit.t, params[li, 3])
        depths.append(depth.reshape(res, res))

    return ShadowMaps(
        depth=jnp.stack(depths), view=jnp.asarray(views),
        proj_kind=jnp.asarray(kinds), params=jnp.asarray(params),
        light_index=jnp.asarray(np.array(lidx, np.int32)),
        bias=jnp.asarray(np.array(biases, np.float32)),
        resolution=res)


_PCF_DISK = np.array([
    [0.0, 0.0], [0.527, 0.085], [-0.040, 0.537], [-0.420, -0.277],
    [0.306, -0.577], [0.824, -0.335], [-0.696, 0.457], [-0.251, -0.954],
    [0.399, 0.687], [-0.857, -0.168], [0.951, 0.301], [-0.352, 0.929],
    [0.672, -0.852], [-0.964, 0.573], [0.124, -0.415], [-0.612, 0.062],
], dtype=np.float32)


def pcf_visibility(maps: ShadowMaps, map_id, world_pos, pcf_samples: int = 16,
                   pcf_radius: float = 1.5, ndotl=None):
    """Percentage-closer filtering (reference:
    shader/shadow_mapping.glsl PCF loop). map_id: (R,), world_pos: (R, 3).
    """
    res = maps.resolution
    mi = jnp.maximum(map_id, 0)
    view = maps.view[mi]                        # (R, 4, 4)
    p_light = jnp.einsum("rij,rj->ri", view[:, :3, :3], world_pos) + \
        view[:, :3, 3]
    z = -p_light[:, 2]                          # depth along light dir
    kind = maps.proj_kind[mi]
    pr = maps.params[mi]
    # ortho uv
    uo = p_light[:, 0] / pr[:, 0]
    vo = -p_light[:, 1] / pr[:, 1]
    # perspective uv
    safe_z = jnp.maximum(z, 1e-6)
    up = p_light[:, 0] / (safe_z * pr[:, 0])
    vp = -p_light[:, 1] / (safe_z * pr[:, 0])
    u = jnp.where(kind == 0, uo, up)
    v = jnp.where(kind == 0, vo, vp)
    x = (u * 0.5 + 0.5) * res - 0.5
    y = (v * 0.5 + 0.5) * res - 0.5
    in_bounds = (jnp.abs(u) < 1) & (jnp.abs(v) < 1) & (z > 0) & \
        (z < pr[:, 3])
    bias = maps.bias[mi]
    if ndotl is not None:
        # slope-scaled bias (reference: shader/shadow_mapping.glsl:120
        # max(max_bias * (1 - ndotl), min_bias))
        bias = jnp.maximum(bias * (1.0 - ndotl), 0.25 * bias)

    taps = min(pcf_samples, len(_PCF_DISK))
    disk = jnp.asarray(_PCF_DISK[:max(taps, 1)]) * pcf_radius
    vis = jnp.zeros(world_pos.shape[0], jnp.float32)
    for k in range(max(taps, 1)):
        sx = jnp.clip(jnp.round(x + disk[k, 0]).astype(jnp.int32), 0,
                      res - 1)
        sy = jnp.clip(jnp.round(y + disk[k, 1]).astype(jnp.int32), 0,
                      res - 1)
        dmap = maps.depth[mi, sy, sx]
        vis = vis + jnp.where(z - bias <= dmap, 1.0, 0.0)
    vis = vis / max(taps, 1)
    return jnp.where(in_bounds, vis, 1.0)
