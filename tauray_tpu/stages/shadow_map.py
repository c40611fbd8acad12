"""Shadow map generation + PCF/PCSS filtering
(reference: src/shadow_map_stage.cc, src/shadow_map.cc, src/scene_stage.cc
update_shadow_map_params, shader/shadow_mapping.glsl, src/atlas.cc).

TPU-native: the depth maps are produced by the same cluster tracer used
for everything else (one ray wave per map), stored as a stacked array
(the analogue of the reference's shadow-map atlas) holding AXIAL linear
depth along the light's forward axis. Filtering mirrors the reference:

  * 64-tap Poisson-disk PCF with a per-pixel random rotation
    (reference: shader/shadow_mapping.glsl pcf_2d_* — the reference
    rotates by a tiled noise texture; here the rotation comes from a
    pcg hash of the screen coordinate, statistically equivalent);
  * bilinear COMPARISON filtering per tap (reference samples a
    sampler2DShadow, i.e. the pass/fail result is bilinearly blended);
  * PCSS blocker search sizing the penumbra from the light's world
    radius (reference: calc_perspective_pcss_radius /
    calc_directional_pcss_radius);
  * biases: perspective maps scale linear depth by (1 - bias)
    (calc_perspective_shadow_map_pos); directional maps subtract the
    bias in NDC depth (find_cascade), with min/max biases from
    auto_assign_shadow_maps (src/tauray.cc:441-454).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class ShadowMaps(NamedTuple):
    depth: jnp.ndarray       # (L, Res, Res) AXIAL linear depth
    view: jnp.ndarray        # (L, 4, 4) world -> light space (-z forward)
    proj_kind: jnp.ndarray   # (L,) 0=ortho (directional), 1=perspective
    params: jnp.ndarray      # (L, 4): ortho (rx, ry, near, far) /
    #                                  persp (tan_half_fov, _, near, far)
    light_index: jnp.ndarray  # (L,) point-light index; -(i+1) = dir i
    min_bias: jnp.ndarray    # (L,)
    max_bias: jnp.ndarray    # (L,)
    pcf_radius: jnp.ndarray  # (L, 2): reference sm.radius semantics
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


def build_shadow_maps(arrays, tracer, opt, scene_center=None
                      ) -> Optional[ShadowMaps]:
    """Ray-cast depth maps for all shadow-casting lights. Bias defaults
    mirror auto_assign_shadow_maps (reference: src/tauray.cc:441-454)."""
    res = min(opt.shadow_map_resolution, 2048)
    views, kinds, params, lidx = [], [], [], []
    min_biases, max_biases, radii = [], [], []
    center = (np.zeros(3, np.float32) if scene_center is None
              else np.asarray(scene_center, np.float32))

    area_size = 2.0 * opt.shadow_map_radius
    for i in range(arrays.dir_count):
        d = arrays.dl_dir[i]
        origin = center - d * opt.shadow_map_depth * 0.5
        views.append(_look_at(origin, d))
        kinds.append(0)
        params.append([opt.shadow_map_radius, opt.shadow_map_radius,
                       0.0, opt.shadow_map_depth])
        lidx.append(-1 - i)
        # reference scales directional biases to be depth-range
        # independent (scene_stage.cc:521 bias_scale = 20/|range| with
        # range = 2*depth, then applied in [-1,1] NDC). In world units
        # that is bias * 20/(2*depth) * depth = bias * 10.
        min_biases.append(opt.shadow_map_bias / 5.0 * 10.0)
        max_biases.append(opt.shadow_map_bias * 10.0)
        # sun angular radius -> PCF radius in uv (reference:
        # scene_stage.cc:527 tan(radians(angle))/area_size)
        ang = math.acos(min(max(float(arrays.dl_dir_cutoff[i]), -1), 1))
        radii.append([math.tan(ang) / max(area_size, 1e-6)] * 2)

    for i in range(arrays.point_count):
        near = 0.01
        far = max(float(arrays.pl_cutoff_radius[i]), 1e-2)
        if arrays.pl_spot_radius[i] >= 0:  # spotlight
            cutoff = float(arrays.pl_dir_cutoff[i])
            half = math.acos(min(max(cutoff, -1), 1))
            views.append(_look_at(arrays.pl_pos[i], arrays.pl_dir[i]))
            kinds.append(1)
            params.append([math.tan(max(half, 1e-3)), 0.0, near, far])
            lidx.append(i)
            min_biases.append(0.005)
            max_biases.append(opt.shadow_map_bias * 2)
            radii.append([float(arrays.pl_radius[i])] * 2)
        else:  # omni point light: 6 cube faces
            dirs = [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                    (0, 0, 1), (0, 0, -1)]
            for d in dirs:
                views.append(_look_at(arrays.pl_pos[i],
                                      np.array(d, np.float32)))
                kinds.append(1)
                params.append([1.0, 0.0, near, far])  # 90 deg faces
                lidx.append(i)
                min_biases.append(0.005)
                max_biases.append(opt.shadow_map_bias * 2)
                radii.append([float(arrays.pl_radius[i])] * 2)

    if not views:
        return None
    L = len(views)
    views = np.stack(views)
    params = np.array(params, np.float32)
    kinds = np.array(kinds, np.int32)

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
            axial = np.ones(len(u), np.float32)
        else:
            t = params[li, 0]
            d_local = np.stack([u * t, -v * t, -np.ones_like(u)], axis=-1)
            norm = np.linalg.norm(d_local, axis=-1, keepdims=True)
            d_local = d_local / norm
            # store AXIAL depth: radial hit distance * cos(angle to axis)
            axial = (-d_local[:, 2]).astype(np.float32)
            o_local = np.zeros_like(d_local)
        o = o_local @ inv_view[:3, :3].T + inv_view[:3, 3]
        d = d_local @ inv_view[:3, :3].T
        hit = tracer.trace(jnp.asarray(o, jnp.float32),
                           jnp.asarray(d, jnp.float32),
                           jnp.zeros(len(u), jnp.float32),
                           jnp.full(len(u), params[li, 3], jnp.float32))
        depth = jnp.where(hit.tri_id >= 0,
                          hit.t * jnp.asarray(axial), params[li, 3])
        depths.append(depth.reshape(res, res))

    return ShadowMaps(
        depth=jnp.stack(depths), view=jnp.asarray(views),
        proj_kind=jnp.asarray(kinds), params=jnp.asarray(params),
        light_index=jnp.asarray(np.array(lidx, np.int32)),
        min_bias=jnp.asarray(np.array(min_biases, np.float32)),
        max_bias=jnp.asarray(np.array(max_biases, np.float32)),
        pcf_radius=jnp.asarray(np.array(radii, np.float32)),
        resolution=res)


def _poisson_disk(n: int, seed: int = 7) -> np.ndarray:
    """Deterministic Poisson-ish disk via best-candidate sampling (the
    reference ships a fixed sample table; this generates an equivalent
    blue-noise set)."""
    rng = np.random.default_rng(seed)
    pts = np.zeros((n, 2), np.float32)
    pts[0] = [0.0, 0.0]
    for i in range(1, n):
        best, best_d = None, -1.0
        cand_r = np.sqrt(rng.random(24))
        cand_a = rng.random(24) * 2 * np.pi
        cand = np.stack([cand_r * np.cos(cand_a),
                         cand_r * np.sin(cand_a)], -1)
        d = np.linalg.norm(cand[:, None] - pts[None, :i], axis=-1).min(1)
        j = int(np.argmax(d))
        pts[i] = cand[j]
    return pts.astype(np.float32)


_POISSON64 = _poisson_disk(64)


def _bilinear_compare(depth_map, mi, x, y, z_cmp, res):
    """Bilinear blend of the 4 per-texel (z_cmp <= stored) results
    (reference: sampler2DShadow linear filtering)."""
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    acc = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            sx = jnp.clip(x0.astype(jnp.int32) + dx, 0, res - 1)
            sy = jnp.clip(y0.astype(jnp.int32) + dy, 0, res - 1)
            d = depth_map[mi, sy, sx]
            w = (jnp.where(dx, fx, 1 - fx) * jnp.where(dy, fy, 1 - fy))
            acc = acc + w * jnp.where(z_cmp <= d, 1.0, 0.0)
    return acc


def pcf_visibility(maps: ShadowMaps, map_id, world_pos,
                   pcf_samples: int = 64, ndotl=None, screen_xy=None,
                   pcss_samples: int = 32, pcss_minimum_radius: float = 0.0):
    """Percentage-closer soft shadows (reference:
    shader/shadow_mapping.glsl calc_directional_shadow /
    calc_point_shadow). map_id: (R,), world_pos: (R, 3), screen_xy:
    (R, 2) pixel coords for the rotation hash (None = fixed rotation)."""
    res = maps.resolution
    R = world_pos.shape[0]
    mi = jnp.maximum(map_id, 0)
    view = maps.view[mi]                        # (R, 4, 4)
    p_light = jnp.einsum("rij,rj->ri", view[:, :3, :3], world_pos) + \
        view[:, :3, 3]
    z = -p_light[:, 2]                          # axial depth (positive)
    kind = maps.proj_kind[mi]
    pr = maps.params[mi]
    is_persp = kind == 1

    if ndotl is None:
        ndotl = jnp.zeros(R, jnp.float32)
    bias = jnp.maximum(maps.max_bias[mi] * (1.0 - ndotl),
                       maps.min_bias[mi])

    # biased comparison depth, linear-space equivalents of the reference:
    #  perspective: hyper((1-bias) * z)  -> compare (1-bias)*z vs stored
    #  directional: bias is pre-scaled to world units in build
    z_cmp = jnp.where(is_persp, (1.0 - bias) * z, z - bias)

    # uv in [0,1]
    safe_z = jnp.maximum(z, 1e-6)
    u = jnp.where(is_persp,
                  p_light[:, 0] / (safe_z * pr[:, 0]),
                  p_light[:, 0] / pr[:, 0])
    v = jnp.where(is_persp,
                  -p_light[:, 1] / (safe_z * pr[:, 0]),
                  -p_light[:, 1] / pr[:, 1])
    in_bounds = (jnp.abs(u) < 1) & (jnp.abs(v) < 1) & (z > 0) & \
        (z < pr[:, 3])
    u01 = u * 0.5 + 0.5
    v01 = v * 0.5 + 0.5

    # per-pixel rotation (reference: tiled noise texture; here pcg hash)
    if screen_xy is not None:
        h = (screen_xy[:, 0].astype(jnp.uint32) * jnp.uint32(0x9E3779B9) ^
             screen_xy[:, 1].astype(jnp.uint32) * jnp.uint32(0x85EBCA6B))
        h = h * jnp.uint32(0x27D4EB2D)
        h = h ^ (h >> jnp.uint32(15))
        ang = h.astype(jnp.float32) * (2 * np.pi / 4294967296.0)
    else:
        ang = jnp.zeros(R, jnp.float32)
    ca = jnp.cos(ang)
    sa = jnp.sin(ang)

    base_radius = maps.pcf_radius[mi]           # (R, 2)
    # uv-space PCF radius (reference: pcf radius semantics per kind)
    #  directional: radius already in uv units
    #  perspective: radius/linear_depth (reference:
    #  calc_perspective_pcss_radius search_radius = -radius/linear_depth)
    persp_uv = base_radius[:, 0] / safe_z
    radius_uv = jnp.where(is_persp, persp_uv, base_radius[:, 0])

    disk = jnp.asarray(_POISSON64)

    if pcss_samples > 0:
        # blocker search (reference: calc_*_pcss_radius)
        zr = jnp.where(is_persp, safe_z, pr[:, 3])
        search_uv = jnp.where(is_persp, persp_uv,
                              base_radius[:, 0] * pr[:, 3] / 20.0)
        occl = jnp.zeros(R, jnp.float32)
        avg_z = jnp.zeros(R, jnp.float32)
        n_search = min(pcss_samples, 64)
        for k in range(n_search):
            ox = disk[k, 0] * ca - disk[k, 1] * sa
            oy = disk[k, 0] * sa + disk[k, 1] * ca
            sx = jnp.clip(((u01 + ox * search_uv) * res - 0.5), 0, res - 1)
            sy = jnp.clip(((v01 + oy * search_uv) * res - 0.5), 0, res - 1)
            d = maps.depth[mi, jnp.round(sy).astype(jnp.int32),
                           jnp.round(sx).astype(jnp.int32)]
            blocker = d < z_cmp
            occl = occl + blocker
            avg_z = avg_z + jnp.where(blocker, d, 0.0)
        any_blocker = occl >= 1.0
        avg_z = avg_z / jnp.maximum(occl, 1.0)
        penumbra = (z_cmp - avg_z) / jnp.maximum(avg_z, 1e-6)
        penumbra = jnp.maximum(penumbra, 0.0)
        radius_pcss = jnp.where(
            is_persp,
            search_uv * (penumbra + pcss_minimum_radius),
            5.0 * search_uv * penumbra + pcss_minimum_radius)
        radius_uv = jnp.where(any_blocker, radius_pcss, radius_uv)
        skip = ~any_blocker
    else:
        skip = jnp.zeros(R, bool)

    taps = max(min(pcf_samples, 64), 1)
    vis = jnp.zeros(R, jnp.float32)
    for k in range(taps):
        ox = disk[k, 0] * ca - disk[k, 1] * sa
        oy = disk[k, 0] * sa + disk[k, 1] * ca
        x = jnp.clip((u01 + ox * radius_uv) * res - 0.5, 0, res - 1)
        y = jnp.clip((v01 + oy * radius_uv) * res - 0.5, 0, res - 1)
        vis = vis + _bilinear_compare(maps.depth, mi, x, y, z_cmp, res)
    vis = vis / taps
    vis = jnp.where(skip, 1.0, vis)
    return jnp.where(in_bounds, vis, 1.0)
