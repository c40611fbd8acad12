"""Shadow map generation + PCF/PCSS filtering
(reference: src/shadow_map_stage.cc, src/shadow_map.cc, src/scene_stage.cc
update_shadow_map_params, shader/shadow_mapping.glsl, src/atlas.cc).

TPU-native: the depth maps are produced by the same cluster tracer used
for everything else (one ray wave per map), stored as a stacked array
(the analogue of the reference's shadow-map atlas) holding AXIAL linear
depth along the light's forward axis. Filtering mirrors the reference:

  * 64-tap Poisson-disk PCF with per-pixel rotation, using the
    reference's exact sample table (shader/poisson_samples_2d.glsl) and
    its tiled (cos,sin) noise texture (data/noise_vector_2d.exr, sampled
    at mod(screen_coord, 256) — shader/shadow_mapping.glsl pcf_2d_*);
    falls back to a pcg-hash rotation when the asset is unavailable;
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
    cascade_count: jnp.ndarray  # (L,) cascades remaining from this layer
    #   (directional layer k of an n-cascade group stores n - k; spot /
    #    cube-face layers store 1)
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


def build_shadow_maps(arrays, tracer, opt, scene_center=None,
                      device_scene=None,
                      cam_pos=None) -> Optional[ShadowMaps]:
    """Ray-cast depth maps for all shadow-casting lights. Bias defaults
    mirror auto_assign_shadow_maps (reference: src/tauray.cc:441-454).

    Potentially-transparent materials cast shadows only where their
    alpha >= 0.5, mirroring the reference's shadow_map.frag discard
    (alpha_clip = 0.5 for potentially_transparent materials,
    src/shadow_map_stage.cc:214-215, src/material.cc:7-11); pass
    `device_scene` to enable the alpha texture fetch."""
    res = min(opt.shadow_map_resolution, 2048)
    views, kinds, params, lidx = [], [], [], []
    min_biases, max_biases, radii, casc = [], [], [], []
    center = (np.zeros(3, np.float32) if scene_center is None
              else np.asarray(scene_center, np.float32))

    area_size = 2.0 * opt.shadow_map_radius
    ncasc = max(int(getattr(opt, "shadow_map_cascades", 1) or 1), 1)
    for i in range(arrays.dir_count):
        d = arrays.dl_dir[i]
        origin = center - d * opt.shadow_map_depth * 0.5
        base_view = _look_at(origin, d)
        # cascades center on the mean camera position in light space
        # (reference: shadow_map.cc track_cameras cam_light_pos), each
        # level covering 2x the previous area, offsets snapped to the
        # level's texel grid (scene_stage.cc align_cascade)
        if cam_pos is not None:
            cl = base_view[:3, :3] @ np.asarray(cam_pos, np.float32) + \
                base_view[:3, 3]
            cam_xy = cl[:2]
        else:
            cam_xy = np.zeros(2, np.float32)
        ang = math.acos(min(max(float(arrays.dl_dir_cutoff[i]), -1), 1))
        for k in range(ncasc):
            scale = 2.0 ** k
            step = (area_size * scale) / res
            off = np.round(cam_xy / step) * step
            view = base_view.copy()
            view[0, 3] -= off[0]
            view[1, 3] -= off[1]
            views.append(view)
            kinds.append(0)
            params.append([opt.shadow_map_radius * scale,
                           opt.shadow_map_radius * scale,
                           0.0, opt.shadow_map_depth])
            lidx.append(-1 - i)
            # reference scales directional biases to be depth-range
            # independent (scene_stage.cc:521 bias_scale = 20/|range|
            # with range = 2*depth, then applied in [-1,1] NDC). In
            # world units that is bias * 20/(2*depth) * depth =
            # bias * 10. Cascade k scales bias by sqrt(2^k)
            # (scene_stage.cc:559 c.bias_scale).
            bs = math.sqrt(scale)
            min_biases.append(opt.shadow_map_bias / 5.0 * 10.0 * bs)
            max_biases.append(opt.shadow_map_bias * 10.0 * bs)
            # sun angular radius -> PCF radius in uv (reference:
            # scene_stage.cc:527 tan(radians(angle))/area_size)
            radii.append([math.tan(ang) / max(area_size * scale,
                                              1e-6)] * 2)
            casc.append(ncasc - k)

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
            casc.append(1)
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
                casc.append(1)

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
        R = len(u)
        if device_scene is not None and \
                bool(getattr(arrays, "any_alpha_materials", False)):
            from ..ops.trace_utils import trace_alpha
            hit = trace_alpha(
                device_scene, tracer, jnp.asarray(o, jnp.float32),
                jnp.asarray(d, jnp.float32), jnp.zeros(R, jnp.float32),
                jnp.full(R, params[li, 3], jnp.float32),
                jnp.full(R, 0.5, jnp.float32), True)
        else:
            hit = tracer.trace(jnp.asarray(o, jnp.float32),
                               jnp.asarray(d, jnp.float32),
                               jnp.zeros(R, jnp.float32),
                               jnp.full(R, params[li, 3], jnp.float32))
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
        cascade_count=jnp.asarray(np.array(casc, np.int32)),
        resolution=res)


# The reference's fixed 64-sample Poisson disk (data table from
# shader/poisson_samples_2d.glsl:9-46 — the golden images depend on these
# exact tap positions, like the CLI option names depend on options.hh).
_POISSON64 = np.array([
    [-0.695065, -0.317671], [0.910942, 0.412491],
    [-0.303778, 0.952665], [0.518187, -0.854809],
    [0.064410, 0.143302], [-0.897262, 0.440243],
    [-0.256688, -0.966451], [0.406177, 0.913495],
    [0.955344, -0.295435], [0.065461, -0.458306],
    [-0.372877, 0.432738], [0.564884, 0.035607],
    [0.057368, 0.607356], [-0.272403, -0.158090],
    [0.510804, -0.407973], [-0.999315, 0.007125],
    [-0.649618, -0.759558], [0.474175, 0.466568],
    [-0.598217, 0.090578], [-0.652515, 0.756754],
    [0.142136, -0.989197], [-0.317785, -0.548586],
    [0.054322, 0.991461], [0.991411, 0.062224],
    [0.258940, -0.155479], [0.796365, -0.604791],
    [0.685861, 0.727529], [-0.245210, 0.150298],
    [0.251747, -0.702386], [-0.051031, -0.741023],
    [-0.221569, 0.677006], [0.341205, 0.213390],
    [0.696124, -0.205655], [-0.086215, 0.373800],
    [-0.963839, -0.264658], [-0.831231, -0.555220],
    [-0.636080, 0.360776], [0.673304, 0.283633],
    [-0.006615, -0.198311], [0.310994, 0.670550],
    [-0.829011, 0.195663], [-0.447090, -0.334952],
    [0.160887, 0.382701], [-0.771199, -0.084460],
    [-0.406718, -0.774974], [-0.585245, -0.529782],
    [-0.156756, -0.378295], [0.567336, -0.630606],
    [-0.449549, 0.649124], [0.282586, -0.384085],
    [-0.495726, -0.112737], [0.706657, 0.504904],
    [0.478992, -0.167310], [0.781413, -0.002990],
    [-0.043730, 0.799185], [-0.094402, -0.002422],
    [-0.719609, 0.555853], [-0.441099, 0.232549],
    [0.207514, 0.851013], [0.774662, -0.398131],
    [-0.055589, -0.943590], [0.319790, -0.893468],
    [-0.488119, 0.872496], [0.863541, 0.217313]], np.float32)


_NOISE_2D = None
_NOISE_2D_TRIED = False


def _load_noise_2d():
    """The reference's tiled PCF rotation-noise texture
    (data/noise_vector_2d.exr, unit (cos,sin) vectors; sampled by
    scene_stage.cc:301 + shadow_mapping.glsl:203-207). Loaded lazily from
    the reference data dir (override with TAURAY_NOISE_2D); returns
    (H*W, 2) rows + (H, W), or None when the asset is unavailable (the
    hash fallback in pcf_visibility then applies)."""
    global _NOISE_2D, _NOISE_2D_TRIED
    if _NOISE_2D_TRIED:
        return _NOISE_2D
    _NOISE_2D_TRIED = True
    import os
    path = os.environ.get("TAURAY_NOISE_2D",
                          "/root/reference/data/noise_vector_2d.exr")
    try:
        from ..io.exr import read_rgb
        img = np.asarray(read_rgb(path))
        H, W = img.shape[:2]
        _NOISE_2D = (jnp.asarray(img[..., :2].reshape(-1, 2)), (H, W))
    except Exception:
        _NOISE_2D = None
    return _NOISE_2D


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
                   pcss_samples: int = 32, pcss_minimum_radius: float = 0.0,
                   cascades: int = 1):
    """Percentage-closer soft shadows (reference:
    shader/shadow_mapping.glsl calc_directional_shadow /
    calc_point_shadow). map_id: (R,), world_pos: (R, 3), screen_xy:
    (R, 2) pixel coords for the rotation hash (None = fixed rotation).
    cascades: static upper bound on directional cascade layers
    (--shadow-map-cascades); the first layer whose bounds (with a
    2*pcf-radius margin) contain the point wins (reference:
    shadow_mapping.glsl find_cascade). Per-layer bias/radius scaling is
    baked in at build time."""
    res = maps.resolution
    R = world_pos.shape[0]
    mi = jnp.maximum(map_id, 0)

    if cascades > 1:
        def _in_margin(ml):
            vw = maps.view[ml]
            pl = jnp.einsum("rij,rj->ri", vw[:, :3, :3], world_pos) + \
                vw[:, :3, 3]
            prm = maps.params[ml]
            uu = pl[:, 0] / prm[:, 0]
            vv = -pl[:, 1] / prm[:, 1]
            rad = maps.pcf_radius[ml][:, 0]
            return (jnp.abs(uu) < 1 - 2 * rad) & \
                (jnp.abs(vv) < 1 - 2 * rad)
        found = _in_margin(mi) | (maps.proj_kind[mi] == 1)
        sel = mi
        for k in range(1, cascades):
            valid = k < maps.cascade_count[mi]
            cand = jnp.where(valid, mi + k, mi)
            take = _in_margin(cand) & valid & ~found
            sel = jnp.where(take, cand, sel)
            found = found | take
        mi = sel

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

    # per-pixel rotation from the reference's tiled noise texture
    # (shader/shadow_mapping.glsl:203-207: noise_pos = ivec2(mod(
    # gl_FragCoord.xy * noise_scale, textureSize)); cs = texel.xy;
    # rotation = mat2(cs.x, cs.y, -cs.y, cs.x) — complex multiply by cs)
    noise = _load_noise_2d()
    if screen_xy is not None and noise is not None:
        rows, (NH, NW) = noise
        nx = jnp.remainder(screen_xy[:, 0].astype(jnp.int32), NW)
        ny = jnp.remainder(screen_xy[:, 1].astype(jnp.int32), NH)
        cs = rows[ny * NW + nx]
        ca = cs[:, 0]
        sa = cs[:, 1]
    elif screen_xy is not None:
        h = (screen_xy[:, 0].astype(jnp.uint32) * jnp.uint32(0x9E3779B9) ^
             screen_xy[:, 1].astype(jnp.uint32) * jnp.uint32(0x85EBCA6B))
        h = h * jnp.uint32(0x27D4EB2D)
        h = h ^ (h >> jnp.uint32(15))
        ang = h.astype(jnp.float32) * (2 * np.pi / 4294967296.0)
        ca = jnp.cos(ang)
        sa = jnp.sin(ang)
    else:
        ca = jnp.ones(R, jnp.float32)
        sa = jnp.zeros(R, jnp.float32)

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
            # textureGather semantics (shadow_mapping.glsl:127-160): the
            # 4 texels of the bilinear footprint all enter the blocker
            # average, unweighted
            sx = jnp.clip((u01 + ox * search_uv) * res - 0.5, 0, res - 1)
            sy = jnp.clip((v01 + oy * search_uv) * res - 0.5, 0, res - 1)
            x0 = jnp.floor(sx).astype(jnp.int32)
            y0 = jnp.floor(sy).astype(jnp.int32)
            for dy in (0, 1):
                for dx in (0, 1):
                    gx = jnp.clip(x0 + dx, 0, res - 1)
                    gy = jnp.clip(y0 + dy, 0, res - 1)
                    d = maps.depth[mi, gy, gx]
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
