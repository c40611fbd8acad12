"""Forward "raster" stage (reference: src/raster_stage.cc,
shader/forward.vert/.frag, shader/scene_raster.glsl).

TPU-native rasterization: primary visibility is one camera-ray wave
through the shared tracer (exactly the image a rasterizer would produce,
without a splatting pipeline), then forward shading: analytic GGX per
punctual light with shadow-map PCF visibility, plus indirect light from
SH probe grids with an ambient fallback (reference:
forward.frag eval_punctual_lights / eval_indirect_light)."""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.brdf_lut import sample_brdf_lut
from ..ops.ggx import BSDFLobes, add_demodulated_color, \
    fresnel_schlick_attenuated, ggx_bsdf, modulate_color
from ..ops.sampling import (create_tangent_space, normalize,
                            to_tangent_space, view_to_tangent_space)
from ..ops.sh import eval_ggx_specular, eval_irradiance
from ..ops.shading import (get_camera_projection, get_screen_camera_ray,
                           interpolate_vertex, ray_cone_lod,
                           sample_material)
from ..scene.device import CameraUniforms, DeviceScene
from .shadow_map import ShadowMaps, pcf_visibility


# Vulkan standard sample locations per MSAA count (spec table 24.2),
# in [0,1) pixel units (reference: raster_pipeline.cc msaa states).
MSAA_LOCATIONS = {
    2: [(0.75, 0.75), (0.25, 0.25)],
    4: [(0.375, 0.125), (0.875, 0.375), (0.125, 0.625), (0.625, 0.875)],
    8: [(0.5625, 0.3125), (0.4375, 0.6875), (0.8125, 0.5625),
        (0.3125, 0.1875), (0.1875, 0.8125), (0.0625, 0.4375),
        (0.6875, 0.9375), (0.9375, 0.0625)],
    16: [(0.5625, 0.5625), (0.4375, 0.3125), (0.3125, 0.625),
         (0.75, 0.4375), (0.1875, 0.375), (0.625, 0.8125),
         (0.8125, 0.6875), (0.6875, 0.1875), (0.375, 0.875),
         (0.5, 0.0625), (0.25, 0.125), (0.125, 0.75),
         (0.0, 0.5), (0.9375, 0.25), (0.875, 0.9375), (0.0625, 0.0)],
}


def _normal_from_world(world_to_local):
    """Grid normal matrix: the INVERSE ROTATION of the grid transform —
    the reference builds it from the transform's quaternion orientation
    alone (scene_stage.cc:1131 `mat4(inverse(orientation))`), so scale
    must be stripped, not inverse-transposed. Consumed by forward.frag's
    grid SH lookups (forward.frag:139,146,149)."""
    fwd = jnp.linalg.inv(world_to_local[:3, :3])       # R @ S
    rot = fwd / jnp.linalg.norm(fwd, axis=0, keepdims=True)
    return rot.T


@partial(jax.jit, static_argnames=("width", "height", "n_views",
                                   "has_alpha"))
def raster_coverage(scene: DeviceScene, bvh, cam: CameraUniforms,
                    sample_offset, width: int, height: int, n_views: int,
                    min_ray_dist: float, has_alpha: bool):
    """Hit mask of one MSAA sample ray per pixel — the coverage half of
    MSAA when shading stays per-pixel (reference: raster pipeline MSAA
    without sample_shading resolves geometry coverage only)."""
    from ..ops.trace_utils import trace_alpha
    V, H, W = n_views, height, width
    R = V * H * W
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    pix = jnp.tile(jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1),
                   (V, 1))
    vp = jnp.repeat(jnp.arange(V), H * W)
    size = jnp.array([W, H], jnp.float32)
    origin, d = get_screen_camera_ray(cam, vp, pix, size,
                                      pixel_offset=sample_offset)
    hit = trace_alpha(scene, bvh, origin, d,
                      jnp.full(R, min_ray_dist, jnp.float32),
                      jnp.full(R, jnp.inf, jnp.float32), 1e-4, has_alpha)
    return (hit.tri_id >= 0).reshape(V, H, W)


@partial(jax.jit, static_argnames=("width", "height", "n_views",
                                   "has_envmap"))
def raster_background(scene: DeviceScene, cam: CameraUniforms, width: int,
                      height: int, n_views: int, has_envmap: bool):
    """Skybox color along the center rays (V, H, W, 3) — the resolve
    target for MSAA coverage blending (reference: envmap_stage draws the
    background before the forward pass)."""
    from ..ops.lights import environment_radiance
    V, H, W = n_views, height, width
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    pix = jnp.tile(jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1),
                   (V, 1))
    vp = jnp.repeat(jnp.arange(V), H * W)
    size = jnp.array([W, H], jnp.float32)
    _, d = get_screen_camera_ray(cam, vp, pix, size)
    bg, _ = environment_radiance(scene, d, has_envmap)
    return bg.reshape(V, H, W, 3)


@partial(jax.jit, static_argnames=("width", "height", "n_views",
                                   "has_shadow_maps", "pcf_samples",
                                   "has_alpha", "sh_order", "has_sh",
                                   "has_envmap", "has_blend",
                                   "pcss_samples", "pcss_min_radius",
                                   "probe_vis", "shadow_cascades"))
def render_raster(scene: DeviceScene, bvh, cam: CameraUniforms,
                  prev_cam: CameraUniforms, shadow_maps: Optional[ShadowMaps],
                  map_table, sh_coefficients, brdf_lut, width: int, height: int,
                  n_views: int, ambient, min_ray_dist: float,
                  has_shadow_maps: bool, pcf_samples: int, has_alpha: bool,
                  sh_order: int = 2, has_sh: bool = False,
                  has_envmap: bool = False, has_blend: bool = False,
                  pcss_samples: int = 32, pcss_min_radius: float = 0.0,
                  probe_vis: bool = False, sample_offset=None,
                  shadow_cascades: int = 1):
    """Returns dict of G-buffer images, each (V, H, W, C)."""
    from ..ops.trace_utils import trace_alpha
    V, H, W = n_views, height, width
    R = V * H * W
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    pix = jnp.tile(jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1),
                   (V, 1))
    vp = jnp.repeat(jnp.arange(V), H * W)
    size = jnp.array([W, H], jnp.float32)

    if sample_offset is None:
        # Exact-tie breaker for shared/silhouette edges: with pixel
        # centers landing EXACTLY on projected triangle edges (axis-
        # aligned test scenes at power-of-two resolutions), the
        # inclusive ray-triangle edge test picks the front triangle
        # where a hardware rasterizer's fill rule excludes it (measured:
        # a 1-px diagonal seam vs the raster golden, ~20% of its
        # residual MSE — scripts/raster_deficit.py). A sub-pixel nudge
        # (default 2^-12 px) makes the tie generic without visibly
        # moving any edge.
        import os as _os
        eps = float(_os.environ.get("TAURAY_RASTER_SUBPIXEL_EPS",
                                    str(2.0 ** -12)))
        if eps:
            sample_offset = jnp.full((1, 2), eps, jnp.float32)
    origin, d = get_screen_camera_ray(cam, vp, pix, size,
                                      pixel_offset=sample_offset)
    hit = trace_alpha(scene, bvh, origin, d,
                      jnp.full(R, min_ray_dist, jnp.float32),
                      jnp.full(R, jnp.inf, jnp.float32), 1e-4, has_alpha,
                      need_uv=False)
    # x-neighbor ray differentials for the ray-cone texture LOD (the
    # reference raster's fragment derivatives; shading passes lod_uv so
    # sample_material filters trilinearly like the hardware sampler)
    d4 = d.reshape(V, H, W, 3)
    o4 = origin.reshape(V, H, W, 3)
    ddx = jnp.concatenate(
        [d4[:, :, 1:] - d4[:, :, :-1], d4[:, :, -1:] - d4[:, :, -2:-1]],
        axis=2).reshape(R, 3)
    dox = jnp.concatenate(
        [o4[:, :, 1:] - o4[:, :, :-1], o4[:, :, -1:] - o4[:, :, -2:-1]],
        axis=2).reshape(R, 3)

    def shade(hit):
        """Forward shading of one hit layer (reference:
        shader/forward.frag); returns (rgb incl. skybox on miss,
        mat, v, miss)."""
        miss = hit.tri_id < 0
        v = interpolate_vertex(scene, hit.tri_id, hit.u, hit.v, d,
                               ray_origin=origin)
        fp = jnp.linalg.norm(
            dox + jnp.where(miss, 1.0, hit.t)[:, None] * ddx, axis=-1)
        mat, v = sample_material(scene, v,
                                 lod_uv=ray_cone_lod(scene, v, fp, d))

        t, b, n = create_tangent_space(v.mapped_normal)
        shading_view = to_tangent_space(-d, t, b, n)

        diffuse = jnp.zeros((R, 3), jnp.float32)
        reflection = jnp.zeros((R, 3), jnp.float32)
        # TAURAY_COLORED_FRESNEL=1 (validation-only, see ops/ggx.py):
        # reproduce the GOLDEN-era colored-Schlick metallic Fresnel.
        # The demodulated diffuse/reflection channels cannot carry a
        # per-channel Fresnel through the scalar modulate_color, so the
        # proof path accumulates a fully-modulated color directly
        # (direct lights via modulate_bsdf — exact for the split lobes —
        # and the indirect term with the vec3 Schlick F).
        from ..ops.ggx import _COLORED_FRESNEL, modulate_bsdf
        crgb = jnp.zeros((R, 3), jnp.float32) if _COLORED_FRESNEL else None
        n_dir = scene.dl_color.shape[0]
        n_point = scene.pl_color.shape[0]
        # debug AOV: mean punctual shadow visibility (scripts/
        # raster_deficit.py isolates the golden residual per term)
        vis_sum = jnp.zeros(R, jnp.float32)
        vis_n = 0

        # directional lights (reference: forward.frag eval_punctual_lights)
        for i in range(n_dir):
            active = i < scene.directional_light_count
            ldir = -scene.dl_dir[i]
            lobes = ggx_bsdf(to_tangent_space(
                jnp.broadcast_to(ldir, (R, 3)), t, b, n), shading_view, mat)
            vis = jnp.ones(R, jnp.float32)
            if has_shadow_maps:
                dir_map_ids = map_table[0]
                vis = pcf_visibility(
                    shadow_maps,
                    jnp.broadcast_to(dir_map_ids[i], (R,)).astype(jnp.int32),
                    v.pos, pcf_samples,
                    ndotl=jnp.abs(jnp.sum(v.mapped_normal * ldir, -1)),
                    screen_xy=pix, pcss_samples=pcss_samples,
                    pcss_minimum_radius=pcss_min_radius,
                    cascades=shadow_cascades)
            facing = jnp.sum(v.hard_normal * ldir, -1) > 0
            vis = jnp.where(facing, vis, 0.0)
            contrib = jnp.where(active, 1.0, 0.0) * vis
            if i == 0:
                vis_sum, vis_n = vis_sum + contrib, vis_n + 1
            color = scene.dl_color[i] * contrib[:, None]
            diffuse, reflection = add_demodulated_color(lobes, color, diffuse,
                                                        reflection)
            if crgb is not None:
                crgb = crgb + color * modulate_bsdf(mat, lobes)

        # point/spot lights
        for i in range(n_point):
            active = i < scene.point_light_count
            from ..ops.lights import get_spotlight_intensity
            lvec = scene.pl_pos[i] - v.pos
            dist2 = jnp.sum(lvec * lvec, -1)
            ldir = lvec / jnp.sqrt(jnp.maximum(dist2, 1e-20))[:, None]
            spot = get_spotlight_intensity(scene.pl_dir_cutoff[i],
                                           scene.pl_dir_falloff[i],
                                           scene.pl_dir[i], ldir)
            lcolor = spot[:, None] * scene.pl_color[i] / \
                jnp.maximum(dist2, 1e-20)[:, None]
            lobes = ggx_bsdf(to_tangent_space(ldir, t, b, n), shading_view, mat)
            vis = jnp.ones(R, jnp.float32)
            if has_shadow_maps:
                _, pt_base, pt_nfaces = map_table
                # cube faces ordered +x,-x,+y,-y,+z,-z (light -> point dir)
                dd = -ldir
                ax = jnp.argmax(jnp.abs(dd), axis=-1)
                neg = jnp.take_along_axis(dd, ax[:, None], axis=-1)[:, 0] < 0
                face = ax * 2 + neg.astype(jnp.int32)
                mid = jnp.where(pt_nfaces[i] > 1, pt_base[i] + face,
                                pt_base[i]).astype(jnp.int32)
                vis = pcf_visibility(
                    shadow_maps, mid, v.pos, pcf_samples,
                    ndotl=jnp.abs(jnp.sum(v.mapped_normal * ldir, -1)),
                    screen_xy=pix, pcss_samples=pcss_samples,
                    pcss_minimum_radius=pcss_min_radius)
            facing = jnp.sum(v.hard_normal * ldir, -1) > 0
            vis = jnp.where(facing, vis, 0.0)
            color = lcolor * (jnp.where(active, 1.0, 0.0) * vis)[:, None]
            diffuse, reflection = add_demodulated_color(lobes, color, diffuse,
                                                        reflection)
            if crgb is not None:
                crgb = crgb + color * modulate_bsdf(mat, lobes)

        # indirect: SH grid irradiance or ambient fallback, combined with
        # the split-sum BRDF integration exactly like the reference
        # (forward.frag eval_indirect_light + brdf_indirect)
        if has_sh:
            coef_grid, world_to_local = sh_coefficients[:2]
            local = jnp.einsum("ij,rj->ri", world_to_local[:3, :3], v.pos) + \
                world_to_local[:3, 3]
            rz, ry, rx = coef_grid.shape[:3]
            res = jnp.array([rx, ry, rz], jnp.float32)
            g = (local * 0.5 + 0.5) * res - 0.5     # grid-space coords
            use_vis = probe_vis and coef_grid.shape[-1] >= 4
            if use_vis:
                # probe-visibility interpolation (reference:
                # shader/spherical_harmonics.glsl:244-309 non-trilinear
                # path, enabled when use_probe_visibility): each of the 8
                # corner probes is weighted by trilinear weight x a
                # visibility factor (the probe's SH-encoded voxel-unit
                # hit distance toward the shaded point, channel .w) x a
                # normal factor (probes behind the surface fade out).
                g = jnp.clip(g, 0.0, res - 1.0)
                grid_n = normalize(jnp.einsum(
                    "ij,rj->ri", _normal_from_world(world_to_local),
                    v.smooth_normal))
            g0 = jnp.floor(g).astype(jnp.int32)
            f = g - g0
            coefs = 0.0
            wsum = 0.0
            from ..ops.sh import sh_basis
            for dz in (0, 1):
                for dy in (0, 1):
                    for dx in (0, 1):
                        ix = jnp.clip(g0[:, 0] + dx, 0, rx - 1)
                        iy = jnp.clip(g0[:, 1] + dy, 0, ry - 1)
                        iz = jnp.clip(g0[:, 2] + dz, 0, rz - 1)
                        w = (jnp.where(dx, f[:, 0], 1 - f[:, 0]) *
                             jnp.where(dy, f[:, 1], 1 - f[:, 1]) *
                             jnp.where(dz, f[:, 2], 1 - f[:, 2]))
                        c = coef_grid[iz, iy, ix]
                        if use_vis:
                            corner = jnp.stack(
                                [ix, iy, iz], -1).astype(jnp.float32)
                            sdir = corner - g
                            sdist = jnp.linalg.norm(sdir, axis=-1)
                            # the clamped interp position can land exactly
                            # on a corner (sdir = 0): any direction works
                            # there since sdist = 0 makes the visibility
                            # factor saturate
                            safe = jnp.where(sdist[:, None] > 1e-6, sdir,
                                             jnp.array([1.0, 0.0, 0.0]))
                            sunit = safe / jnp.maximum(sdist, 1e-6)[:, None]
                            nf = jnp.clip(
                                (jnp.sum(grid_n * sunit, -1) + 1.0) * 0.5,
                                0.0, 1.0)
                            # visibility: SH distance of the corner probe
                            # evaluated toward the shaded point (basis
                            # direction in grid-LOCAL units, matching the
                            # projection direction space)
                            vloc = -safe / res[None, :]
                            vdir = vloc / jnp.linalg.norm(
                                vloc, axis=-1, keepdims=True)
                            vis_d = jnp.sum(
                                sh_basis(vdir, sh_order) * c[..., 3], -1)
                            vf = jnp.clip(vis_d - sdist + 0.4, 0.0, 1.0)
                            w = w * nf * vf
                        coefs = coefs + c[..., :3] * w[:, None, None]
                        wsum = wsum + w
            if use_vis:
                coefs = coefs / jnp.maximum(wsum, 1e-8)[:, None, None]
            # evaluation directions in grid-LOCAL frame (reference:
            # forward.frag:146-152 normal_from_world * mapped_normal /
            # ref_dir), matching the bake's local-dir SH projection
            nfw = _normal_from_world(world_to_local)
            sh_n = normalize(jnp.einsum("ij,rj->ri", nfw, v.mapped_normal))
            inc_diffuse = jnp.maximum(
                eval_irradiance(coefs, sh_n, sh_order), 0.0)
            ref_dir = d - 2.0 * jnp.sum(d * v.mapped_normal, -1,
                                        keepdims=True) * v.mapped_normal
            sh_ref = normalize(jnp.einsum("ij,rj->ri", nfw, ref_dir))
            inc_spec = jnp.maximum(eval_ggx_specular(
                coefs, sh_ref, jnp.sqrt(mat.roughness), sh_order), 0.0)
        else:
            inc_diffuse = jnp.broadcast_to(jnp.asarray(ambient)[None, :],
                                           (R, 3))
            inc_spec = inc_diffuse
        # brdf_indirect (reference: forward.frag)
        cos_v = jnp.maximum(jnp.sum(v.mapped_normal * -d, -1), 0.0)
        f_att = fresnel_schlick_attenuated(cos_v, mat.f0, mat.roughness)
        kd = (1.0 - f_att) * (1.0 - mat.metallic) * (1.0 - mat.transmittance)
        diffuse = diffuse + kd[:, None] * inc_diffuse
        bi = sample_brdf_lut(brdf_lut, cos_v, jnp.sqrt(mat.roughness))
        spec_w = f_att * bi[..., 0] + bi[..., 1]
        spec_w = spec_w + (1.0 - spec_w) * mat.metallic
        reflection = reflection + inc_spec * spec_w[:, None]

        rgb = modulate_color(mat, diffuse, reflection) + mat.emission
        if crgb is not None:
            # golden-era indirect: vec3 Schlick F with F0 = mix(0.04,
            # albedo, metallic) feeds the split-sum directly (untinted
            # white term survives; the current scalar model routes
            # everything through the albedo-tinted modulate)
            alb = mat.albedo[..., :3]
            met = mat.metallic[:, None]
            f0v = 0.04 * (1.0 - met) + alb * met
            fv = f0v + (jnp.maximum(1.0 - mat.roughness[:, None], f0v) -
                        f0v) * (1.0 - cos_v[:, None]) ** 5
            spec_c = inc_spec * (fv * bi[..., 0:1] + bi[..., 1:2])
            diff_c = (kd[:, None] * inc_diffuse) * alb * (1.0 - met)
            rgb = crgb + diff_c + spec_c + mat.emission
        alpha = jnp.where(miss, 0.0, 1.0)
        # skybox: envmap lookup along the ray like the reference's
        # envmap_stage (reference: shader/envmap.frag), else env_factor
        from ..ops.lights import environment_radiance
        bg, _ = environment_radiance(scene, d, has_envmap)
        rgb = jnp.where(miss[:, None], bg, rgb)
        svis = vis_sum / max(vis_n, 1)
        return rgb, mat, v, miss, diffuse, reflection, svis

    rgb, mat, v, miss, diffuse, reflection, shadow_vis = shade(hit)
    # alpha-BLEND materials: composite the front blend layer over
    # the next non-blend surface along the ray (reference: raster
    # pipeline alpha blending; one blend layer deep)
    if has_blend:
        from ..ops.intersect import Hit as _Hit
        inst = scene.tri_instance[jnp.maximum(hit.tri_id, 0)]
        front_blend = (hit.tri_id >= 0) & scene.inst_blend[inst]
        tmin2 = jnp.where(front_blend,
                          hit.t * 1.0001 + 1e-4, min_ray_dist)
        h2 = trace_alpha(scene, bvh, origin, d, tmin2,
                         jnp.full(R, jnp.inf), 1e-4, has_alpha,
                         need_uv=False)
        for _ in range(2):
            i2 = scene.tri_instance[jnp.maximum(h2.tri_id, 0)]
            again = (h2.tri_id >= 0) & scene.inst_blend[i2]
            tmin2 = jnp.where(again, h2.t * 1.0001 + 1e-4, tmin2)
            h2b = trace_alpha(scene, bvh, origin, d, tmin2,
                              jnp.full(R, jnp.inf), 1e-4, has_alpha,
                              need_uv=False)
            h2 = _Hit(*(jnp.where(again, b2, a2)
                        for a2, b2 in zip(h2, h2b)))
        rgb_back = shade(h2)[0]
        a_front = jnp.clip(mat.albedo[:, 3], 0.0, 1.0)
        blended = a_front[:, None] * rgb + \
            (1.0 - a_front[:, None]) * rgb_back
        rgb = jnp.where(front_blend[:, None], blended, rgb)
    alpha = jnp.where(miss, 0.0, 1.0)
    color = jnp.concatenate([rgb, alpha[:, None]], axis=-1)

    screen_motion = get_camera_projection(prev_cam, vp, v.prev_pos)
    view_z = -(jnp.einsum("rj,rj->r",
                          cam.view[vp][:, 2, :3], v.pos) +
               cam.view[vp][:, 2, 3])

    def r4(x, C):
        return x.reshape(V, H, W, C)

    return dict(
        color=r4(color, 4),
        diffuse=r4(jnp.concatenate(
            [diffuse, jnp.ones((R, 1))], -1), 4),
        reflection=r4(jnp.concatenate(
            [reflection, jnp.ones((R, 1))], -1), 4),
        albedo=r4(mat.albedo, 4),
        normal=r4(jnp.where(miss[:, None], -d, v.mapped_normal), 3),
        pos=r4(v.pos, 3),
        screen_motion=r4(screen_motion, 3),
        metallic_roughness=r4(jnp.stack([mat.metallic, mat.roughness],
                                        -1), 2),
        emission=r4(mat.emission, 3),
        shadow_vis=r4(shadow_vis[:, None], 1)[..., 0],
        view_z=r4(view_z[:, None], 1)[..., 0])
