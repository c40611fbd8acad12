"""Wavefront path tracer stage.

The reference's megakernel bounce loop (reference:
shader/path_tracer.glsl evaluate_ray, shader/path_tracer.rgen) becomes a
wavefront over flat ray batches: per bounce, one BVH traversal over all
rays, vectorized NEE + shadow traversal, vectorized GGX sampling.
Dead lanes compact between bounces when few rays remain alive (see
_run_bounce_capped; tier schedule fed by the previous frame's counts).
Feature parity:

  * NEE over point/directional/tri/envmap lights with weighted selection
    (reference: shader/path_tracer.glsl sample_explicit_light)
  * MIS balance/power/off (reference: bsdf_mis_pdf / nee_mis_pdf)
  * bounce modes hemisphere / cosine / material (shader/ggx.glsl)
  * russian roulette, path-space regularization, indirect clamping
  * film filters point/box/blackman-harris, depth of field
  * demodulated diffuse/reflection outputs for denoisers
  * deterministic pcg4d sample streams identical to the reference
    (pixel, viewport+seed, global sample index)
  * running-mean accumulation (reference: shader/gbuffer.glsl
    accumulate_gbuffer_color)
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import rng as rng_ops
from ..ops.bvh import DeviceBVH
from ..ops.ggx import (BSDFLobes, add_demodulated_color, material_bsdf_pdf,
                       material_bsdf_sample, modulate_bsdf, modulate_color)
from ..ops.intersect import RAY_MAX_DIST, intersect_spheres
from ..ops.lights import (NEEWeights, environment_radiance,
                          directional_light_radiance, point_light_radiance,
                          ray_plane_intersection_dist, sample_directional_light,
                          sample_directional_light_pdf, sample_environment_map,
                          sample_point_light, sample_point_light_pdf,
                          sample_triangle_light, sample_triangle_light_pdf)
from ..ops.sampling import (create_tangent_space, from_tangent_space,
                            get_barycentric_coords, normalize,
                            sample_blackman_harris_concentric_disk,
                            view_to_tangent_space)
from ..ops.shading import (get_screen_camera_ray, interpolate_vertex,
                           rgb_to_luminance, sample_material)
from ..scene.device import CameraUniforms, DeviceScene


# perf-lab wave capture: scripts/ set this to a list to collect each
# trace wave's (kind, o, d, t_max) for offline kernel experiments
_WAVE_DUMP: Optional[list] = None


@dataclass(frozen=True)
class PTConfig:
    """Static path tracer configuration → one compiled program per value."""
    width: int
    height: int
    n_views: int
    max_bounces: int
    samples_per_pass: int = 1
    film: str = "point"
    film_radius: float = 0.5
    min_ray_dist: float = 1e-4
    mis_mode: str = "power"            # off | balance | power
    bounce_mode: str = "material"      # hemisphere | cosine | material
    tri_light_mode: str = "solid-angle"
    russian_roulette_delta: float = 0.0
    indirect_clamping: float = 0.0
    regularization_gamma: float = 0.0
    nee: NEEWeights = NEEWeights(0, 0, 0, 0)
    has_envmap: bool = False
    has_point_lights: bool = False
    hide_lights: bool = False
    use_dof: bool = False
    transparent_background: bool = False
    use_white_albedo_on_first_bounce: bool = False
    direct_only: bool = False          # `direct` renderer: 2-bounce NEE-only
    rng_seed: int = 0
    has_alpha_materials: bool = False
    sampler: str = "uniform-random"    # | sobol-owen | sobol-z2 | sobol-z3
    # SH probe tracer semantics (reference: shader/sh_path_tracer.rgen
    # defines INDIRECT_CLAMP_FIRST_BOUNCE): indirect clamping applies at
    # bounce 0 too (path_tracer.glsl:422-427, 465-467)
    clamp_first_bounce: bool = False
    count_rays: bool = False           # emit useful-ray (alive-lane) counts
    # which texture slots (albedo, metallic-roughness, normal, emission)
    # are bound by ANY material — unbound slots compile to constants so
    # their atlas gathers (row-latency-bound) vanish from the program
    tex_slots: Tuple[bool, bool, bool, bool] = (True, True, True, True)
    tl_textured: bool = True           # any emissive tri with a texture


class PTOutput(NamedTuple):
    color: jnp.ndarray       # (R, 4)
    diffuse: jnp.ndarray     # (R, 4) demodulated
    reflection: jnp.ndarray  # (R, 4)
    first_albedo: jnp.ndarray      # (R, 4)
    first_normal: jnp.ndarray      # (R, 3)
    first_pos: jnp.ndarray         # (R, 3)
    first_screen_motion: jnp.ndarray  # (R, 3)
    first_instance: jnp.ndarray    # (R,) i32
    first_metallic_roughness: jnp.ndarray  # (R, 2)
    first_emission: jnp.ndarray    # (R, 3)
    useful_rays: Optional[jnp.ndarray] = None  # scalar, cfg.count_rays
    # (max_bounces-1,) i32: alive lanes ENTERING bounce b (b >= 1) — the
    # feedback signal for the next frame's compaction tier schedule
    live_counts: Optional[jnp.ndarray] = None


def draw_ray_sample(cfg: PTConfig, seed, coord, slot: int):
    """Per-bounce 4D sample (reference: shader/sampling.glsl
    generate_ray_sample_uint): uniform-random advances the pcg4d stream;
    Sobol variants use the sample index + pixel from `coord` and leave the
    pcg stream untouched, exactly like the reference's split sampler."""
    if cfg.sampler == "uniform-random" or slot < 0:
        return rng_ops.generate_uniform_random_uint(seed)
    from ..ops import sobol
    if cfg.sampler == "sobol-owen":
        pixel_seed = rng_ops.pcg4d(coord)
        r = sobol.sobol_owen_sample_uint(pixel_seed, coord[:, 3], slot)
        return seed, r
    # sobol-z2 / sobol-z3
    r = sobol.sobol_z_sample_uint(coord[:, :2], coord[:, 3], slot,
                                  bits_3d=cfg.sampler == "sobol-z3")
    return seed, r


def _mis_pdf_pair(cfg: PTConfig, a, b):
    if cfg.mis_mode == "power":
        return (a * a + b * b) / jnp.maximum(b, 1e-30)
    if cfg.mis_mode == "balance":
        return a + b
    return None


def bsdf_mis_pdf(cfg: PTConfig, scene, nee_point, nee_dir, nee_tri, nee_env,
                 bsdf_pdf):
    """(reference: shader/path_tracer.glsl bsdf_mis_pdf)"""
    w = cfg.nee
    avg_nee_pdf = (
        nee_dir * w.directional /
        jnp.maximum(scene.directional_light_count, 1) +
        nee_tri * w.triangle / jnp.maximum(scene.tri_light_count, 1) +
        nee_env * w.envmap +
        nee_point * w.point / jnp.maximum(scene.point_light_count, 1))
    if cfg.mis_mode == "power":
        res = (avg_nee_pdf ** 2 + bsdf_pdf ** 2) / jnp.maximum(bsdf_pdf, 1e-30)
    elif cfg.mis_mode == "balance":
        res = avg_nee_pdf + bsdf_pdf
    else:
        res = jnp.where(avg_nee_pdf > 0, jnp.inf, bsdf_pdf)
    return jnp.where(bsdf_pdf == 0.0, 1.0, res)


def nee_mis_pdf(cfg: PTConfig, nee_pdf, bsdf_pdf):
    """(reference: shader/path_tracer.glsl nee_mis_pdf). Negative nee_pdf
    flags delta lights."""
    if cfg.mis_mode == "power":
        res = (nee_pdf ** 2 + bsdf_pdf ** 2) / jnp.maximum(nee_pdf, 1e-30)
    elif cfg.mis_mode == "balance":
        res = nee_pdf + bsdf_pdf
    else:
        res = nee_pdf
    return jnp.where(nee_pdf <= 0.0, -nee_pdf, res)





def sample_explicit_light(cfg: PTConfig, scene: DeviceScene, rand_uint, pos):
    """(reference: shader/path_tracer.glsl sample_explicit_light).
    Returns (color, out_dir, out_length, pdf)."""
    R = pos.shape[0]
    u = rand_uint.astype(jnp.float32) * jnp.float32(rng_ops.INV_UINT32_MAX)
    w = cfg.nee
    uw = u[:, 3]
    pick_point = uw < w.point
    pick_tri = ~pick_point & (uw < w.point + w.triangle)
    pick_env = ~pick_point & ~pick_tri & (uw < w.point + w.triangle + w.envmap)
    pick_dir = ~pick_point & ~pick_tri & ~pick_env & \
        (uw < w.point + w.triangle + w.envmap + w.directional)

    color = jnp.zeros((R, 3), jnp.float32)
    out_dir = jnp.zeros((R, 3), jnp.float32)
    out_len = jnp.zeros(R, jnp.float32)
    pdf = jnp.ones(R, jnp.float32)

    if w.point > 0:
        lc = scene.point_light_count
        li = jnp.clip((u[:, 2] * lc).astype(jnp.int32), 0, lc - 1)
        weight = jnp.maximum(lc, 1).astype(jnp.float32)
        d, l, c, p = sample_point_light(scene, li, u[:, :2], pos)
        # prob/weight scales both area pdfs and delta markers (reference:
        # path_tracer.glsl `pdf *= point_prob / weight`)
        p = p * (w.point / weight)
        color = jnp.where(pick_point[:, None], c, color)
        out_dir = jnp.where(pick_point[:, None], d, out_dir)
        out_len = jnp.where(pick_point, l, out_len)
        pdf = jnp.where(pick_point, p, pdf)

    if w.triangle > 0:
        from ..scene.device import (TL_EMISSION, TL_POS, TL_TEX,
                                    TL_TEXBLOCK, TL_TEXSIZE, TL_UV)
        from ..ops.shading import sample_texture_quad
        lc = scene.tri_light_count
        li = jnp.clip((u[:, 2] * lc).astype(jnp.int32), 0, lc - 1)
        from ..ops.lights import row_lookup
        row = row_lookup(scene.tl_packed, li)      # one-hot for small tables
        A = row[:, TL_POS + 0:TL_POS + 3] - pos
        B = row[:, TL_POS + 3:TL_POS + 6] - pos
        C = row[:, TL_POS + 6:TL_POS + 9] - pos
        c = row[:, TL_EMISSION:TL_EMISSION + 3]
        d, tri_pdf = sample_triangle_light(u[:, :2], A, B, C,
                                           cfg.tri_light_mode)
        l = ray_plane_intersection_dist(d, A, B, C)
        bad = ~jnp.isfinite(tri_pdf) | (tri_pdf <= 0) | \
            (l <= cfg.min_ray_dist) | ~jnp.isfinite(d).all(-1)
        # textured emissive triangles (skipped at compile time when no
        # tri light binds an emission texture)
        if cfg.tl_textured:
            bary = get_barycentric_coords(d * l[:, None], A, B, C)
            uv = (row[:, TL_UV:TL_UV + 2] * bary[:, 0:1] +
                  row[:, TL_UV + 2:TL_UV + 4] * bary[:, 1:2] +
                  row[:, TL_UV + 4:TL_UV + 6] * bary[:, 2:3])
            tex = sample_texture_quad(
                scene, row[:, TL_TEX].astype(jnp.int32),
                row[:, TL_TEXSIZE:TL_TEXSIZE + 2], uv,
                block=row[:, TL_TEXBLOCK:TL_TEXBLOCK + 2])[:, :3]
            c = c * tex
        l = l - cfg.min_ray_dist
        p = w.triangle * tri_pdf / jnp.maximum(lc, 1)
        c = jnp.where(bad[:, None], 0.0, c)
        d = jnp.where(bad[:, None], 0.0, d)
        p = jnp.where(bad, 1.0, p)
        color = jnp.where(pick_tri[:, None], c, color)
        out_dir = jnp.where(pick_tri[:, None], d, out_dir)
        out_len = jnp.where(pick_tri, l, out_len)
        pdf = jnp.where(pick_tri, p, pdf)

    if w.envmap > 0:
        if cfg.has_envmap:
            c, d, l, p = sample_environment_map(scene, rand_uint[:, :3])
        else:
            d = __import__("tauray_tpu.ops.sampling",
                           fromlist=["sample_sphere"]).sample_sphere(u[:, :2])
            p = jnp.full(R, 1.0 / (4.0 * jnp.pi))
            c = jnp.broadcast_to(scene.env_factor[None, :3], (R, 3))
            l = jnp.full(R, RAY_MAX_DIST)
        p = p * w.envmap
        color = jnp.where(pick_env[:, None], c, color)
        out_dir = jnp.where(pick_env[:, None], d, out_dir)
        out_len = jnp.where(pick_env, l, out_len)
        pdf = jnp.where(pick_env, p, pdf)

    if w.directional > 0:
        lc = scene.directional_light_count
        li = jnp.clip((u[:, 2] * lc).astype(jnp.int32), 0, lc - 1)
        d, c, p = sample_directional_light(scene, li, u[:, :2])
        p = p * (w.directional / jnp.maximum(lc, 1))
        color = jnp.where(pick_dir[:, None], c, color)
        out_dir = jnp.where(pick_dir[:, None], d, out_dir)
        out_len = jnp.where(pick_dir, jnp.full(R, RAY_MAX_DIST), out_len)
        pdf = jnp.where(pick_dir, p, pdf)

    return color, out_dir, out_len, pdf


def _clamp_contribution(cfg: PTConfig, contrib):
    """(reference: shader/path_tracer.glsl clamp_contribution_mul)"""
    if cfg.indirect_clamping <= 0:
        return contrib
    m = rgb_to_luminance(contrib)
    mul = jnp.where(m > cfg.indirect_clamping,
                    cfg.indirect_clamping / jnp.maximum(m, 1e-30), 1.0)
    return contrib * mul[..., None]


def _correct_lobes_for_normal_map(sample_dir, geometric_normal,
                                  lobes: BSDFLobes) -> BSDFLobes:
    """(reference: shader/path_tracer.glsl correct_lobes_for_normal_map)"""
    below = jnp.sum(geometric_normal * sample_dir, -1) < 0
    z = jnp.zeros_like(lobes.diffuse)
    return BSDFLobes(
        transmission=jnp.where(below, lobes.transmission, z),
        diffuse=jnp.where(below, z, lobes.diffuse),
        dielectric_reflection=jnp.where(below, z,
                                        lobes.dielectric_reflection),
        metallic_reflection=jnp.where(below, z, lobes.metallic_reflection))


def next_event_estimation(cfg, scene, rand_uint, tbn, shading_view,
                          mat, v_pos, v_hard_normal, vis):
    """(reference: shader/path_tracer.glsl next_event_estimation).
    `vis` is the shadow visibility traced by the wavefront orchestrator.
    Returns (contrib, lobes)."""
    t, b, n = tbn
    contrib, out_dir, out_len, light_pdf = \
        sample_explicit_light(cfg, scene, rand_uint, v_pos)
    shading_light = jnp.stack([jnp.sum(out_dir * t, -1),
                               jnp.sum(out_dir * b, -1),
                               jnp.sum(out_dir * n, -1)], axis=-1)
    lobes, bsdf_pdf = material_bsdf_pdf(shading_light, shading_view, mat,
                                        cfg.bounce_mode)
    lobes = _correct_lobes_for_normal_map(out_dir, v_hard_normal, lobes)
    needs_ray = jnp.any(contrib > 0.0001, axis=-1)
    contrib = contrib * jnp.where(needs_ray, vis, 1.0)[:, None]
    contrib = contrib / jnp.maximum(
        nee_mis_pdf(cfg, light_pdf, bsdf_pdf), 1e-30)[:, None]
    return contrib, lobes


def _ray_visibility(view, mapped_normal, smooth_normal):
    """(reference: shader/path_tracer.glsl ray_visibility)"""
    h = mapped_normal + smooth_normal
    vh = jnp.sum(view * h, -1)
    nm = jnp.sum(mapped_normal * smooth_normal, -1)
    return jnp.where((1 - nm) * jnp.sum(h * h, -1) <= 2.0 * vh * vh, 1.0, 0.0)


def _shade_bounce(cfg: PTConfig, scene: DeviceScene, state, hit, vis,
                  b_idx, is_first: bool, max_bounces: int,
                  coord=None, sobol_bounce: int = -1):
    """Shading program for one bounce: consumes a precomputed closest hit
    and NEE shadow visibilities. Wavefront architecture: the traversal
    programs run separately (host-orchestrated), so this compiles once per
    (cfg, is_first) and is reused for every bounce and sample pass."""
    (seed, alpha_seed, pos, view, attenuation, bsdf_pdf, regularization,
     pl_t, pl_d, pl_dr, pl_mr, alive, diffuse, reflection) = state
    primary_lobes = BSDFLobes(pl_t, pl_d, pl_dr, pl_mr)
    R = pos.shape[0]

    if cfg.has_alpha_materials:
        alpha_seed = rng_ops.pcg4d(alpha_seed)  # mirrors the pre-trace draw
    safe_view = jnp.where(jnp.abs(view) < 1e-30,
                          jnp.array([0.0, 0, 1.0]), view)
    # point-light spheres (reference: rt_common_point_light.rint)
    see_lights = cfg.has_point_lights and \
        not (cfg.hide_lights and is_first) and not cfg.direct_only
    if see_lights:
        t_min = jnp.full(R, 0.0 if is_first else cfg.min_ray_dist,
                         jnp.float32)
        lt, lid = intersect_spheres(pos, safe_view, t_min, hit.t,
                                    scene.pl_pos, scene.pl_radius)
        light_hit = (lid >= 0) & (lt < hit.t)
    else:
        lid = jnp.full(R, -1, jnp.int32)
        light_hit = jnp.zeros(R, bool)
    tri_hit = (hit.tri_id >= 0) & ~light_hit
    miss = ~tri_hit & ~light_hit

    # ---- intersection info (reference: get_intersection_info) ---------
    # ONE tri_packed row gather serves interpolation, material constants,
    # emissive flag and NEE corner reads below — the column-indexed reads
    # this replaces each lowered to their OWN 1M-row gather from a
    # transposed table copy (~11 ms/wave each, hlo_stats fusion.35)
    from ..scene.device import IP_LIGHTBASE, TP_IP, TP_POS
    g_row = scene.tri_packed[jnp.maximum(hit.tri_id, 0)]
    # ray_origin: barycentrics recomputed from the gathered row — the
    # traversal ran with need_uv=False (no barycentric post-pass gather)
    v = interpolate_vertex(scene, hit.tri_id, hit.u, hit.v, safe_view,
                           ray_origin=pos, row=g_row)
    mat, v = sample_material(scene, v, slots=cfg.tex_slots, row=g_row)
    mat = mat._replace(albedo=jnp.concatenate(
        [mat.albedo[:, :3], jnp.ones((R, 1), jnp.float32)], axis=-1))

    inst = jnp.maximum(v.instance_id, 0)
    is_emissive_inst = g_row[:, TP_IP + IP_LIGHTBASE] >= 0

    nee_point = jnp.zeros(R, jnp.float32)
    nee_dir = jnp.zeros(R, jnp.float32)
    nee_tri = jnp.zeros(R, jnp.float32)
    nee_env = jnp.zeros(R, jnp.float32)
    light = jnp.zeros((R, 3), jnp.float32)
    emission = mat.emission

    if cfg.nee.triangle > 0:
        # corner positions from the shared tri_packed row gather
        gp = g_row
        tri_pdf = sample_triangle_light_pdf(
            v.pos - pos,
            gp[:, TP_POS + 0:TP_POS + 3] - pos,
            gp[:, TP_POS + 3:TP_POS + 6] - pos,
            gp[:, TP_POS + 6:TP_POS + 9] - pos,
            cfg.tri_light_mode)
        nee_tri = jnp.where(tri_hit & is_emissive_inst, tri_pdf, 0.0)
        light = jnp.where((tri_hit & is_emissive_inst)[:, None],
                          emission, light)
        emission = jnp.where((tri_hit & is_emissive_inst)[:, None],
                             0.0, emission)
    emission = jnp.where(tri_hit[:, None], emission, 0.0)
    light = jnp.where(tri_hit[:, None], light, 0.0)

    if see_lights:
        pl_col = point_light_radiance(scene, jnp.maximum(lid, 0), safe_view)
        if cfg.nee.point > 0:
            light = jnp.where(light_hit[:, None], pl_col, light)
            nee_point = jnp.where(
                light_hit,
                sample_point_light_pdf(scene, jnp.maximum(lid, 0), pos),
                nee_point)
        else:
            emission = jnp.where(light_hit[:, None], pl_col, emission)

    env_col, env_pdf = environment_radiance(scene, safe_view, cfg.has_envmap)
    dl_col, dl_pdf = directional_light_radiance(scene, safe_view)
    if cfg.nee.directional > 0:
        light = jnp.where(miss[:, None], light + dl_col, light)
        nee_dir = jnp.where(miss, dl_pdf, nee_dir)
    else:
        emission = jnp.where(miss[:, None], emission + dl_col, emission)
    if cfg.nee.envmap > 0:
        light = jnp.where(miss[:, None], light + env_col, light)
        nee_env = jnp.where(miss, env_pdf if cfg.has_envmap else 0.0, nee_env)
    else:
        emission = jnp.where(miss[:, None], emission + env_col, emission)

    terminal = ~tri_hit | (b_idx == max_bounces - 1)
    if cfg.direct_only and not is_first:
        # direct renderer: secondary rays must not see emitters
        light = jnp.zeros_like(light)
        emission = jnp.zeros_like(emission)

    # ---- MIS + emission accumulation ----------------------------------
    mis_pdf = bsdf_mis_pdf(cfg, scene, nee_point, nee_dir, nee_tri,
                           nee_env, bsdf_pdf)
    has_pdf = bsdf_pdf != 0
    attenuation = jnp.where(
        has_pdf[:, None],
        attenuation / jnp.maximum(bsdf_pdf, 1e-30)[:, None], attenuation)
    mis_weight = jnp.where(has_pdf,
                           bsdf_pdf / jnp.maximum(mis_pdf, 1e-30), 1.0)
    contrib = attenuation * mis_weight[:, None] * (emission + light)
    contrib = jnp.where(alive[:, None], contrib, 0.0)
    if not is_first or cfg.clamp_first_bounce:
        contrib = _clamp_contribution(cfg, contrib)
    d_new, r_new = add_demodulated_color(primary_lobes, contrib,
                                         diffuse[:, :3], reflection[:, :3])
    diffuse = jnp.concatenate([d_new, diffuse[:, 3:]], axis=-1)
    reflection = jnp.concatenate([r_new, reflection[:, 3:]], axis=-1)

    first = None
    if is_first:
        first = dict(
            vertex_pos=v.pos, vertex_prev_pos=v.prev_pos,
            mapped_normal=jnp.where(tri_hit[:, None], v.mapped_normal,
                                    -safe_view),
            instance_id=jnp.where(tri_hit, v.instance_id, -1),
            albedo=jnp.where(
                tri_hit[:, None], mat.albedo,
                jnp.where(light_hit[:, None],
                          jnp.array([0.0, 0, 0, 1.0]), 0.0)),
            metallic=jnp.where(tri_hit, mat.metallic, 1.0),
            roughness=jnp.where(tri_hit, mat.roughness, 1.0),
            emission=contrib, miss=miss, light_hit=light_hit)

    # ---- regularization ------------------------------------------------
    if cfg.regularization_gamma > 0:
        reg_mul = jnp.maximum(
            1 - cfg.regularization_gamma /
            jnp.maximum(bsdf_pdf, 1e-30) ** 0.25, 0.0)
        regularization = regularization * jnp.where(has_pdf, reg_mul, 1.0)
        mat = mat._replace(
            roughness=1.0 - (1.0 - mat.roughness) * regularization)

    t, b, n = create_tangent_space(v.mapped_normal)
    shading_view = view_to_tangent_space(safe_view, t, b, n)

    # ---- NEE ------------------------------------------------------------
    if cfg.nee.any:
        slot = -1 if sobol_bounce < 0 else sobol_bounce * 2
        seed, rand = draw_ray_sample(cfg, seed, coord, slot)
        if cfg.has_alpha_materials:
            alpha_seed = rng_ops.pcg4d(alpha_seed)  # mirrors NEE shadow draw
        radiance, nee_lobes = next_event_estimation(
            cfg, scene, rand, (t, b, n), shading_view, mat,
            v.pos, v.hard_normal, vis)
        radiance = attenuation * radiance
        active_nee = alive & ~terminal
        if not is_first:
            radiance = radiance * modulate_bsdf(mat, nee_lobes)
            radiance = _clamp_contribution(cfg, radiance)
        else:
            primary_lobes = BSDFLobes(*(
                jnp.where(active_nee, n_, p_)
                for n_, p_ in zip(nee_lobes, primary_lobes)))
            if cfg.clamp_first_bounce:
                radiance = _clamp_contribution(cfg, radiance)
        radiance = jnp.where(active_nee[:, None], radiance, 0.0)
        d_new, r_new = add_demodulated_color(
            primary_lobes, radiance, diffuse[:, :3], reflection[:, :3])
        diffuse = jnp.concatenate([d_new, diffuse[:, 3:]], axis=-1)
        reflection = jnp.concatenate([r_new, reflection[:, 3:]], axis=-1)
        if not is_first:
            # bounce 1 stores 1/first-segment-length in alpha for denoisers
            set_a = active_nee & (b_idx == 1)
            inv_dist = 1.0 / jnp.maximum(
                jnp.linalg.norm(v.pos - pos, axis=-1), 1e-30)
            a = jnp.where(set_a, inv_dist, diffuse[:, 3])
            diffuse = jnp.concatenate([diffuse[:, :3], a[:, None]], axis=-1)
            reflection = jnp.concatenate([reflection[:, :3], a[:, None]],
                                         axis=-1)
    else:
        seed, _ = rng_ops.generate_uniform_random_uint(seed)

    alive = alive & ~terminal

    # ---- next bounce -----------------------------------------------------
    slot2 = -1 if sobol_bounce < 0 else sobol_bounce * 2 + 1
    seed, rand = draw_ray_sample(cfg, seed, coord, slot2)
    ray_sample = rand.astype(jnp.float32) * \
        jnp.float32(rng_ops.INV_UINT32_MAX)
    out_dir_ts, lobes, new_bsdf_pdf = material_bsdf_sample(
        ray_sample, shading_view, mat, cfg.bounce_mode)
    new_view = from_tangent_space(out_dir_ts, t, b, n)
    lobes = _correct_lobes_for_normal_map(v.hard_normal, new_view, lobes)

    if not is_first:
        attenuation = jnp.where(alive[:, None],
                                attenuation * modulate_bsdf(mat, lobes),
                                attenuation)
    else:
        primary_lobes = BSDFLobes(*(
            jnp.where(alive, n_, p_)
            for n_, p_ in zip(lobes, primary_lobes)))

    bsdf_pdf = jnp.where(alive, new_bsdf_pdf, bsdf_pdf)
    pos = jnp.where(alive[:, None], v.pos, pos)
    view = jnp.where(alive[:, None], new_view, view)

    if cfg.russian_roulette_delta > 0:
        # Unbiased Russian roulette: survivors are reweighted by 1/qi.
        # Two deviations from the reference (shader/path_tracer.glsl:
        # 489-496), both bias fixes: (1) the reference computes
        # `visibility /= qi` into a dead local, so its RR is silently
        # biased dark; (2) it tests ray_sample.w, which the diffuse lobe
        # sampler also consumes (shader/ggx.glsl:323), correlating
        # survival with the outgoing direction. We reweight survivors and
        # use an independent decision draw.
        qi = min(1.0, 1.0 / cfg.russian_roulette_delta)
        seed, rr_rand = rng_ops.generate_uniform_random_uint(seed)
        alive = alive & (rng_ops.uint_to_float(rr_rand[:, 0]) <= qi)
        attenuation = jnp.where(alive[:, None], attenuation / qi,
                                attenuation)
    alive = alive & (jnp.max(attenuation, axis=-1) > 0.0)

    state = (seed, alpha_seed, pos, view, attenuation, bsdf_pdf,
             regularization, *primary_lobes, alive, diffuse, reflection)
    return state, first


_shade_jit = None


def _get_shade_jit():
    global _shade_jit
    if _shade_jit is None:
        _shade_jit = jax.jit(
            _shade_bounce,
            static_argnames=("cfg", "is_first", "max_bounces",
                             "sobol_bounce"))
    return _shade_jit


@partial(jax.jit, static_argnames=("cfg", "slot"))
def _nee_prep(cfg: PTConfig, scene: DeviceScene, seed, alpha_seed, hit,
              pos, view, coord, slot: int):
    """Small program producing NEE shadow rays for the wavefront
    orchestrator. Redraws the same RNG values the shade program will."""
    safe_view = jnp.where(jnp.abs(view) < 1e-30,
                          jnp.array([0.0, 0, 1.0]), view)
    v = interpolate_vertex(scene, hit.tri_id, hit.u, hit.v, safe_view,
                           ray_origin=pos)
    _, rand = draw_ray_sample(cfg, seed, coord, slot)
    _, out_dir, out_len, _ = sample_explicit_light(cfg, scene, rand, v.pos)
    if cfg.has_alpha_materials:
        a2 = rng_ops.pcg4d(alpha_seed)
        nee_alpha_u = rng_ops.uint_to_float(a2[:, 0])
    else:
        nee_alpha_u = jnp.zeros(pos.shape[0], jnp.float32)
    safe_dir = jnp.where(jnp.abs(out_dir) < 1e-30,
                         jnp.array([0.0, 0, 1.0]), out_dir)
    return v.pos, safe_dir, out_len, nee_alpha_u


@partial(jax.jit, static_argnames=())
def _advance_alpha(alpha_seed):
    import os
    a2 = rng_ops.pcg4d(alpha_seed)
    u = rng_ops.uint_to_float(a2[:, 0])
    f = os.environ.get("TAURAY_ALPHA_FORCE")
    if f is not None:
        u = jnp.full_like(u, float(f))
    return u


@partial(jax.jit, static_argnames=("has_alpha", "any_hit", "rounds",
                                   "sort", "need_uv"))
def _trace_alpha_program(scene: DeviceScene, tracer, o, d, t_min, t_max,
                         alpha_u, has_alpha: bool, any_hit: bool = False,
                         rounds: int = 4, sort: bool = False,
                         need_uv: bool = False):
    """Alpha-tested trace as ONE device program: a `while_loop` services
    transparent hits only while any ray actually needs it — device-side
    early exit, zero host syncs (the tunnel round-trip would otherwise
    serialize every bounce).

    Work-proportional alpha handling, two layers:
      * the traversal kernel's hit ids ARE the transparency test:
        build_cluster_tracer segregates alpha-capable triangles into the
        tail clusters, so `trace_flagged` marks "might be transparent"
        hits arithmetically — the full-width material/texture alpha
        fetch that used to run after EVERY trace (measured ~12% of
        frame device time) is gone entirely;
      * flagged rays are serviced COMPACTED: each round gathers them to
        the front (one argsort over a bool), alpha-tests and re-traces a
        fixed CAP-ray sub-wave, and scatters results back; rays beyond
        CAP stay pending for later rounds. A wave that hits no
        alpha-capable triangle skips the loop at the cost of one
        compare."""
    R = o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    if not has_alpha:
        return tracer.trace(o, d, t_min, t_max, any_hit=any_hit,
                            sort_rays=sort, need_uv=need_uv)
    hit, pending0 = tracer.trace_flagged(o, d, t_min, t_max,
                                         any_hit=any_hit, sort_rays=sort,
                                         need_uv=need_uv)
    cutoff = jnp.broadcast_to(jnp.asarray(alpha_u, jnp.float32), (R,))

    def needs_work(carry):
        k, t, tri_id, u, v, pending, _ = carry
        return jnp.any(pending) & (k < rounds)

    quantum = 8192
    # cap sized to the observed alpha-pending population (~1-3% of a
    # wave on test.glb): R//32 keeps the per-round compaction gather +
    # scatter ~4x cheaper than the round-3 R//8 while still servicing a
    # full wave's pending set within the round budget
    cap = min(R, max(quantum, (R // 32) // quantum * quantum))

    # TPU gathers/scatters are row-latency-bound and WIDTH-FREE up to
    # ~128 cols (scripts/gather_lab.py: 1 col 7.5 ms/1M rows, 128
    # cols 11.2 ms), so the per-round compaction moves ONE wide packed
    # row per ray instead of nine scalar columns, and writes results
    # back with ONE packed scatter. The pack is INT32: triangle ids
    # bitcast through float are denormal/NaN bit patterns that TPU f32
    # scatters flush/canonicalize (the sorted-trace scatter measurably
    # corrupted ids this way; ADVICE r3) — int moves are bit-exact, so
    # every float column rides as its bitcast int.
    def asi(x):
        return jax.lax.bitcast_convert_type(
            jnp.asarray(x, jnp.float32), jnp.int32)

    def asf(x):
        return jax.lax.bitcast_convert_type(x, jnp.float32)

    ray_pack = asi(jnp.concatenate([
        o, d, cutoff[:, None], t_max[:, None]], axis=1))     # (R, 8) static

    def body(carry):
        k, t, tri_id, u, v, pending, tmin_c = carry
        # compaction of pending rays to the front. Fixed-size nonzero
        # (cumsum + scatter) was tried and measured SLOWER than the
        # bool argsort at 1M rays (the cumsum costs ~10 ms/round vs the
        # sort's ~9 and adds a scatter) — TPU sorts are fast enough
        # that sort-based compaction wins.
        idx = jnp.argsort(~pending, stable=True)[:cap]
        state = jnp.concatenate([
            asi(t)[:, None], asi(u)[:, None], asi(v)[:, None],
            asi(tmin_c)[:, None], tri_id[:, None],
            pending.astype(jnp.int32)[:, None], ray_pack], axis=1)
        s = state[idx]                                       # (cap, 14)
        t_s, u_s, v_s, tmin_s = (asf(s[:, 0]), asf(s[:, 1]),
                                 asf(s[:, 2]), asf(s[:, 3]))
        tri_s = s[:, 4]
        p_s = s[:, 5] > 0
        o_s, d_s = asf(s[:, 6:9]), asf(s[:, 9:12])
        cut_s, tmax_s = asf(s[:, 12]), asf(s[:, 13])
        # alpha test (uv interp + texture fetch) on the sub-wave only
        skip_s, ntmin_s, _ = _alpha_skip_impl(
            scene, t_s, tri_s, u_s, v_s, cut_s,
            tmin_s, o=o_s, d=d_s, recompute_uv=not need_uv)
        skip_s = skip_s & p_s
        re_tmax = jnp.where(skip_s, tmax_s, 0.0)
        rehit, reflag = tracer.trace_flagged(o_s, d_s, ntmin_s,
                                             re_tmax, any_hit=any_hit,
                                             need_uv=need_uv)
        st = jnp.where(skip_s, rehit.t, t_s)
        stri = jnp.where(skip_s, rehit.tri_id, tri_s)
        su = jnp.where(skip_s, rehit.u, u_s)
        sv = jnp.where(skip_s, rehit.v, v_s)
        # serviced rays stay pending only when the re-trace hit another
        # alpha-capable triangle; unserviced (beyond CAP) keep pending=1
        sp = skip_s & reflag
        out = jnp.stack([
            asi(st), asi(su), asi(sv), asi(ntmin_s), stri,
            sp.astype(jnp.int32)], axis=1)                   # (cap, 6)
        back = jnp.concatenate([
            asi(t)[:, None], asi(u)[:, None], asi(v)[:, None],
            asi(tmin_c)[:, None], tri_id[:, None],
            pending.astype(jnp.int32)[:, None]], axis=1).at[idx].set(out)
        t, u, v, tmin_c = (asf(back[:, 0]), asf(back[:, 1]),
                           asf(back[:, 2]), asf(back[:, 3]))
        tri_id = back[:, 4]
        pending = back[:, 5] > 0
        return (k + 1, t, tri_id, u, v, pending, tmin_c)

    carry = (jnp.int32(0), hit.t, hit.tri_id, hit.u, hit.v, pending0, t_min)
    carry = jax.lax.while_loop(needs_work, body, carry)
    from ..ops.intersect import Hit
    return Hit(carry[1], carry[2], carry[3], carry[4])


def _alpha_skip_impl(scene, t, tri_id, u, v, cutoff, t_min, o=None,
                     d=None, recompute_uv: bool = False):
    """One tri row + one inst row + one texture block gather.
    recompute_uv: barycentrics from the gathered row + ray (pairs with
    need_uv=False traces)."""
    from ..scene.device import (IP_ALBEDO, IP_HASALPHA, IP_TEX,
                                IP_TEXBLOCK, IP_TEXSIZE, TP_IP, TP_UV)
    from ..ops.shading import bary_from_row, sample_texture_quad
    valid = tri_id >= 0
    g = scene.tri_packed[jnp.maximum(tri_id, 0)]
    m = g[:, TP_IP:]
    may_skip = valid & (m[:, IP_HASALPHA] > 0.5)
    if recompute_uv:
        u, v = bary_from_row(g, o, d)
    b0 = (1.0 - u - v)[:, None]
    uv = (g[:, TP_UV:TP_UV + 2] * b0 +
          g[:, TP_UV + 2:TP_UV + 4] * u[:, None] +
          g[:, TP_UV + 4:TP_UV + 6] * v[:, None])
    tex_a = sample_texture_quad(
        scene, m[:, IP_TEX].astype(jnp.int32),
        m[:, IP_TEXSIZE:IP_TEXSIZE + 2], uv,
        block=m[:, IP_TEXBLOCK:IP_TEXBLOCK + 2])[:, 3]
    alpha = m[:, IP_ALBEDO + 3] * tex_a
    skip = may_skip & (alpha <= cutoff)
    new_tmin = jnp.where(skip, t * (1 + 1e-5) + 1e-6, t_min)
    return skip, new_tmin, jnp.any(skip)


def host_trace_alpha(scene, tracer, o, d, t_min, t_max, alpha_u,
                     has_alpha: bool, any_hit: bool = False,
                     rounds: int = 6, sort: bool = False,
                     need_uv: bool = False):
    return _trace_alpha_program(scene, tracer, o, d, t_min, t_max, alpha_u,
                                has_alpha, any_hit, rounds, sort, need_uv)


def _run_bounce(cfg: PTConfig, scene: DeviceScene, tracer, state, b_idx,
                is_first: bool, max_bounces: int, coord=None):
    (seed, alpha_seed, pos, view) = state[0], state[1], state[2], state[3]
    alive = state[11]
    sobol_bounce = -1 if cfg.sampler == "uniform-random" else int(b_idx)
    R = pos.shape[0]
    if cfg.has_alpha_materials:
        alpha_u = _advance_alpha(alpha_seed)
    else:
        alpha_u = 0.0
    t_min = 0.0 if is_first else cfg.min_ray_dist
    t_max = jnp.where(alive, RAY_MAX_DIST, 0.0)
    # Ray sorting: bounce/shadow waves sort by the ACTIVE-SET signature
    # key (ops/cluster._sig_sort_key) — one packed gather in, one packed
    # scatter out, 3-5x fewer tile-union cluster activations; camera
    # waves keep pixel-block order (already 2.2 activations/tile).
    # (Round-3's corridor key was a net loss; the signature key's
    # far-stronger grouping flipped the trade — scripts/sortsig_lab.py.)
    if _WAVE_DUMP is not None:              # perf-lab capture, dev only
        _WAVE_DUMP.append(("bounce", pos, view, t_min, t_max))
    _sort_env = os.environ.get("TAURAY_WAVE_SORT", "1") == "1"
    hit = host_trace_alpha(scene, tracer, pos, view, t_min, t_max,
                           alpha_u, cfg.has_alpha_materials,
                           sort=(not is_first) and _sort_env)
    useful = jnp.sum(t_max > 0.0) if cfg.count_rays else None
    if cfg.nee.any and int(b_idx) < max_bounces - 1:
        slot = -1 if sobol_bounce < 0 else sobol_bounce * 2
        sh_o, sh_d, sh_len, nee_alpha_u = _nee_prep(
            cfg, scene, seed, alpha_seed, hit, pos, view, coord, slot)
        sh_len = jnp.where(alive & (hit.tri_id >= 0), sh_len, 0.0)
        if _WAVE_DUMP is not None:          # perf-lab capture, dev only
            _WAVE_DUMP.append(("shadow", sh_o, sh_d, cfg.min_ray_dist,
                               sh_len))
        sh = host_trace_alpha(scene, tracer, sh_o, sh_d, cfg.min_ray_dist,
                              sh_len, nee_alpha_u, cfg.has_alpha_materials,
                              any_hit=True, sort=_sort_env)
        vis = jnp.where(sh.tri_id < 0, 1.0, 0.0)
        if cfg.count_rays:
            useful = useful + jnp.sum(sh_len > 0.0)
    else:
        vis = jnp.ones(R, jnp.float32)
    state, first = _get_shade_jit()(cfg, scene, state, hit, vis,
                                    jnp.int32(b_idx), is_first, max_bounces,
                                    coord, sobol_bounce)
    return state, first, useful


# ---------------------------------------------------------------------------
# Between-bounce dead-lane compaction.
#
# Dead lanes cost almost nothing in the traversal kernel (zero t_max =>
# zero active clusters => the streamed kernel skips them), but every
# OTHER per-lane cost — phase-1 slab culling, the signature sort, NEE
# prep, shading gathers and BSDF math — is paid for all R lanes. When
# few rays remain alive, the whole bounce (trace + NEE + shadow + shade)
# runs on a COMPACTED prefix instead:
#
#   * the path state packs into ONE (R, 37) int32 matrix (floats/uints
#     ride as bitcast int32 — bit-exact through gathers/scatters, the
#     same trick as the alpha re-trace rounds above);
#   * one stable argsort over ~alive moves live rays to the front; the
#     bounce runs on rows [0:cap); one scatter un-permutes;
#   * cap is a STATIC tier (R/2, R/4, R/8) chosen by the renderer from
#     the PREVIOUS frame's live counts (alive is monotone non-increasing
#     over bounces, and counts are stable across frames at 1M-lane
#     statistics). EXACTNESS does not depend on the prediction: a
#     lax.cond falls back to the full-width bounce whenever the actual
#     live count exceeds the tier, so a mispredicted schedule costs
#     speed, never correctness.
# ---------------------------------------------------------------------------

def _state_mat_pack(state, coord):
    """(state, coord) -> (R, 37) int32 (every column a bitcast int32)."""
    def asi(x):
        x = jnp.asarray(x)
        if x.dtype == jnp.bool_:
            x = x.astype(jnp.int32)
        elif x.dtype != jnp.int32:
            x = jax.lax.bitcast_convert_type(x, jnp.int32)
        return x if x.ndim == 2 else x[:, None]
    cols = [asi(x) for x in state] + [asi(coord)]
    return jnp.concatenate(cols, axis=1)


def _state_mat_unpack(mat):
    """Inverse of _state_mat_pack."""
    def f32(sl):
        return jax.lax.bitcast_convert_type(sl, jnp.float32)

    def u32(sl):
        return jax.lax.bitcast_convert_type(sl, jnp.uint32)
    state = (
        u32(mat[:, 0:4]),            # sampler seed
        u32(mat[:, 4:8]),            # alpha seed
        f32(mat[:, 8:11]),           # pos
        f32(mat[:, 11:14]),          # view
        f32(mat[:, 14:17]),          # attenuation
        f32(mat[:, 17]),             # bsdf_pdf
        f32(mat[:, 18]),             # regularization
        f32(mat[:, 19]), f32(mat[:, 20]),
        f32(mat[:, 21]), f32(mat[:, 22]),   # primary lobes
        mat[:, 23] > 0,              # alive
        f32(mat[:, 24:28]),          # diffuse
        f32(mat[:, 28:32]),          # reflection
    )
    coord = u32(mat[:, 32:36])
    return state, coord


def _run_bounce_capped(cfg: PTConfig, scene: DeviceScene, tracer, state,
                       b_idx, max_bounces: int, coord, cap: int):
    """Bounce b_idx (>= 1) at static width `cap` when the live count
    allows it, else full width. Returns (state, useful)."""
    alive = state[11]
    R = alive.shape[0]
    live = jnp.sum(alive)

    def z(u):
        return u if u is not None else jnp.int32(0)

    def compact_branch(args):
        state, coord = args
        mat = _state_mat_pack(state, coord)
        perm = jnp.argsort(~alive, stable=True)
        matp = mat[perm]
        st_p, coord_p = _state_mat_unpack(matp[:cap])
        st_o, _, useful = _run_bounce(cfg, scene, tracer, st_p, b_idx,
                                      False, max_bounces, coord_p)
        out = _state_mat_pack(st_o, coord_p)
        matp = jax.lax.dynamic_update_slice(matp, out, (0, 0))
        mat2 = jnp.zeros_like(matp).at[perm].set(matp)
        st2, _ = _state_mat_unpack(mat2)
        return st2, z(useful)

    def full_branch(args):
        state, coord = args
        st, _, useful = _run_bounce(cfg, scene, tracer, state, b_idx,
                                    False, max_bounces, coord)
        return st, z(useful)

    st, useful = jax.lax.cond(live <= cap, compact_branch, full_branch,
                              (state, coord))
    return st, useful if cfg.count_rays else None


def evaluate_ray(cfg: PTConfig, scene: DeviceScene, bvh: DeviceBVH,
                 sampler_seed, pos, view, coord=None, bounce_caps=None):
    """One path per ray (reference: shader/path_tracer.glsl evaluate_ray).

    Wavefront orchestration: per bounce, a closest-hit wave, an NEE shadow
    wave, and a shading program — all small, individually-compiled, reused
    programs. Dead-ray early exit via one host sync per bounce.
    bounce_caps: optional static per-bounce compaction tiers (see
    _run_bounce_capped); bounce_caps[b] >= R disables for that bounce.
    Returns (diffuse (R,4), reflection (R,4), first-hit dict, useful,
    live_counts)."""
    R = pos.shape[0]
    z = jnp.zeros(R, jnp.float32)
    state = (
        sampler_seed,
        rng_ops.pcg4d(sampler_seed),          # stochastic-alpha stream
        pos, view,
        jnp.ones((R, 3), jnp.float32),        # attenuation
        z,                                    # bsdf_pdf
        jnp.ones(R, jnp.float32),             # regularization
        # primary lobes init to ZERO (reference: bsdf_lobes(0,0,0,0)) so
        # bounce-0 emission reaches the image only via first_hit.emission,
        # never the demodulated channels — nonzero init double-counts
        # every primary-visible emitter
        z, z, z, z,                           # primary lobes (t, d, dr, mr)
        jnp.ones(R, bool),                    # alive
        jnp.zeros((R, 4), jnp.float32),       # diffuse
        jnp.zeros((R, 4), jnp.float32),       # reflection
    )
    max_bounces = 2 if cfg.direct_only else cfg.max_bounces

    state, first, useful = _run_bounce(cfg, scene, bvh, state, 0, True,
                                       max_bounces, coord)
    live_counts = []
    for b_idx in range(1, max_bounces):
        # no host-side alive check: it would block the async dispatch
        # pipeline; dead lanes are COMPACTED when the renderer's tier
        # schedule (fed by the previous frame's live counts) says the
        # bounce fits a smaller static width, masked otherwise
        live_counts.append(jnp.sum(state[11], dtype=jnp.int32))
        cap = R if bounce_caps is None else min(int(bounce_caps[b_idx]), R)
        if cap < R:
            state, u = _run_bounce_capped(cfg, scene, bvh, state, b_idx,
                                          max_bounces, coord, cap)
        else:
            state, _, u = _run_bounce(cfg, scene, bvh, state, b_idx, False,
                                      max_bounces, coord)
        if cfg.count_rays:
            useful = useful + u
    diffuse = state[-2]
    reflection = state[-1]
    lc = (jnp.stack(live_counts) if live_counts
          else jnp.zeros((0,), jnp.int32))
    return diffuse, reflection, first, useful, lc


def evaluate_ray_inline(cfg: PTConfig, scene: DeviceScene, bvh,
                        sampler_seed, pos, view, coord=None):
    """Fully-jittable variant of evaluate_ray (fixed alpha rounds, no host
    syncs) for use inside `shard_map` / multi-chip programs."""
    from ..ops.trace_utils import trace_alpha
    R = pos.shape[0]
    z = jnp.zeros(R, jnp.float32)
    state = (
        sampler_seed, rng_ops.pcg4d(sampler_seed), pos, view,
        jnp.ones((R, 3), jnp.float32), z, jnp.ones(R, jnp.float32),
        z, z, z, z, jnp.ones(R, bool),
        jnp.zeros((R, 4), jnp.float32), jnp.zeros((R, 4), jnp.float32))
    max_bounces = 2 if cfg.direct_only else cfg.max_bounces
    first = None
    for b_idx in range(max_bounces):
        is_first = b_idx == 0
        seed, alpha_seed, cur_pos, cur_view = state[:4]
        alive = state[11]
        if cfg.has_alpha_materials:
            alpha_u = _advance_alpha(alpha_seed)
        else:
            alpha_u = jnp.zeros(R, jnp.float32)
        t_min = 0.0 if is_first else cfg.min_ray_dist
        # dead lanes keep stale ray state; zero t_max resolves them in one
        # kernel step instead of re-tracing the same ray every bounce
        t_max = jnp.where(alive, RAY_MAX_DIST, 0.0)
        hit = trace_alpha(scene, bvh, cur_pos, cur_view,
                          jnp.full(R, t_min, jnp.float32),
                          t_max, alpha_u, cfg.has_alpha_materials,
                          need_uv=False, sort=not is_first)
        # NEE is statically inactive at the final path vertex
        # (terminal => active_nee false in _shade_bounce), so the last
        # bounce's shadow wave is skipped entirely
        if cfg.nee.any and b_idx < max_bounces - 1:
            sobol_b = -1 if cfg.sampler == "uniform-random" else b_idx
            slot = -1 if sobol_b < 0 else sobol_b * 2
            sh_o, sh_d, sh_len, nee_alpha_u = _nee_prep(
                cfg, scene, seed, alpha_seed, hit, cur_pos, cur_view,
                coord, slot)
            sh_len = jnp.where(alive & (hit.tri_id >= 0), sh_len, 0.0)
            sh = trace_alpha(scene, bvh, sh_o, sh_d,
                             jnp.full(R, cfg.min_ray_dist, jnp.float32),
                             sh_len, nee_alpha_u, cfg.has_alpha_materials,
                             any_hit=True, need_uv=False, sort=True)
            vis = jnp.where(sh.tri_id < 0, 1.0, 0.0)
        else:
            vis = jnp.ones(R, jnp.float32)
        sobol_b = -1 if cfg.sampler == "uniform-random" else b_idx
        state, fh = _shade_bounce(cfg, scene, state, hit, vis,
                                  jnp.int32(b_idx), is_first, max_bounces,
                                  coord, sobol_b)
        if is_first:
            first = fh
    return state[-2], state[-1], first


def pt_trace_pass_inline(cfg: PTConfig, scene: DeviceScene, bvh,
                        cam: CameraUniforms, prev_cam: CameraUniforms,
                        pix_pos, vp, previous_samples):
    """Jittable single-pass color (multi-chip path); same wave batching
    as pt_trace_pass — all samples_per_pass samples in ONE wavefront."""
    R = pix_pos.shape[0]
    S = cfg.samples_per_pass
    if S == 1:
        pix_b, vp_b, prev_b = pix_pos, vp, previous_samples
    else:
        pix_b = jnp.repeat(pix_pos, S, axis=0)
        vp_b = jnp.repeat(vp, S, axis=0)
        prev_b = jnp.repeat(previous_samples, S, axis=0) + \
            jnp.tile(jnp.arange(S, dtype=previous_samples.dtype), R)
    seed, origin, d, coord = _begin_sample(cfg, cam, pix_b, vp_b, prev_b)
    diffuse, refl, fh = evaluate_ray_inline(cfg, scene, bvh, seed,
                                            origin, d, coord)
    color, _ = _finalize_sample(
        cfg, prev_cam, vp_b, diffuse, refl, fh["albedo"], fh["metallic"],
        fh["emission"], fh["vertex_prev_pos"])
    if S > 1:
        color = color.reshape(R, S, 3).mean(axis=1)
        alpha0 = fh["albedo"][::S, 3]
    else:
        alpha0 = fh["albedo"][:, 3]
    if cfg.transparent_background:
        alpha = alpha0
    else:
        alpha = jnp.ones(R, jnp.float32)
    return jnp.concatenate([color, alpha[:, None]], axis=-1)


def _film_offset(cfg: PTConfig, seed):
    """Film filter AA offset in [-1, 1] units (reference:
    shader/path_tracer.glsl get_world_camera_ray)."""
    if cfg.film == "point":
        return seed, None
    seed, rand = rng_ops.generate_uniform_random_uint(seed)
    u = rng_ops.uint_to_float(rand[..., :2])
    if cfg.film == "box":
        off = u * 2.0 - 1.0
    else:  # blackman-harris
        off = sample_blackman_harris_concentric_disk(u) * 2.0
    return seed, off * (2.0 * cfg.film_radius)


@partial(jax.jit, static_argnames=("cfg",))
def _begin_sample(cfg: PTConfig, cam: CameraUniforms, pix_pos, vp,
                  prev_plus_i):
    """Sampler init + film/DoF sampling + camera ray generation
    (reference: shader/path_tracer.rgen main + get_world_camera_ray)."""
    size = jnp.array([cfg.width, cfg.height], jnp.float32)
    rng_seed_hash = 0
    if cfg.rng_seed != 0:
        import numpy as _np
        s = _np.uint32(cfg.rng_seed)
        s = s * _np.uint32(747796405) + _np.uint32(2891336453)
        s = ((s >> _np.uint32((s >> _np.uint32(28)) + _np.uint32(4))) ^ s) \
            * _np.uint32(277803737)
        rng_seed_hash = int((s >> _np.uint32(22)) ^ s)
    coord = jnp.stack([
        pix_pos[:, 0].astype(jnp.uint32),
        pix_pos[:, 1].astype(jnp.uint32),
        # rng_seed_hash is a full uint32; add in uint32 to avoid int32
        # overflow when parsing the Python literal
        vp.astype(jnp.uint32) + jnp.uint32(rng_seed_hash),
        prev_plus_i.astype(jnp.uint32)], axis=-1)
    seed = rng_ops.init_random_sampler(coord)
    seed, film_off = _film_offset(cfg, seed)
    if cfg.use_dof:
        seed, rand = rng_ops.generate_uniform_random_uint(seed)
        dof_u = rng_ops.uint_to_float(rand[..., :2])
    else:
        dof_u = None
    origin, d = get_screen_camera_ray(cam, vp, pix_pos, size,
                                      pixel_offset=film_off, dof_u=dof_u)
    # payload.random_seed draw (reference: evaluate_ray first line)
    seed, _ = rng_ops.generate_uniform_random_uint(seed)
    return seed, origin, d, coord


@partial(jax.jit, static_argnames=("cfg",))
def _finalize_sample(cfg: PTConfig, prev_cam: CameraUniforms, vp, diffuse,
                     refl, fh_albedo, fh_metallic, fh_emission,
                     fh_prev_pos):
    """Per-sample color modulation (reference: shader/path_tracer.rgen
    sum_color) + screen motion projection."""
    from ..ops.shading import get_camera_projection
    R = diffuse.shape[0]
    if cfg.use_white_albedo_on_first_bounce:
        albedo = jnp.concatenate(
            [jnp.ones((R, 3), jnp.float32), fh_albedo[:, 3:]], axis=-1)
    else:
        albedo = fh_albedo

    class _M:
        pass
    m = _M()
    m.albedo = albedo
    m.metallic = fh_metallic
    color = fh_emission + modulate_color(m, diffuse[:, :3], refl[:, :3])
    screen_motion = get_camera_projection(prev_cam, vp, fh_prev_pos)
    return color, screen_motion


def pt_trace_pass(cfg: PTConfig, scene: DeviceScene, bvh: DeviceBVH,
                  cam: CameraUniforms, prev_cam: CameraUniforms,
                  pix_pos, vp, previous_samples,
                  bounce_caps=None) -> PTOutput:
    """One pass of `samples_per_pass` samples per pixel, averaged
    (reference: shader/path_tracer.rgen main).

    WAVE BATCHING: all `samples_per_pass` samples trace as ONE wavefront
    of R*S rays (pixel-major interleave, so a 32-ray traversal tile covers
    only ceil(32/S) adjacent pixels of camera rays — a tighter footprint
    than one-sample waves). Large waves amortize the per-dispatch link
    latency and every per-wave fixed cost (phase-1 cull, sorts, gather op
    overhead) across S samples; results are bit-identical to the
    sample-at-a-time loop because every RNG stream is keyed on
    (pixel, viewport, sample index), never on wave shape."""
    R = pix_pos.shape[0]
    S = cfg.samples_per_pass
    if S == 1:
        pix_b, vp_b, prev_b = pix_pos, vp, previous_samples
    else:
        pix_b = jnp.repeat(pix_pos, S, axis=0)
        vp_b = jnp.repeat(vp, S, axis=0)
        prev_b = jnp.repeat(previous_samples, S, axis=0) + \
            jnp.tile(jnp.arange(S, dtype=previous_samples.dtype), R)

    seed, origin, d, coord = _begin_sample(cfg, cam, pix_b, vp_b, prev_b)
    diffuse, refl, fh, useful, live_counts = evaluate_ray(
        cfg, scene, bvh, seed, origin, d, coord, bounce_caps=bounce_caps)
    color, screen_motion = _finalize_sample(
        cfg, prev_cam, vp_b, diffuse, refl, fh["albedo"], fh["metallic"],
        fh["emission"], fh["vertex_prev_pos"])

    if S == 1:
        sum_color, sum_diffuse, sum_reflection = color, diffuse, refl
        first, first_motion = fh, screen_motion
    else:
        def mean_s(x):
            return x.reshape(R, S, -1).mean(axis=1)

        sum_color = mean_s(color)
        sum_diffuse = mean_s(diffuse)
        sum_reflection = mean_s(refl)
        # first-hit G-buffer comes from sample 0, matching the
        # sample-at-a-time loop (sample 0 of pixel r sits at row r*S)
        first = {k: v[::S] for k, v in fh.items()}
        first_motion = screen_motion[::S]

    if cfg.transparent_background:
        alpha = first["albedo"][:, 3]
    else:
        alpha = jnp.ones(R, jnp.float32)

    return PTOutput(
        color=jnp.concatenate([sum_color, alpha[:, None]], axis=-1),
        diffuse=sum_diffuse,
        reflection=sum_reflection,
        first_albedo=first["albedo"],
        first_normal=first["mapped_normal"],
        first_pos=first["vertex_pos"],
        first_screen_motion=first_motion,
        first_instance=first["instance_id"],
        first_metallic_roughness=jnp.stack(
            [first["metallic"], first["roughness"]], axis=-1),
        first_emission=first["emission"],
        useful_rays=useful,
        live_counts=live_counts)


def accumulate(new, prev, samples, previous_samples):
    """Running mean (reference: shader/gbuffer.glsl
    accumulate_gbuffer_color)."""
    total = samples + previous_samples
    t = previous_samples / jnp.maximum(total, 1)
    return new * (1.0 - t) + prev * t
