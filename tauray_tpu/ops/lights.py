"""Light sampling for next-event estimation.

Vectorized counterparts of (reference: shader/light.glsl,
shader/rt.glsl sample_environment_map / get_nee_sampling_probabilities,
shader/path_tracer.glsl sample_explicit_light).

Delta lights mark their "infinite pdf" with a negative sign, resolved by
`nee_mis_pdf` (reference: shader/light.glsl sample_point_light pdf=-dist2).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..scene.device import DeviceScene
from .intersect import RAY_MAX_DIST
from .rng import INV_UINT32_MAX
from .sampling import (get_barycentric_coords, normalize,
                       ray_plane_intersection_dist, sample_cone,
                       sample_sphere, sample_spherical_triangle,
                       sample_triangle_area, spherical_triangle_solid_angle,
                       triangle_area_pdf)

M_PI = math.pi


class NEEWeights(NamedTuple):
    """Static per-scene sampling probabilities (reference:
    shader/rt.glsl get_nee_sampling_probabilities, resolved host-side
    because light counts are fixed per scene)."""
    point: float
    triangle: float
    directional: float
    envmap: float

    @staticmethod
    def from_options(opt, scene_arrays) -> "NEEWeights":
        p = opt.sample_point_lights if scene_arrays.point_count > 0 else 0.0
        t = (opt.sample_emissive_triangles
             if scene_arrays.tri_light_count > 0 else 0.0)
        d = (opt.sample_directional_lights
             if scene_arrays.dir_count > 0 else 0.0)
        e = (opt.sample_envmap
             if scene_arrays.environment_map is not None else 0.0)
        s = p + t + d + e
        inv = 0.0 if s <= 0 else (1.0 / s + 1e-5)
        return NEEWeights(p * inv, t * inv, d * inv, e * inv)

    @property
    def any(self) -> bool:
        return (self.point + self.triangle + self.directional +
                self.envmap) > 0


def get_spotlight_intensity(dir_cutoff, dir_falloff, light_dir, dir):
    """(reference: shader/light.glsl get_spotlight_intensity)"""
    cutoff = jnp.sum(dir * -light_dir, -1)
    fall = 1.0 - jnp.maximum(1.0 - cutoff, 0.0) ** dir_falloff / \
        jnp.maximum(1.0 - dir_cutoff, 1e-12) ** dir_falloff
    shaped = jnp.where(cutoff > dir_cutoff, fall, 0.0)
    return jnp.where(dir_falloff > 0, shaped, 1.0)


def row_lookup(table, li):
    """Row lookup for SMALL tables (lights): a 1M-ray gather from a
    13-row table is latency-bound on TPU (~25ns/row); a one-hot matmul
    streams at MXU rate instead. Falls back to a real gather for large
    tables (emissive-heavy scenes)."""
    L = table.shape[0]
    if L > 128 or table.ndim != 2:
        return table[li]
    oh = (li[..., None] == jnp.arange(L, dtype=li.dtype)).astype(
        table.dtype)
    return jax.lax.dot_general(
        oh, table, (((oh.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def sample_point_light(scene: DeviceScene, li, u, pos):
    """(reference: shader/light.glsl sample_point_light).
    Returns (out_dir, out_length, color, pdf). One pl_packed row
    gather."""
    from ..scene.device import (PL_COLOR, PL_DIR, PL_DIRCUT, PL_FALLOFF,
                                PL_POS, PL_RADIUS)
    row = row_lookup(scene.pl_packed, li)
    lpos = row[..., PL_POS:PL_POS + 3]
    radius = row[..., PL_RADIUS]
    dir = pos - lpos
    dist2 = jnp.sum(dir * dir, -1)
    k = 1.0 - radius * radius / jnp.maximum(dist2, 1e-20)
    dir_cutoff = jnp.where(k > 0, jnp.sqrt(jnp.maximum(k, 0.0)), -1.0)
    out_dir = sample_cone(u, -normalize(dir), dir_cutoff)
    b = jnp.sum(dir * out_dir, -1)
    out_length = -b - jnp.sqrt(jnp.maximum(
        b * b - dist2 + radius * radius, 0.0))
    spot = get_spotlight_intensity(row[..., PL_DIRCUT],
                                   row[..., PL_FALLOFF],
                                   row[..., PL_DIR:PL_DIR + 3],
                                   normalize(-dir))
    color = spot[..., None] * row[..., PL_COLOR:PL_COLOR + 3]
    area_color = color / jnp.maximum(radius * radius * M_PI, 1e-20)[..., None]
    pdf_cone = 1.0 / (2.0 * M_PI * jnp.maximum(1.0 - dir_cutoff, 1e-12))
    delta = radius == 0.0
    color = jnp.where(delta[..., None], color, area_color)
    pdf = jnp.where(delta, -dist2, pdf_cone)
    return out_dir, out_length, color, pdf


def sample_point_light_pdf(scene: DeviceScene, li, pos):
    from ..scene.device import PL_POS, PL_RADIUS
    row = row_lookup(scene.pl_packed, li)
    lpos = row[..., PL_POS:PL_POS + 3]
    radius = row[..., PL_RADIUS]
    dir = pos - lpos
    dist2 = jnp.sum(dir * dir, -1)
    k = 1.0 - radius * radius / jnp.maximum(dist2, 1e-20)
    dir_cutoff = jnp.where(k > 0, jnp.sqrt(jnp.maximum(k, 0.0)), -1.0)
    pdf = 1.0 / (2.0 * M_PI * jnp.maximum(1.0 - dir_cutoff, 1e-12))
    return jnp.where(radius == 0.0, 0.0, pdf)


def point_light_radiance(scene: DeviceScene, li, view):
    """Radiance when a ray hits the light sphere (reference:
    shader/path_tracer.glsl get_intersection_info point-light branch)."""
    from ..scene.device import (PL_COLOR, PL_DIR, PL_DIRCUT, PL_FALLOFF,
                                PL_RADIUS)
    row = row_lookup(scene.pl_packed, li)
    spot = get_spotlight_intensity(row[..., PL_DIRCUT],
                                   row[..., PL_FALLOFF],
                                   row[..., PL_DIR:PL_DIR + 3], view)
    r = row[..., PL_RADIUS]
    return spot[..., None] * row[..., PL_COLOR:PL_COLOR + 3] / \
        jnp.maximum(r * r * M_PI, 1e-20)[..., None]


def sample_directional_light(scene: DeviceScene, li, u):
    """Returns (out_dir, color, pdf)."""
    from ..scene.device import DL_COLOR, DL_DIR, DL_DIRCUT
    row = row_lookup(scene.dl_packed, li)
    dl_dir = row[..., DL_DIR:DL_DIR + 3]
    cutoff = row[..., DL_DIRCUT]
    dl_color = row[..., DL_COLOR:DL_COLOR + 3]
    out_dir = sample_cone(u, -dl_dir, cutoff)
    pdf = jnp.where(cutoff >= 1.0, -1.0,
                    1.0 / (2.0 * M_PI * jnp.maximum(1.0 - cutoff, 1e-12)))
    color = jnp.where((pdf > 0)[..., None], dl_color * pdf[..., None],
                      dl_color)
    return out_dir, color, pdf


def sample_directional_light_pdf(scene: DeviceScene, li):
    from ..scene.device import DL_DIRCUT
    cutoff = scene.dl_packed[li, DL_DIRCUT]
    return jnp.where(cutoff >= 1.0, 0.0,
                     1.0 / (2.0 * M_PI * jnp.maximum(1.0 - cutoff, 1e-12)))


def directional_light_radiance(scene: DeviceScene, view):
    """Escaped-ray radiance from all directional lights + pdf sum
    (reference: shader/path_tracer.glsl miss branch)."""
    D = scene.dl_color.shape[0]
    cutoff = scene.dl_dir_cutoff            # (D,)
    dirs = scene.dl_dir                     # (D, 3)
    cosv = jnp.einsum("rj,dj->rd", view, -dirs)
    visible = jnp.where(cosv >= cutoff[None, :], 1.0, 0.0)
    active = (jnp.arange(D) < scene.directional_light_count)[None, :] & \
        (cutoff < 1.0)[None, :]
    visible = jnp.where(active, visible, 0.0)
    rad = visible[..., None] * scene.dl_color[None, :, :] / \
        (2.0 * M_PI * jnp.maximum(1.0 - cutoff, 1e-12))[None, :, None]
    pdfs = visible / (2.0 * M_PI * jnp.maximum(1.0 - cutoff, 1e-12))[None, :]
    return rad.sum(axis=1), pdfs.sum(axis=1)


# -- triangle lights ---------------------------------------------------------

def sample_triangle_light(u, A, B, C, mode: str):
    """Returns (dir, pdf) (reference: shader/light.glsl
    sample_triangle_light; mode in area/solid-angle/hybrid)."""
    if mode == "area":
        P = sample_triangle_area(u, A, B, C)
        return normalize(P), triangle_area_pdf(P, A, B, C)
    d_sa, pdf_sa = sample_spherical_triangle(u, A, B, C)
    if mode == "solid-angle":
        return d_sa, pdf_sa
    # hybrid: fall back to area sampling for tiny solid angles
    sa = spherical_triangle_solid_angle(normalize(A), normalize(B),
                                        normalize(C))
    P = sample_triangle_area(u, A, B, C)
    d_ar = normalize(P)
    pdf_ar = triangle_area_pdf(P, A, B, C)
    use_sa = sa > 1e-6
    return jnp.where(use_sa[..., None], d_sa, d_ar), \
        jnp.where(use_sa, pdf_sa, pdf_ar)


def sample_triangle_light_pdf(P, A, B, C, mode: str):
    if mode == "area":
        return triangle_area_pdf(P, A, B, C)
    sa = spherical_triangle_solid_angle(normalize(A), normalize(B),
                                        normalize(C))
    if mode == "solid-angle":
        return 1.0 / jnp.maximum(sa, 1e-20)
    return jnp.where(sa > 1e-6, 1.0 / jnp.maximum(sa, 1e-20),
                     triangle_area_pdf(P, A, B, C))


# -- environment map ---------------------------------------------------------

def sample_environment_map(scene: DeviceScene, rand_uint):
    """(reference: shader/rt.glsl sample_environment_map). rand_uint:
    (R, 3) uint32. Returns (color, dir, length, pdf)."""
    h, w = scene.env_map.shape[:2]
    factor = scene.env_factor[:3]
    # constant-color (no map) case is resolved by the caller statically
    size = jnp.array([w, h], jnp.uint32)
    ip = jnp.minimum((rand_uint[:, :2] //
                      (jnp.uint32(0xFFFFFFFF) // size)), size - 1)
    i = (ip[:, 0] + ip[:, 1] * w).astype(jnp.int32)
    row = scene.env_packed[i]                    # one gather
    at_prob = jax.lax.bitcast_convert_type(row[:, 0], jnp.uint32)
    alias_id = jax.lax.bitcast_convert_type(row[:, 1], jnp.uint32)
    take_alias = rand_uint[:, 2] > at_prob
    pdf = jnp.where(take_alias, row[:, 3], row[:, 2])
    i = jnp.where(take_alias, alias_id.astype(jnp.int32), i)
    p = jnp.stack([i % w, i // w], axis=-1).astype(jnp.float32)
    pixel_count = jnp.uint32(w * h)
    off = (rand_uint[:, :2] * pixel_count).astype(jnp.float32) * \
        jnp.float32(INV_UINT32_MAX)
    uv = (p + off) / jnp.array([w, h], jnp.float32)
    dir = uv_to_latlong_direction(uv)
    # bilinear sample of the env map at uv
    col = _sample_envmap_bilinear(scene.env_map, uv) * factor[None, :]
    return col, dir, jnp.full(i.shape, RAY_MAX_DIST), pdf


def _sample_envmap_bilinear(env, uv):
    h, w = env.shape[:2]
    x = uv[:, 0] * w - 0.5
    y = uv[:, 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0.astype(jnp.int32) + 1, w)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    c = (env[y0i, x0i] * (1 - fx) * (1 - fy) + env[y0i, x1i] * fx * (1 - fy) +
         env[y1i, x0i] * (1 - fx) * fy + env[y1i, x1i] * fx * fy)
    return c


def uv_to_latlong_direction(uv):
    """(reference: shader/alias_table.glsl uv_to_latlong_direction)"""
    u = (uv[:, 0] - 0.5) * M_PI
    v = (uv[:, 1] - 0.5) * M_PI
    dy = -jnp.sin(v)
    sc = jnp.sqrt(jnp.maximum(1 - dy * dy, 0.0))
    return jnp.stack([jnp.cos(2 * u) * sc, dy, jnp.sin(2 * u) * sc], axis=-1)


def latlong_direction_to_pixel_id(dir, w, h):
    """(reference: shader/alias_table.glsl latlong_direction_to_pixel_id)"""
    u = jnp.arctan2(dir[:, 2], dir[:, 0]) * 0.5 / M_PI + 0.5
    v = jnp.arcsin(jnp.clip(-dir[:, 1], -1, 1)) / M_PI + 0.5
    px = (u * w + 0.5).astype(jnp.int32)
    py = (v * h + 0.5).astype(jnp.int32)
    px = jnp.clip(px, 0, w - 1)
    py = jnp.clip(py, 0, h - 1)
    return px + py * w


def environment_radiance(scene: DeviceScene, view, has_envmap: bool):
    """Escaped-ray env radiance + sampling pdf (reference:
    shader/path_tracer.glsl miss branch + sample_environment_map_pdf)."""
    color = jnp.broadcast_to(scene.env_factor[None, :3],
                             (view.shape[0], 3)).astype(jnp.float32)
    if not has_envmap:
        return color, jnp.full(view.shape[0], 1.0 / (4.0 * M_PI))
    h, w = scene.env_map.shape[:2]
    uvy = jnp.arcsin(jnp.clip(-view[:, 1], -1, 1)) / M_PI + 0.5
    uvx = jnp.arctan2(view[:, 2], view[:, 0]) / (2 * M_PI) + 0.5
    uv = jnp.stack([uvx, uvy], axis=-1)
    color = color * _sample_envmap_bilinear(scene.env_map, uv)
    i = latlong_direction_to_pixel_id(view, w, h)
    return color, scene.env_packed[i, 2]
