"""Camera rays, vertex interpolation, texture and material sampling.

Vectorized counterparts of the reference's per-ray GLSL:
  * get_camera_ray / get_screen_camera_ray (shader/camera.glsl, rt.glsl)
  * get_interpolated_vertex (shader/rt.glsl:29-105)
  * sample_material (shader/scene.glsl:88-152) incl. the exact
    inverse_srgb_correction polynomial (shader/color.glsl:7-12)

All functions operate on flat ray batches (R, ...).
"""

from __future__ import annotations

import os as _os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..scene.device import CameraUniforms, DeviceScene


def normalize(v, axis=-1):
    return v / jnp.linalg.norm(v, axis=axis, keepdims=True)


# ---------------------------------------------------------------------------
# Camera rays
# ---------------------------------------------------------------------------

def get_camera_ray(cam: CameraUniforms, vp: jnp.ndarray, pixel_coord,
                   screen_size, dof_u=None):
    """Pinhole/ortho camera ray (reference: shader/camera.glsl get_camera_ray).

    cam fields indexed by per-ray viewport `vp` (R,) i32;
    pixel_coord: (R, 2) in pixels (already offset to sample position);
    screen_size: (2,) float. Returns (origin (R,3), dir (R,3))."""
    uv = pixel_coord / screen_size * 2.0 - 1.0            # (R, 2)
    proj_inv = cam.proj_inverse[vp]                       # (R, 4, 4)
    view_inv = cam.view_inverse[vp]
    t = jnp.einsum("rij,rj->ri", proj_inv,
                   jnp.concatenate([uv, jnp.ones_like(uv)], axis=-1))
    d = jnp.einsum("rij,rj->ri", view_inv[:, :3, :3], t[:, :3])
    d = normalize(d)
    # equirectangular branch (reference: shader/camera.glsl:107-124,
    # equirect half-fov radians in pan.xy, src/camera.cc:474)
    eq = cam.proj_type[vp] == 2
    ang = uv * cam.pan[vp][:, :2]
    c = jnp.cos(ang)
    s = jnp.sin(ang)
    teq = jnp.stack([s[:, 0] * c[:, 1], s[:, 1],
                     -c[:, 0] * c[:, 1]], axis=-1)
    deq = normalize(jnp.einsum("rij,rj->ri", view_inv[:, :3, :3], teq))
    d = jnp.where(eq[:, None], deq, d)
    origin = cam.origin[vp][:, :3]
    return origin, d


def get_camera_ray_dof(cam: CameraUniforms, vp, pixel_coord, screen_size,
                       dof_u):
    """Depth-of-field version (thin lens; reference: shader/camera.glsl
    USE_DEPTH_OF_FIELD branch)."""
    from .sampling import sample_concentric_disk, sample_regular_polygon
    uv = pixel_coord / screen_size * 2.0 - 1.0
    dof = cam.dof_params[vp]                              # (R, 4)
    sides = dof[:, 3]
    ap_disk = sample_concentric_disk(dof_u)
    ap_poly = sample_regular_polygon(dof_u, dof[:, 2], sides)
    aperture = jnp.where(sides[:, None] == 0, ap_disk, ap_poly)
    view_origin = jnp.concatenate(
        [aperture * dof[:, 1:2], jnp.zeros_like(sides)[:, None]], axis=-1)
    proj_inv = cam.proj_inverse[vp]
    t = jnp.einsum("rij,rj->ri", proj_inv,
                   jnp.concatenate([uv, jnp.ones_like(uv)], axis=-1))
    view_dir = t[:, :3] * dof[:, 0:1]
    view_dir = normalize(view_dir - view_origin)
    view_inv = cam.view_inverse[vp]
    origin = jnp.einsum("rij,rj->ri", view_inv[:, :3, :3], view_origin) + \
        view_inv[:, :3, 3]
    d = normalize(jnp.einsum("rij,rj->ri", view_inv[:, :3, :3], view_dir))
    # equirect cameras have no thin lens (reference: camera.glsl:107
    # equirect get_camera_ray ignores dof_u)
    eq = cam.proj_type[vp] == 2
    o_pin, d_pin = get_camera_ray(cam, vp, pixel_coord, screen_size)
    return (jnp.where(eq[:, None], o_pin, origin),
            jnp.where(eq[:, None], d_pin, d))


def get_screen_camera_ray(cam: CameraUniforms, vp, pixel_pos, screen_size,
                          pixel_offset=None, dof_u=None):
    """(reference: shader/rt.glsl get_screen_camera_ray)
    pixel_pos: (R, 2) integer pixel positions; OpenGL-style y flip."""
    size = jnp.asarray(screen_size, jnp.float32)
    if pixel_offset is None:
        p = pixel_pos.astype(jnp.float32) + 0.5
    else:
        p = pixel_pos.astype(jnp.float32) + (pixel_offset * 0.5 + 0.5)
    p = p.at[:, 1].set(size[1] - p[:, 1])
    if dof_u is None:
        return get_camera_ray(cam, vp, p, size)
    return get_camera_ray_dof(cam, vp, p, size, dof_u)


def get_camera_projection(cam: CameraUniforms, vp, world_pos):
    """(reference: shader/camera.glsl get_camera_projection; the
    equirectangular variant is camera.glsl:126-134)"""
    vpm = cam.view_proj[vp]
    pr = jnp.einsum("rij,rj->ri", vpm[:, :3, :3], world_pos) + vpm[:, :3, 3]
    w = jnp.einsum("rj,rj->r", cam.view_proj[vp][:, 3, :3], world_pos) + \
        cam.view_proj[vp][:, 3, 3]
    uv = pr[:, :2] / w[:, None] * 0.5 + 0.5
    eq = cam.proj_type[vp] == 2
    vm = cam.view[vp]
    t = jnp.einsum("rij,rj->ri", vm[:, :3, :3], world_pos) + vm[:, :3, 3]
    t_len = jnp.maximum(jnp.linalg.norm(t, axis=-1), 1e-12)
    tn = t / t_len[:, None]
    fov = jnp.maximum(cam.pan[vp][:, :2], 1e-9)
    uv_eq = jnp.stack([jnp.arctan2(tn[:, 0], -tn[:, 2]),
                       jnp.arcsin(jnp.clip(tn[:, 1], -1, 1))],
                      axis=-1) / fov * 0.5 + 0.5
    uv = jnp.where(eq[:, None], uv_eq, uv)
    w = jnp.where(eq, t_len, w)
    return jnp.concatenate([uv, w[:, None]], axis=-1)


# ---------------------------------------------------------------------------
# Texture sampling
# ---------------------------------------------------------------------------

def sample_texture_quad(scene: DeviceScene, tex_id, size, uv, block=None):
    """Bilinear sample via the 4x4-block mip atlas: ONE row gather per
    sample instead of four texel gathers (TPU gathers are
    row-latency-bound; scene.tex_atlas is built by scene/device.py
    build_tex_atlas).

    tex_id: (R,) i32/f32 (negative = unbound, returns 1); size: (R, 2)
    actual (w, h) of the sampled level; block: (R, 2) atlas block offset
    of the level (level 0 offsets live in inst/tl_packed rows; other
    levels come from tex_meta); uv: (R, 2). REPEAT wrapping."""
    if block is None:
        block = jnp.zeros_like(size)
    w = jnp.maximum(size[..., 0], 1.0)
    h = jnp.maximum(size[..., 1], 1.0)
    u = uv[:, 0] * w - 0.5
    v = uv[:, 1] * h - 0.5
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fu = (u - x0)[:, None]
    fv = (v - y0)[:, None]
    wi = w.astype(jnp.int32)
    hi = h.astype(jnp.int32)
    x0i = jnp.mod(x0.astype(jnp.int32), wi)
    y0i = jnp.mod(y0.astype(jnp.int32), hi)
    px = (x0i >> 1) + block[..., 0].astype(jnp.int32)
    py = (y0i >> 1) + block[..., 1].astype(jnp.int32)
    lx = (x0i & 1)[:, None]
    ly = (y0i & 1)[:, None]
    # LINEAR single-index gather: a 2D-indexed gather ([py, px]) takes
    # XLA's slow multi-dim-gather path on TPU (~19 ms/1M rows measured);
    # flattening block rows makes it a plain row gather (~2 ms). The
    # atlas rows are int32 WORDS (4 texel bytes each): u8-row gathers
    # take a slow sublane-packed path (~18 ms/1M rows vs ~7.5 for word
    # rows); the byte unpack is a few cheap VPU shift/mask ops.
    wa = scene.tex_atlas.shape[1]
    flat = scene.tex_atlas.reshape(-1, 16)
    w32 = flat[py * wa + px]                                 # (R, 16) i32
    blk = jnp.stack(
        [(w32 >> (8 * k)) & 0xFF for k in range(4)],
        axis=-1).reshape(-1, 64).astype(jnp.float32)         # (R, 64)
    q = blk.reshape(-1, 4, 4, 4)
    # rows y0, y0+1 live at block rows (ly, ly+1), ly in {0, 1}
    rA = jnp.where(ly[..., None] == 0, q[:, 0], q[:, 1])     # (R, 4, 4)
    rB = jnp.where(ly[..., None] == 0, q[:, 1], q[:, 2])
    lxm = lx == 0
    c00 = jnp.where(lxm, rA[:, 0], rA[:, 1])
    c10 = jnp.where(lxm, rA[:, 1], rA[:, 2])
    c01 = jnp.where(lxm, rB[:, 0], rB[:, 1])
    c11 = jnp.where(lxm, rB[:, 1], rB[:, 2])
    col = (c00 * (1 - fu) * (1 - fv) + c10 * fu * (1 - fv) +
           c01 * (1 - fu) * fv + c11 * fu * fv) * (1.0 / 255.0)
    return jnp.where(tex_id[:, None] >= 0, col, 1.0)


def sample_texture_lod(scene: DeviceScene, tex_id, uv, lod):
    """TRUE trilinear mip sample (reference: src/texture.cc
    generate_mipmaps + the sampler's hardware trilinear): bilinear at
    floor(lod) and floor(lod)+1, blended by the lod fraction. Two row
    gathers; TAURAY_TRILINEAR=0 falls back to bilinear-at-nearest-mip
    (one gather, visible LOD popping). lod: (R,) float."""
    tid = jnp.maximum(tex_id.astype(jnp.int32), 0)
    nmips = scene.tex_nmips[tid]
    if _os.environ.get("TAURAY_TRILINEAR", "1") == "0":
        level = jnp.clip(jnp.round(lod).astype(jnp.int32), 0, nmips - 1)
        meta = scene.tex_meta[tid, level].astype(jnp.float32)  # (R, 4)
        return sample_texture_quad(scene, tex_id, meta[:, 2:4], uv,
                                   block=meta[:, 0:2])
    l0 = jnp.clip(jnp.floor(lod).astype(jnp.int32), 0, nmips - 1)
    l1 = jnp.minimum(l0 + 1, nmips - 1)
    f = jnp.clip(lod - l0.astype(jnp.float32), 0.0, 1.0)[:, None]
    m0 = scene.tex_meta[tid, l0].astype(jnp.float32)
    m1 = scene.tex_meta[tid, l1].astype(jnp.float32)
    c0 = sample_texture_quad(scene, tex_id, m0[:, 2:4], uv,
                             block=m0[:, 0:2])
    c1 = sample_texture_quad(scene, tex_id, m1[:, 2:4], uv,
                             block=m1[:, 0:2])
    # when l1 == l0 (last level) the blend is a no-op by construction
    return c0 * (1 - f) + c1 * f


def ray_cone_lod(scene: DeviceScene, v: "VertexData", footprint_world,
                 view_dir):
    """log2 of the UV-space pixel footprint at the hit, from a ray-cone
    width in world units (the ray-cast raster's analogue of fragment
    derivatives; the reference raster samples with implicit derivatives
    + hardware trilinear, shader/forward.frag). Texel density comes from
    the hit triangle's uv-area/world-area ratio (same tri_packed row the
    vertex interpolation gathered; XLA CSEs the gather); grazing
    incidence widens the footprint by 1/|n.d| (clamped)."""
    from ..scene.device import TP_HARDN, TP_POS, TP_UV
    g = scene.tri_packed[jnp.maximum(v.primitive_id, 0)]
    p0 = g[:, TP_POS:TP_POS + 3]
    p1 = g[:, TP_POS + 3:TP_POS + 6]
    p2 = g[:, TP_POS + 6:TP_POS + 9]
    u0 = g[:, TP_UV:TP_UV + 2]
    u1 = g[:, TP_UV + 2:TP_UV + 4]
    u2 = g[:, TP_UV + 4:TP_UV + 6]
    wa = jnp.linalg.norm(jnp.cross(p1 - p0, p2 - p0), axis=-1)
    e1 = u1 - u0
    e2 = u2 - u0
    ua = jnp.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
    density = jnp.sqrt(ua / jnp.maximum(wa, 1e-20))
    n = g[:, TP_HARDN:TP_HARDN + 3]
    spread = 1.0 / jnp.clip(
        jnp.abs(jnp.sum(n * view_dir, axis=-1)), 0.1, 1.0)
    return jnp.log2(jnp.maximum(
        footprint_world * density * spread, 1e-20))


def inverse_srgb_correction(col):
    """(reference: shader/color.glsl:7-12) — the exact polynomial."""
    low = col * 0.07739938
    high = (col * 0.94786729 + 0.05213270) ** 2.4
    return jnp.where(col > 0.04045, high, low)


def rgb_to_luminance(col):
    return col[..., 0] * 0.2126 + col[..., 1] * 0.7152 + col[..., 2] * 0.0722


# ---------------------------------------------------------------------------
# Vertex interpolation + material
# ---------------------------------------------------------------------------

class VertexData(NamedTuple):
    """(reference: shader/scene.glsl vertex_data)"""
    pos: jnp.ndarray
    prev_pos: jnp.ndarray
    hard_normal: jnp.ndarray
    smooth_normal: jnp.ndarray
    mapped_normal: jnp.ndarray
    uv: jnp.ndarray
    tangent: jnp.ndarray
    bitangent: jnp.ndarray
    back_facing: jnp.ndarray
    instance_id: jnp.ndarray
    primitive_id: jnp.ndarray


class SampledMaterial(NamedTuple):
    """(reference: shader/material.glsl sampled_material)"""
    albedo: jnp.ndarray        # (R, 4)
    metallic: jnp.ndarray
    roughness: jnp.ndarray
    emission: jnp.ndarray      # (R, 3)
    transmittance: jnp.ndarray
    ior_in: jnp.ndarray
    ior_out: jnp.ndarray
    f0: jnp.ndarray
    double_sided: jnp.ndarray
    shadow_terminator_mul: jnp.ndarray


def bary_from_row(g, origin, direction):
    """Barycentrics (u, v) recomputed from an already-gathered tri_packed
    row + the ray — lets the traversal kernel skip its barycentric
    post-pass gather entirely (row gathers are latency-bound; ~30 VPU
    flops here replace one 1M-row gather per wave)."""
    from ..scene.device import TP_POS
    v0 = g[:, TP_POS:TP_POS + 3]
    e1 = g[:, TP_POS + 3:TP_POS + 6] - v0
    e2 = g[:, TP_POS + 6:TP_POS + 9] - v0
    h = jnp.cross(direction, e2)
    a = jnp.sum(e1 * h, axis=-1)
    f = jnp.where(a != 0, 1.0 / jnp.where(a == 0, 1.0, a), 0.0)
    s = origin - v0
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1)
    v = f * jnp.sum(direction * q, axis=-1)
    return u, v


def interpolate_vertex(scene: DeviceScene, tri_id, bary_u, bary_v, view_dir,
                       ray_origin=None, row=None) -> VertexData:
    """(reference: shader/rt.glsl get_interpolated_vertex). tri_id must be
    clamped valid (mask misses outside). ONE tri_packed row gather feeds
    the whole interpolation (gathers are row-latency-bound on TPU).

    ray_origin: when given, (bary_u, bary_v) are ignored and recomputed
    from the row + ray (view_dir = ray direction) — pairs with
    need_uv=False traces.

    row: optionally the already-gathered tri_packed rows (R, TP_COLS) —
    callers that need other columns of the same row gather once and
    share (XLA does NOT reliably CSE a column-indexed read with a row
    gather; the separate read measured ~11 ms/wave as its own gather
    from a transposed table copy)."""
    from ..scene.device import (TP_HARDN, TP_INST, TP_NORMAL, TP_POS,
                                TP_PREV, TP_TANGENT, TP_UV)
    tid = jnp.maximum(tri_id, 0)
    g = scene.tri_packed[tid] if row is None else row  # (R, TP_COLS)
    if ray_origin is not None:
        bary_u, bary_v = bary_from_row(g, ray_origin, view_dir)
    b0 = (1.0 - bary_u - bary_v)[:, None]
    b1 = bary_u[:, None]
    b2 = bary_v[:, None]

    def lerp3(base, n):
        return (g[:, base:base + n] * b0 +
                g[:, base + n:base + 2 * n] * b1 +
                g[:, base + 2 * n:base + 3 * n] * b2)

    pos = lerp3(TP_POS, 3)
    prev_pos = lerp3(TP_PREV, 3)
    smooth_n = normalize(lerp3(TP_NORMAL, 3))
    avg_tan = lerp3(TP_TANGENT, 4)
    tangent = normalize(avg_tan[:, :3])
    uv = lerp3(TP_UV, 2)
    hard_n = g[:, TP_HARDN:TP_HARDN + 3]
    back = jnp.sum(hard_n * view_dir, axis=-1) > 0
    sgn = jnp.where(back, -1.0, 1.0)[:, None]
    smooth_n = smooth_n * sgn
    hard_n = hard_n * sgn
    bitangent = normalize(jnp.cross(smooth_n, tangent) * avg_tan[:, 3:4])
    inst = g[:, TP_INST].astype(jnp.int32)
    return VertexData(
        pos=pos, prev_pos=prev_pos, hard_normal=hard_n,
        smooth_normal=smooth_n, mapped_normal=smooth_n, uv=uv,
        tangent=tangent, bitangent=bitangent, back_facing=back,
        instance_id=inst, primitive_id=tid)


def sample_material(scene: DeviceScene, v: VertexData,
                    slots: Optional[Tuple[bool, ...]] = None,
                    lod_uv=None, row=None
                    ) -> Tuple[SampledMaterial, VertexData]:
    """(reference: shader/scene.glsl sample_material). Returns material and
    vertex data with normal mapping applied. ONE inst_packed row gather +
    one block gather per sampled texture.

    slots: static per-scene (albedo, mr, normal, emission) "any material
    binds this slot" flags — unbound slots skip their atlas gather (and
    the normal-mapping math) at compile time.

    lod_uv: optional (R,) log2 UV footprint (ray_cone_lod) — the raster
    path passes it to get the reference's fragment-derivative trilinear
    filtering (scene.glsl USE_EXPLICIT_GRADIENTS textureGrad); ray
    traced paths leave it None, matching the reference's base-level
    texture() in non-fragment stages."""
    from ..scene.device import (IP_ALBEDO, IP_CUTOFF, IP_DOUBLE, IP_TEXBLOCK,
                                IP_EMISSION, IP_IOR, IP_METAL,
                                IP_NORMAL_F, IP_ROUGH, IP_STMUL,
                                IP_TEX, IP_TEXSIZE, IP_TRANSMIT, TP_IP)
    # the material constants ride in the SAME tri_packed row the vertex
    # interpolation gathered — pass `row` to guarantee one gather
    tid = jnp.maximum(v.primitive_id, 0)
    m = (scene.tri_packed[tid] if row is None else row)[:, TP_IP:]
    tex = m[:, IP_TEX:IP_TEX + 4].astype(jnp.int32)
    if slots is None:
        slots = (True, True, True, True)

    def tex_at(slot):
        if not slots[slot]:
            return jnp.ones((m.shape[0], 4), jnp.float32)
        size = m[:, IP_TEXSIZE + 2 * slot:IP_TEXSIZE + 2 * slot + 2]
        if lod_uv is not None:
            # texture-space lod: footprint in texels of THIS texture
            lod = lod_uv + 0.5 * jnp.log2(jnp.maximum(
                size[:, 0] * size[:, 1], 1.0))
            return sample_texture_lod(scene, tex[:, slot], v.uv, lod)
        blk = m[:, IP_TEXBLOCK + 2 * slot:IP_TEXBLOCK + 2 * slot + 2]
        return sample_texture_quad(scene, tex[:, slot], size, v.uv,
                                   block=blk)

    albedo = m[:, IP_ALBEDO:IP_ALBEDO + 4]
    if slots[0]:
        tex_col = tex_at(0)
        tex_rgb = inverse_srgb_correction(tex_col[:, :3])
        albedo = albedo * jnp.concatenate([tex_rgb, tex_col[:, 3:4]],
                                          axis=-1)

    if slots[1]:
        mr_tex = tex_at(1)
        # glTF: metallic in B, roughness in G (reference: scene.glsl
        # .bg swizzle)
        metallic = m[:, IP_METAL] * mr_tex[:, 2]
        r = m[:, IP_ROUGH] * mr_tex[:, 1]
    else:
        metallic = m[:, IP_METAL]
        r = m[:, IP_ROUGH]
    roughness = r * r                 # artist-space squaring

    mapped_normal = v.smooth_normal
    if slots[2]:
        has_normal_tex = tex[:, 2] >= 0
        nf = m[:, IP_NORMAL_F:IP_NORMAL_F + 1]
        ts_n = tex_at(2)[:, :3] * 2.0 - 1.0
        ts_n = normalize(ts_n)
        tbn_n = (v.tangent * ts_n[:, 0:1] * nf +
                 v.bitangent * ts_n[:, 1:2] * nf +
                 v.smooth_normal * ts_n[:, 2:3])
        tbn_n = normalize(tbn_n)
        mapped_normal = jnp.where(
            (has_normal_tex[:, None]) &
            jnp.isfinite(tbn_n).all(-1, keepdims=True),
            tbn_n, mapped_normal)

    emission = m[:, IP_EMISSION:IP_EMISSION + 3]
    if slots[3]:
        emission = emission * tex_at(3)[:, :3]

    transmittance = m[:, IP_TRANSMIT]
    ior = m[:, IP_IOR]
    refr_back = v.back_facing & (transmittance > 0.0001)
    ior_in = jnp.where(refr_back, ior, 1.0)
    ior_out = jnp.where(refr_back, 1.0, ior)
    f0 = ((ior_out - ior_in) / (ior_out + ior_in)) ** 2

    mat = SampledMaterial(
        albedo=albedo, metallic=metallic, roughness=roughness,
        emission=emission, transmittance=transmittance,
        ior_in=ior_in, ior_out=ior_out, f0=f0,
        double_sided=m[:, IP_DOUBLE] > 0.5,
        shadow_terminator_mul=m[:, IP_STMUL])
    return mat, v._replace(mapped_normal=mapped_normal)
