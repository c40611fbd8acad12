"""SVGF denoiser (reference: src/svgf_stage.cc + shader/svgf_temporal.comp,
svgf_atrous.comp, svgf_disocclusion_fix.comp, svgf_firefly_suppression.comp,
svgf.glsl).

Pipeline (matching the reference's stage order, src/svgf_stage.hh):
  1. temporal: motion-reprojected accumulation of demodulated diffuse and
     specular radiance + first/second luminance moments, with geometry
     validity tests and per-pixel history length;
  2. disocclusion fix: freshly-disoccluded pixels take a wide spatial
     average instead of raw 1-spp values;
  3. firefly suppression: luminance clamp against the local neighborhood;
  4. variance-guided a-trous wavelet filtering with separate iteration
     counts for diffuse and specular (options svgf.atrous-diffuse-iter /
     atrous-spec-iter, sigmas l/n/z — reference: src/options.hh:419-437).

All state (history color/moments/length) is carried as a pytree by the
post-processing renderer.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.shading import rgb_to_luminance


class SVGFParams(NamedTuple):
    atrous_diffuse_iter: int = 5
    atrous_spec_iter: int = 5
    atrous_kernel_radius: int = 2
    sigma_l: float = 10.0
    sigma_z: float = 1.0
    sigma_n: float = 128.0
    min_alpha_color: float = 0.02
    min_alpha_moments: float = 0.2

    @staticmethod
    def from_options(opt) -> "SVGFParams":
        s = opt.svgf
        return SVGFParams(s.atrous_diffuse_iter, s.atrous_spec_iter,
                          s.atrous_kernel_radius, s.sigma_l, s.sigma_z,
                          s.sigma_n, s.min_alpha_color, s.min_alpha_moments)


class SVGFState(NamedTuple):
    color: jnp.ndarray      # (H, W, 6) diffuse rgb + specular rgb
    moments: jnp.ndarray    # (H, W, 4) mean/second moment for both channels
    history_len: jnp.ndarray  # (H, W)
    normal: jnp.ndarray     # (H, W, 3)
    pos: jnp.ndarray        # (H, W, 3)

    @staticmethod
    def zeros(H, W):
        return SVGFState(
            color=jnp.zeros((H, W, 6), jnp.float32),
            moments=jnp.zeros((H, W, 4), jnp.float32),
            history_len=jnp.zeros((H, W), jnp.float32),
            normal=jnp.zeros((H, W, 3), jnp.float32),
            pos=jnp.zeros((H, W, 3), jnp.float32))


def _gather(img, x, y):
    H, W = img.shape[:2]
    return img[jnp.clip(y, 0, H - 1), jnp.clip(x, 0, W - 1)]


def _reproject(state: SVGFState, motion, cur_normal, cur_pos):
    """Bilinear history fetch with validity tests (reference:
    shader/svgf_temporal.comp)."""
    H, W = motion.shape[:2]
    mx = motion[..., 0] * W - 0.5
    my = (1.0 - motion[..., 1]) * H - 0.5
    x0 = jnp.floor(mx).astype(jnp.int32)
    y0 = jnp.floor(my).astype(jnp.int32)
    fx = (mx - x0)[..., None]
    fy = (my - y0)[..., None]

    csum = jnp.zeros((H, W, 6))
    msum = jnp.zeros((H, W, 4))
    hsum = jnp.zeros((H, W, 1))
    wsum = jnp.zeros((H, W, 1))
    for dy, dx, w in ((0, 0, (1 - fx) * (1 - fy)), (0, 1, fx * (1 - fy)),
                      (1, 0, (1 - fx) * fy), (1, 1, fx * fy)):
        sx = x0 + dx
        sy = y0 + dy
        inb = (sx >= 0) & (sx < W) & (sy >= 0) & (sy < H)
        pn = _gather(state.normal, sx, sy)
        pp = _gather(state.pos, sx, sy)
        dpos = cur_pos - pp
        keep = inb & (jnp.sum(pn * cur_normal, -1) > 0.9) & \
            (jnp.sum(dpos * dpos, -1) < 0.02)
        wk = w * keep[..., None]
        csum += _gather(state.color, sx, sy) * wk
        msum += _gather(state.moments, sx, sy) * wk
        hsum += _gather(state.history_len[..., None], sx, sy) * wk
        wsum += wk
    ok = wsum[..., 0] > 1e-4
    inv = 1.0 / jnp.maximum(wsum, 1e-9)
    return csum * inv, msum * inv, hsum[..., 0] * inv[..., 0], ok


def _box_blur(img, radius):
    out = img
    for axis in (0, 1):
        acc = out
        for r in range(1, radius + 1):
            acc = acc + jnp.roll(out, r, axis) + jnp.roll(out, -r, axis)
        out = acc / (2 * radius + 1)
    return out


@partial(jax.jit, static_argnames=("params",))
def svgf_temporal(params: SVGFParams, state: SVGFState, diffuse, specular,
                  motion, normal, pos):
    """Returns (filter-input color (H,W,6), variance (H,W,2), new state)."""
    cur = jnp.concatenate([diffuse[..., :3], specular[..., :3]], axis=-1)
    lum_d = rgb_to_luminance(diffuse[..., :3])
    lum_s = rgb_to_luminance(specular[..., :3])
    cur_m = jnp.stack([lum_d, lum_d * lum_d, lum_s, lum_s * lum_s], axis=-1)

    prev_c, prev_m, prev_len, ok = _reproject(state, motion, normal, pos)
    hist = jnp.where(ok, prev_len + 1.0, 1.0)
    alpha_c = jnp.maximum(1.0 / hist, params.min_alpha_color)[..., None]
    alpha_m = jnp.maximum(1.0 / hist, params.min_alpha_moments)[..., None]
    okc = ok[..., None]
    color = jnp.where(okc, prev_c * (1 - alpha_c) + cur * alpha_c, cur)
    moments = jnp.where(okc, prev_m * (1 - alpha_m) + cur_m * alpha_m, cur_m)

    var = jnp.stack([
        jnp.maximum(moments[..., 1] - moments[..., 0] ** 2, 0.0),
        jnp.maximum(moments[..., 3] - moments[..., 2] ** 2, 0.0)], axis=-1)
    # disocclusion fix: young pixels get a spatially-estimated variance
    # and blurred color (reference: shader/svgf_disocclusion_fix.comp)
    young = hist < 4.0
    blurred_c = _box_blur(color, 2)
    blurred_v = _box_blur(var, 2) + 1e-3
    color = jnp.where(young[..., None], blurred_c, color)
    var = jnp.where(young[..., None], blurred_v, var)

    # firefly suppression: clamp luminance to k * neighborhood mean
    # (reference: shader/svgf_firefly_suppression.comp)
    mean_l = _box_blur(jnp.stack([rgb_to_luminance(color[..., :3]),
                                  rgb_to_luminance(color[..., 3:])],
                                 axis=-1), 1)
    for ch, sl in ((0, slice(0, 3)), (1, slice(3, 6))):
        l = rgb_to_luminance(color[..., sl])
        limit = mean_l[..., ch] * 4.0 + 0.5
        scale = jnp.where(l > limit, limit / jnp.maximum(l, 1e-9), 1.0)
        color = color.at[..., sl].mul(scale[..., None])

    new_state = SVGFState(color=color, moments=moments, history_len=hist,
                          normal=normal, pos=pos)
    return color, var, new_state


def _atrous_pass(color, var, normal, depth, step, radius, sigma_l, sigma_n,
                 sigma_z):
    """One a-trous iteration with edge-stopping weights (reference:
    shader/svgf_atrous.comp, svgf.glsl)."""
    H, W = color.shape[:2]
    lum = rgb_to_luminance(color)
    var_blur = _box_blur(var[..., None], 1)[..., 0]
    denom_l = sigma_l * jnp.sqrt(var_blur + 1e-10)

    csum = color
    vsum = var
    wsum = jnp.ones((H, W))
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dx == 0 and dy == 0:
                continue
            oy, ox = dy * step, dx * step
            nc = jnp.roll(jnp.roll(color, oy, 0), ox, 1)
            nv = jnp.roll(jnp.roll(var, oy, 0), ox, 1)
            nn = jnp.roll(jnp.roll(normal, oy, 0), ox, 1)
            nz = jnp.roll(jnp.roll(depth, oy, 0), ox, 1)
            nl = rgb_to_luminance(nc)
            w_l = jnp.exp(-jnp.abs(nl - lum) / jnp.maximum(denom_l, 1e-10))
            w_n = jnp.maximum(jnp.sum(nn * normal, -1), 0.0) ** sigma_n
            w_z = jnp.exp(-jnp.abs(nz - depth) /
                          (sigma_z * jnp.abs(depth) + 1e-4))
            w = w_l * w_n * w_z
            csum = csum + nc * w[..., None]
            vsum = vsum + nv * w * w
            wsum = wsum + w
    return csum / wsum[..., None], vsum / (wsum * wsum)


@partial(jax.jit, static_argnames=("params",))
def svgf_atrous(params: SVGFParams, color6, var2, normal, depth):
    """Separate diffuse/specular filtering chains
    (reference: separate iteration counts, src/options.hh:419-424)."""
    outs = []
    for ch, (sl, iters) in enumerate((
            (slice(0, 3), params.atrous_diffuse_iter),
            (slice(3, 6), params.atrous_spec_iter))):
        c = color6[..., sl]
        v = var2[..., ch]
        for i in range(iters):
            c, v = _atrous_pass(c, v, normal, depth, 1 << i,
                                params.atrous_kernel_radius,
                                params.sigma_l, params.sigma_n,
                                params.sigma_z)
        outs.append(c)
    return jnp.concatenate(outs, axis=-1)


def _lobe_similarity(axis1, rough1, axis2, rough2):
    """Isotropic-SG specular lobe similarity (reference:
    shader/svgf.glsl specular_lobe_similarity, approximate branch)."""
    inv_r1 = 1.0 / jnp.maximum(rough1, 1e-3)
    inv_r2 = 1.0 / jnp.maximum(rough2, 1e-3)
    s1 = inv_r1 * inv_r1
    s2 = inv_r2 * inv_r2
    dm2 = 2.0 * s1 * s2 * jnp.sum(axis1 * axis2, -1) + s2 * s2 + s1 * s1
    dm = jnp.sqrt(jnp.maximum(dm2, 1e-12))
    return jnp.clip(jnp.exp2(0.7689564567938175 * (dm - s1 - s2) + 1.0) *
                    inv_r1 * inv_r2 / dm, 0.0, 1.0)


def svgf_hit_dist_reconstruction(specular4, normal, pos, roughness,
                                 cam_origin):
    """Fill zero specular hit-distances (alpha channel) from 3x3
    neighbors weighted by plane distance + specular-lobe similarity
    (reference: shader/svgf_hit_dist_reconstruction.comp)."""
    H, W = specular4.shape[:2]
    view = cam_origin[None, None, :] - pos
    view = view / jnp.maximum(
        jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-9)
    # reflect(view_away, n): the reference reflects the AWAY-pointing V
    axis = 2.0 * jnp.sum(view * normal, -1, keepdims=True) * normal - view
    rough = jnp.maximum(roughness, 0.01)
    dist_to_cam = jnp.linalg.norm(cam_origin[None, None, :] - pos, axis=-1)
    inv_dist = 1.0 / jnp.maximum(dist_to_cam, 1e-6)

    a = specular4[..., 3]
    w_sum = jnp.where(a != 0.0, 1.0, 0.0)
    acc = a
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            qs = jnp.roll(specular4[..., 3], (-dy, -dx), (0, 1))
            qp = jnp.roll(pos, (-dy, -dx), (0, 1))
            qa = jnp.roll(axis, (-dy, -dx), (0, 1))
            qr = jnp.roll(rough, (-dy, -dx), (0, 1))
            w = jnp.where(qs != 0.0, 1.0, 0.0)
            plane_d = jnp.abs(jnp.sum((qp - pos) * normal, -1))
            w = w * jnp.where(plane_d * inv_dist < 0.005, 1.0, 0.0)
            w = w * _lobe_similarity(axis, rough, qa, qr) ** 16.0
            w_sum = w_sum + w
            acc = acc + qs * w
    recon = jnp.where(w_sum > 1e-3, acc / jnp.maximum(w_sum, 1e-3), 0.0)
    new_a = jnp.where(a == 0.0, recon, a)
    return jnp.concatenate([specular4[..., :3], new_a[..., None]], -1)


def svgf_denoise(params: SVGFParams, state: SVGFState, diffuse, specular,
                 motion, normal, pos, depth, cam_origin=None,
                 roughness=None):
    """Full pipeline; returns (diffuse, specular, new_state)."""
    if cam_origin is not None and specular.shape[-1] == 4:
        # specular hit-distance reconstruction before temporal reuse
        # (reference: svgf_stage.cc dispatch order)
        r = roughness if roughness is not None else \
            jnp.zeros_like(specular[..., 3]) + 0.5
        specular = svgf_hit_dist_reconstruction(
            specular, normal, pos, r, cam_origin)
    color, var, new_state = svgf_temporal(params, state, diffuse, specular,
                                          motion, normal, pos)
    filtered = svgf_atrous(params, color, var, normal, depth)
    return filtered[..., :3], filtered[..., 3:], new_state
