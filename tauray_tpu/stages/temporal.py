"""Temporal & spatial reprojection stages.

* `temporal_reprojection` — reuse a fraction of the previous frame along
  screen motion vectors, rejecting samples across geometry changes
  (reference: shader/temporal_reprojection.comp: bilinear taps with
  normal-cosine > 0.99 and squared-distance < 0.01 validity tests).
* `spatial_reprojection` — the light-field trick: only a subset of
  viewports is rendered; the rest are filled by projecting the rendered
  viewports' world positions (reference:
  shader/spatial_reprojection.comp, src/spatial_reprojection_stage.hh).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

SQRD_DIST_LIMIT = 0.01
COS_LIMIT = 0.99


def _gather2d(img, x, y):
    """img: (H, W, C); x/y: (H, W) int32 — clamped gather."""
    H, W = img.shape[:2]
    x = jnp.clip(x, 0, W - 1)
    y = jnp.clip(y, 0, H - 1)
    return img[y, x]


@jax.jit
def temporal_reprojection(current_color, current_normal, current_pos,
                          screen_motion, previous_color, previous_normal,
                          previous_pos, temporal_ratio):
    """All images (H, W, C). screen_motion: (H, W, 2) = previous-frame uv
    (reference: get_camera_projection of prev_pos). Returns blended color."""
    H, W = current_color.shape[:2]
    motion = screen_motion[..., :2]
    mx = motion[..., 0] * W - 0.5
    my = (1.0 - motion[..., 1]) * H - 0.5
    x0 = jnp.floor(mx).astype(jnp.int32)
    y0 = jnp.floor(my).astype(jnp.int32)
    qx = (mx - x0)[..., None]
    qy = (my - y0)[..., None]

    out_accum = jnp.zeros_like(current_color)
    wsum = jnp.zeros(current_color.shape[:2] + (1,), jnp.float32)
    for dy, dx, w in ((0, 0, (1 - qx) * (1 - qy)), (0, 1, qx * (1 - qy)),
                      (1, 0, (1 - qx) * qy), (1, 1, qx * qy)):
        sx = x0 + dx
        sy = y0 + dy
        inb = (sx >= 0) & (sx < W) & (sy >= 0) & (sy < H)
        pn = _gather2d(previous_normal, sx, sy)
        pp = _gather2d(previous_pos, sx, sy)
        pc = _gather2d(previous_color, sx, sy)
        dp = current_pos - pp
        keep = inb & \
            (jnp.sum(pn * current_normal, -1) > COS_LIMIT) & \
            (jnp.sum(dp * dp, -1) < SQRD_DIST_LIMIT)
        wk = w * keep[..., None]
        out_accum = out_accum + pc * wk
        wsum = wsum + wk

    ok = wsum[..., 0] > 1e-5
    r = out_accum / jnp.maximum(wsum, 1e-9)
    blended = current_color * (1 - temporal_ratio) + r * temporal_ratio
    blended = jnp.where(jnp.isnan(blended), current_color, blended)
    return jnp.where(ok[..., None], blended, current_color)


@jax.jit
def spatial_reprojection(target_cam_view_proj, src_colors, src_pos,
                         src_valid):
    """Fill an inactive viewport from rendered viewports' G-buffers.

    target_cam_view_proj: (4, 4); src_colors: (S, H, W, 4);
    src_pos: (S, H, W, 3) world positions; src_valid: (S, H, W) bool.
    Forward-splats each source pixel into the target viewport, nearest
    depth wins (reference: shader/spatial_reprojection.comp)."""
    S, H, W = src_colors.shape[:3]
    pos = src_pos.reshape(-1, 3)
    col = src_colors.reshape(-1, 4)
    valid = src_valid.reshape(-1)
    m = target_cam_view_proj
    pr = pos @ m[:3, :3].T + m[:3, 3]
    w = pos @ m[3, :3] + m[3, 3]
    uv = pr[:, :2] / jnp.maximum(jnp.abs(w[:, None]), 1e-9) * \
        jnp.sign(w[:, None]) * 0.5 + 0.5
    x = (uv[:, 0] * W).astype(jnp.int32)
    y = ((1.0 - uv[:, 1]) * H).astype(jnp.int32)
    inb = valid & (w > 0) & (x >= 0) & (x < W) & (y >= 0) & (y < H)
    lin = jnp.where(inb, y * W + x, H * W)
    depth = jnp.where(inb, w, jnp.inf)
    # nearest-depth wins: scatter-min depth, then scatter colors whose
    # depth equals the winner
    dbuf = jnp.full(H * W + 1, jnp.inf).at[lin].min(depth)
    winner = inb & (depth <= dbuf[lin] * (1 + 1e-6))
    out = jnp.zeros((H * W + 1, 4)).at[jnp.where(winner, lin, H * W)].set(
        jnp.where(winner[:, None], col, 0.0))
    filled = dbuf[:H * W] < jnp.inf
    return (out[:H * W].reshape(H, W, 4),
            filled.reshape(H, W))
