#!/usr/bin/env python
"""Raster golden-residual isolation (VERDICT r4 ask #3).

Renders the raster golden config ONCE via RasterRenderer internals,
grabs the G-buffer (color + shadow_vis + albedo + pos), diffs against
the reference golden, and reports WHERE the MSE lives:
  * by shadow-visibility bucket: lit (vis=1) / penumbra (0<vis<1) /
    umbra (vis=0) / background;
  * by material (albedo segmentation like scripts/pt_deficit_proof.py);
  * the top error 16x16 blocks with their bucket mix, so the residual
    has an address, not a guess.

Run on the TPU: python scripts/raster_deficit.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SCENE = "/root/reference/test/test.glb"
GOLDEN = "/root/reference/test/references/validate_raster.exr"
SIZE = int(os.environ.get("RASTER_DEFICIT_SIZE", "512"))

REGIONS = [
    ("white", (1.0, 1.0, 1.0)),
    ("blue", (0.0, 0.0, 0.8)),
    ("red", (0.8, 0.08, 0.0)),
    ("glass", (0.48, 0.6, 0.28)),
    ("metal", (0.72, 0.22, 0.0)),
]


def main():
    import jax.numpy as jnp  # noqa: F401  (device init before renderer)
    from tauray_tpu.io import exr
    from tauray_tpu.options import parse_command_line_options
    from tauray_tpu.app.main import load_scenes, create_renderer

    opt = parse_command_line_options([
        "--renderer=raster", f"--width={SIZE}", f"--height={SIZE}",
        "--headless=unused", "--filetype=none", SCENE])
    s = load_scenes(opt)
    rr = create_renderer(opt, s)
    rr.set_scene(s)
    img = np.asarray(rr.render())          # tonemapped color (V,H,W,4)
    gbuf = rr.last_gbuf
    vis = np.asarray(gbuf["shadow_vis"])[0]
    alb = np.asarray(gbuf["albedo"])[0, ..., :3]
    alpha = np.asarray(gbuf["color"])[0, ..., 3]
    ours = img.reshape(SIZE, SIZE, -1)[..., :3]

    golden = exr.read_rgb(GOLDEN)
    diff2 = np.nan_to_num(ours - golden, nan=0.0, posinf=0.0,
                          neginf=0.0) ** 2
    total = diff2.mean() * 65535
    print(f"total MSE(quantum) = {total:.2f}")

    px = diff2.mean(axis=-1)               # per-pixel mse
    buckets = {
        "background": alpha <= 0.0,
        "lit": (alpha > 0) & (vis >= 0.999),
        "penumbra": (alpha > 0) & (vis > 0.001) & (vis < 0.999),
        "umbra": (alpha > 0) & (vis <= 0.001),
    }
    N = px.size
    for name, m in buckets.items():
        if not m.any():
            continue
        share = px[m].sum() / px.sum() * 100
        print(f"  {name:10s}: pixels {m.sum():7d} ({m.mean()*100:5.1f}%)"
              f"  mse-share {share:5.1f}%"
              f"  mean-mse(q) {px[m].mean() * 65535:8.2f}")

    print("by material (albedo segmentation):")
    for name, rgb in REGIONS:
        m = (np.abs(alb - np.array(rgb)).max(axis=-1) < 0.02)
        if not m.any():
            continue
        share = px[m].sum() / px.sum() * 100
        print(f"  {name:10s}: pixels {m.sum():7d}  mse-share {share:5.1f}%"
              f"  mean-mse(q) {px[m].mean() * 65535:8.2f}")

    B = 16
    hb = SIZE // B
    blk = px[:hb * B, :hb * B].reshape(hb, B, hb, B).mean(axis=(1, 3))
    order = np.argsort(blk.ravel())[::-1][:16]
    print("top error 16x16 blocks (y, x, mean-mse(q), vis-mean, alb):")
    for o in order:
        by, bx = divmod(int(o), hb)
        sl = (slice(by * B, (by + 1) * B), slice(bx * B, (bx + 1) * B))
        print(f"  ({by * B:3d},{bx * B:3d}) {blk[by, bx]*65535:9.2f} "
              f"vis={vis[sl].mean():.3f} "
              f"alb={np.round(alb[sl].reshape(-1, 3).mean(0), 2)}")


if __name__ == "__main__":
    main()
