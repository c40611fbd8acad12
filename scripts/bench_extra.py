#!/usr/bin/env python
"""BASELINE.md tracked-config measurements beyond bench.py's headline
metric (VERDICT r4 ask #6): every "benchmark configs" row gets a number.

  * svgf_1080p    — Sponza-class 1080p, 1 spp PT + SVGF denoise (TPU)
  * restir_1080p  — ReSTIR DI+GI on the same scene (TPU)
  * quilt_5x9     — 45-view light field view-sharded over the virtual
                    8-device CPU mesh with stitch recomposition (wall +
                    per-view ms; run separately with JAX_PLATFORMS=cpu
                    XLA_FLAGS=--xla_force_host_platform_device_count=8)

Writes/updates BENCH_extra.json at the repo root and prints one JSON
line. Scene is the procedural Sponza-scale stand-in (same disclosure as
bench.py sponza_1080p).

Usage:
  python scripts/bench_extra.py svgf restir   # TPU configs
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/bench_extra.py quilt
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SCENE = "proc://sponza?tris=262144"
OUT = os.path.join(os.path.dirname(__file__), "..", "BENCH_extra.json")


def _render_config(args, frames=3):
    from tauray_tpu.options import parse_command_line_options
    from tauray_tpu.app.main import load_scenes, create_renderer
    opt = parse_command_line_options(args)
    s = load_scenes(opt)
    rr = create_renderer(opt, s)
    rr.set_scene(s)
    rr.render()                                  # compile
    times = []
    for _ in range(frames):
        t0 = time.perf_counter()
        rr.render()
        times.append(time.perf_counter() - t0)
    return min(times)


def bench_svgf():
    dt = _render_config([
        "--renderer=path-tracer", "--width=1920", "--height=1080",
        "--samples-per-pixel=1", "--samples-per-pass=1",
        "--max-ray-depth=4", "--denoiser=svgf", "--headless=unused",
        "--filetype=none", SCENE])
    return {"scene": SCENE, "spp": 1, "denoiser": "svgf",
            "ms_per_frame": round(dt * 1000, 2)}


def bench_restir():
    dt = _render_config([
        "--renderer=restir", "--width=1920", "--height=1080",
        "--headless=unused", "--filetype=none", SCENE])
    return {"scene": SCENE, "mode": "DI+GI",
            "ms_per_frame": round(dt * 1000, 2)}


def bench_quilt():
    """5x9 camera-grid light field view-sharded over the virtual mesh
    (BASELINE.json row; reference: looking_glass display + distribution).
    """
    import numpy as np
    import jax
    from tauray_tpu.options import parse_command_line_options
    from tauray_tpu.app.main import load_scenes
    from tauray_tpu.renderer.distributed import (
        DistributedPathTracerRenderer)
    from tauray_tpu.scene.transformable import Transformable
    from tauray_tpu.scene.camera import Camera

    n_dev = len(jax.devices())
    opt = parse_command_line_options([
        "--renderer=path-tracer", "--width=256", "--height=256",
        "--max-ray-depth=2", "--samples-per-pixel=1",
        "--samples-per-pass=1", "--headless=unused", "--filetype=none",
        "/root/reference/test/test.glb"])
    s = load_scenes(opt)
    # 5x9 camera grid (45 views) like the LKG arc
    for k in range(44):
        ce = s.add(f"quiltcam{k}")
        ce.transform = Transformable(position=(0.05 * (k - 22), 0, 6))
        ce.camera = Camera()
        ce.camera.perspective(45, 1.0, 0.1, 100.0)
        ce.camera_enabled = True
    rr = DistributedPathTracerRenderer(opt)
    rr.set_scene(s)
    q = rr.render()                              # compile
    t0 = time.perf_counter()
    q = rr.render()
    dt = time.perf_counter() - t0
    assert q.shape[0] == 45 and np.isfinite(q).all()
    return {"views": 45, "grid": "5x9", "devices": n_dev,
            "size": "256x256/view", "view_sharded": bool(rr.view_sharded),
            "wall_ms": round(dt * 1000, 2),
            "ms_per_view": round(dt * 1000 / 45, 2)}


def main():
    wanted = sys.argv[1:] or ["svgf", "restir"]
    data = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            data = json.load(f)
    for k in wanted:
        fn = {"svgf": bench_svgf, "restir": bench_restir,
              "quilt": bench_quilt}[k]
        try:
            data[{"svgf": "svgf_1080p", "restir": "restir_1080p",
                  "quilt": "quilt_5x9"}[k]] = fn()
        except Exception as e:
            data[k + "_error"] = f"{type(e).__name__}: {e}"
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(data))


if __name__ == "__main__":
    main()
