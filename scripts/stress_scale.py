#!/usr/bin/env python
"""Large-scene stress: ~1M-triangle procedural field through the full
renderer (Sponza-class triangle count; the repo has no big scene asset).
Reports build time, HBM-relevant array sizes and render throughput."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_scene(n_side=23):
    from tauray_tpu.scene.scene import Scene
    from tauray_tpu.scene.mesh import Mesh, Model
    from tauray_tpu.scene.material import Material
    from tauray_tpu.scene.transformable import Transformable
    from tauray_tpu.scene.light import DirectionalLight
    from tauray_tpu.scene.camera import Camera
    rng = np.random.default_rng(0)
    s = Scene()
    s.textures = []
    s.texture_meta = []
    # one icosphere-ish blob mesh, instanced n_side^2 times
    M = 2000   # tris per blob
    th = rng.random(M * 3).reshape(-1) * np.pi
    ph = rng.random(M * 3).reshape(-1) * 2 * np.pi
    pts = np.stack([np.sin(th) * np.cos(ph), np.cos(th),
                    np.sin(th) * np.sin(ph)], -1).astype(np.float32)
    verts = pts * (1.0 + 0.1 * rng.random((M * 3, 1), dtype=np.float32))
    idx = np.arange(M * 3, dtype=np.int32).reshape(M, 3)
    mesh = Mesh(positions=verts, indices=idx)
    for gy in range(n_side):
        for gx in range(n_side):
            model = Model()
            model.add_vertex_group(Material(
                albedo_factor=np.array(
                    [0.3 + 0.7 * rng.random(), 0.5, 0.6, 1.0],
                    np.float32),
                metallic_factor=float(rng.random() < 0.3),
                roughness_factor=0.4, double_sided=True), mesh)
            e = s.add(f"blob{gx}_{gy}")
            e.transform = Transformable(
                position=((gx - n_side / 2) * 2.5, 0,
                          (gy - n_side / 2) * 2.5))
            e.model = model
    le = s.add("sun")
    le.transform = Transformable()
    le.light = DirectionalLight((4.0, 3.8, 3.5))
    ce = s.add("cam")
    ce.transform = Transformable(position=(0, 18, 34))
    ce.transform.set_orientation(np.array(
        [-np.sin(np.pi / 8), 0, 0, np.cos(np.pi / 8)], np.float32))
    ce.camera = Camera()
    ce.camera.perspective(60, 1.0, 0.1, 300.0)
    ce.camera_enabled = True
    return s


def main():
    from tauray_tpu.options import Options
    from tauray_tpu.renderer.rt_renderer import PathTracerRenderer
    t0 = time.perf_counter()
    s = build_scene()
    print(f"scene build {time.perf_counter() - t0:.1f}s")
    opt = Options()
    opt.width = opt.height = 256
    opt.max_ray_depth = 3
    opt.tonemap = "linear"
    t0 = time.perf_counter()
    rr = PathTracerRenderer(opt)
    rr.set_scene(s)
    T = rr.arrays.tri_pos.shape[0]
    C = rr.bvh.n_clusters
    print(f"arrays+tracer build {time.perf_counter() - t0:.1f}s: "
          f"{T} tris, {C} clusters")
    rr.render()   # compile
    times = []
    for _ in range(3):
        rr.reset_accumulation()
        t0 = time.perf_counter()
        rr.render()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    rays = opt.width * opt.height * opt.max_ray_depth * 2
    img = np.asarray(rr.accum_color)
    print(f"frame {dt*1000:.0f} ms -> {rays/dt/1e6:.2f} Mrays/s; "
          f"mean {img[:, :3].mean():.4f} nan {np.isnan(img).sum()}")


if __name__ == "__main__":
    main()
