#!/usr/bin/env python
"""One-line trace-only measurement at bench wave size (1M rays) for a
given TAURAY_PTILE/TAURAY_PKBV/TAURAY_PVMEM_MB; sweep via:

  for t in 8 16 32; do for k in 8 16 32; do
    TAURAY_PTILE=$t TAURAY_PKBV=$k python scripts/trace_sweep.py; done; done
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from honest_timing import scan_time


def main():
    from tauray_tpu.options import parse_command_line_options
    from tauray_tpu.app.main import load_scenes
    from tauray_tpu.scene.arrays import SceneArrays
    from tauray_tpu.scene.device import to_device_scene, to_camera_uniforms
    from tauray_tpu.ops.cluster import build_cluster_tracer
    from tauray_tpu.ops import pallas_trace as ptr
    from tauray_tpu.stages import path_tracer as pt

    scene_path = os.environ.get("TAURAY_BENCH_SCENE",
                                "/root/reference/test/test.glb")
    W = H = 256
    SPP = int(os.environ.get("TAURAY_SWEEP_SPP", "16"))
    N = int(os.environ.get("TAURAY_PROFILE_N", "6"))
    opt = parse_command_line_options([
        "--renderer=path-tracer", f"--width={W}", f"--height={H}",
        "--max-ray-depth=4", "--headless=unused", "--filetype=none",
        scene_path])
    s = load_scenes(opt)
    arrays = SceneArrays(s, opt)
    tracer, _ = build_cluster_tracer(arrays.tri_pos, arrays.tri_instance)

    vps = [(e.camera, e.transform) for e in s.entities
           if e.camera is not None]
    cam = to_camera_uniforms(arrays.camera_uniforms(vps))
    R = W * H * SPP
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pix = np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.int32)
    pix = jnp.asarray(np.tile(pix, (SPP, 1)))
    vp = jnp.zeros(R, jnp.int32)
    prev = jnp.arange(R, dtype=jnp.uint32)  # distinct jitter per sample
    cfg = pt.PTConfig(width=W, height=H, n_views=1, max_bounces=4,
                      nee=pt.NEEWeights(0.25, 0.25, 0.25, 0.25),
                      has_envmap=False, has_point_lights=True)
    seed, origin, d, coord = jax.jit(pt._begin_sample,
                                     static_argnames=("cfg",))(
        cfg, cam, pix, vp, prev)
    tmin = jnp.zeros(R, jnp.float32)
    tmax = jnp.full(R, np.inf, jnp.float32)

    rng = np.random.default_rng(1)
    lo = np.asarray(tracer.cmin.min(axis=0))
    hi = np.asarray(tracer.cmax.max(axis=0))
    io = jnp.asarray(rng.random((R, 3)).astype(np.float32) * (hi - lo) + lo)
    idr = rng.standard_normal((R, 3)).astype(np.float32)
    idr /= np.linalg.norm(idr, axis=1, keepdims=True)
    idr = jnp.asarray(idr)

    def perturb(o, i):
        return o + (i.astype(jnp.float32) * 1e-7)[None, None]

    tag = (f"TILE={ptr.TILE:2d} KBV={ptr.KBV:2d} "
           f"vm={'y' if ptr.vm_fits(tracer.n_clusters) else 'n'}")
    cams = scan_time(
        lambda i: tracer.trace(perturb(origin, i), d, tmin, tmax,
                               need_uv=False), n=N)
    inc = scan_time(
        lambda i: tracer.trace(perturb(io, i), idr, tmin, tmax,
                               need_uv=False), n=N)
    sh = scan_time(
        lambda i: tracer.trace(perturb(io, i), idr, tmin, tmax,
                               any_hit=True, need_uv=False), n=N)
    print(f"{tag} R={R//1000}k cam={cams:7.1f}ms ({R/cams/1e3:6.1f} Mr/s)"
          f" incoh={inc:7.1f}ms ({R/inc/1e3:6.1f})"
          f" shadow={sh:7.1f}ms ({R/sh/1e3:6.1f})", flush=True)


if __name__ == "__main__":
    main()
