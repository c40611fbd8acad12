#!/usr/bin/env python
"""Per-stage timing breakdown of the tracer hot path on real hardware.

Answers: where do the ms of a bench frame go? (ray sort / phase-1 cull /
phase-2 intersection / shading). Run on TPU.

Timing methodology: see scripts/honest_timing.py — every number here is
amortized over a jitted lax.scan with per-step input perturbation and a
forced device_get readback, because single-dispatch timing through the
device tunnel is unreliable.
"""
import os
import sys

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
    from tauray_tpu.ops.cluster import (build_cluster_tracer, TILE,
                                        _ray_sort_key, _slab_hit_soa)
    from tauray_tpu.stages import path_tracer as pt

    scene_path = os.environ.get("TAURAY_BENCH_SCENE",
                                "/root/reference/test/test.glb")
    W = H = int(os.environ.get("TAURAY_BENCH_SIZE", "256"))
    N = int(os.environ.get("TAURAY_PROFILE_N", "8"))
    opt = parse_command_line_options([
        "--renderer=path-tracer", f"--width={W}", f"--height={H}",
        "--max-ray-depth=4", "--headless=unused", "--filetype=none",
        scene_path])
    s = load_scenes(opt)
    arrays = SceneArrays(s, opt)
    scene = to_device_scene(arrays)
    tracer, _ = build_cluster_tracer(arrays.tri_pos, arrays.tri_instance)
    print(f"tris={arrays.tri_pos.shape[0]} clusters={tracer.n_clusters} "
          f"pallas={'y' if tracer.tris9 is not None else 'n'}")

    vps = [(e.camera, e.transform) for e in s.entities
           if e.camera is not None]
    cam = to_camera_uniforms(arrays.camera_uniforms(vps))

    R = W * H
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pix = jnp.asarray(np.stack([xs.reshape(-1), ys.reshape(-1)], -1)
                      .astype(np.int32))
    vp = jnp.zeros(R, jnp.int32)
    prev = jnp.zeros(R, jnp.uint32)
    cfg = pt.PTConfig(width=W, height=H, n_views=1, max_bounces=4,
                      nee=pt.NEEWeights(0.25, 0.25, 0.25, 0.25),
                      has_envmap=False, has_point_lights=True)

    seed, origin, d, coord = jax.jit(pt._begin_sample,
                                     static_argnames=("cfg",))(
        cfg, cam, pix, vp, prev)

    tmin = jnp.zeros(R, jnp.float32)
    tmax = jnp.full(R, np.inf, jnp.float32)

    # incoherent wave: random dirs from random scene points
    rng = np.random.default_rng(1)
    lo = np.asarray(tracer.cmin.min(axis=0))
    hi = np.asarray(tracer.cmax.max(axis=0))
    io = jnp.asarray(rng.random((R, 3)).astype(np.float32) * (hi - lo) + lo)
    idr = rng.standard_normal((R, 3)).astype(np.float32)
    idr /= np.linalg.norm(idr, axis=1, keepdims=True)
    idr = jnp.asarray(idr)

    def perturb(o, i):
        return o + (i.astype(jnp.float32) * 1e-7)[None, None]

    ms = scan_time(lambda i: tracer.trace(perturb(origin, i), d, tmin, tmax),
                   n=N)
    print(f"coherent wave (sorted):    {ms:8.2f} ms")
    ms = scan_time(lambda i: tracer.trace(perturb(origin, i), d, tmin, tmax,
                                          sort_rays=False), n=N)
    print(f"coherent wave (unsorted):  {ms:8.2f} ms")
    ms = scan_time(lambda i: tracer.trace(perturb(io, i), idr, tmin, tmax),
                   n=N)
    print(f"incoherent wave (sorted):  {ms:8.2f} ms")
    ms = scan_time(lambda i: tracer.trace(perturb(io, i), idr, tmin, tmax,
                                          sort_rays=False), n=N)
    print(f"incoherent wave (unsorted):{ms:8.2f} ms")

    def sortonly(i):
        o_ = perturb(io, i)
        key = _ray_sort_key(o_, idr, tracer.cmin.min(axis=0),
                            tracer.cmax.max(axis=0))
        perm = jnp.argsort(key)
        return o_[perm], idr[perm]
    print(f"ray sort alone:            {scan_time(sortonly, n=N):8.2f} ms")

    def phase1(i):
        o_ = perturb(origin, i)
        n_tiles = R // TILE
        ro = o_.reshape(n_tiles, TILE, 3)
        rd = d.reshape(n_tiles, TILE, 3)
        inv_d = jnp.where(rd == 0, jnp.float32(3e38),
                          1.0 / jnp.where(rd == 0, 1.0, rd))
        hc = _slab_hit_soa(
            ro[:, None, :, 0], ro[:, None, :, 1], ro[:, None, :, 2],
            inv_d[:, None, :, 0], inv_d[:, None, :, 1], inv_d[:, None, :, 2],
            tmin.reshape(n_tiles, 1, TILE), tmax.reshape(n_tiles, 1, TILE),
            tracer.cmin, tracer.cmax)
        return jnp.any(hc, axis=2).sum(axis=1)
    print(f"phase1 alone:              {scan_time(phase1, n=N):8.2f} ms")

    # activity stats (single dispatch; values, not timing)
    p1 = jax.jit(phase1)
    key = _ray_sort_key(io, idr, tracer.cmin.min(axis=0),
                        tracer.cmax.max(axis=0))
    perm = jnp.argsort(key)
    io_s, idr_s = io[perm], idr[perm]

    def phase1_io(i):
        o_ = perturb(io_s, i)
        n_tiles = R // TILE
        ro = o_.reshape(n_tiles, TILE, 3)
        rd = idr_s.reshape(n_tiles, TILE, 3)
        inv_d = jnp.where(rd == 0, jnp.float32(3e38),
                          1.0 / jnp.where(rd == 0, 1.0, rd))
        hc = _slab_hit_soa(
            ro[:, None, :, 0], ro[:, None, :, 1], ro[:, None, :, 2],
            inv_d[:, None, :, 0], inv_d[:, None, :, 1], inv_d[:, None, :, 2],
            tmin.reshape(n_tiles, 1, TILE), tmax.reshape(n_tiles, 1, TILE),
            tracer.cmin, tracer.cmax)
        return jnp.any(hc, axis=2).sum(axis=1)
    for name, c in [("coherent", jax.device_get(p1(jnp.int32(0)))),
                    ("incoherent(sorted)",
                     jax.device_get(jax.jit(phase1_io)(jnp.int32(0))))]:
        c = np.asarray(c)
        print(f"  active clusters/tile {name}: mean={c.mean():.1f} "
              f"p50={np.percentile(c, 50):.0f} p90={np.percentile(c, 90):.0f} "
              f"max={c.max()} (of {tracer.n_clusters})")

    hit = jax.jit(lambda: tracer.trace(origin, d, tmin, tmax))()
    z = jnp.zeros(R, jnp.float32)
    state = (seed, seed, origin, d, jnp.ones((R, 3), jnp.float32), z,
             jnp.ones(R, jnp.float32), z, z, z, jnp.ones(R, jnp.float32),
             jnp.ones(R, bool), jnp.zeros((R, 4), jnp.float32),
             jnp.zeros((R, 4), jnp.float32))
    vis = jnp.ones(R, jnp.float32)

    def shade(i):
        st = (seed + i.astype(jnp.uint32), *state[1:])
        out, _ = pt._shade_bounce(cfg, scene, st, hit, vis, jnp.int32(0),
                                  True, 4, coord, -1)
        return out[-2]
    print(f"shade bounce alone:        {scan_time(shade, n=N):8.2f} ms")

    def neep(i):
        return pt._nee_prep(cfg, scene, seed + i.astype(jnp.uint32), seed,
                            hit, origin, d, coord, -1)
    print(f"nee prep alone:            {scan_time(neep, n=N):8.2f} ms")

    def frame(i):
        return pt.pt_trace_pass_inline(cfg, scene, tracer, cam, cam, pix,
                                       vp, prev + i.astype(jnp.uint32))
    ms = scan_time(frame, n=max(N // 2, 2))
    print(f"full frame (1spp depth4):  {ms:8.2f} ms")
    rays = R * 4 * 2
    print(f"  -> {rays / ms / 1e3:.1f} Mrays/s")


if __name__ == "__main__":
    main()
