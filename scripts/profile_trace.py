#!/usr/bin/env python
"""Per-stage timing breakdown of the tracer hot path on real hardware.

Answers: where do the ms of a bench frame go? (ray sort / phase-1 cull /
phase-2 intersection / shading). Run on TPU.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=5, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1000, out


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

    trace = jax.jit(lambda o_, d_, tn, tx: tracer.trace(o_, d_, tn, tx))
    trace_nosort = jax.jit(lambda o_, d_, tn, tx: tracer.trace(
        o_, d_, tn, tx, sort_rays=False))
    ms, hit = timeit(trace, origin, d, tmin, tmax)
    print(f"coherent wave (sorted):    {ms:8.2f} ms")
    ms, _ = timeit(trace_nosort, origin, d, tmin, tmax)
    print(f"coherent wave (unsorted):  {ms:8.2f} ms")
    ms, _ = timeit(trace, io, idr, tmin, tmax)
    print(f"incoherent wave (sorted):  {ms:8.2f} ms")
    ms, _ = timeit(trace_nosort, io, idr, tmin, tmax)
    print(f"incoherent wave (unsorted):{ms:8.2f} ms")

    # ray sort alone
    def sortonly(o_, d_):
        key = _ray_sort_key(o_, d_, tracer.cmin.min(axis=0),
                            tracer.cmax.max(axis=0))
        perm = jnp.argsort(key)
        return o_[perm], d_[perm]
    ms, _ = timeit(jax.jit(sortonly), io, idr)
    print(f"ray sort alone:            {ms:8.2f} ms")

    # phase 1 alone + activity stats
    def phase1(o_, d_, tn, tx):
        n_tiles = R // TILE
        ro = o_.reshape(n_tiles, TILE, 3)
        rd = d_.reshape(n_tiles, TILE, 3)
        inv_d = jnp.where(rd == 0, jnp.float32(3e38),
                          1.0 / jnp.where(rd == 0, 1.0, rd))
        hc = _slab_hit_soa(
            ro[:, None, :, 0], ro[:, None, :, 1], ro[:, None, :, 2],
            inv_d[:, None, :, 0], inv_d[:, None, :, 1], inv_d[:, None, :, 2],
            tn.reshape(n_tiles, 1, TILE), tx.reshape(n_tiles, 1, TILE),
            tracer.cmin, tracer.cmax)
        return jnp.any(hc, axis=2).sum(axis=1)
    p1 = jax.jit(phase1)
    ms, counts_c = timeit(p1, origin, d, tmin, tmax)
    print(f"phase1 alone:              {ms:8.2f} ms")
    # sorted-ray activity stats
    key = _ray_sort_key(io, idr, tracer.cmin.min(axis=0),
                        tracer.cmax.max(axis=0))
    perm = jnp.argsort(key)
    counts_i = p1(io[perm], idr[perm], tmin, tmax)
    ck = _ray_sort_key(origin, d, tracer.cmin.min(axis=0),
                       tracer.cmax.max(axis=0))
    cperm = jnp.argsort(ck)
    counts_cs = p1(origin[cperm], d[cperm], tmin, tmax)
    for name, c in [("coherent(sorted)", counts_cs),
                    ("incoherent(sorted)", counts_i),
                    ("incoherent(raw)", p1(io, idr, tmin, tmax))]:
        c = np.asarray(c)
        print(f"  active clusters/tile {name}: mean={c.mean():.1f} "
              f"p50={np.percentile(c, 50):.0f} p90={np.percentile(c, 90):.0f} "
              f"max={c.max()} (of {tracer.n_clusters})")

    # shading alone
    hit = trace(origin, d, tmin, tmax)
    jax.block_until_ready(hit)
    z = jnp.zeros(R, jnp.float32)
    state = (seed, seed, origin, d, jnp.ones((R, 3), jnp.float32), z,
             jnp.ones(R, jnp.float32), z, z, z, jnp.ones(R, jnp.float32),
             jnp.ones(R, bool), jnp.zeros((R, 4), jnp.float32),
             jnp.zeros((R, 4), jnp.float32))
    vis = jnp.ones(R, jnp.float32)
    shade = jax.jit(pt._shade_bounce,
                    static_argnames=("cfg", "is_first", "max_bounces",
                                     "sobol_bounce"))
    ms, _ = timeit(lambda: shade(cfg, scene, state, hit, vis, jnp.int32(0),
                                 True, 4, coord, -1))
    print(f"shade bounce alone:        {ms:8.2f} ms")

    ms, _ = timeit(lambda: jax.jit(pt._nee_prep, static_argnames=(
        "cfg", "slot"))(cfg, scene, seed, seed, hit, origin, d, coord, -1))
    print(f"nee prep alone:            {ms:8.2f} ms")

    # full frame for scale
    f = jax.jit(pt.pt_trace_pass_inline, static_argnames=("cfg",))
    ms, _ = timeit(f, cfg, scene, tracer, cam, cam, pix, vp, prev)
    print(f"full frame (1spp depth4):  {ms:8.2f} ms")


if __name__ == "__main__":
    main()
