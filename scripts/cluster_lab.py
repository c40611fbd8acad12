#!/usr/bin/env python
"""Cluster-builder quality: mean ACTIVE clusters per 32-ray kernel tile
(the quantity the traversal kernel's work is proportional to) for
different build orders, on real camera waves and bounce-like waves.

  median — current production builder (widest-axis median split)
  sah    — same top-down splits, but axis AND cut chosen by surface-
           area cost over CLUSTER-aligned cuts
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CLUSTER = 128
TILE = 32


def median_order(centroids, ids):
    out = []
    stack = [np.asarray(ids)]
    while stack:
        cur = stack.pop()
        if len(cur) <= CLUSTER:
            out.append(cur)
            continue
        c = centroids[cur]
        ax = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        k = len(cur) // 2
        k = max(CLUSTER * max(round(k / CLUSTER), 1), CLUSTER)
        k = min(k, len(cur) - 1)
        part = np.argpartition(c[:, ax], k)
        stack.append(cur[part[k:]])
        stack.append(cur[part[:k]])
    return np.concatenate(out)


def sah_order(centroids, tlo, thi, ids):
    """Top-down splits; cut = argmin over (axis, CLUSTER-aligned k) of
    SA(L)*k + SA(R)*(n-k) with L/R the coordinate-sorted prefix/suffix
    triangle AABB unions."""
    out = []
    stack = [np.asarray(ids)]
    while stack:
        cur = stack.pop()
        n = len(cur)
        if n <= CLUSTER:
            out.append(cur)
            continue
        best = None
        for ax in range(3):
            o = cur[np.argsort(centroids[cur, ax], kind="stable")]
            lo = tlo[o]
            hi = thi[o]
            pre_lo = np.minimum.accumulate(lo)
            pre_hi = np.maximum.accumulate(hi)
            suf_lo = np.minimum.accumulate(lo[::-1])[::-1]
            suf_hi = np.maximum.accumulate(hi[::-1])[::-1]

            def sa(lo_, hi_):
                d = np.maximum(hi_ - lo_, 0)
                return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + \
                    d[:, 2] * d[:, 0]
            ks = np.arange(CLUSTER, n, CLUSTER)
            if not len(ks):
                ks = np.array([n // 2])
            cost = sa(pre_lo[ks - 1], pre_hi[ks - 1]) * ks + \
                sa(suf_lo[ks], suf_hi[ks]) * (n - ks)
            j = int(np.argmin(cost))
            if best is None or cost[j] < best[0]:
                best = (cost[j], o, int(ks[j]))
        _, o, k = best
        stack.append(o[k:])
        stack.append(o[:k])
    return np.concatenate(out)


def activations(order, tri_pos, o, d, tmin, tmax):
    """Mean active clusters per TILE-ray tile (phase-1 slab test on the
    built clusters, rays pre-sorted by the production sort key)."""
    from tauray_tpu.ops.cluster import _ray_sort_key, _slab_hit_soa
    T = len(order)
    pad = (-T) % CLUSTER
    if pad:
        order = np.concatenate([order, order[-1:].repeat(pad)])
    pos = tri_pos[order]
    C = len(order) // CLUSTER
    grp = pos.reshape(C, CLUSTER, 3, 3)
    cmin = jnp.asarray(grp.min(axis=(1, 2)))
    cmax = jnp.asarray(grp.max(axis=(1, 2)))
    key = _ray_sort_key(o, d, cmin.min(axis=0), cmax.max(axis=0))
    perm = jnp.argsort(key)
    o = o[perm]
    d = d[perm]
    R = o.shape[0]
    n_tiles = R // TILE
    ro = o.reshape(n_tiles, TILE, 3)
    rd = d.reshape(n_tiles, TILE, 3)
    inv_d = jnp.where(rd == 0, jnp.float32(3e38),
                      1.0 / jnp.where(rd == 0, 1.0, rd))
    hc = _slab_hit_soa(
        ro[:, None, :, 0], ro[:, None, :, 1], ro[:, None, :, 2],
        inv_d[:, None, :, 0], inv_d[:, None, :, 1], inv_d[:, None, :, 2],
        tmin.reshape(n_tiles, 1, TILE), tmax.reshape(n_tiles, 1, TILE),
        cmin, cmax)
    act = jnp.any(hc, axis=2).sum(axis=1)
    per_ray = hc.sum(axis=(1, 2)) / TILE
    return float(act.mean()), float(per_ray.mean()), C


def main():
    from tauray_tpu.options import parse_command_line_options
    from tauray_tpu.app.main import load_scenes
    from tauray_tpu.scene.arrays import SceneArrays
    from tauray_tpu.scene.device import to_camera_uniforms
    from tauray_tpu.stages import path_tracer as pt

    scene_path = os.environ.get("TAURAY_BENCH_SCENE",
                                "/root/reference/test/test.glb")
    opt = parse_command_line_options([
        "--renderer=path-tracer", "--width=256", "--height=256",
        "--headless=unused", "--filetype=none", scene_path])
    s = load_scenes(opt)
    arrays = SceneArrays(s, opt)
    tri_pos = np.asarray(arrays.tri_pos)
    valid = np.asarray(arrays.tri_instance) >= 0
    tri_pos = tri_pos[valid]
    T = tri_pos.shape[0]
    centroids = tri_pos.mean(axis=1)
    tlo = tri_pos.min(axis=1)
    thi = tri_pos.max(axis=1)
    print(f"{T} tris")

    # camera wave
    vps = [(e.camera, e.transform) for e in s.entities
           if e.camera is not None]
    cam = to_camera_uniforms(arrays.camera_uniforms(vps))
    W = H = 256
    R = W * H
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pix = jnp.asarray(np.stack([xs.reshape(-1), ys.reshape(-1)],
                               -1).astype(np.int32))
    cfg = pt.PTConfig(width=W, height=H, n_views=1, max_bounces=4,
                      nee=pt.NEEWeights(0.25, 0.25, 0.25, 0.25),
                      has_envmap=False, has_point_lights=True)
    _, co, cd, _ = jax.jit(pt._begin_sample, static_argnames=("cfg",))(
        cfg, cam, pix, jnp.zeros(R, jnp.int32),
        jnp.zeros(R, jnp.uint32))

    # bounce-like wave: origins on random triangle surfaces, cosine dirs
    # around the (unoriented) normal
    rng = np.random.default_rng(2)
    ti = rng.integers(0, T, R)
    b1 = rng.random(R, np.float32)
    b2 = rng.random(R, np.float32)
    swap = b1 + b2 > 1
    b1 = np.where(swap, 1 - b1, b1)
    b2 = np.where(swap, 1 - b2, b2)
    p = (tri_pos[ti, 0] * (1 - b1 - b2)[:, None] +
         tri_pos[ti, 1] * b1[:, None] + tri_pos[ti, 2] * b2[:, None])
    nrm = np.cross(tri_pos[ti, 1] - tri_pos[ti, 0],
                   tri_pos[ti, 2] - tri_pos[ti, 0])
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-20)
    v = rng.standard_normal((R, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v = np.where((v * nrm).sum(1, keepdims=True) < 0, -v, v)
    bo = jnp.asarray((p + nrm * 1e-4).astype(np.float32))
    bd = jnp.asarray(v.astype(np.float32))

    tmin = jnp.zeros(R, jnp.float32)
    tmax = jnp.full(R, 3e38, jnp.float32)

    builders = {"median": lambda: median_order(centroids, np.arange(T)),
                "sah": lambda: sah_order(centroids, tlo, thi,
                                         np.arange(T))}
    for name, fn in builders.items():
        t0 = time.perf_counter()
        order = fn()
        bt = time.perf_counter() - t0
        a_cam, pr_cam, C = activations(order, tri_pos, co, cd, tmin, tmax)
        a_b, pr_b, _ = activations(order, tri_pos, bo, bd, tmin, tmax)
        print(f"{name:7s} C={C} build={bt*1e3:7.0f}ms  "
              f"cam tile-act={a_cam:6.1f} ray-act={pr_cam:6.1f}   "
              f"bounce tile-act={a_b:6.1f} ray-act={pr_b:6.1f}",
              flush=True)


if __name__ == "__main__":
    main()
