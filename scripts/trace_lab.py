#!/usr/bin/env python3
"""Traversal-config lab: measure cull/early-exit quality on REAL waves.

Captures the actual (origin, dir, t_min, t_max) waves a render pass
traces (camera, bounce, NEE shadow), then simulates the cluster tracer's
phase-1 cull + front-to-back early exit for a grid of configurations
(ray tile size, cluster size, early-exit group KB, ray sorting) WITHOUT
recompiling any kernel. Output: mean triangles tested per ray — the
quantity the Pallas phase-2 time is proportional to.

Usage: python scripts/trace_lab.py [--spp 4] [--size 256] [--tiles 256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def capture_waves(size, spp, depth, scene_path):
    os.environ["TAURAY_HOST_WAVEFRONT"] = "1"
    import jax.numpy as jnp
    from tauray_tpu.options import parse_command_line_options
    from tauray_tpu.app.main import load_scenes, create_renderer
    from tauray_tpu.stages import path_tracer as pt

    waves = []
    orig = pt.host_trace_alpha

    def record(scene, tracer, o, d, t_min, t_max, alpha_u, has_alpha,
               any_hit=False, rounds=6):
        R = o.shape[0]
        tmin = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
        tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
        waves.append(dict(o=np.asarray(o), d=np.asarray(d),
                          tmin=np.asarray(tmin), tmax=np.asarray(tmax),
                          any_hit=any_hit))
        return orig(scene, tracer, o, d, t_min, t_max, alpha_u, has_alpha,
                    any_hit, rounds)

    pt.host_trace_alpha = record
    import tauray_tpu.stages.path_tracer as _m
    opt = parse_command_line_options([
        "--renderer=path-tracer", f"--width={size}", f"--height={size}",
        f"--max-ray-depth={depth}", f"--samples-per-pixel={spp}",
        f"--samples-per-pass={spp}", "--headless=unused",
        "--filetype=none", scene_path])
    s = load_scenes(opt)
    rr = create_renderer(opt, s)
    rr.set_scene(s)
    rr.reset_accumulation()
    rr.render()
    pt.host_trace_alpha = orig
    tris = np.asarray(rr.arrays.tri_pos)
    tri_inst = np.asarray(rr.arrays.tri_instance)
    return waves, tris, tri_inst


def build_clusters(tris, tri_inst, cluster):
    """Morton-order clustering identical to ops/cluster.py (all-merged)."""
    from tauray_tpu.ops.bvh import morton_3d
    valid = tri_inst >= 0
    cent = tris.mean(axis=1)
    lo = cent[valid].min(axis=0)
    hi = cent[valid].max(axis=0)
    ext = np.maximum(hi - lo, 1e-12)
    grid = np.clip((cent - lo) / ext * 1023.0, 0, 1023).astype(np.uint32)
    codes = morton_3d(grid).astype(np.uint64)
    codes = codes + (~valid).astype(np.uint64) * (np.uint64(1) << 50)
    order = np.lexsort((np.arange(len(tris)), codes))
    n_valid = int(valid.sum())
    C = max((n_valid + cluster - 1) // cluster, 1)
    total = C * cluster
    perm = np.full(total, order[0], np.int64)
    perm[:min(len(order), total)] = order[:total]
    vmask = np.zeros(total, bool)
    vmask[:n_valid] = True
    pos = tris[perm]
    corners = pos.reshape(C, cluster, 3, 3)
    big = 3e38
    vm = vmask.reshape(C, cluster)[..., None, None]
    cmin = np.where(vm, corners, big).min(axis=(1, 2))
    cmax = np.where(vm, corners, -big).max(axis=(1, 2))
    v0 = pos[:, 0].reshape(C, cluster, 3)
    e1 = (pos[:, 1] - pos[:, 0]).reshape(C, cluster, 3)
    e2 = (pos[:, 2] - pos[:, 0]).reshape(C, cluster, 3)
    return dict(C=C, K=cluster, cmin=cmin, cmax=cmax, v0=v0, e1=e1, e2=e2,
                valid=vmask.reshape(C, cluster))


def morton10(g):
    g = g.astype(np.uint32) & 0x3FF
    x = g
    x = (x ^ (x << 16)) & 0xFF0000FF
    x = (x ^ (x << 8)) & 0x0300F00F
    x = (x ^ (x << 4)) & 0x030C30C3
    x = (x ^ (x << 2)) & 0x09249249
    return x[..., 0] + 2 * x[..., 1] + 4 * x[..., 2]


def sort_rays(o, d, mode, lo, hi):
    if mode == "none":
        return np.arange(len(o))
    octant = ((d[:, 0] > 0).astype(np.uint64) |
              ((d[:, 1] > 0).astype(np.uint64) << 1) |
              ((d[:, 2] > 0).astype(np.uint64) << 2))
    ext = np.maximum(hi - lo, 1e-6)
    g = np.clip((o - lo) / ext * 1023.0, 0, 1023).astype(np.uint32)
    m = morton10(g).astype(np.uint64)
    if mode == "origin-octant":
        key = (m << np.uint64(3)) | octant
    elif mode == "octant-origin":
        key = (octant << np.uint64(30)) | m
    elif mode == "dir-origin":
        # quantized direction (6 bits/axis) major, origin morton minor
        dg = np.clip((d * 0.5 + 0.5) * 31.0, 0, 31).astype(np.uint64)
        dk = (dg[:, 0] << 10) | (dg[:, 1] << 5) | dg[:, 2]
        key = (dk << np.uint64(30)) | m
    return np.argsort(key, kind="stable")


def slab(o, inv, tmin, tmax, cmin, cmax):
    """o/inv: (T, 3); returns (T, C) tn, active."""
    t0 = (cmin[None, :, :] - o[:, None, :]) * inv[:, None, :]
    t1 = (cmax[None, :, :] - o[:, None, :]) * inv[:, None, :]
    tn = np.minimum(t0, t1).max(axis=2)
    tf = np.maximum(t0, t1).min(axis=2)
    tn = np.maximum(tn, tmin[:, None])
    act = (tf >= tn) & (tn <= tmax[:, None])
    return tn, act


def mt_best(o, d, tmin, tmax, v0, e1, e2, valid):
    """Closest-hit t per ray against one cluster; o,d (T,3), cluster
    (K,3) arrays. Returns (T,) best t (inf when none)."""
    h = np.cross(d[:, None, :], e2[None, :, :])
    a = (e1[None] * h).sum(-1)
    f = np.where(a != 0, 1.0 / np.where(a == 0, 1.0, a), 0.0)
    s = o[:, None, :] - v0[None, :, :]
    u = f * (s * h).sum(-1)
    q = np.cross(s, e1[None, :, :])
    v = f * (d[:, None, :] * q).sum(-1)
    t = f * (e2[None] * q).sum(-1)
    hit = (a != 0) & (u >= 0) & (v >= 0) & (u + v <= 1) & \
        (t >= tmin[:, None]) & (t <= tmax[:, None]) & valid[None, :]
    t = np.where(hit, t, np.inf)
    return t.min(axis=1)


def simulate(wave, cl, tile, kb, sortmode, n_tiles_sample, rng):
    o, d, tmin, tmax = wave["o"], wave["d"], wave["tmin"], wave["tmax"]
    aliveish = tmax > 0
    lo = cl["cmin"].min(axis=0)
    hi = cl["cmax"].max(axis=0)
    perm = sort_rays(o, d, sortmode, lo, hi)
    o, d, tmin, tmax = o[perm], d[perm], tmin[perm], tmax[perm]
    R = len(o)
    n_tiles = R // tile
    pick = rng.choice(n_tiles, size=min(n_tiles_sample, n_tiles),
                      replace=False)
    tested = 0.0
    active_total = 0.0
    rays = 0
    for ti in pick:
        sl = slice(ti * tile, (ti + 1) * tile)
        to, td = o[sl], d[sl]
        ttmin, ttmax = tmin[sl], tmax[sl]
        live = ttmax > 0
        if not live.any():
            continue
        inv = np.where(td == 0, 3e38, 1.0 / np.where(td == 0, 1, td))
        tn, act = slab(to, inv, ttmin, ttmax, cl["cmin"], cl["cmax"])
        tile_act = act.any(axis=0)
        tile_tn = np.where(act, tn, np.inf).min(axis=0)
        order = np.argsort(tile_tn)
        n_act = int(tile_act.sum())
        active_total += n_act
        rays += int(live.sum())
        best = np.where(live, np.minimum(ttmax, 3e38), 0.0)
        k = 0
        while k < n_act:
            grp = order[k:k + kb]
            for c in grp:
                bt = mt_best(to, td, ttmin, best, cl["v0"][c],
                             cl["e1"][c], cl["e2"][c], cl["valid"][c])
                best = np.minimum(best, bt)
            tested += len(grp) * cl["K"] * int(live.sum())
            k += kb
            if k < n_act:
                nxt = tile_tn[order[min(k, n_act - 1)]]
                if np.all(best <= nxt):
                    break
    return (tested / max(rays, 1), active_total / max(len(pick), 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--tiles", type=int, default=192)
    ap.add_argument("--scene", default="/root/reference/test/test.glb")
    ap.add_argument("--cache", default="/tmp/trace_lab_waves.npz")
    args = ap.parse_args()

    if os.path.exists(args.cache):
        data = np.load(args.cache, allow_pickle=True)
        waves = list(data["waves"])
        tris = data["tris"]
        tri_inst = data["tri_inst"]
        print(f"loaded {len(waves)} cached waves")
    else:
        waves, tris, tri_inst = capture_waves(args.size, args.spp,
                                              args.depth, args.scene)
        np.savez(args.cache, waves=np.array(waves, dtype=object),
                 tris=tris, tri_inst=tri_inst)
        print(f"captured {len(waves)} waves")
    for i, w in enumerate(waves):
        live = float((w["tmax"] > 0).mean())
        print(f"  wave {i}: R={len(w['o'])} any_hit={w['any_hit']} "
              f"live={live:.2f}")

    rng = np.random.default_rng(0)
    clusters = {k: build_clusters(tris, tri_inst, k) for k in (128, 64, 32)}
    # representative waves: camera (0), first bounce (2), one shadow (1)
    sel = list(range(min(len(waves), 7)))
    configs = []
    for K in (128, 64, 32):
        for tile in (32, 16):
            for kb_tris in (1024, 512, 256):   # early-exit granularity
                kb = max(kb_tris // K, 1)
                for sm in ("none", "origin-octant", "dir-origin"):
                    configs.append((K, tile, kb, sm))
    print(f"{'K':>4} {'tile':>4} {'KB':>3} {'sort':>14} | per-wave tested "
          f"tris/ray (cam, sh0, b1, sh1, b2, ...)")
    for (K, tile, kb, sm) in configs:
        cl = clusters[K]
        res = []
        for wi in sel:
            tested, act = simulate(waves[wi], cl, tile, kb, sm,
                                   args.tiles, rng)
            res.append(tested)
        tot = sum(res)
        print(f"{K:>4} {tile:>4} {kb:>3} {sm:>14} | " +
              " ".join(f"{r:7.0f}" for r in res) + f"  sum={tot:8.0f}")


if __name__ == "__main__":
    main()
