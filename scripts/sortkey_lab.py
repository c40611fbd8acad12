#!/usr/bin/env python
"""Ray sort-key study: which wave ordering minimizes the mean ACTIVE
clusters per 32-ray tile (the traversal kernel's work unit) on
bounce-like waves, where per-ray activation is ~7.5 clusters but the
production key's tile union is ~107 (scripts/cluster_lab.py)?

Variants:
  cur     — production: direction 5 bits/axis major, origin morton minor
  d4      — direction 4 bits/axis major, origin morton minor
  six     — 6D interleave: morton bits of (origin, direction) alternated
  perp    — direction octant+fine major, then 2D morton of the origin
            projected PERPENDICULAR to the dominant direction axis
            (rays in the same corridor share clusters; position ALONG
            the ray barely changes the activated set)
  perp8   — perp with 8-bit perpendicular cells
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CLUSTER = 128
TILE = 32


def morton2(x, y):
    def part(v):
        v = (v | (v << np.uint32(8))) & np.uint32(0x00FF00FF)
        v = (v | (v << np.uint32(4))) & np.uint32(0x0F0F0F0F)
        v = (v | (v << np.uint32(2))) & np.uint32(0x33333333)
        v = (v | (v << np.uint32(1))) & np.uint32(0x55555555)
        return v
    return part(x) | (part(y) << np.uint32(1))


def keys_for(variant, o, d, lo, hi):
    o = np.asarray(o)
    d = np.asarray(d)
    ext = np.maximum(hi - lo, 1e-6)
    g10 = np.clip((o - lo) / ext * 1023.0, 0, 1023).astype(np.uint32)
    from tauray_tpu.ops.cluster import _morton10_jnp
    m30 = np.asarray(_morton10_jnp(jnp.asarray(g10)))
    if variant == "cur":
        dg = np.clip((d * 0.5 + 0.5) * 31.0, 0, 31).astype(np.uint32)
        dk = (dg[:, 0] << 10) | (dg[:, 1] << 5) | dg[:, 2]
        return (dk.astype(np.uint64) << np.uint64(17)) | \
            (m30 >> np.uint32(13)).astype(np.uint64)
    if variant == "d4":
        dg = np.clip((d * 0.5 + 0.5) * 15.0, 0, 15).astype(np.uint32)
        dk = (dg[:, 0] << 8) | (dg[:, 1] << 4) | dg[:, 2]
        return (dk.astype(np.uint64) << np.uint64(21)) | \
            (m30 >> np.uint32(9)).astype(np.uint64)
    if variant == "six":
        dg = np.clip((d * 0.5 + 0.5) * 1023.0, 0, 1023).astype(np.uint32)
        md = np.asarray(_morton10_jnp(jnp.asarray(dg)))
        # interleave 2-bit groups of (dir morton, origin morton)
        key = np.zeros(len(o), np.uint64)
        for i in range(15):
            key |= (((md >> np.uint32(28 - 2 * i)) & np.uint32(3))
                    .astype(np.uint64) << np.uint64(62 - 4 * i))
            key |= (((m30 >> np.uint32(28 - 2 * i)) & np.uint32(3))
                    .astype(np.uint64) << np.uint64(60 - 4 * i))
        return key
    if variant.startswith("perp"):
        dbits = {"perp": 4, "perp8": 4, "perp5": 5,
                 "perp6": 6, "perpX": 4}[variant]
        bits = {"perp": 10, "perp8": 8, "perp5": 10,
                "perp6": 10, "perpX": 10}[variant]
        ax = np.argmax(np.abs(d), axis=1)
        others = np.array([[1, 2], [0, 2], [0, 1]])[ax]
        dsc = (1 << dbits) - 1
        dg = np.clip((d * 0.5 + 0.5) * dsc, 0, dsc).astype(np.uint32)
        dk = ((dg[np.arange(len(o)), others[:, 0]] << dbits) |
              dg[np.arange(len(o)), others[:, 1]]).astype(np.uint64)
        dk |= np.uint64(1 << (2 * dbits)) * ax.astype(np.uint64)
        dk |= np.uint64(1 << (2 * dbits + 2)) * \
            (d[np.arange(len(o)), ax] < 0)
        scale = (1 << bits) - 1
        gq = np.clip((o - lo) / ext * scale, 0, scale).astype(np.uint32)
        px = gq[np.arange(len(o)), others[:, 0]]
        py = gq[np.arange(len(o)), others[:, 1]]
        perp = morton2(px, py).astype(np.uint64)
        along = gq[np.arange(len(o)), ax].astype(np.uint64)
        if variant == "perpX":     # no along-axis bits at all
            along = np.zeros_like(along)
        return (dk << np.uint64(53)) | (perp << np.uint64(10)) | \
            (along >> np.uint64(max(bits - 10, 0)))
    raise ValueError(variant)


def main():
    from tauray_tpu.options import parse_command_line_options
    from tauray_tpu.app.main import load_scenes
    from tauray_tpu.scene.arrays import SceneArrays
    from tauray_tpu.ops.cluster import _slab_hit_soa
    from cluster_lab import sah_order, median_order

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

    builder = os.environ.get("TAURAY_LAB_BUILDER", "sah")
    if builder == "sah":
        order = sah_order(centroids, tri_pos.min(axis=1),
                          tri_pos.max(axis=1), np.arange(T))
    else:
        order = median_order(centroids, np.arange(T))
    pad = (-T) % CLUSTER
    if pad:
        order = np.concatenate([order, order[-1:].repeat(pad)])
    grp = tri_pos[order].reshape(-1, CLUSTER, 3, 3)
    cmin = jnp.asarray(grp.min(axis=(1, 2)))
    cmax = jnp.asarray(grp.max(axis=(1, 2)))
    lo = np.asarray(cmin.min(axis=0))
    hi = np.asarray(cmax.max(axis=0))

    R = 1 << 20
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
    bo = (p + nrm * 1e-4).astype(np.float32)
    bd = v.astype(np.float32)

    n_tiles = R // TILE
    tmin = jnp.zeros(R, jnp.float32).reshape(n_tiles, 1, TILE)
    tmax = jnp.full(R, 3e38, jnp.float32).reshape(n_tiles, 1, TILE)

    @jax.jit
    def count(o, d):
        ro = o.reshape(n_tiles, TILE, 3)
        rd = d.reshape(n_tiles, TILE, 3)
        inv_d = jnp.where(rd == 0, jnp.float32(3e38),
                          1.0 / jnp.where(rd == 0, 1.0, rd))
        hc = _slab_hit_soa(
            ro[:, None, :, 0], ro[:, None, :, 1], ro[:, None, :, 2],
            inv_d[:, None, :, 0], inv_d[:, None, :, 1],
            inv_d[:, None, :, 2], tmin, tmax, cmin, cmax)
        return jnp.any(hc, axis=2).sum(axis=1).mean()

    # coherent camera wave at the same R (16 jittered spp)
    from tauray_tpu.scene.device import to_camera_uniforms
    from tauray_tpu.stages import path_tracer as pt
    vps = [(e.camera, e.transform) for e in s.entities
           if e.camera is not None]
    cam = to_camera_uniforms(arrays.camera_uniforms(vps))
    W = H = 256
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pix = np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.int32)
    pix = jnp.asarray(np.tile(pix, (R // (W * H), 1)))
    cfg = pt.PTConfig(width=W, height=H, n_views=1, max_bounces=4,
                      nee=pt.NEEWeights(0.25, 0.25, 0.25, 0.25),
                      has_envmap=False, has_point_lights=True)
    _, co, cd, _ = jax.jit(pt._begin_sample, static_argnames=("cfg",))(
        cfg, cam, pix, jnp.zeros(R, jnp.int32),
        jnp.arange(R, dtype=jnp.uint32))
    co = np.asarray(co)
    cd = np.asarray(cd)

    print(f"{T} tris, C={len(order)//CLUSTER}, builder={builder}, "
          f"waves R={R>>20}M")
    for variant in ("cur", "d4", "six", "perp", "perp5", "perp6",
                    "perpX"):
        key = keys_for(variant, bo, bd, lo, hi)
        perm = np.argsort(key, kind="stable")
        a = float(count(jnp.asarray(bo[perm]), jnp.asarray(bd[perm])))
        key = keys_for(variant, co, cd, lo, hi)
        perm = np.argsort(key, kind="stable")
        ac = float(count(jnp.asarray(co[perm]), jnp.asarray(cd[perm])))
        print(f"  {variant:6s} bounce tile-act={a:7.1f}   "
              f"cam tile-act={ac:7.1f}", flush=True)


if __name__ == "__main__":
    main()
