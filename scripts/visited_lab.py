#!/usr/bin/env python
"""How many cluster-batch steps does the kernel actually VISIT before
the front-to-back early exit fires, vs the phase-1 ACTIVE count?
Uses the VM kernel's debug_steps output on real waves."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


from functools import partial


@partial(jax.jit, static_argnames=("any_hit",))
def _steps_jit(tracer, o, d, t_min, t_max, any_hit=False):
    from tauray_tpu.ops.cluster import (TILE, _ray_sort_key,
                                        _slab_t_soa)
    from tauray_tpu.ops.pallas_trace import (TILE as PT,
                                             pallas_trace_tiles_vm)
    key = _ray_sort_key(o, d, tracer.cmin.min(axis=0),
                        tracer.cmax.max(axis=0))
    perm = jnp.argsort(key)
    o, d, t_min, t_max = o[perm], d[perm], t_min[perm], t_max[perm]
    R = o.shape[0]
    C = tracer.n_clusters
    n_blocks = R // TILE
    sub = TILE // PT
    n_tiles = R // PT
    ro = o.reshape(n_blocks, TILE, 3)
    rd = d.reshape(n_blocks, TILE, 3)
    rtmin = t_min.reshape(n_blocks, TILE)
    rtmax = t_max.reshape(n_blocks, TILE)
    inv_d = jnp.where(rd == 0, jnp.float32(3e38),
                      1.0 / jnp.where(rd == 0, 1.0, rd))
    tn, tf = _slab_t_soa(
        ro[:, None, :, 0], ro[:, None, :, 1], ro[:, None, :, 2],
        inv_d[:, None, :, 0], inv_d[:, None, :, 1], inv_d[:, None, :, 2],
        tracer.cmin, tracer.cmax)
    tn = jnp.maximum(tn, rtmin[:, None, :])
    active_rc = (tf >= tn) & (tn <= rtmax[:, None, :])
    inf = jnp.float32(jnp.inf)
    tile_tnear = jnp.min(
        jnp.where(active_rc, tn, inf).reshape(n_blocks, C, sub, PT),
        axis=3)
    tile_tnear = jnp.transpose(tile_tnear, (0, 2, 1)).reshape(n_tiles, C)
    counts = jnp.sum(tile_tnear < inf, axis=1).astype(jnp.int32)
    cpad = 1024 * (-(-(C + 8) // 1024))
    idbits = max(int(np.ceil(np.log2(max(C, 2)))), 1)
    idmask = (1 << idbits) - 1
    tn_bits = jax.lax.bitcast_convert_type(tile_tnear, jnp.int32)
    cid = jnp.arange(C, dtype=jnp.int32)[None, :]
    k2 = (tn_bits & ~idmask) | cid
    k2 = jnp.where(jnp.isfinite(tile_tnear), k2, jnp.int32(0x7FFFFFFF))
    k2 = jnp.pad(k2, ((0, 0), (0, cpad - C)),
                 constant_values=0x7FFFFFFF)
    keys = jnp.sort(k2, axis=1)
    opaque = (jnp.pad(tracer.opaque.astype(jnp.int32),
                      (0, 1024 * (-(-C // 1024)) - C))
              if any_hit and tracer.opaque is not None
              else jnp.ones(1024, jnp.int32))
    o3 = o.reshape(n_tiles, PT, 3)
    d3 = d.reshape(n_tiles, PT, 3)
    mm2 = jnp.stack([t_min, t_max], axis=-1).reshape(n_tiles, PT, 2)
    return pallas_trace_tiles_vm(
        counts, keys, o3, d3, mm2, tracer.tris12, opaque, C, cpad,
        idmask, any_hit=any_hit, debug_steps=True)


def steps_for(tracer, o, d, t_min, t_max, any_hit=False):
    from tauray_tpu.ops.pallas_trace import KBV
    steps, cnt = _steps_jit(tracer, o, d, t_min, t_max, any_hit=any_hit)
    visited = np.asarray(steps) * KBV
    act = np.asarray(cnt)
    visited = np.minimum(visited, act)
    return visited, act


def main():
    from tauray_tpu.options import parse_command_line_options
    from tauray_tpu.app.main import load_scenes
    from tauray_tpu.scene.arrays import SceneArrays
    from tauray_tpu.scene.device import to_camera_uniforms
    from tauray_tpu.ops.cluster import build_cluster_tracer
    from tauray_tpu.stages import path_tracer as pt

    scene_path = os.environ.get("TAURAY_BENCH_SCENE",
                                "/root/reference/test/test.glb")
    opt = parse_command_line_options([
        "--renderer=path-tracer", "--width=256", "--height=256",
        "--headless=unused", "--filetype=none", scene_path])
    s = load_scenes(opt)
    arrays = SceneArrays(s, opt)
    tracer, _ = build_cluster_tracer(arrays.tri_pos, arrays.tri_instance)
    tri_pos = np.asarray(arrays.tri_pos)
    valid = np.asarray(arrays.tri_instance) >= 0
    tri_pos = tri_pos[valid]
    T = tri_pos.shape[0]

    vps = [(e.camera, e.transform) for e in s.entities
           if e.camera is not None]
    cam = to_camera_uniforms(arrays.camera_uniforms(vps))
    W = H = 256
    SPP = 16
    R = W * H * SPP
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pix = np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.int32)
    pix = jnp.asarray(np.tile(pix, (SPP, 1)))
    cfg = pt.PTConfig(width=W, height=H, n_views=1, max_bounces=4,
                      nee=pt.NEEWeights(0.25, 0.25, 0.25, 0.25),
                      has_envmap=False, has_point_lights=True)
    _, co, cd, _ = jax.jit(pt._begin_sample, static_argnames=("cfg",))(
        cfg, cam, pix, jnp.zeros(R, jnp.int32),
        jnp.arange(R, dtype=jnp.uint32))

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
    for name, (o, d, ah) in {
            "camera": (co, cd, False),
            "bounce": (bo, bd, False),
            "shadow": (bo, bd, True)}.items():
        vis, act = steps_for(tracer, o, d, tmin, tmax, any_hit=ah)
        print(f"{name:7s} visited mean={vis.mean():6.1f} "
              f"p50={np.percentile(vis, 50):5.0f} "
              f"p90={np.percentile(vis, 90):5.0f} "
              f"max={vis.max():5.0f}   active mean={act.mean():6.1f}",
              flush=True)


if __name__ == "__main__":
    main()
