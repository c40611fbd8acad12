#!/usr/bin/env python
"""Kernel-visited steps vs phase-1 active counts on REAL captured waves,
under the EXACT production path (signature sort + v2 VMEM kernel
debug_steps). Answers VERDICT-r4 weak #6: does the front-to-back /
any-hit early exit actually fire, per wave kind?

Env: SCENE (default proc sponza), SIZE=WxH, SPP, ANY_HIT=0/1.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


@partial(jax.jit, static_argnames=("any_hit", "sort"))
def _steps_jit(tracer, o, d, t_min, t_max, any_hit=False, sort=True):
    from tauray_tpu.ops.cluster import TILE, _sig_sort_key, _slab_t_soa
    from tauray_tpu.ops.pallas_trace import (TILE as PT, KBV,
                                             pallas_trace_tiles_vm2)
    if sort:
        key = _sig_sort_key(tracer, o, d, t_min, t_max)
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
    # per-ray need: how many cluster AABBs each individual ray enters
    need = jnp.sum(active_rc, axis=1).reshape(-1)           # (R,)
    live_r = (t_max.reshape(-1) > 0)
    need_live = jnp.sum(jnp.where(live_r, need, 0)) / \
        jnp.maximum(jnp.sum(live_r), 1)
    cpad = 1024 * (-(-(C + 8) // 1024))
    idbits = max(int(np.ceil(np.log2(max(C, 2)))), 1)
    idmask = (1 << idbits) - 1
    tn_bits = jax.lax.bitcast_convert_type(tile_tnear, jnp.int32)
    cid = jnp.arange(C, dtype=jnp.int32)[None, :]
    k2 = (tn_bits & ~idmask) | cid
    k2 = jnp.where(jnp.isfinite(tile_tnear), k2, jnp.int32(0x7FFFFFFF))
    k2 = jnp.pad(k2, ((0, 0), (0, cpad - C)), constant_values=0x7FFFFFFF)
    keys = jnp.sort(k2, axis=1)
    opad = 1024 * (-(-C // 1024))
    if any_hit and tracer.opaque is not None:
        opaque = jnp.pad(tracer.opaque.astype(jnp.int32), (0, opad - C))
    else:
        opaque = jnp.ones(1024, jnp.int32)
    o3 = o.reshape(n_tiles, PT, 3)
    d3 = d.reshape(n_tiles, PT, 3)
    mm2 = jnp.stack([t_min, t_max], axis=-1).reshape(n_tiles, PT, 2)
    steps, cnts = pallas_trace_tiles_vm2(
        counts, keys, o3, d3, mm2, tracer.tris12, opaque, C, cpad,
        idmask, any_hit=any_hit, debug_steps=True,
        kbv=int(os.environ.get("LAB_KBV", "8")))
    return steps, cnts, need_live


def main():
    from tauray_tpu.options import parse_command_line_options
    from tauray_tpu.app.main import load_scenes, create_renderer
    from tauray_tpu.ops.pallas_trace import KBV

    scene = os.environ.get("SCENE", "proc://sponza?tris=262144")
    W, H = (int(x) for x in os.environ.get("SIZE", "960x540").split("x"))
    spp = int(os.environ.get("SPP", "1"))
    opt = parse_command_line_options([
        "--renderer=path-tracer", f"--width={W}", f"--height={H}",
        "--max-ray-depth=4", f"--samples-per-pixel={spp}",
        f"--samples-per-pass={spp}", "--headless=unused",
        "--filetype=none", scene])
    s = load_scenes(opt)
    rr = create_renderer(opt, s)
    rr.set_scene(s)
    waves = rr.capture_waves()
    C = rr.bvh.n_clusters
    kbv = int(os.environ.get("LAB_KBV", "8"))
    print(f"C={C} clusters, kbv={kbv}, {len(waves)} waves")
    for i, (kind, o, d, tmin, tmax) in enumerate(waves):
        kind = "camera" if i == 0 else kind
        any_hit = kind == "shadow"
        pad = (-o.shape[0]) % (128 * 64)
        if pad:
            o = np.concatenate([o, np.zeros((pad, 3), o.dtype)])
            d = np.concatenate([d, np.ones((pad, 3), d.dtype)])
            tmin = np.concatenate([tmin, np.ones(pad, np.float32)])
            tmax = np.concatenate([tmax, np.zeros(pad, np.float32)])
        steps, cnts, need = _steps_jit(
            rr.bvh, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmin),
            jnp.asarray(tmax), any_hit=any_hit, sort=i > 0)
        steps = np.asarray(steps)
        cnts = np.asarray(cnts)
        need = float(np.asarray(need))
        full = np.ceil(cnts / kbv)
        live = (cnts > 0)
        print(f"w{i:2d} {kind:6s} any_hit={int(any_hit)} "
              f"tiles={len(steps)} live%={100*live.mean():5.1f} "
              f"steps mean={steps[live].mean():6.2f} "
              f"p95={np.percentile(steps[live],95):6.1f} "
              f"| no-exit mean={full[live].mean():6.2f} "
              f"| exit saves={100*(1-steps[live].sum()/max(full[live].sum(),1)):5.1f}% "
              f"| counts mean={cnts[live].mean():6.1f} "
              f"| need/ray={need:5.1f}")


if __name__ == "__main__":
    main()
