#!/usr/bin/env python
"""Per-wave traversal statistics on REAL production waves: live
fraction, per-tile active-cluster counts (phase-1), visited steps
(kernel debug output), tests/ray, and kernel wall time. This is the
number VERDICT r3 said we never report: triangle tests per ray, per
wave type."""
import os
import sys
import time

os.environ["TAURAY_HOST_WAVEFRONT"] = "1"

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tauray_tpu.options import parse_command_line_options
    from tauray_tpu.app.main import load_scenes, create_renderer
    from tauray_tpu.stages import path_tracer as pt
    from tauray_tpu.ops.cluster import (build_cluster_tracer, TILE,
                                        TILE_CHUNK, _trace_padded_pallas)
    from tauray_tpu.ops import pallas_trace as ptr
    from tauray_tpu.scene.arrays import SceneArrays

    scene_path = os.environ.get("TAURAY_BENCH_SCENE",
                                "/root/reference/test/test.glb")
    spp = int(os.environ.get("TAURAY_BENCH_SPP", "16"))
    opt = parse_command_line_options([
        "--renderer=path-tracer", "--width=256", "--height=256",
        "--max-ray-depth=4", f"--samples-per-pixel={spp}",
        f"--samples-per-pass={spp}", "--headless=unused",
        "--filetype=none", scene_path])
    s = load_scenes(opt)
    rr = create_renderer(opt, s)
    rr.set_scene(s)
    rr.reset_accumulation()
    rr.render()
    pt._WAVE_DUMP = []
    rr.reset_accumulation()
    rr.render()
    waves = [(k, np.asarray(o), np.asarray(d), np.asarray(tm))
             for k, o, d, _tmin, tm in pt._WAVE_DUMP]
    pt._WAVE_DUMP = None
    arrays = SceneArrays(s, opt)
    tracer, _ = build_cluster_tracer(
        np.asarray(arrays.tri_pos), np.asarray(arrays.tri_instance),
        tri_opaque=None)
    C = tracer.n_clusters
    print(f"scene C={C} clusters, kernel TILE={ptr.TILE} KBV={ptr.KBV}")

    PT = ptr.TILE

    def pad_wave(o, d, tmin, tm):
        R = o.shape[0]
        pad = (-R) % (TILE * max(TILE_CHUNK, 8))
        if pad:
            o = np.concatenate([o, np.zeros((pad, 3), o.dtype)])
            d = np.concatenate([d, np.ones((pad, 3), d.dtype)])
            tmin = np.concatenate([tmin, np.ones(pad, np.float32)])
            tm = np.concatenate([tm, np.zeros(pad, np.float32)])
        return o, d, tmin, tm

    @jax.jit
    def kernel_only(o, d, tmin, tm, any_hit=False, debug=False):
        return None

    tot_tests = 0.0
    tot_rays = 0.0
    tot_ms = 0.0
    for i, (k, o, d, tm) in enumerate(waves):
        tmin = np.full(o.shape[0], 0.0 if i == 0 else 1e-4, np.float32)
        o, d, tmin, tm = pad_wave(o, d, tmin, tm)
        R = o.shape[0]
        live = float((tm > 0).mean())
        ah = k == "shadow"

        oj = jnp.asarray(o)
        dj = jnp.asarray(d)
        tmi = jnp.asarray(tmin)
        tmx = jnp.asarray(tm)

        # full trace timing (phase1 + kernel)
        hit = _trace_padded_pallas(tracer, oj, dj, tmi, tmx, ah)
        jax.block_until_ready(hit)
        t0 = time.perf_counter()
        hit = _trace_padded_pallas(tracer, oj, dj, tmi, tmx, ah)
        jax.block_until_ready(hit)
        ms_full = (time.perf_counter() - t0) * 1000

        # phase-1 counts + kernel visited steps via debug_steps
        from tauray_tpu.ops.cluster import _slab_t_soa

        @jax.jit
        def phase1(oj, dj, tmi, tmx):
            n_blocks = R // 128
            sub = 128 // PT
            n_tiles = R // PT
            ro = oj.reshape(n_blocks, 128, 3)
            rd = dj.reshape(n_blocks, 128, 3)
            rtmin = tmi.reshape(n_blocks, 128)
            rtmax = tmx.reshape(n_blocks, 128)
            inv_d = jnp.where(rd == 0, jnp.float32(3e38),
                              1.0 / jnp.where(rd == 0, 1.0, rd))
            tn, tf = _slab_t_soa(
                ro[:, None, :, 0], ro[:, None, :, 1], ro[:, None, :, 2],
                inv_d[:, None, :, 0], inv_d[:, None, :, 1],
                inv_d[:, None, :, 2], tracer.cmin, tracer.cmax)
            tn = jnp.maximum(tn, rtmin[:, None, :])
            active_rc = (tf >= tn) & (tn <= rtmax[:, None, :])
            inf = jnp.float32(jnp.inf)
            tile_tnear = jnp.min(
                jnp.where(active_rc, tn, inf).reshape(
                    n_blocks, C, sub, PT), axis=3)
            tile_tnear = jnp.transpose(tile_tnear, (0, 2, 1)).reshape(
                n_tiles, C)
            counts = jnp.sum(tile_tnear < inf, axis=1).astype(jnp.int32)
            per_ray = jnp.sum(active_rc, axis=1).reshape(-1)
            return tile_tnear, counts, per_ray

        n_tiles = R // PT
        tile_tnear, counts, per_ray = phase1(oj, dj, tmi, tmx)

        import numpy as _np
        from tauray_tpu.ops.pallas_trace import pallas_trace_tiles_vm
        PKB = ptr.KB
        cpad = 1024 * (-(-(C + PKB) // 1024))
        idbits = max(int(np.ceil(np.log2(max(C, 2)))), 1)
        idmask = (1 << idbits) - 1
        tn_bits = jax.lax.bitcast_convert_type(tile_tnear, jnp.int32)
        cid = jnp.arange(C, dtype=jnp.int32)[None, :]
        key = (tn_bits & ~idmask) | cid
        key = jnp.where(jnp.isfinite(tile_tnear), key,
                        jnp.int32(0x7FFFFFFF))
        key = jnp.pad(key, ((0, 0), (0, cpad - C)),
                      constant_values=0x7FFFFFFF)
        keys = jnp.sort(key, axis=1)
        o3 = oj.reshape(n_tiles, PT, 3)
        d3 = dj.reshape(n_tiles, PT, 3)
        mm2 = jnp.stack([tmi, tmx], axis=-1).reshape(n_tiles, PT, 2)
        opad = 1024 * (-(-C // 1024))
        opaque = jnp.pad(tracer.opaque.astype(jnp.int32), (0, opad - C)) \
            if tracer.opaque is not None else jnp.ones(1024, jnp.int32)
        steps, cnts = pallas_trace_tiles_vm(
            counts, keys, o3, d3, mm2, tracer.tris12, opaque, C, cpad,
            idmask, any_hit=ah, debug_steps=True)
        steps = np.asarray(steps)
        cnts = np.asarray(cnts)

        # kernel-only timing
        def run_kernel():
            t, tid = pallas_trace_tiles_vm(
                counts, keys, o3, d3, mm2, tracer.tris12, opaque, C,
                cpad, idmask, any_hit=ah)
            jax.block_until_ready((t, tid))
        run_kernel()
        t0 = time.perf_counter()
        run_kernel()
        ms_kern = (time.perf_counter() - t0) * 1000

        tests_per_ray = float(steps.mean()) * ptr.KBV * 128
        live_rays = max(float((tm > 0).sum()), 1.0)
        tot_tests += tests_per_ray * R
        tot_rays += live_rays
        tot_ms += ms_full
        print(f"{i}:{k:6s} R={R} live={live:4.2f} "
              f"activations/tile mean={cnts.mean():6.1f} "
              f"p95={np.percentile(cnts, 95):6.0f} "
              f"per-ray-need={float(per_ray.mean()):5.1f} "
              f"steps mean={steps.mean():5.2f} p95="
              f"{np.percentile(steps, 95):4.0f} "
              f"tests/lane-ray={tests_per_ray:7.0f} "
              f"kern={ms_kern:6.1f}ms full={ms_full:6.1f}ms", flush=True)
    print(f"TOTAL trace {tot_ms:.0f} ms  "
          f"tests/lane-ray avg={tot_tests / max(tot_rays, 1):.0f}")


if __name__ == "__main__":
    main()
