#!/usr/bin/env python
"""Sub-cluster culling study: how much do per-tile row activations drop
when a 128-tri fetch row activates only if one of its 32-tri SUB-AABBs
hits, instead of the row's single union AABB?

Also measures the cost of the per-TILE interval (conservative) test vs
the per-RAY exact test at both granularities — the interval test is what
makes sub-granularity affordable in phase 1.

Run on the real TPU: python scripts/subcull_lab.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from tauray_tpu.options import parse_command_line_options
    from tauray_tpu.app.main import load_scenes, create_renderer
    from tauray_tpu.ops import cluster as cl

    W = H = int(os.environ.get("TAURAY_BENCH_SIZE", "256"))
    spp = int(os.environ.get("TAURAY_BENCH_SPP", "16"))
    scene = os.environ.get("TAURAY_BENCH_SCENE",
                           "/root/reference/test/test.glb")
    opt = parse_command_line_options([
        "--renderer=path-tracer", f"--width={W}", f"--height={H}",
        "--max-ray-depth=4", f"--samples-per-pixel={spp}",
        f"--samples-per-pass={spp}", "--headless=unused",
        "--filetype=none", scene])
    s = load_scenes(opt)
    rr = create_renderer(opt, s)
    rr.set_scene(s)
    rr.reset_accumulation()
    rr.render()
    waves = rr.capture_waves()
    tracer = rr.bvh
    C = tracer.n_clusters
    PT = 32

    # sub AABBs at SUB-tri granularity from the CURRENT in-cluster order
    for SUB in (16, 32, 64, 128):
        NS = cl.CLUSTER // SUB
        v0 = tracer.v0.reshape(C * NS, SUB, 3)
        e1 = tracer.e1.reshape(C * NS, SUB, 3)
        e2 = tracer.e2.reshape(C * NS, SUB, 3)
        tv = tracer.tri_valid.reshape(C * NS, SUB)[..., None]
        big = jnp.float32(3e38)
        cmins = []
        cmaxs = []
        for p in (v0, v0 + e1, v0 + e2):
            cmins.append(jnp.where(tv, p, big).min(axis=1))
            cmaxs.append(jnp.where(tv, p, -big).max(axis=1))
        smin = jnp.minimum(jnp.minimum(cmins[0], cmins[1]), cmins[2])
        smax = jnp.maximum(jnp.maximum(cmaxs[0], cmaxs[1]), cmaxs[2])

        @jax.jit
        def row_counts_perray(o, d, tmin, tmax, smin=smin, smax=smax,
                              NS=NS):
            R = o.shape[0]
            nt = R // PT
            ro = o.reshape(nt, PT, 3)
            rd = d.reshape(nt, PT, 3)
            CH = 256

            def chunk(args):
                ro, rd, tmin, tmax = args
                inv = jnp.where(rd == 0, big,
                                1.0 / jnp.where(rd == 0, 1., rd))
                tn, tf = cl._slab_t_soa(
                    ro[:, None, :, 0], ro[:, None, :, 1],
                    ro[:, None, :, 2], inv[:, None, :, 0],
                    inv[:, None, :, 1], inv[:, None, :, 2], smin, smax)
                tn = jnp.maximum(tn, tmin[:, None, :])
                act = (tf >= tn) & (tn <= tmax[:, None, :])
                act_row = jnp.any(act.reshape(-1, C, NS, PT), axis=(2, 3))
                return jnp.sum(act_row, axis=1)
            return jax.lax.map(chunk, (
                ro.reshape(-1, CH, PT, 3), rd.reshape(-1, CH, PT, 3),
                tmin.reshape(-1, CH, PT),
                tmax.reshape(-1, CH, PT))).reshape(-1)

        @jax.jit
        def _unused_perray(o, d, tmin, tmax, smin=smin, smax=smax,
                           NS=NS):
            R = o.shape[0]
            nt = R // PT
            ro = o.reshape(nt, PT, 3)
            rd = d.reshape(nt, PT, 3)
            inv = jnp.where(rd == 0, big, 1.0 / jnp.where(rd == 0, 1., rd))
            tn, tf = cl._slab_t_soa(
                ro[:, None, :, 0], ro[:, None, :, 1], ro[:, None, :, 2],
                inv[:, None, :, 0], inv[:, None, :, 1], inv[:, None, :, 2],
                smin, smax)
            tn = jnp.maximum(tn, tmin.reshape(nt, PT)[:, None, :])
            act = (tf >= tn) & (tn <= tmax.reshape(nt, PT)[:, None, :])
            act_row = jnp.any(act.reshape(nt, C, NS, PT), axis=(2, 3))
            return jnp.sum(act_row, axis=1)

        @jax.jit
        def row_counts_interval(o, d, tmin, tmax, smin=smin, smax=smax,
                                NS=NS):
            R = o.shape[0]
            nt0 = R // PT
            CH = 256
            args = (o.reshape(-1, CH, PT, 3), d.reshape(-1, CH, PT, 3),
                    tmin.reshape(-1, CH, PT), tmax.reshape(-1, CH, PT))
            return jax.lax.map(
                lambda a: _interval_chunk(a, smin, smax, NS),
                args).reshape(-1)

        def _interval_chunk(args, smin, smax, NS):
            ro, rd, rtmin, rtmax = args
            nt = ro.shape[0]
            live = rtmax > 0
            inv = jnp.where(rd == 0, big, 1.0 / jnp.where(rd == 0, 1., rd))
            lv = live[..., None]
            olo = jnp.where(lv, ro, big).min(1)     # (nt, 3)
            ohi = jnp.where(lv, ro, -big).max(1)
            ilo = jnp.where(lv, inv, big).min(1)
            ihi = jnp.where(lv, inv, -big).max(1)
            tmin_lo = jnp.where(live, rtmin, big).min(1)
            tmax_hi = jnp.where(live, rtmax, -big).max(1)
            tn_lb = jnp.full((nt, C * NS), -big)
            tf_ub = jnp.full((nt, C * NS), big)
            for k in range(3):
                a0lo = smin[None, :, k] - ohi[:, k, None]
                a0hi = smin[None, :, k] - olo[:, k, None]
                a1lo = smax[None, :, k] - ohi[:, k, None]
                a1hi = smax[None, :, k] - olo[:, k, None]
                il = ilo[:, k, None]
                ih = ihi[:, k, None]

                def ia(alo, ahi):
                    p1 = alo * il
                    p2 = alo * ih
                    p3 = ahi * il
                    p4 = ahi * ih
                    return (jnp.minimum(jnp.minimum(p1, p2),
                                        jnp.minimum(p3, p4)),
                            jnp.maximum(jnp.maximum(p1, p2),
                                        jnp.maximum(p3, p4)))
                t0lo, t0hi = ia(a0lo, a0hi)
                t1lo, t1hi = ia(a1lo, a1hi)
                tn_lb = jnp.maximum(tn_lb, jnp.minimum(t0lo, t1lo))
                tf_ub = jnp.minimum(tf_ub, jnp.maximum(t0hi, t1hi))
            act = (tf_ub >= jnp.maximum(tn_lb, tmin_lo[:, None])) & \
                (tn_lb <= tmax_hi[:, None]) & (tmax_hi[:, None] > 0)
            act_row = jnp.any(act.reshape(nt, C, NS), axis=2)
            return jnp.sum(act_row, axis=1)

        for i, (kind, o, d, tmin, tmax) in enumerate(waves):
            if i not in (0, 3, 4):   # camera, one bounce, one shadow
                continue
            o = jnp.asarray(o)
            d = jnp.asarray(d)
            tmin = jnp.asarray(tmin)
            tmax = jnp.asarray(tmax)
            R0 = o.shape[0]
            pad = (-R0) % (128 * 64)
            if pad:
                o = jnp.concatenate([o, jnp.zeros((pad, 3))])
                d = jnp.concatenate([d, jnp.ones((pad, 3))])
                tmin = jnp.concatenate([tmin, jnp.ones(pad)])
                tmax = jnp.concatenate([tmax, jnp.zeros(pad)])
            if i > 0:
                @jax.jit
                def _sortall(o, d, tmin, tmax):
                    key = cl._sig_sort_key(tracer, o, d, tmin, tmax)
                    p = jnp.argsort(key)
                    return o[p], d[p], tmin[p], tmax[p]
                o, d, tmin, tmax = _sortall(o, d, tmin, tmax)
            ce = np.asarray(row_counts_perray(o, d, tmin, tmax))
            ci = np.asarray(row_counts_interval(o, d, tmin, tmax))
            print(f"SUB={SUB:3d} wave{i}:{kind:6s} "
                  f"perray rows/tile={ce.mean():6.2f} "
                  f"interval rows/tile={ci.mean():6.2f} "
                  f"(p95 {np.percentile(ce, 95):5.1f}/"
                  f"{np.percentile(ci, 95):5.1f})")


if __name__ == "__main__":
    main()
