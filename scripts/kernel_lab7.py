#!/usr/bin/env python
"""v2 kernel (grid-batched meta heads) vs v1, on real waves, unsorted
and signature-sorted, with a KBV sweep. Checks hit-id equality."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tauray_tpu.ops.cluster import build_cluster_tracer, _slab_t_soa
from tauray_tpu.ops import pallas_trace as ptr


def phase1_keys(tracer, o, d, tmin, tmax, PT, PKB):
    C = tracer.n_clusters
    R = o.shape[0]
    nb = R // 128
    sub = 128 // PT
    n_tiles = R // PT
    ro = o.reshape(nb, 128, 3)
    rd = d.reshape(nb, 128, 3)
    rtmin = tmin.reshape(nb, 128)
    rtmax = tmax.reshape(nb, 128)
    inv_d = jnp.where(rd == 0, jnp.float32(3e38),
                      1.0 / jnp.where(rd == 0, 1.0, rd))
    tn, tf = _slab_t_soa(
        ro[:, None, :, 0], ro[:, None, :, 1], ro[:, None, :, 2],
        inv_d[:, None, :, 0], inv_d[:, None, :, 1], inv_d[:, None, :, 2],
        tracer.cmin, tracer.cmax)
    tn = jnp.maximum(tn, rtmin[:, None, :])
    act = (tf >= tn) & (tn <= rtmax[:, None, :])
    inf = jnp.float32(jnp.inf)
    tile_tnear = jnp.min(
        jnp.where(act, tn, inf).reshape(nb, C, sub, PT), axis=3)
    tile_tnear = jnp.transpose(tile_tnear, (0, 2, 1)).reshape(n_tiles, C)
    counts = jnp.sum(tile_tnear < inf, axis=1).astype(jnp.int32)
    cpad = 1024 * (-(-(C + PKB) // 1024))
    idbits = max(int(np.ceil(np.log2(max(C, 2)))), 1)
    idmask = (1 << idbits) - 1
    tn_bits = jax.lax.bitcast_convert_type(tile_tnear, jnp.int32)
    cid = jnp.arange(C, dtype=jnp.int32)[None, :]
    key = (tn_bits & ~idmask) | cid
    key = jnp.where(jnp.isfinite(tile_tnear), key, jnp.int32(0x7FFFFFFF))
    key = jnp.pad(key, ((0, 0), (0, cpad - C)),
                  constant_values=0x7FFFFFFF)
    keys = jnp.sort(key, axis=1)
    return counts, keys


def sigsort_perm(tracer, o, d, tmin, tmax):
    C = tracer.n_clusters
    R = o.shape[0]
    nb = R // 128
    ro = o.reshape(nb, 128, 3)
    rd = d.reshape(nb, 128, 3)
    rtmin = tmin.reshape(nb, 128)
    rtmax = tmax.reshape(nb, 128)
    inv_d = jnp.where(rd == 0, jnp.float32(3e38),
                      1.0 / jnp.where(rd == 0, 1.0, rd))
    tn, tf = _slab_t_soa(
        ro[:, None, :, 0], ro[:, None, :, 1], ro[:, None, :, 2],
        inv_d[:, None, :, 0], inv_d[:, None, :, 1], inv_d[:, None, :, 2],
        tracer.cmin, tracer.cmax)
    tn = jnp.maximum(tn, rtmin[:, None, :])
    act = (tf >= tn) & (tn <= rtmax[:, None, :])
    cid = jnp.arange(C, dtype=jnp.int32)[None, :, None]
    big = jnp.int32(C)
    c0 = jnp.min(jnp.where(act, cid, big), axis=1)
    c1 = jnp.min(jnp.where(act & (cid > c0[:, None, :]), cid, big), axis=1)
    k = (c0.reshape(-1).astype(jnp.uint32) * jnp.uint32(C + 1) +
         c1.reshape(-1).astype(jnp.uint32))
    k = jnp.where(tmax <= 0, jnp.uint32(0xFFFFFFF0), k)
    return jnp.argsort(k)


def main():
    dat = np.load("/tmp/waves.npz")
    tracer, _ = build_cluster_tracer(dat["tri_pos"], dat["tri_instance"])
    C = tracer.n_clusters
    PT = ptr.TILE
    opad = 1024 * (-(-C // 1024))
    opaque = jnp.pad(tracer.opaque.astype(jnp.int32), (0, opad - C))

    p1 = jax.jit(lambda o, d, a, b: phase1_keys(tracer, o, d, a, b, PT,
                                                ptr.KB))
    sig = jax.jit(lambda o, d, a, b: sigsort_perm(tracer, o, d, a, b))

    def timeit(fn, n=4):
        fn()
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000

    for i in (2, 3):      # bounce 2, shadow 3 (the expensive waves)
        kind = str(dat[f"w{i}_kind"])
        o = jnp.asarray(dat[f"w{i}_o"])
        d = jnp.asarray(dat[f"w{i}_d"])
        tm = jnp.asarray(dat[f"w{i}_tmax"])
        R = o.shape[0]
        tmin = jnp.full(R, 1e-4, jnp.float32)
        ah = kind == "shadow"
        for sort in (False, True):
            if sort:
                perm = sig(o, d, tmin, tm)
                oo, dd = o[perm], d[perm]
                ti, tx = tmin[perm], tm[perm]
            else:
                oo, dd, ti, tx = o, d, tmin, tm
            counts, keys = p1(oo, dd, ti, tx)
            cpad = 1024 * (-(-(C + ptr.KB) // 1024))
            idbits = max(int(np.ceil(np.log2(max(C, 2)))), 1)
            idmask = (1 << idbits) - 1
            n_tiles = R // PT
            o3 = oo.reshape(n_tiles, PT, 3)
            d3 = dd.reshape(n_tiles, PT, 3)
            mm2 = jnp.stack([ti, tx], -1).reshape(n_tiles, PT, 2)

            def run_v1():
                r = ptr.pallas_trace_tiles_vm(
                    counts, keys, o3, d3, mm2, tracer.tris12, opaque,
                    C, cpad, idmask, any_hit=ah)
                jax.block_until_ready(r)
                return r
            ms1 = timeit(run_v1)
            t1, id1 = run_v1()
            line = (f"{i}:{kind:6s} sort={int(sort)} "
                    f"v1={ms1:6.1f}ms")
            for kbv in (4, 8):
                def run_v3():
                    import jax.numpy as _jnp
                    r8 = _jnp.concatenate([o3, d3, mm2], axis=2)
                    r = ptr.pallas_trace_tiles_vm3(
                        counts, keys, r8, tracer.tris12,
                        C, cpad, idmask, kbv=kbv)
                    jax.block_until_ready(r)
                    return r
                ms3 = timeit(run_v3)
                t3, id3 = run_v3()
                # v3 drops the any-hit exit => exact closest-hit ids
                mism = float(jnp.mean((id1 != id3).astype(jnp.float32)))
                tmis = float(jnp.mean(jnp.where(
                    jnp.isfinite(t1) & jnp.isfinite(t3),
                    jnp.abs(t1 - t3), 0.0)))
                line += f"  v3k{kbv}={ms3:6.1f}ms(mm={mism:.4f})"
            print(line, flush=True)


if __name__ == "__main__":
    main()
