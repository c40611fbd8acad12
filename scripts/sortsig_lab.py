#!/usr/bin/env python
"""Signature-sort study: group rays by their PHASE-1 ACTIVE CLUSTER SET
(first/second active cluster id) instead of direction heuristics.

Per-ray need is 2-3 clusters (wave_stats.py) while 32-ray tile unions
run 21-36 — a ~10x waste. A ray's active set is known from the same
slab test phase 1 already does, so sort rays by a key derived from the
set itself and measure the resulting tile-union sizes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tauray_tpu.ops.cluster import (build_cluster_tracer, _slab_t_soa,
                                    _ray_sort_key)

PT = int(os.environ.get("SIG_PT", "32"))  # kernel ray-tile size


def phase1_per_ray(tracer, o, d, tmin, tmax):
    """Returns per-ray (c0, c1) = two smallest active cluster ids
    (C sentinel when absent), computed in one fused pass."""
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
    act = (tf >= tn) & (tn <= rtmax[:, None, :])     # (nb, C, 128)
    cid = jnp.arange(C, dtype=jnp.int32)[None, :, None]
    big = jnp.int32(C)
    c0 = jnp.min(jnp.where(act, cid, big), axis=1)   # (nb, 128)
    c1 = jnp.min(jnp.where(act & (cid > c0[:, None, :]), cid, big), axis=1)
    return c0.reshape(-1), c1.reshape(-1)


def tile_unions(tracer, o, d, tmin, tmax):
    """Per-PT-ray-tile union activation counts + per-ray need."""
    C = tracer.n_clusters
    R = o.shape[0]
    nb = R // 128
    sub = 128 // PT
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
    tile_act = jnp.any(act.reshape(nb, C, sub, PT), axis=3)
    counts = jnp.sum(tile_act, axis=1).reshape(-1)   # (n_tiles,)
    return counts


def main():
    dat = np.load(os.environ.get("TAURAY_WAVE_FILE", "/tmp/waves.npz"))
    tracer, _ = build_cluster_tracer(dat["tri_pos"], dat["tri_instance"])
    C = tracer.n_clusters
    smin = np.asarray(tracer.cmin).min(axis=0)
    smax = np.asarray(tracer.cmax).max(axis=0)
    uni = jax.jit(lambda o, d, a, b: tile_unions(tracer, o, d, a, b))
    p1 = jax.jit(lambda o, d, a, b: phase1_per_ray(tracer, o, d, a, b))

    n = int(dat["n_waves"])
    for i in range(n):
        kind = str(dat[f"w{i}_kind"])
        o = jnp.asarray(dat[f"w{i}_o"])
        d = jnp.asarray(dat[f"w{i}_d"])
        tm = jnp.asarray(dat[f"w{i}_tmax"])
        R = o.shape[0]
        pad = (-R) % 1024
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3))])
            d = jnp.concatenate([d, jnp.ones((pad, 3))])
            tm = jnp.concatenate([tm, jnp.zeros(pad)])
        R = o.shape[0]
        tmin = jnp.full(R, 0.0 if i == 0 else 1e-4, jnp.float32)

        res = {}
        res["none"] = uni(o, d, tmin, tm)

        corr = _ray_sort_key(o, d, smin, smax)
        dead = tm <= 0
        corr = jnp.where(dead, jnp.uint32(0xFFFFFFFF), corr)
        perm = jnp.argsort(corr)
        res["corridor"] = uni(o[perm], d[perm], tmin[perm], tm[perm])

        c0, c1 = p1(o, d, tmin, tm)
        # dead rays last; key (c0, c1) packed, corridor low bits tiebreak
        k0 = (c0.astype(jnp.uint32) * jnp.uint32(C + 1) +
              c1.astype(jnp.uint32))
        k0 = jnp.where(dead, jnp.uint32(0xFFFFFFF0), k0)
        perm = jnp.argsort(k0)
        res["sig01"] = uni(o[perm], d[perm], tmin[perm], tm[perm])

        # c0 + corridor tiebreak (single reduction)
        k1 = (c0.astype(jnp.uint32) << jnp.uint32(21)) | \
            (corr >> jnp.uint32(11))
        k1 = jnp.where(dead, jnp.uint32(0xFFFFFFFF), k1)
        perm = jnp.argsort(k1)
        res["sig0corr"] = uni(o[perm], d[perm], tmin[perm], tm[perm])

        # (c0, c1) + corridor tiebreak via 64-bit two-pass stable sort
        lo = corr
        hi = k0
        perm = jnp.argsort(lo)
        perm = perm[jnp.argsort(hi[perm], stable=True)]
        res["sig01corr"] = uni(o[perm], d[perm], tmin[perm], tm[perm])

        # single-REDUCTION-pass variant: (c0, hash(active set)) — c0 min
        # and the set hash fuse into one pass over the slab test
        def hash_key(o_, d_, a, b):
            C_ = tracer.n_clusters
            R_ = o_.shape[0]
            nb = R_ // 128
            ro = o_.reshape(nb, 128, 3)
            rd = d_.reshape(nb, 128, 3)
            rtmin = a.reshape(nb, 128)
            rtmax = b.reshape(nb, 128)
            inv_dd = jnp.where(rd == 0, jnp.float32(3e38),
                               1.0 / jnp.where(rd == 0, 1.0, rd))
            tn, tf = _slab_t_soa(
                ro[:, None, :, 0], ro[:, None, :, 1], ro[:, None, :, 2],
                inv_dd[:, None, :, 0], inv_dd[:, None, :, 1],
                inv_dd[:, None, :, 2], tracer.cmin, tracer.cmax)
            tn = jnp.maximum(tn, rtmin[:, None, :])
            act = (tf >= tn) & (tn <= rtmax[:, None, :])
            cidv = jnp.arange(C_, dtype=jnp.int32)[None, :, None]
            c0_ = jnp.min(jnp.where(act, cidv, jnp.int32(C_)), axis=1)
            mult = jnp.int32(np.int32(np.uint32(2654435761)))
            hsh = jnp.sum(jnp.where(act, cidv * mult + 1, 0),
                          axis=1, dtype=jnp.int32)
            k = (jnp.minimum(c0_, 65535).astype(jnp.uint32) <<
                 jnp.uint32(16)) | \
                (hsh.astype(jnp.uint32) & jnp.uint32(0xFFFF))
            return k.reshape(-1)
        kh = jax.jit(hash_key)(o, d, tmin, tm)
        kh = jnp.where(dead, jnp.uint32(0xFFFFFFFF), kh)
        perm = jnp.argsort(kh)
        res["sig0hash"] = uni(o[perm], d[perm], tmin[perm], tm[perm])

        # even/odd split: two INDEPENDENT min reductions (fuse into one
        # pass): e0 = smallest even active cluster, e1 = smallest odd
        def eo_key(o_, d_, a, b):
            C_ = tracer.n_clusters
            R_ = o_.shape[0]
            nb = R_ // 128
            ro = o_.reshape(nb, 128, 3)
            rd = d_.reshape(nb, 128, 3)
            rtmin = a.reshape(nb, 128)
            rtmax = b.reshape(nb, 128)
            inv_dd = jnp.where(rd == 0, jnp.float32(3e38),
                               1.0 / jnp.where(rd == 0, 1.0, rd))
            tn, tf = _slab_t_soa(
                ro[:, None, :, 0], ro[:, None, :, 1], ro[:, None, :, 2],
                inv_dd[:, None, :, 0], inv_dd[:, None, :, 1],
                inv_dd[:, None, :, 2], tracer.cmin, tracer.cmax)
            tn = jnp.maximum(tn, rtmin[:, None, :])
            act = (tf >= tn) & (tn <= rtmax[:, None, :])
            cidv = jnp.arange(C_, dtype=jnp.int32)[None, :, None]
            big = jnp.int32(65535)
            even = (cidv & 1) == 0
            e0 = jnp.min(jnp.where(act & even, cidv, big), axis=1)
            e1 = jnp.min(jnp.where(act & ~even, cidv, big), axis=1)
            k = (jnp.minimum(e0, 65535).astype(jnp.uint32) <<
                 jnp.uint32(16)) | \
                jnp.minimum(e1, 65535).astype(jnp.uint32)
            return k.reshape(-1)
        ke = jax.jit(eo_key)(o, d, tmin, tm)
        ke = jnp.where(dead, jnp.uint32(0xFFFFFFFF), ke)
        perm = jnp.argsort(ke)
        res["sigeo"] = uni(o[perm], d[perm], tmin[perm], tm[perm])

        line = f"{i}:{kind:6s}"
        for name, cnts in res.items():
            cnts = np.asarray(cnts)
            steps = np.ceil(cnts / 8).clip(min=0)  # KBV=8
            line += (f"  {name}={cnts.mean():5.1f}"
                     f"/s{steps.mean():4.2f}")
        print(line, flush=True)


if __name__ == "__main__":
    main()
