#!/usr/bin/env python
"""Cull-quality lab round 2: tile=8, and BETTER CLUSTER BUILDERS.

The Mosaic DMA model pins the cluster size to 128 lanes, so the open
culling levers are the ray-tile size and the SHAPE of the 128-triangle
clusters. Morton-order runs produce elongated, overlapping AABBs; this
lab compares:
  * morton  — production builder (global Morton order, runs of 128)
  * median  — top-down recursive median split on the widest centroid
              axis until <=128 tris per leaf (kd-ish, tight boxes)
  * sah     — same recursion but split at the best of 8 SAH candidate
              positions on the widest axis

Uses the waves captured by trace_lab.py (/tmp/trace_lab_waves.npz).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from trace_lab import simulate, sort_rays, morton10  # noqa: E402


def build_from_order(tris, valid, order, cluster):
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


def morton_order(tris, valid):
    cent = tris.mean(axis=1)
    lo = cent[valid].min(axis=0)
    hi = cent[valid].max(axis=0)
    ext = np.maximum(hi - lo, 1e-12)
    grid = np.clip((cent - lo) / ext * 1023.0, 0, 1023).astype(np.uint32)
    codes = morton10(grid).astype(np.uint64)
    codes = codes + (~valid).astype(np.uint64) * (np.uint64(1) << 50)
    return np.lexsort((np.arange(len(tris)), codes))


def split_order(tris, valid, cluster, sah=False):
    """Top-down recursion to <=cluster leaves; returns concatenated leaf
    order (valid tris only, padded later by build_from_order)."""
    cent = tris.mean(axis=1)
    idx_all = np.flatnonzero(valid)
    out = []

    def rec(idx):
        if len(idx) <= cluster:
            out.append(idx)
            return
        c = cent[idx]
        lo = c.min(axis=0)
        hi = c.max(axis=0)
        ax = int(np.argmax(hi - lo))
        vals = c[:, ax]
        if not sah:
            k = len(idx) // 2
            # round split to cluster multiples so leaves stay full
            k = max(cluster * max(round(k / cluster), 1), cluster)
            k = min(k, len(idx) - 1)
            part = np.argpartition(vals, k)
            rec(idx[part[:k]])
            rec(idx[part[k:]])
            return
        # SAH over 8 candidate positions (surface-area * count)
        order = np.argsort(vals)
        sidx = idx[order]
        spos = tris[sidx]
        pref_min = np.minimum.accumulate(spos.reshape(len(sidx), 9, ...)
                                         if False else
                                         spos.min(axis=1))
        pref_max = np.maximum.accumulate(spos.max(axis=1))
        suf_min = np.minimum.accumulate(spos.min(axis=1)[::-1])[::-1]
        suf_max = np.maximum.accumulate(spos.max(axis=1)[::-1])[::-1]

        def area(mn, mx):
            d = np.maximum(mx - mn, 0)
            return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]

        n = len(sidx)
        cands = [max(cluster * max(round((n * f) / cluster), 1), cluster)
                 for f in (0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875)]
        cands = sorted({min(k, n - 1) for k in cands})
        best_k, best_c = None, None
        al = area(pref_min, pref_max)
        ar = area(suf_min, suf_max)
        for k in cands:
            cost = al[k - 1] * k + ar[k] * (n - k)
            if best_c is None or cost < best_c:
                best_c, best_k = cost, k
        rec(sidx[:best_k])
        rec(sidx[best_k:])

    rec(idx_all)
    return np.concatenate(out)


def main():
    data = np.load("/tmp/trace_lab_waves.npz", allow_pickle=True)
    waves = list(data["waves"])
    tris = data["tris"]
    tri_inst = data["tri_inst"]
    valid = tri_inst >= 0
    rng = np.random.default_rng(0)

    builders = {
        "morton": lambda K: build_from_order(tris, valid,
                                             morton_order(tris, valid), K),
        "median": lambda K: build_from_order(tris, valid,
                                             split_order(tris, valid, K), K),
        "sah": lambda K: build_from_order(
            tris, valid, split_order(tris, valid, K, sah=True), K),
    }
    sel = list(range(min(len(waves), 7)))
    print(f"{'builder':>7} {'K':>4} {'tile':>4} {'KB':>3} {'sort':>14} | "
          f"tested tris/ray per wave")
    for bname in sys.argv[1:] or ["morton", "median", "sah"]:
        for K in (128,):
            cl = builders[bname](K)
            print(f"# {bname} K={K}: C={cl['C']}")
            for tile in (32, 16, 8):
                for kb_tris in (256, 1024):
                    kb = max(kb_tris // K, 1)
                    for sm in ("none", "dir-origin"):
                        res = []
                        for wi in sel:
                            tested, act = simulate(waves[wi], cl, tile, kb,
                                                   sm, 128, rng)
                            res.append(tested)
                        print(f"{bname:>7} {K:>4} {tile:>4} {kb:>3} "
                              f"{sm:>14} | " +
                              " ".join(f"{r:7.0f}" for r in res) +
                              f"  sum={sum(res):8.0f}")


if __name__ == "__main__":
    main()
