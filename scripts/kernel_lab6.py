#!/usr/bin/env python
"""Kernel fixed-cost anatomy: per-tile overhead vs per-step cost.

wave_stats.py regression gives kern_ms ~ n_tiles * (a + b*steps) with
a ~ 0.95us (31 ms/wave of pure per-tile overhead!) and b ~ 0.8us.
Hypothesis: `a` is the 4 KB/tile meta DMA into SMEM (cpad=1024 keys).
Probe: time the kernel at counts=0 (no steps, only meta machinery),
counts=8 (1 step), counts=16 (2 steps), and sweep cpad."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tauray_tpu.ops.cluster import build_cluster_tracer
from tauray_tpu.ops import pallas_trace as ptr


def main():
    dat = np.load("/tmp/waves.npz")
    tracer, _ = build_cluster_tracer(dat["tri_pos"], dat["tri_instance"])
    tracer = tracer.with_pallas_layout()
    C = tracer.n_clusters
    R = 1048576
    PT = ptr.TILE
    n_tiles = R // PT
    o = jnp.asarray(dat["w2_o"][:R])
    d = jnp.asarray(dat["w2_d"][:R])
    tmin = jnp.full(R, 1e-4, jnp.float32)
    tmax = jnp.asarray(dat["w2_tmax"][:R])
    o3 = o.reshape(n_tiles, PT, 3)
    d3 = d.reshape(n_tiles, PT, 3)
    mm2 = jnp.stack([tmin, tmax], -1).reshape(n_tiles, PT, 2)
    opad = 1024 * (-(-C // 1024))
    opaque = jnp.pad(tracer.opaque.astype(jnp.int32), (0, opad - C))

    idbits = max(int(np.ceil(np.log2(max(C, 2)))), 1)
    idmask = (1 << idbits) - 1

    def timeit(fn, n=5):
        fn()
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000

    for cpad in (1024, 2048):
        for nact in (0, 8, 16, 32):
            counts = jnp.full(n_tiles, nact, jnp.int32)
            key = jnp.arange(cpad, dtype=jnp.int32)[None, :].repeat(
                n_tiles, 0)
            key = jnp.where(key < max(nact, 1),
                            key & idmask, jnp.int32(0x7FFFFFFF))

            def run():
                t, tid = ptr.pallas_trace_tiles_vm(
                    counts, key, o3, d3, mm2, tracer.tris12, opaque,
                    C, cpad, idmask)
                jax.block_until_ready((t, tid))
                return t, tid
            ms = timeit(run)
            t, tid = run()
            print(f"cpad={cpad} counts={nact:3d} "
                  f"{ms:7.1f} ms  {ms * 1000 / n_tiles:5.3f} us/tile "
                  f"hits={int((tid >= 0).sum())}",
                  flush=True)


if __name__ == "__main__":
    main()
