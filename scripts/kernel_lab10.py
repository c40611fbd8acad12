#!/usr/bin/env python
"""Strip-down bisection of the v3 streamed kernel on a REAL sorted
bounce wave: which per-tile component costs the ~0.9us intercept?
  full     — as shipped
  noray    — ray components replaced by constants (no o/d/mm loads)
  fixord   — orders replaced by constant 0 (no SMEM->dyn-load chain)
  nowrite  — per-tile output writes dropped (pre-init only)
  nconcat  — single kbv block but reading tris_ref[0:...] statically
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tauray_tpu.ops.cluster import build_cluster_tracer, _slab_t_soa
from tauray_tpu.ops import pallas_trace as ptr
from kernel_lab7 import phase1_keys, sigsort_perm

TILE = ptr.TILE
G = ptr.G
KC = ptr.KC
CLUSTER = 128
KBV = 8


def make_kernel(mode, n_clusters, cpad, idmask):
    kbv = KBV
    bkv = kbv * CLUSTER

    def kern(counts_ref, trips_ref, heads_ref, full_ref, o_ref, d_ref,
             mm_ref, tris_ref, out_ref, head_scr, ovf_scr, head_sem,
             ovf_sem):
        b = pl.program_id(0)
        nb = pl.num_programs(0)

        def head_dma(bb):
            return pltpu.make_async_copy(
                heads_ref.at[pl.ds(bb * G, G), :],
                head_scr.at[jax.lax.rem(bb, 2)],
                head_sem.at[jax.lax.rem(bb, 2)])

        @pl.when(b == 0)
        def _():
            head_dma(0).start()

        @pl.when(b + 1 < nb)
        def _():
            head_dma(b + 1).start()
        head_dma(b).wait()
        slot = jax.lax.rem(b, 2)

        out_ref[:, :, 0:1] = jnp.minimum(mm_ref[:, :, 1:2], ptr.BIG)
        out_ref[:, :, 1:2] = jax.lax.bitcast_convert_type(
            jnp.full((G, TILE, 1), -1, jnp.int32), jnp.float32)

        def steps_of(g):
            c = counts_ref[b * G + jnp.minimum(g, G - 1)]
            return jnp.where(g < G, (c + kbv - 1) // kbv, jnp.int32(1))

        def next_active(g):
            return jax.lax.while_loop(
                lambda x: (x < G) & (steps_of(x) == 0), lambda x: x + 1, g)

        trip = trips_ref[b]

        def key_at(g, k):
            kk = jnp.minimum(k, KC - 1)
            return head_scr[slot, g, kk]

        def body(i, c):
            g, ls, bt, bi = c
            count = counts_ref[b * G + g]
            steps = (count + kbv - 1) // kbv
            first = ls == 0
            last = ls + 1 >= steps

            if mode == "fixord":
                orders = [jnp.int32(j) for j in range(kbv)]
            else:
                orders = [jnp.minimum(key_at(g, ls * kbv + j) & idmask,
                                      n_clusters - 1) for j in range(kbv)]
            ts = [tris_ref[o] for o in orders]
            tri = jnp.concatenate(ts, axis=-1)

            if mode == "noray":
                ox = jnp.full((TILE, 1), 0.1)
                oy = jnp.full((TILE, 1), 0.2)
                oz = jnp.full((TILE, 1), 0.3)
                dx = jnp.full((TILE, 1), 0.4)
                dy = jnp.full((TILE, 1), 0.5)
                dz = jnp.full((TILE, 1), 0.6)
                tmin = jnp.zeros((TILE, 1))
                tmax = jnp.full((TILE, 1), 1e30)
            else:
                ox = o_ref[g, :, 0:1]
                oy = o_ref[g, :, 1:2]
                oz = o_ref[g, :, 2:3]
                dx = d_ref[g, :, 0:1]
                dy = d_ref[g, :, 1:2]
                dz = d_ref[g, :, 2:3]
                tmin = mm_ref[g, :, 0:1]
                tmax = mm_ref[g, :, 1:2]
            bt = jnp.where(first, jnp.minimum(tmax, ptr.BIG), bt)
            bi = jnp.where(first, jnp.int32(-1), bi)

            den = (tri[0] * dx + tri[1] * dy + tri[2] * dz)
            num = tri[3] - (tri[0] * ox + tri[1] * oy + tri[2] * oz)
            f = jnp.where(den != 0, 1.0 / jnp.where(den == 0, 1.0, den),
                          0.0)
            tt = num * f
            px = ox + tt * dx
            py = oy + tt * dy
            pz = oz + tt * dz
            uu = tri[4] * px + tri[5] * py + tri[6] * pz - tri[7]
            vv = tri[8] * px + tri[9] * py + tri[10] * pz - tri[11]
            lane_block = jax.lax.broadcasted_iota(
                jnp.int32, (TILE, bkv), 1) // CLUSTER
            slot_ok = (ls * kbv + lane_block) < count
            hit = (den != 0) & (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & \
                (tt >= tmin) & (tt < bt) & slot_ok
            tt = jnp.where(hit, tt, ptr.BIG)
            cand_t = jnp.min(tt, axis=1, keepdims=True)
            arg = jnp.argmin(tt, axis=1)[:, None]
            closer = cand_t < bt
            cid_win = jnp.zeros((TILE, 1), jnp.int32)
            for j in range(kbv):
                cid_win = jnp.where(arg // CLUSTER == j, orders[j],
                                    cid_win)
            bt = jnp.where(closer, cand_t, bt)
            bi = jnp.where(closer, cid_win * CLUSTER + arg % CLUSTER, bi)

            if mode != "nowrite":
                @pl.when(last)
                def _():
                    out_ref[g, :, 0:1] = bt
                    out_ref[g, :, 1:2] = jax.lax.bitcast_convert_type(
                        bi, jnp.float32)

            ng = jnp.where(last, next_active(g + 1), g)
            nls = jnp.where(last, 0, ls + 1)
            return (ng, nls, bt, bi)

        init = (next_active(jnp.int32(0)), jnp.int32(0),
                jnp.zeros((TILE, 1), jnp.float32),
                jnp.full((TILE, 1), -1, jnp.int32))
        fin = jax.lax.fori_loop(0, trip, body, init)
        if mode == "nowrite":
            @pl.when(fin[0] >= 0)
            def _():
                out_ref[0, :, 0:1] = fin[2]
    return kern


@partial(jax.jit, static_argnames=("mode", "n_clusters", "cpad", "idmask"))
def run_mode(counts, keys, o3, d3, mm2, tris12, mode, n_clusters, cpad,
             idmask):
    n_tiles = counts.shape[0]
    heads = keys[:, :KC]
    flat = keys.reshape(-1)
    steps = (counts + KBV - 1) // KBV
    trips = jnp.sum(steps.reshape(-1, G), axis=1)
    C = tris12.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles // G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                  pl.BlockSpec((G, TILE, 3), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((G, TILE, 3), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((G, TILE, 2), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, 12, 1, CLUSTER),
                               lambda b, *_: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, TILE, 2), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((2, G, KC), jnp.int32),
            pltpu.SMEM((cpad,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ])
    return pl.pallas_call(
        make_kernel(mode, n_clusters, cpad, idmask),
        out_shape=jax.ShapeDtypeStruct((n_tiles, TILE, 2), jnp.float32),
        grid_spec=grid_spec)(counts, trips, heads, flat, o3, d3, mm2,
                             tris12)


def main():
    dat = np.load("/tmp/waves.npz")
    tracer, _ = build_cluster_tracer(dat["tri_pos"], dat["tri_instance"])
    C = tracer.n_clusters
    PT = ptr.TILE
    o = jnp.asarray(dat["w2_o"])
    d = jnp.asarray(dat["w2_d"])
    tm = jnp.asarray(dat["w2_tmax"])
    R = o.shape[0]
    tmin = jnp.full(R, 1e-4, jnp.float32)
    sig = jax.jit(lambda o_, d_, a, b: sigsort_perm(tracer, o_, d_, a, b))
    perm = sig(o, d, tmin, tm)
    o, d, tmin, tm = o[perm], d[perm], tmin[perm], tm[perm]
    p1 = jax.jit(lambda o_, d_, a, b: phase1_keys(tracer, o_, d_, a, b,
                                                  PT, ptr.KB))
    counts, keys = p1(o, d, tmin, tm)
    cpad = 1024 * (-(-(C + ptr.KB) // 1024))
    idbits = max(int(np.ceil(np.log2(max(C, 2)))), 1)
    idmask = (1 << idbits) - 1
    n_tiles = R // PT
    o3 = o.reshape(n_tiles, PT, 3)
    d3 = d.reshape(n_tiles, PT, 3)
    mm2 = jnp.stack([tmin, tm], -1).reshape(n_tiles, PT, 2)

    def timeit(fn, n=6):
        fn()
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000

    for mode in ("full", "noray", "fixord", "nowrite"):
        def run():
            r = run_mode(counts, keys, o3, d3, mm2, tracer.tris12,
                         mode, C, cpad, idmask)
            jax.block_until_ready(r)
            return r
        ms = timeit(run)
        print(f"{mode:8s}: {ms:6.1f} ms  ({ms * 1000 / n_tiles:4.2f}us/t)",
              flush=True)


if __name__ == "__main__":
    main()
