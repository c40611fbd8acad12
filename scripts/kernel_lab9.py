#!/usr/bin/env python
"""Bisect per-STEP cost of the VMEM-resident traversal kernel:
  A: full (loads + concat + Baldwin-Weber math)
  B: loads + concat only (sum the concat, no BW math)
  C: BW math only (static tri block, no dynamic loads/concat)
  D: loads, no concat (8 separate (32,128) BW blocks, combined mins)
All on uniform counts=8/16 (1/2 steps per tile), R=1M."""
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

from tauray_tpu.ops.cluster import build_cluster_tracer
from tauray_tpu.ops import pallas_trace as ptr

TILE = ptr.TILE
G = ptr.G
KC = ptr.KC
CLUSTER = 128
KBV = 8
BKV = KBV * CLUSTER


def bw_block(tri, ox, oy, oz, dx, dy, dz, tmin, best_t, count, step,
             width):
    nx, ny, nz, ndot = tri[0], tri[1], tri[2], tri[3]
    r1x, r1y, r1z, r1d = tri[4], tri[5], tri[6], tri[7]
    r2x, r2y, r2z, r2d = tri[8], tri[9], tri[10], tri[11]
    den = nx * dx + ny * dy + nz * dz
    num = ndot - (nx * ox + ny * oy + nz * oz)
    f = jnp.where(den != 0, 1.0 / jnp.where(den == 0, 1.0, den), 0.0)
    tt = num * f
    px = ox + tt * dx
    py = oy + tt * dy
    pz = oz + tt * dz
    uu = r1x * px + r1y * py + r1z * pz - r1d
    vv = r2x * px + r2y * py + r2z * pz - r2d
    hit = (den != 0) & (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & \
        (tt >= tmin) & (tt < best_t)
    tt = jnp.where(hit, tt, ptr.BIG)
    cand_t = jnp.min(tt, axis=1, keepdims=True)
    arg = jnp.argmin(tt, axis=1)[:, None]
    return cand_t, arg


def make_kernel(mode):
    def kern(counts_ref, heads_ref, o_ref, d_ref, mm_ref, tris_ref,
             out_ref, head_scr, head_sem):
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

        def process_tile(g, _):
            count = counts_ref[b * G + g]
            steps = (count + KBV - 1) // KBV
            ox = o_ref[g, :, 0:1]
            oy = o_ref[g, :, 1:2]
            oz = o_ref[g, :, 2:3]
            dx = d_ref[g, :, 0:1]
            dy = d_ref[g, :, 1:2]
            dz = d_ref[g, :, 2:3]
            tmin = mm_ref[g, :, 0:1]
            tmax = mm_ref[g, :, 1:2]

            def key_at(k):
                return head_scr[slot, g, jnp.minimum(k, KC - 1)]

            def order_at(k):
                return jnp.minimum(key_at(k) & 1023,
                                   tris_ref.shape[0] - 1)

            def cond(c):
                if mode == "exit":
                    return (c[0] < steps) & ~c[2]
                return (c[0] < steps)

            def body(c):
                if mode == "exit":
                    step, best_t, done_in, best_id = c
                else:
                    step, best_t, best_id = c
                orders = [order_at(step * KBV + j) for j in range(KBV)]
                if mode in ("full", "loads", "exit"):
                    ts = [tris_ref[o] for o in orders]
                    tri = jnp.concatenate(ts, axis=-1)
                elif mode == "math":
                    tri = tris_ref[0:1].reshape(12, 1, CLUSTER)
                    tri = jnp.concatenate([tri] * KBV, axis=-1)
                if mode == "loads":
                    s = sum(tri[i] for i in range(12))
                    cand_t = jnp.min(s, axis=1, keepdims=True)
                    best_t = jnp.minimum(best_t, cand_t)
                    return (step + 1, best_t, best_id)
                if mode in ("full", "math", "exit"):
                    cand_t, arg = bw_block(tri, ox, oy, oz, dx, dy, dz,
                                           tmin, best_t, count, step, BKV)
                    closer = cand_t < best_t
                    cid_win = jnp.zeros((TILE, 1), jnp.int32)
                    for j in range(KBV):
                        cid_win = jnp.where(arg // CLUSTER == j,
                                            orders[j], cid_win)
                    best_t = jnp.where(closer, cand_t, best_t)
                    best_id = jnp.where(
                        closer, cid_win * CLUSTER + arg % CLUSTER,
                        best_id)
                    if mode == "exit":
                        next_tn = key_at((step + 1) * KBV) & ~1023
                        t_bits = jax.lax.bitcast_convert_type(
                            best_t, jnp.int32)
                        done = jnp.all(t_bits <= next_tn)
                        return (step + 1, best_t, done, best_id)
                    return (step + 1, best_t, best_id)
                # mode == "nocat": 8 separate (32,128) BW blocks
                for j in range(KBV):
                    tri = tris_ref[orders[j]]
                    cand_t, arg = bw_block(tri, ox, oy, oz, dx, dy, dz,
                                           tmin, best_t, count, step,
                                           CLUSTER)
                    closer = cand_t < best_t
                    best_t = jnp.where(closer, cand_t, best_t)
                    best_id = jnp.where(
                        closer, orders[j] * CLUSTER + arg, best_id)
                return (step + 1, best_t, best_id)

            init_t = jnp.minimum(tmax, ptr.BIG)
            init_id = jnp.full((TILE, 1), -1, jnp.int32)
            if mode == "exit":
                _, bt, _, bi = jax.lax.while_loop(
                    cond, body,
                    (jnp.int32(0), init_t, steps <= 0, init_id))
            else:
                _, bt, bi = jax.lax.while_loop(
                    cond, body, (jnp.int32(0), init_t, init_id))
            out_ref[g, :, 0:1] = bt
            out_ref[g, :, 1:2] = jax.lax.bitcast_convert_type(
                bi, jnp.float32)
            return 0

        jax.lax.fori_loop(0, G, process_tile, 0)
    return kern


@partial(jax.jit, static_argnames=("mode",))
def run_mode(counts, heads, o3, d3, mm2, tris12, mode):
    n_tiles = counts.shape[0]
    C = tris12.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles // G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
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
            pltpu.SemaphoreType.DMA((2,)),
        ])
    return pl.pallas_call(
        make_kernel(mode),
        out_shape=jax.ShapeDtypeStruct((n_tiles, TILE, 2), jnp.float32),
        grid_spec=grid_spec)(counts, heads, o3, d3, mm2, tris12)


def main():
    dat = np.load("/tmp/waves.npz")
    tracer, _ = build_cluster_tracer(dat["tri_pos"], dat["tri_instance"])
    tris12 = tracer.tris12
    R = 1048576
    n_tiles = R // TILE
    rng = np.random.default_rng(0)
    o3 = jnp.asarray(rng.standard_normal((n_tiles, TILE, 3)), jnp.float32)
    d3 = jnp.asarray(rng.standard_normal((n_tiles, TILE, 3)), jnp.float32)
    mm2 = jnp.asarray(
        np.stack([np.zeros((n_tiles, TILE)),
                  np.full((n_tiles, TILE), 1e30)], -1), jnp.float32)
    heads = jnp.asarray(
        rng.integers(0, tracer.n_clusters, (n_tiles, KC)), jnp.int32)

    def timeit(fn, n=5):
        fn()
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000

    for mode in ("full", "exit", "loads", "math", "nocat"):
        line = f"{mode:6s}:"
        for nact in (8, 16, 32):
            counts = jnp.full(n_tiles, nact, jnp.int32)

            def run():
                r = run_mode(counts, heads, o3, d3, mm2, tris12, mode)
                jax.block_until_ready(r)
                return r
            ms = timeit(run)
            r = run()
            hits = int((jax.lax.bitcast_convert_type(
                r[:, :, 1], jnp.int32) >= 0).sum())
            line += (f"  s{nact // 8}: {ms:6.1f}ms "
                     f"({ms * 1000 / n_tiles:4.2f}us/t h={hits})")
        print(line, flush=True)


if __name__ == "__main__":
    main()
