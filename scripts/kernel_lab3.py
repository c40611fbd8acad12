#!/usr/bin/env python
"""VMEM-resident triangle table: can the traversal kernel index cluster
blocks straight out of VMEM (no per-step DMA, no semaphores, no double
buffering)?  test.glb's tri table is 2.9 MB and Sponza-class 9.7 MB —
both fit v5e VMEM — so if dynamic first-dim indexing of a VMEM ref is
legal and fast, the per-tile fixed cost collapses and small TILE/KB
(which cull 2-3x better, scripts/trace_lab2.py) stop losing to
overhead.  Compare against kernel_lab2's DMA variants."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from honest_timing import scan_time

Cc = 636
rng = np.random.default_rng(0)
tris9 = jnp.asarray(rng.random((Cc, 9, 1, 128), dtype=np.float32))


def make_kernel(TILE, KB, G):
    BK = KB * 128

    def kernel(meta_ref, rays_ref, out_ref, tris_ref, meta_scr, meta_sem,
               *, steps):
        b = pl.program_id(0)
        nb = pl.num_programs(0)
        row = 1024
        grow = G * row

        def meta_dma(slot, blk):
            return pltpu.make_async_copy(
                meta_ref.at[pl.ds(blk * grow, grow)],
                meta_scr.at[pl.ds(slot * grow, grow)], meta_sem.at[slot])

        @pl.when(b == 0)
        def _():
            meta_dma(0, b).start()
        slot = jax.lax.rem(b, 2)

        @pl.when(b + 1 < nb)
        def _():
            meta_dma(jax.lax.rem(b + 1, 2), b + 1).start()
        meta_dma(slot, b).wait()

        def process_tile(g, _):
            base = slot * grow + g * row

            def brick_at(k):
                return jnp.clip(meta_scr[base + k], 0, Cc - 1)

            ox = rays_ref[g, :, 0:1]
            oy = rays_ref[g, :, 1:2]
            oz = rays_ref[g, :, 2:3]
            dx = rays_ref[g, :, 3:4]
            dy = rays_ref[g, :, 4:5]
            dz = rays_ref[g, :, 5:6]
            tmin = rays_ref[g, :, 6:7]

            init = (jnp.minimum(rays_ref[g, :, 7:8], 3e38),
                    jnp.full((TILE, 1), -1, jnp.int32))

            def loop(step, carry):
                best_t, best_id = carry
                ts = [tris_ref[brick_at(step * KB + j)] for j in range(KB)]
                if KB > 1:
                    tri = jnp.concatenate(ts, axis=-1)  # (9, 1, BK)
                else:
                    tri = ts[0]
                v0x = tri[0]
                v0y = tri[1]
                v0z = tri[2]
                e1x = tri[3]
                e1y = tri[4]
                e1z = tri[5]
                e2x = tri[6]
                e2y = tri[7]
                e2z = tri[8]
                hx = dy * e2z - dz * e2y
                hy = dz * e2x - dx * e2z
                hz = dx * e2y - dy * e2x
                a = e1x * hx + e1y * hy + e1z * hz
                f = jnp.where(a != 0, 1.0 /
                              jnp.where(a == 0, 1.0, a), 0.0)
                sx = ox - v0x
                sy = oy - v0y
                sz = oz - v0z
                uu = f * (sx * hx + sy * hy + sz * hz)
                qx = sy * e1z - sz * e1y
                qy = sz * e1x - sx * e1z
                qz = sx * e1y - sy * e1x
                vv = f * (dx * qx + dy * qy + dz * qz)
                tt = f * (e2x * qx + e2y * qy + e2z * qz)
                hit = (a != 0) & (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & \
                    (tt >= tmin) & (tt < best_t)
                tt = jnp.where(hit, tt, 3e38)
                cand_t = jnp.min(tt, axis=1, keepdims=True)
                arg = jnp.argmin(tt, axis=1)[:, None]
                closer = cand_t < best_t
                best_t = jnp.where(closer, cand_t, best_t)
                best_id = jnp.where(closer, step * BK + arg, best_id)
                return best_t, best_id

            bt, bi = jax.lax.fori_loop(0, steps, loop, init)
            out_ref[g, :, 0:1] = bt
            out_ref[g, :, 1:2] = jax.lax.bitcast_convert_type(
                bi, jnp.float32)
            return 0

        jax.lax.fori_loop(0, G, process_tile, 0)
    return kernel, BK


def run(TILE, KB, label, steps, G=32, n=16):
    R = 65536
    n_tiles = R // TILE
    kernel, BK = make_kernel(TILE, KB, G)
    meta = jnp.asarray(
        rng.integers(0, Cc, n_tiles * 1024, dtype=np.int32))
    rays = jnp.asarray(rng.random((n_tiles, TILE, 8), dtype=np.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles // G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                  pl.BlockSpec((G, TILE, 8), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, TILE, 2), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Cc, 9, 1, 128), jnp.float32),
            pltpu.SMEM((2 * G * 1024,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ])
    out_shape = jax.ShapeDtypeStruct((n_tiles, TILE, 2), jnp.float32)

    def kernel_wrap(meta_ref, rays_ref, tris_in, out_ref, tri_scr,
                    meta_scr, meta_sem, *, steps):
        # copy the whole tri table into VMEM scratch once at b==0
        # (scratch persists across the sequential grid)
        @pl.when(pl.program_id(0) == 0)
        def _():
            tri_scr[...] = tris_in[...]
        kernel(meta_ref, rays_ref, out_ref, tri_scr, meta_scr, meta_sem,
               steps=steps)

    grid_spec2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles // G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                  pl.BlockSpec((G, TILE, 8), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((Cc, 9, 1, 128), lambda b: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, TILE, 2), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Cc, 9, 1, 128), jnp.float32),
            pltpu.SMEM((2 * G * 1024,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ])

    @jax.jit
    def f(i):
        return pl.pallas_call(partial(kernel_wrap, steps=steps),
                              out_shape=out_shape,
                              grid_spec=grid_spec2)(
            meta, rays + i.astype(jnp.float32) * 0, tris9)

    ms = scan_time(f, n=n)
    tests = R * steps * BK
    print(f"{label:28s} steps={steps}: {ms:7.2f} ms "
          f"({ms*1e3/n_tiles:5.2f} us/tile, "
          f"{tests/(ms/1e3)/1e9:6.1f} G tests/s)", flush=True)


if __name__ == "__main__":
    for TILE in (8, 16, 32):
        target = {8: 14, 16: 26, 32: 52}[TILE]
        for KB in (1, 2, 4, 8):
            steps = max(target // KB, 1)
            run(TILE, KB, f"vmem TILE={TILE} KB={KB}", steps)
