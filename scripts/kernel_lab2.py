#!/usr/bin/env python
"""Microbenchmarks for the FINE-BRICK traversal kernel shape.

trace_lab (cull simulation on captured waves) says 32-tri bricks +
16-ray tiles + dir-origin ray sort test 5.2x fewer triangles than the
production K=128/t32 config (8,925 vs 46,317 tris/ray summed over a
depth-4 frame's 7 waves). kernel_lab says the production kernel is
VPU-bound at ~45G ray-tri tests/s with DMA fully hidden. The open
question this script answers on hardware: does the fine shape keep the
VPU busy, or do per-brick DMA descriptors / per-tile scalar overhead
become the bottleneck at (16 rays x KB*32 tris) blocks?

Variants:
  k6  TILE=16, brick=32, bricks DMA'd as 32-lane slices of a
      (C, 9, 1, 128) coarse layout (4 bricks per cluster row)
  k7  TILE=32, brick=32 (same DMA granularity, twice the rays)
  bodies: mt    - production Moller-Trumbore (division, argmin)
          mtfast- deferred-division MT + packed (t|lane) min, no argmin
"""
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

BRICK = 128         # Mosaic DMA lane quantum: 128-tri clusters
Cc = 636
NB = Cc

rng = np.random.default_rng(0)
tris9 = jnp.asarray(rng.random((Cc, 9, 1, 128), dtype=np.float32))


def make_kernel(TILE, KB, body, G):
    BK = KB * BRICK

    def kernel(meta_ref, rays_ref, tris_ref, out_ref, tri_scr, meta_scr,
               meta_sem, sem, *, steps):
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
                return jnp.clip(meta_scr[base + k], 0, NB - 1)

            ox = rays_ref[g, :, 0:1]
            oy = rays_ref[g, :, 1:2]
            oz = rays_ref[g, :, 2:3]
            dx = rays_ref[g, :, 3:4]
            dy = rays_ref[g, :, 4:5]
            dz = rays_ref[g, :, 5:6]
            tmin = rays_ref[g, :, 6:7]

            def get_dmas(buf, step):
                dmas = []
                for j in range(KB):
                    bid = brick_at(step * KB + j)
                    dmas.append(pltpu.make_async_copy(
                        tris_ref.at[bid],
                        tri_scr.at[buf, :, :, pl.ds(j * BRICK, BRICK)],
                        sem.at[buf, j]))
                return dmas

            init = (jnp.minimum(rays_ref[g, :, 7:8], 3e38),
                    jnp.full((TILE, 1), -1, jnp.int32))

            for dma in get_dmas(0, 0):
                dma.start()

            def loop(step, carry):
                buf = jax.lax.rem(step, 2)

                @pl.when(step + 1 < steps)
                def _():
                    for dma in get_dmas(jax.lax.rem(step + 1, 2), step + 1):
                        dma.start()
                for dma in get_dmas(buf, step):
                    dma.wait()
                return body(tri_scr, buf, ox, oy, oz, dx, dy, dz, tmin,
                            carry, step, TILE, BK)

            bt, bi = jax.lax.fori_loop(0, steps, loop, init)
            out_ref[g, :, 0:1] = bt
            out_ref[g, :, 1:2] = jax.lax.bitcast_convert_type(
                bi, jnp.float32)
            return 0

        jax.lax.fori_loop(0, G, process_tile, 0)
    return kernel, BK


def mt_body(tri_scr, buf, ox, oy, oz, dx, dy, dz, tmin, carry, step,
            TILE, BK):
    best_t, best_id = carry
    v0x = tri_scr[buf, 0]
    v0y = tri_scr[buf, 1]
    v0z = tri_scr[buf, 2]
    e1x = tri_scr[buf, 3]
    e1y = tri_scr[buf, 4]
    e1z = tri_scr[buf, 5]
    e2x = tri_scr[buf, 6]
    e2y = tri_scr[buf, 7]
    e2z = tri_scr[buf, 8]
    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    f = jnp.where(a != 0, 1.0 / jnp.where(a == 0, 1.0, a), 0.0)
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


def mtfast_body(tri_scr, buf, ox, oy, oz, dx, dy, dz, tmin, carry, step,
                TILE, BK):
    """Deferred-division MT: all tests multiplied through by |a|; the
    winning lane is found with ONE min over packed (t_bits & ~mask | lane)
    keys (t >= 0 so the IEEE bit pattern is order-preserving; the id
    steals mantissa LSBs, keeping the key a valid t lower bound)."""
    best_t, best_key = carry
    v0x = tri_scr[buf, 0]
    v0y = tri_scr[buf, 1]
    v0z = tri_scr[buf, 2]
    e1x = tri_scr[buf, 3]
    e1y = tri_scr[buf, 4]
    e1z = tri_scr[buf, 5]
    e2x = tri_scr[buf, 6]
    e2y = tri_scr[buf, 7]
    e2z = tri_scr[buf, 8]
    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    sx = ox - v0x
    sy = oy - v0y
    sz = oz - v0z
    u_n = sx * hx + sy * hy + sz * hz
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v_n = dx * qx + dy * qy + dz * qz
    t_n = e2x * qx + e2y * qy + e2z * qz
    sa = jnp.where(a < 0, -1.0, 1.0)
    na = a * sa
    nu = u_n * sa
    nv = v_n * sa
    nt = t_n * sa
    hit = (nu >= 0) & (nv >= 0) & (nu + nv <= na) & \
        (nt >= tmin * na) & (nt < best_t * na) & (na > 0)
    # exact t only for hit lanes (division on survivors only is not
    # possible lane-wise; division happens but only feeds hit lanes)
    tt = jnp.where(hit, t_n / jnp.where(na == 0, 1.0, a * sa), 3e38)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE, BK), 1)
    tb = jax.lax.bitcast_convert_type(tt, jnp.int32)
    key = (tb & ~1023) | lane
    cand = jnp.min(key, axis=1, keepdims=True)
    best_t_bits = jax.lax.bitcast_convert_type(best_t, jnp.int32)
    closer = cand < best_t_bits
    bt = jax.lax.bitcast_convert_type(cand & ~1023, jnp.float32)
    best_t = jnp.where(closer, bt, best_t)
    best_key = jnp.where(closer, step * BK + (cand & 1023), best_key)
    return best_t, best_key


def run(TILE, KB, body, label, steps, G=32, n=16):
    R = 65536
    n_tiles = R // TILE
    kernel, BK = make_kernel(TILE, KB, body, G)
    meta = jnp.asarray(
        rng.integers(0, NB, n_tiles * 1024, dtype=np.int32))
    rays = jnp.asarray(rng.random((n_tiles, TILE, 8), dtype=np.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles // G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                  pl.BlockSpec((G, TILE, 8), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec((G, TILE, 2), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 9, 1, BK), jnp.float32),
            pltpu.SMEM((2 * G * 1024,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, KB)),
        ])
    out_shape = jax.ShapeDtypeStruct((n_tiles, TILE, 2), jnp.float32)

    @jax.jit
    def f(i):
        return pl.pallas_call(partial(kernel, steps=steps),
                              out_shape=out_shape,
                              grid_spec=grid_spec)(
            meta, rays + i.astype(jnp.float32) * 0, tris9)

    ms = scan_time(f, n=n)
    tests = R * steps * BK
    print(f"{label:34s} steps={steps}: {ms:7.2f} ms "
          f"({ms*1e3/n_tiles:5.2f} us/tile, "
          f"{tests/(ms/1e3)/1e9:6.1f} G tests/s)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["k6", "k7", "k6f", "k7f"]
    for name in which:
        body = mtfast_body if name.endswith("f") else mt_body
        if name.startswith("k8"):
            TILE = 8
        elif name.startswith("k6"):
            TILE = 16
        else:
            TILE = 32
        for KB in (4, 8, 16):
            target = {8: 14, 16: 26, 32: 52}[TILE]
            steps = max(target // KB, 1)
            run(TILE, KB, body, f"{name} TILE={TILE} KB={KB}", steps)
