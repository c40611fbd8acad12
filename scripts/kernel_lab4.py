#!/usr/bin/env python
"""Cost of the production kernel's per-step machinery, measured on the
VMEM-resident variant (kernel_lab3 showed 43 G tests/s for the bare
fixed-step loop at TILE=32 KB=8):

  * while    — while_loop with per-step early-exit (jnp.all reduce ->
               scalar branch), like the production kernel
  * while2   — same but the exit test only every 2nd step
  * cid      — fixed loop + per-step winning-cluster-id resolution
               (the KB-long scalar-select chain, production style)
  * slot     — fixed loop, winner kept as ORDER SLOT (step*BK+arg);
               cluster id resolved post-kernel in XLA (one
               take_along_axis per wave)
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

Cc = 636
rng = np.random.default_rng(0)
tris9 = jnp.asarray(rng.random((Cc, 9, 1, 128), dtype=np.float32))


def mt_block(tri, ox, oy, oz, dx, dy, dz, tmin, best_t):
    v0x, v0y, v0z = tri[0], tri[1], tri[2]
    e1x, e1y, e1z = tri[3], tri[4], tri[5]
    e2x, e2y, e2z = tri[6], tri[7], tri[8]
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
    return jnp.where(hit, tt, 3e38)


def make_kernel(TILE, KB, G, variant):
    BK = KB * 128

    def kernel(meta_ref, rays_ref, tris_in, out_ref, tri_scr, meta_scr,
               meta_sem, *, steps):
        b = pl.program_id(0)
        nb = pl.num_programs(0)
        row = 1024
        grow = G * row

        @pl.when(pl.program_id(0) == 0)
        def _():
            tri_scr[...] = tris_in[...]

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

            init_t = jnp.minimum(rays_ref[g, :, 7:8], 3e38)
            init_id = jnp.full((TILE, 1), -1, jnp.int32)

            def step_body(step, best_t, best_id):
                ts = [tri_scr[brick_at(step * KB + j)] for j in range(KB)]
                tri = jnp.concatenate(ts, axis=-1) if KB > 1 else ts[0]
                tt = mt_block(tri, ox, oy, oz, dx, dy, dz, tmin, best_t)
                cand_t = jnp.min(tt, axis=1, keepdims=True)
                arg = jnp.argmin(tt, axis=1)[:, None]
                closer = cand_t < best_t
                if variant == "cid":
                    cid = jnp.zeros((TILE, 1), jnp.int32)
                    for j in range(KB):
                        cid = jnp.where(arg // 128 == j,
                                        brick_at(step * KB + j), cid)
                    win = cid * 128 + arg % 128
                else:
                    win = step * BK + arg
                best_t = jnp.where(closer, cand_t, best_t)
                best_id = jnp.where(closer, win, best_id)
                return best_t, best_id

            if variant in ("fixed", "cid", "slot"):
                def loop(step, carry):
                    return step_body(step, *carry)
                bt, bi = jax.lax.fori_loop(0, steps, loop,
                                           (init_t, init_id))
            elif variant == "while":
                def cond(c):
                    return (c[0] < steps) & ~c[1]

                def body(c):
                    step, _, best_t, best_id = c
                    best_t, best_id = step_body(step, best_t, best_id)
                    nxt = meta_scr[base + jnp.minimum(
                        (step + 1) * KB, row - 1)]
                    tb = jax.lax.bitcast_convert_type(best_t, jnp.int32)
                    done = jnp.all(tb <= nxt)
                    return (step + 1, done, best_t, best_id)

                _, _, bt, bi = jax.lax.while_loop(
                    cond, body, (jnp.int32(0), steps <= 0, init_t,
                                 init_id))
            else:  # while2: exit test every 2nd step
                def cond(c):
                    return (c[0] < steps) & ~c[1]

                def body(c):
                    step, _, best_t, best_id = c
                    best_t, best_id = step_body(step, best_t, best_id)
                    nxt = meta_scr[base + jnp.minimum(
                        (step + 1) * KB, row - 1)]
                    tb = jax.lax.bitcast_convert_type(best_t, jnp.int32)
                    done = jax.lax.cond(
                        jax.lax.rem(step, 2) == 1,
                        lambda: jnp.all(tb <= nxt),
                        lambda: jnp.bool_(False))
                    return (step + 1, done, best_t, best_id)

                _, _, bt, bi = jax.lax.while_loop(
                    cond, body, (jnp.int32(0), steps <= 0, init_t,
                                 init_id))

            out_ref[g, :, 0:1] = bt
            out_ref[g, :, 1:2] = jax.lax.bitcast_convert_type(
                bi, jnp.float32)
            return 0

        jax.lax.fori_loop(0, G, process_tile, 0)
    return kernel, BK


def run(TILE, KB, variant, steps, G=32, n=16):
    R = 65536
    n_tiles = R // TILE
    kernel, BK = make_kernel(TILE, KB, G, variant)
    meta = jnp.asarray(
        rng.integers(0, Cc, n_tiles * 1024, dtype=np.int32))
    rays = jnp.asarray(rng.random((n_tiles, TILE, 8), dtype=np.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
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
    out_shape = jax.ShapeDtypeStruct((n_tiles, TILE, 2), jnp.float32)

    @jax.jit
    def f(i):
        return pl.pallas_call(partial(kernel, steps=steps),
                              out_shape=out_shape,
                              grid_spec=grid_spec)(
            meta, rays + i.astype(jnp.float32) * 0, tris9)

    ms = scan_time(f, n=n)
    tests = R * steps * BK
    print(f"{variant:6s} TILE={TILE} KB={KB:2d} steps={steps}: "
          f"{ms:7.2f} ms ({tests/(ms/1e3)/1e9:6.1f} G tests/s)",
          flush=True)


if __name__ == "__main__":
    for variant in (sys.argv[1:] or ["fixed", "slot", "cid", "while",
                                     "while2"]):
        for TILE, KB in ((32, 8), (32, 16), (16, 8)):
            steps = {8: 6, 16: 3}[KB] if TILE == 32 else 3
            run(TILE, KB, variant, steps)
