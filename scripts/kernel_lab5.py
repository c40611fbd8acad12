#!/usr/bin/env python
"""Baldwin-Weber precomputed-transform intersection vs Möller-Trumbore
in the VMEM-resident traversal loop: BW stores 12 floats/tri
(n, n.v0, r1, r1.v0, r2, r2.v0 — rows of [e1 e2 n]^-1) and needs ~27
VPU ops/pair vs MT's ~40. Measures raw G tests/s at TILE=32 KB=8,
fixed-step loop (same harness as kernel_lab4 'fixed')."""
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
TILE = 32
G = 32
rng = np.random.default_rng(0)
tris9 = jnp.asarray(rng.random((Cc, 9, 1, 128), dtype=np.float32))
tris12 = jnp.asarray(rng.random((Cc, 12, 1, 128), dtype=np.float32))


def make_kernel(KB, variant):
    BK = KB * 128
    NF = 9 if variant == "mt" else 12

    def kernel(meta_ref, rays_ref, tris_ref, out_ref, meta_scr, meta_sem,
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

        def tile(g, _):
            base = slot * grow + g * row
            ox = rays_ref[g, :, 0:1]
            oy = rays_ref[g, :, 1:2]
            oz = rays_ref[g, :, 2:3]
            dx = rays_ref[g, :, 3:4]
            dy = rays_ref[g, :, 4:5]
            dz = rays_ref[g, :, 5:6]
            tmin = rays_ref[g, :, 6:7]

            def body(step, carry):
                best_t, best_id = carry
                orders = [jnp.minimum(
                    meta_scr[base + step * KB + j] & 1023, Cc - 1)
                    for j in range(KB)]
                ts = [tris_ref[o] for o in orders]
                tri = jnp.concatenate(ts, axis=-1) if KB > 1 else ts[0]
                if variant == "mt":
                    v0x, v0y, v0z = tri[0], tri[1], tri[2]
                    e1x, e1y, e1z = tri[3], tri[4], tri[5]
                    e2x, e2y, e2z = tri[6], tri[7], tri[8]
                    hx = dy * e2z - dz * e2y
                    hy = dz * e2x - dx * e2z
                    hz = dx * e2y - dy * e2x
                    a = e1x * hx + e1y * hy + e1z * hz
                    f = jnp.where(a != 0,
                                  1.0 / jnp.where(a == 0, 1.0, a), 0.0)
                    sx = ox - v0x
                    sy = oy - v0y
                    sz = oz - v0z
                    uu = f * (sx * hx + sy * hy + sz * hz)
                    qx = sy * e1z - sz * e1y
                    qy = sz * e1x - sx * e1z
                    qz = sx * e1y - sy * e1x
                    vv = f * (dx * qx + dy * qy + dz * qz)
                    tt = f * (e2x * qx + e2y * qy + e2z * qz)
                    hit = (a != 0) & (uu >= 0) & (vv >= 0) & \
                        (uu + vv <= 1) & (tt >= tmin) & (tt < best_t)
                else:
                    nx, ny, nz, nd = tri[0], tri[1], tri[2], tri[3]
                    r1x, r1y, r1z, r1d = tri[4], tri[5], tri[6], tri[7]
                    r2x, r2y, r2z, r2d = tri[8], tri[9], tri[10], tri[11]
                    den = nx * dx + ny * dy + nz * dz
                    num = nd - (nx * ox + ny * oy + nz * oz)
                    f = jnp.where(den != 0,
                                  1.0 / jnp.where(den == 0, 1.0, den),
                                  0.0)
                    tt = num * f
                    px = ox + tt * dx
                    py = oy + tt * dy
                    pz = oz + tt * dz
                    uu = r1x * px + r1y * py + r1z * pz - r1d
                    vv = r2x * px + r2y * py + r2z * pz - r2d
                    hit = (den != 0) & (uu >= 0) & (vv >= 0) & \
                        (uu + vv <= 1) & (tt >= tmin) & (tt < best_t)
                tt = jnp.where(hit, tt, 3e38)
                cand = jnp.min(tt, axis=1, keepdims=True)
                arg = jnp.argmin(tt, axis=1)[:, None]
                closer = cand < best_t
                best_t = jnp.where(closer, cand, best_t)
                best_id = jnp.where(closer,
                                    step * BK + arg, best_id)
                return best_t, best_id

            bt, bi = jax.lax.fori_loop(
                0, steps, body,
                (jnp.full((TILE, 1), 3e38), jnp.zeros((TILE, 1),
                                                      jnp.int32)))
            out_ref[g, :, 0:1] = bt
            out_ref[g, :, 1:2] = bi.astype(jnp.float32)
            return 0

        jax.lax.fori_loop(0, G, tile, 0)

    return kernel, NF


def run(KB, variant, steps, n=8):
    kernel, NF = make_kernel(KB, variant)
    n_tiles = 32768
    R = n_tiles * TILE
    meta = jnp.asarray(
        rng.integers(0, Cc, n_tiles * 1024, dtype=np.int32))
    rays = jnp.asarray(rng.random((n_tiles, TILE, 8), dtype=np.float32))
    tris = tris9 if variant == "mt" else tris12
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles // G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                  pl.BlockSpec((G, TILE, 8), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((Cc, NF, 1, 128), lambda b: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, TILE, 2), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((2 * G * 1024,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ])
    out_shape = jax.ShapeDtypeStruct((n_tiles, TILE, 2), jnp.float32)

    @jax.jit
    def f(i):
        return pl.pallas_call(partial(kernel, steps=steps),
                              out_shape=out_shape,
                              grid_spec=grid_spec)(
            meta, rays + i.astype(jnp.float32) * 0, tris)

    ms = scan_time(f, n=n)
    tests = R * steps * KB * 128
    print(f"{variant:3s} KB={KB:2d} steps={steps}: {ms:7.2f} ms "
          f"({tests/(ms/1e3)/1e9:6.1f} G tests/s)", flush=True)


if __name__ == "__main__":
    for variant in ("mt", "bw"):
        for KB, steps in ((8, 6), (8, 4), (4, 8)):
            run(KB, variant, steps)
