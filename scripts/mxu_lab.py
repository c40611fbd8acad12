#!/usr/bin/env python
"""Prototype: MXU Plücker-form intersection step vs VPU Möller-Trumbore.

Benchmarks one synthetic traversal-like kernel per variant over the same
workload: n_tiles tiles x steps x (TILE rays, BK tris).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from honest_timing import scan_time

TILE = 32
CLUSTER = 128
KB = 8
BK = KB * CLUSTER
G = 32

R = 65536
n_tiles = R // TILE
C = 636
STEPS = 6   # fixed steps per tile (mean active ~47 -> ~6 steps of KB=8)

rng = np.random.default_rng(0)
o3 = jnp.asarray(rng.random((n_tiles, TILE, 3), dtype=np.float32))
d3 = jnp.asarray(rng.standard_normal((n_tiles, TILE, 3)).astype(np.float32))
mm2 = jnp.asarray(
    np.concatenate([np.zeros((n_tiles, TILE, 1), np.float32),
                    np.full((n_tiles, TILE, 1), 3e38, np.float32)], -1))
tris9 = jnp.asarray(rng.random((C, 9, 1, CLUSTER), dtype=np.float32))
tris24 = jnp.asarray(rng.random((C, 24, 1, CLUSTER), dtype=np.float32))
order = jnp.asarray(rng.integers(0, C, (n_tiles, 64), dtype=np.int32))


def run(kernel, tris, rows, label):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles // G,),
        in_specs=[pl.BlockSpec((G, TILE, 3), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((G, TILE, 3), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((G, TILE, 2), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec((G, TILE, 2), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, rows, 1, BK), jnp.float32),
            pltpu.SemaphoreType.DMA((2, KB)),
        ])
    out_shape = jax.ShapeDtypeStruct((n_tiles, TILE, 2), jnp.float32)

    @jax.jit
    def f(i):
        return pl.pallas_call(kernel, out_shape=out_shape,
                              grid_spec=grid_spec)(
            order, o3 + i.astype(jnp.float32) * 1e-7, d3, mm2, tris)[
                :, :, 0].sum()

    ms = scan_time(f, n=8)
    tput = R * STEPS * BK / (ms / 1e3) / 1e9
    print(f"{label:28s}: {ms:7.2f} ms  ({tput_fmt(tput)})", flush=True)


def tput_fmt(g):
    return f"{g:6.1f} G ray-tri/s"


def common(kernel_body):
    def kernel(order_ref, o_ref, d_ref, mm_ref, tris_ref, out_ref,
               tri_scr, sem):
        b = pl.program_id(0)

        def process_tile(g, _):
            gt = b * G + g

            def get_dmas(buf, step):
                return [pltpu.make_async_copy(
                    tris_ref.at[order_ref[gt, step * KB + j]],
                    tri_scr.at[buf, :, :, pl.ds(j * CLUSTER, CLUSTER)],
                    sem.at[buf, j]) for j in range(KB)]

            ox = o_ref[g, :, 0:1]
            oy = o_ref[g, :, 1:2]
            oz = o_ref[g, :, 2:3]
            dx = d_ref[g, :, 0:1]
            dy = d_ref[g, :, 1:2]
            dz = d_ref[g, :, 2:3]
            tmin = mm_ref[g, :, 0:1]
            tmax = mm_ref[g, :, 1:2]

            for dma in get_dmas(0, 0):
                dma.start()

            def body(step, carry):
                best_t, best_id = carry
                buf = jax.lax.rem(step, 2)

                @pl.when(step + 1 < STEPS)
                def _():
                    for dma in get_dmas(jax.lax.rem(step + 1, 2), step + 1):
                        dma.start()
                for dma in get_dmas(buf, step):
                    dma.wait()
                best_t, best_id = kernel_body(
                    tri_scr, buf, ox, oy, oz, dx, dy, dz, tmin, tmax,
                    best_t, best_id, step)
                return best_t, best_id

            init_t = jnp.minimum(tmax, 3e38)
            init_id = jnp.full((TILE, 1), -1, jnp.int32)
            bt, bi = jax.lax.fori_loop(0, STEPS, body, (init_t, init_id))
            out_ref[g, :, 0:1] = bt
            out_ref[g, :, 1:2] = jax.lax.bitcast_convert_type(
                bi, jnp.float32)
            return 0

        jax.lax.fori_loop(0, G, process_tile, 0)
    return kernel


def mt_body(tri_scr, buf, ox, oy, oz, dx, dy, dz, tmin, tmax,
            best_t, best_id, step):
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


def plucker_body(tri_scr, buf, ox, oy, oz, dx, dy, dz, tmin, tmax,
                 best_t, best_id, step):
    # ray Plücker: U = d, V = d x o  (TILE, 6)
    vx = dy * oz - dz * oy
    vy = dz * ox - dx * oz
    vz = dx * oy - dy * ox
    rays6 = jnp.concatenate([dx, dy, dz, vx, vy, vz], axis=1)  # (TILE, 6)
    rays4 = jnp.concatenate([-ox, -oy, -oz, jnp.ones_like(ox)],
                            axis=1)                            # (TILE, 4)
    blk = tri_scr[buf, :, 0, :]                                # (24, BK)
    # sides: one matmul per edge, (TILE,6) @ (6,BK)
    s0 = jax.lax.dot_general(
        rays6, blk[0:6], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    s1 = jax.lax.dot_general(
        rays6, blk[6:12], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    s2 = jax.lax.dot_general(
        rays6, blk[12:18], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    tnum = jax.lax.dot_general(
        rays4, blk[18:22], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    den = s0 + s1 + s2
    inside = ((s0 >= 0) & (s1 >= 0) & (s2 >= 0)) | \
             ((s0 <= 0) & (s1 <= 0) & (s2 <= 0))
    f = jnp.where(den != 0, 1.0 / jnp.where(den == 0, 1.0, den), 0.0)
    tt = tnum * f
    hit = inside & (den != 0) & (tt >= tmin) & (tt < best_t)
    tt = jnp.where(hit, tt, 3e38)
    cand_t = jnp.min(tt, axis=1, keepdims=True)
    arg = jnp.argmin(tt, axis=1)[:, None]
    closer = cand_t < best_t
    best_t = jnp.where(closer, cand_t, best_t)
    best_id = jnp.where(closer, step * BK + arg, best_id)
    return best_t, best_id


run(common(mt_body), tris9, 9, "VPU Moller-Trumbore")
run(common(plucker_body), tris24, 24, "MXU Plucker")
