#!/usr/bin/env python
"""MXU-step experiment (round 5): can the traversal inner loop's
Baldwin-Weber test run as small matmuls?

The BW test decomposes into six dot products per (ray, tri):
n.o, r1.o, r2.o (fold -ndot/-r1d/-r2d via a homogeneous 1-column) and
n.d, r1.d, r2.d. With the resident table laid out (C, 3, 4, CLUSTER)
[type(n,r1,r2), row(x,y,z,const), lane(tri)], a step of KBV clusters
does 6 matmuls (TILE,4)@(4,BKV) on the MXU plus a ~17-op epilogue —
against the current ~40-op VPU-only body.

Measures steps/s of both bodies on a synthetic stream with the whole
table VMEM-resident, identical iteration structure (v3-style streamed
fori over (tile, step) pairs).
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 32
CLUSTER = 128
KBV = 8
BKV = KBV * CLUSTER
G = 32
BIG = 3.0e38


def _body_common(best, cand_t, arg, orders, kbv):
    bt, bi = best
    closer = cand_t < bt
    cid_win = jnp.zeros((TILE, 1), jnp.int32)
    for j in range(kbv):
        cid_win = jnp.where(arg // CLUSTER == j, orders[j], cid_win)
    bt = jnp.where(closer, cand_t, bt)
    bi = jnp.where(closer, cid_win * CLUSTER + arg % CLUSTER, bi)
    return bt, bi


def _kernel(steps_ref, rays_ref, tris_ref, out_ref, *, mode, n_steps,
            n_clusters):
    g = pl.program_id(0)
    rays = rays_ref[0]
    ox = rays[:, 0:1]
    oy = rays[:, 1:2]
    oz = rays[:, 2:3]
    dx = rays[:, 3:4]
    dy = rays[:, 4:5]
    dz = rays[:, 5:6]
    tmin = rays[:, 6:7]
    if mode == "mxu":
        o4 = jnp.concatenate(
            [rays[:, 0:3], jnp.ones((TILE, 1), jnp.float32)], axis=1)
        d3 = rays[:, 3:6]

    def body(i, c):
        bt, bi = c
        orders = [jax.lax.rem(i * KBV + j + g, n_clusters)
                  for j in range(KBV)]
        if mode == "vpu":
            ts = [tris_ref[o] for o in orders]       # (12, 1, 128)
            tri = jnp.concatenate(ts, axis=-1)       # (12, 1, BKV)
            nx, ny, nz, ndot = tri[0], tri[1], tri[2], tri[3]
            r1x, r1y, r1z, r1d = tri[4], tri[5], tri[6], tri[7]
            r2x, r2y, r2z, r2d = tri[8], tri[9], tri[10], tri[11]
            den = nx * dx + ny * dy + nz * dz
            num = ndot - (nx * ox + ny * oy + nz * oz)
            f = jnp.where(den != 0, 1.0 / jnp.where(den == 0, 1.0, den),
                          0.0)
            tt = num * f
            px = ox + tt * dx
            py = oy + tt * dy
            pz = oz + tt * dz
            uu = r1x * px + r1y * py + r1z * pz - r1d
            vv = r2x * px + r2y * py + r2z * pz - r2d
        else:
            ts = [tris_ref[o] for o in orders]       # (3, 4, 128)
            tri = jnp.concatenate(ts, axis=-1)       # (3, 4, BKV)
            on = jax.lax.dot_general(
                o4, tri[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # n.o - ndot
            or1 = jax.lax.dot_general(
                o4, tri[1], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            or2 = jax.lax.dot_general(
                o4, tri[2], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dn = jax.lax.dot_general(
                d3, tri[0, 0:3], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dr1 = jax.lax.dot_general(
                d3, tri[1, 0:3], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dr2 = jax.lax.dot_general(
                d3, tri[2, 0:3], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            den = dn
            f = jnp.where(den != 0, 1.0 / jnp.where(den == 0, 1.0, den),
                          0.0)
            tt = -on * f
            uu = or1 + tt * dr1
            vv = or2 + tt * dr2
        hit = (den != 0) & (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & \
            (tt >= tmin) & (tt < bt)
        tt = jnp.where(hit, tt, BIG)
        tt = tt.reshape(TILE, BKV)
        cand_t = jnp.min(tt, axis=1, keepdims=True)
        arg = jnp.argmin(tt, axis=1)[:, None]
        return _body_common((bt, bi), cand_t, arg, orders, KBV)

    init = (jnp.full((TILE, 1), BIG, jnp.float32),
            jnp.full((TILE, 1), -1, jnp.int32))
    bt, bi = jax.lax.fori_loop(0, steps_ref[g], body, init)
    out_ref[0] = jnp.concatenate(
        [bt, jax.lax.bitcast_convert_type(bi, jnp.float32)], axis=1)


@partial(jax.jit, static_argnames=("mode", "n_steps", "C", "n_tiles"))
def run(steps, rays, tris, mode, n_steps, C, n_tiles):
    shape = (3, 4, CLUSTER) if mode == "mxu" else (12, 1, CLUSTER)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, TILE, 8), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((C,) + shape, lambda b, *_: (0,) * 4,
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TILE, 2), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        partial(_kernel, mode=mode, n_steps=n_steps, n_clusters=C),
        out_shape=jax.ShapeDtypeStruct((n_tiles, TILE, 2), jnp.float32),
        grid_spec=grid_spec,
    )(steps, rays, tris)


def main():
    C = 1024
    n_tiles = 4096
    n_steps = 8
    rng = np.random.default_rng(0)
    rays = rng.standard_normal((n_tiles, TILE, 8)).astype(np.float32)
    rays[:, :, 6] = 0.0
    rays[:, :, 7] = BIG
    v0 = rng.standard_normal((C * CLUSTER, 3)).astype(np.float32)
    e1 = rng.standard_normal((C * CLUSTER, 3)).astype(np.float32) * 0.1
    e2 = rng.standard_normal((C * CLUSTER, 3)).astype(np.float32) * 0.1
    n = np.cross(e1, e2)
    det = (n * n).sum(-1, keepdims=True)
    inv = np.where(det > 0, 1.0 / np.where(det == 0, 1, det), 0)
    r1 = np.cross(e2, n) * inv
    r2 = np.cross(n, e1) * inv

    def dv(x):
        return (x * v0).sum(-1, keepdims=True)
    bw = np.concatenate([n, dv(n), r1, dv(r1), r2, dv(r2)], -1)
    tris12 = np.swapaxes(bw.reshape(C, CLUSTER, 12), 1, 2)[:, :, None, :]
    tris12 = np.ascontiguousarray(tris12.reshape(C, 12, 1, CLUSTER))
    # mxu layout (C, 3type, 4row, CLUSTER), const = -dot
    m = np.zeros((C, 3, 4, CLUSTER), np.float32)
    for t, (vec, dd) in enumerate(((n, dv(n)), (r1, dv(r1)),
                                   (r2, dv(r2)))):
        vr = vec.reshape(C, CLUSTER, 3)
        m[:, t, 0] = vr[..., 0]
        m[:, t, 1] = vr[..., 1]
        m[:, t, 2] = vr[..., 2]
        m[:, t, 3] = -dd.reshape(C, CLUSTER)
    steps = np.full((n_tiles,), n_steps, np.int32)

    steps_j = jnp.asarray(steps)
    rays_j = jnp.asarray(rays)
    outs = {}
    for mode, tris in (("vpu", jnp.asarray(tris12)),
                       ("mxu", jnp.asarray(m))):
        out = run(steps_j, rays_j, tris, mode, n_steps, C, n_tiles)
        outs[mode] = np.asarray(out)
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            r = run(steps_j, rays_j, tris, mode, n_steps, C, n_tiles)
            float(np.asarray(jnp.sum(r[:, :, 0])))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        total_steps = n_tiles * n_steps
        print(f"{mode}: {dt*1e3:7.2f} ms  {dt/total_steps*1e6:6.3f} us/step "
              f"{total_steps*TILE*BKV/dt/1e9:7.1f} Gtests/s")
    a, b = outs["vpu"], outs["mxu"]
    ids_a = a[:, :, 1].view(np.int32)
    ids_b = b[:, :, 1].view(np.int32)
    print("t allclose:", np.allclose(a[:, :, 0], b[:, :, 0], rtol=1e-4,
                                     atol=1e-5),
          " id match:", float((ids_a == ids_b).mean()))


if __name__ == "__main__":
    main()
