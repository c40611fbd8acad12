"""Pallas TPU traversal kernel for the cluster tracer.

The XLA version of phase 2 (ops/cluster.py) is iteration-overhead-bound:
every fori step rematerializes gathers and reductions through HBM, and the
lockstep loop bound is the chunk MAX activity. This kernel keeps the whole
per-tile traversal on-chip:

  * grid = one program per ray tile (TILE rays);
  * phase 1 (dense slab culling + per-tile compacted cluster lists) stays
    in XLA — it is regular and cheap; the lists are inputs here;
  * the loop bound is each tile's OWN count (scalar-prefetched) — no
    lockstep-max waste;
  * each iteration DMAs one cluster's triangle block (9 x CLUSTER floats,
    double-buffered) from HBM and evaluates a dense (TILE x CLUSTER)
    Möller–Trumbore block on the VPU — triangles in vector lanes, rays in
    sublanes, best-hit state in VMEM for the whole tile.

Planned follow-up: Plücker-form tests as (TILE, 6) @ (6, 3*CLUSTER)
matmuls on the MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
CLUSTER = 128
BIG = 3.0e38


def _kernel(counts_ref,                       # scalar prefetch (n_tiles,)
            order_ref,                        # (n_tiles, 8, INNER) i32 HBM
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            tmin_ref, tmax_ref,               # rays (TILE, 1) VMEM
            tris_ref,                         # (C, 9, 1, CLUSTER) HBM
            tvalid_ref,                       # (C, 1, CLUSTER) f32 HBM
            t_out, id_out, u_out, v_out,      # (TILE, 1) VMEM outputs
            tri_scr, valid_scr, order_scr, order_sem, sem):
    t = pl.program_id(0)
    count = counts_ref[t]
    # cluster list must live in SMEM for scalar/DMA indexing
    order_dma = pltpu.make_async_copy(order_ref.at[t], order_scr, order_sem)
    order_dma.start()
    order_dma.wait()

    ox = ox_ref[:]          # (TILE, 1)
    oy = oy_ref[:]
    oz = oz_ref[:]
    dx = dx_ref[:]
    dy = dy_ref[:]
    dz = dz_ref[:]
    tmin = tmin_ref[:]
    tmax = tmax_ref[:]

    t_out[:] = jnp.minimum(tmax, BIG)
    id_out[:] = jnp.full((TILE, 1), -1, jnp.int32)
    u_out[:] = jnp.zeros((TILE, 1), jnp.float32)
    v_out[:] = jnp.zeros((TILE, 1), jnp.float32)

    inner = order_scr.shape[1]

    def get_dma(slot, k):
        cid = order_scr[k // inner, k % inner]
        return (
            pltpu.make_async_copy(tris_ref.at[cid], tri_scr.at[slot],
                                  sem.at[slot, 0]),
            pltpu.make_async_copy(tvalid_ref.at[cid], valid_scr.at[slot],
                                  sem.at[slot, 1]),
        )

    @pl.when(count > 0)
    def _():
        for dma in get_dma(0, 0):
            dma.start()

        def body(k, _):
            slot = jax.lax.rem(k, 2)
            nxt = jax.lax.rem(k + 1, 2)

            @pl.when(k + 1 < count)
            def _():
                for dma in get_dma(nxt, k + 1):
                    dma.start()

            for dma in get_dma(slot, k):
                dma.wait()

            # triangle components along lanes: (1, CLUSTER)
            v0x = tri_scr[slot, 0]
            v0y = tri_scr[slot, 1]
            v0z = tri_scr[slot, 2]
            e1x = tri_scr[slot, 3]
            e1y = tri_scr[slot, 4]
            e1z = tri_scr[slot, 5]
            e2x = tri_scr[slot, 6]
            e2y = tri_scr[slot, 7]
            e2z = tri_scr[slot, 8]

            # h = cross(d, e2): (TILE, CLUSTER)
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
            tvalid = valid_scr[slot] > 0.5          # (1, CLUSTER)
            best_t = t_out[:]                       # (TILE, 1)
            hit = (a != 0) & (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & \
                (tt >= tmin) & (tt < best_t) & tvalid
            tt = jnp.where(hit, tt, BIG)
            cand_t = jnp.min(tt, axis=1, keepdims=True)    # (TILE, 1)
            arg = jnp.argmin(tt, axis=1)[:, None]          # (TILE, 1)
            closer = cand_t < best_t
            cid = order_scr[k // inner, k % inner]
            t_out[:] = jnp.where(closer, cand_t, best_t)
            id_out[:] = jnp.where(closer, cid * CLUSTER + arg, id_out[:])
            onehot = (jax.lax.broadcasted_iota(
                jnp.int32, (TILE, CLUSTER), 1) == arg)
            sel_u = jnp.sum(jnp.where(onehot, uu, 0.0), axis=1,
                            keepdims=True)
            sel_v = jnp.sum(jnp.where(onehot, vv, 0.0), axis=1,
                            keepdims=True)
            u_out[:] = jnp.where(closer, sel_u, u_out[:])
            v_out[:] = jnp.where(closer, sel_v, v_out[:])
            return 0

        jax.lax.fori_loop(0, count, body, 0)


@partial(jax.jit, static_argnames=("n_clusters", "interpret"))
def pallas_trace_tiles(counts, order, rays, tris9, tvalid_f32,
                       n_clusters: int, interpret: bool = False):
    """counts: (n_tiles,) i32; order: (n_tiles, C) i32;
    rays: tuple of 8 (n_tiles*TILE, 1) f32 (ox,oy,oz,dx,dy,dz,tmin,tmax);
    tris9: (C, 9, 1, CLUSTER) f32 (v0/e1/e2 xyz components in lanes);
    tvalid_f32: (C, 1, CLUSTER) f32.
    Returns (t (f32, inf=miss), tri_id (i32, -1=miss), u, v),
    each (n_tiles*TILE,)."""
    n_tiles = counts.shape[0]
    C = n_clusters
    # order rows padded/reshaped to (8, INNER) to satisfy TPU tiling
    c_pad = -(-C // 1024) * 1024
    inner = c_pad // 8
    order = jnp.pad(order, ((0, 0), (0, c_pad - order.shape[1])))
    order = order.reshape(n_tiles, 8, inner)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] +
                 [pl.BlockSpec((TILE, 1), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM)] * 8 +
                 [pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        out_specs=[pl.BlockSpec((TILE, 1), lambda t, *_: (t, 0),
                                memory_space=pltpu.VMEM)] * 4,
        scratch_shapes=[
            pltpu.VMEM((2, 9, 1, CLUSTER), jnp.float32),
            pltpu.VMEM((2, 1, CLUSTER), jnp.float32),
            pltpu.SMEM((8, inner), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2, 2)),
        ])
    out_shapes = [
        jax.ShapeDtypeStruct((n_tiles * TILE, 1), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles * TILE, 1), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles * TILE, 1), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles * TILE, 1), jnp.float32)]
    t, tid, u, v = pl.pallas_call(
        _kernel, out_shape=out_shapes, grid_spec=grid_spec,
        interpret=interpret,
    )(counts, order, *rays, tris9, tvalid_f32)
    t = t[:, 0]
    tid = tid[:, 0]
    t = jnp.where(tid < 0, jnp.inf, t)
    return t, tid, u[:, 0], v[:, 0]
