"""Pallas TPU traversal kernel for the cluster tracer.

The XLA version of phase 2 (ops/cluster.py) is iteration-overhead-bound.
This kernel keeps the whole per-tile traversal on-chip:

  * grid = one program per ray tile (TILE rays);
  * phase 1 (dense slab culling + per-tile compacted cluster lists) stays
    in XLA inside the same jitted program — it fuses with ray prep;
  * the loop bound is each tile's OWN count (scalar-prefetched) — no
    lockstep-max waste;
  * each iteration DMAs KB clusters' triangle blocks (9 x KB*CLUSTER
    floats, double-buffered) and evaluates a dense (TILE x KB*CLUSTER)
    Möller–Trumbore block on the VPU — triangles in vector lanes, rays in
    sublanes; only (t, id) are tracked in the loop, barycentrics are
    recomputed for the single best triangle in a cheap XLA post-pass.

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
KB = 4                    # clusters per loop iteration
BK = KB * CLUSTER
BIG = 3.0e38


def _kernel(counts_ref,                       # scalar prefetch (n_tiles,)
            bits_ref,                         # (n_tiles, W) i32 HBM bitmask
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            tmin_ref, tmax_ref,               # rays (TILE, 1) VMEM
            tris_ref,                         # (C, 9, 1, CLUSTER) HBM
            t_out, id_out,                    # (TILE, 1) VMEM outputs
            tri_scr, bits_scr, order_scr, order_sem, sem):
    t = pl.program_id(0)
    count = counts_ref[t]
    steps = (count + KB - 1) // KB
    n_words = (tris_ref.shape[0] + 31) // 32
    # activity bitmask for this tile -> SMEM, then compact the active
    # cluster list with a scalar loop (replaces an expensive XLA argsort)
    bits_dma = pltpu.make_async_copy(bits_ref.at[t], bits_scr, order_sem)
    bits_dma.start()
    bits_dma.wait()

    def compact(w, cnt):
        word = bits_scr[w]

        def inner_bit(b, cnt):
            c = w * 32 + b
            bit = (word >> b) & 1

            @pl.when(bit == 1)
            def _():
                order_scr[cnt // order_scr.shape[1],
                          cnt % order_scr.shape[1]] = c
            return cnt + bit

        return jax.lax.fori_loop(0, 32, inner_bit, cnt)

    cnt = jax.lax.fori_loop(0, n_words, compact, jnp.int32(0))
    # KB pad entries so the last iteration's DMA indices are in range
    # (their results are masked off by slot_ok)
    for j in range(KB):
        order_scr[(cnt + j) // order_scr.shape[1],
                  (cnt + j) % order_scr.shape[1]] = 0

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

    inner = order_scr.shape[1]

    def get_dmas(slot, step):
        dmas = []
        for j in range(KB):
            k = step * KB + j
            cid = order_scr[k // inner, k % inner]
            dmas.append(pltpu.make_async_copy(
                tris_ref.at[cid],
                tri_scr.at[slot, :, :, pl.ds(j * CLUSTER, CLUSTER)],
                sem.at[slot, j]))
        return dmas

    @pl.when(steps > 0)
    def _():
        for dma in get_dmas(0, 0):
            dma.start()

        def body(step, _):
            slot = jax.lax.rem(step, 2)
            nxt = jax.lax.rem(step + 1, 2)

            @pl.when(step + 1 < steps)
            def _():
                for dma in get_dmas(nxt, step + 1):
                    dma.start()

            for dma in get_dmas(slot, step):
                dma.wait()

            # triangle components along lanes: (1, BK)
            v0x = tri_scr[slot, 0]
            v0y = tri_scr[slot, 1]
            v0z = tri_scr[slot, 2]
            e1x = tri_scr[slot, 3]
            e1y = tri_scr[slot, 4]
            e1z = tri_scr[slot, 5]
            e2x = tri_scr[slot, 6]
            e2y = tri_scr[slot, 7]
            e2z = tri_scr[slot, 8]

            # h = cross(d, e2): (TILE, BK)
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
            best_t = t_out[:]                       # (TILE, 1)
            # slot-validity: block j is real only when step*KB+j < count
            lane_block = jax.lax.broadcasted_iota(
                jnp.int32, (TILE, BK), 1) // CLUSTER
            slot_ok = (step * KB + lane_block) < count
            hit = (a != 0) & (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & \
                (tt >= tmin) & (tt < best_t) & slot_ok
            tt = jnp.where(hit, tt, BIG)
            cand_t = jnp.min(tt, axis=1, keepdims=True)    # (TILE, 1)
            arg = jnp.argmin(tt, axis=1)[:, None]          # (TILE, 1)
            closer = cand_t < best_t
            # global id: cluster id of the winning block * CLUSTER + local
            kwin = step * KB + arg // CLUSTER
            # gather winning cluster ids via select over the KB candidates
            cid_win = jnp.zeros((TILE, 1), jnp.int32)
            for j in range(KB):
                k = step * KB + j
                cid_j = order_scr[k // inner, k % inner]
                cid_win = jnp.where(arg // CLUSTER == j, cid_j, cid_win)
            t_out[:] = jnp.where(closer, cand_t, best_t)
            id_out[:] = jnp.where(closer,
                                  cid_win * CLUSTER + arg % CLUSTER,
                                  id_out[:])
            return 0

        jax.lax.fori_loop(0, steps, body, 0)


@partial(jax.jit, static_argnames=("n_clusters", "interpret"))
def pallas_trace_tiles(counts, order, rays, tris9, tvalid_f32,
                       n_clusters: int, interpret: bool = False):
    """counts: (n_tiles,) i32; order: (n_tiles, C) bool ACTIVITY mask
    (compacted into a cluster list inside the kernel);
    rays: tuple of 8 (n_tiles*TILE, 1) f32 (ox,oy,oz,dx,dy,dz,tmin,tmax);
    tris9: (C, 9, 1, CLUSTER) f32 (v0/e1/e2 xyz components in lanes).
    tvalid_f32 is unused here (invalid padding triangles are degenerate,
    det == 0, and never hit).
    Returns (t (f32, inf=miss), tri_id (i32, -1=miss)), (n_tiles*TILE,)."""
    n_tiles = counts.shape[0]
    C = n_clusters
    # pack the activity mask into 32-bit words (vector ops, no sort);
    # word dim padded to 128 so the HBM->SMEM DMA slice is lane-aligned
    n_words = -(-C // 32)
    w_pad = 128 * -(-n_words // 128)
    active = jnp.pad(order.astype(jnp.int32),
                     ((0, 0), (0, w_pad * 32 - C)))
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    bits = jnp.sum(active.reshape(n_tiles, w_pad, 32).astype(jnp.uint32) *
                   weights[None, None, :], axis=2).astype(jnp.int32)
    c_pad = -(-(C + KB) // 1024) * 1024
    inner = c_pad // 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] +
                 [pl.BlockSpec((TILE, 1), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM)] * 8 +
                 [pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[pl.BlockSpec((TILE, 1), lambda t, *_: (t, 0),
                                memory_space=pltpu.VMEM)] * 2,
        scratch_shapes=[
            pltpu.VMEM((2, 9, 1, BK), jnp.float32),
            pltpu.SMEM((w_pad,), jnp.int32),
            pltpu.SMEM((8, inner), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2, KB)),
        ])
    out_shapes = [
        jax.ShapeDtypeStruct((n_tiles * TILE, 1), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles * TILE, 1), jnp.int32)]
    t, tid = pl.pallas_call(
        _kernel, out_shape=out_shapes, grid_spec=grid_spec,
        interpret=interpret,
    )(counts, bits, *rays, tris9)
    t = t[:, 0]
    tid = tid[:, 0]
    t = jnp.where(tid < 0, jnp.inf, t)
    return t, tid
