"""Pallas TPU traversal kernel for the cluster tracer.

Phase 2 of the cluster tracer (ops/cluster.py) as one on-chip kernel:

  * ray tiles are TILE=32 rays. Culling quality scales inversely with
    tile size (a tile traverses the UNION of its rays' active cluster
    sets); measured on test.glb bounce waves, 32-ray tiles do ~2.8x less
    ray-triangle work than 128-ray tiles (mean active clusters 47 vs
    131 of 636) while keeping the VPU's 8-sublane blocks full;
  * grid = one program per GROUP of G=32 ray tiles; the per-tile sorted
    key rows stream through a 4-slot SMEM ring, prefetched 3 tiles
    ahead (each tile waits for the NEXT tile's row so every DMA is
    waited exactly once, then issues the row 3 ahead);
  * phase 1 (dense slab culling) runs in XLA inside the same jitted
    program and produces, per tile, ONE sorted i32 key row: each key is
    (slab-entry-t bits & ~idmask) | cluster_id — a single `jnp.sort`
    gives the active-cluster list in FRONT-TO-BACK order and the entry
    distances at once (truncating the mantissa keeps the key a lower
    bound of the true entry t, so the early exit below stays safe);
  * the kernel walks the list with a `while_loop`: each step DMAs KB
    clusters' triangle blocks (9 x KB*CLUSTER floats, double-buffered)
    and evaluates a dense (TILE x KB*CLUSTER) Möller–Trumbore block on
    the VPU — triangles in vector lanes, rays in sublanes;
  * EARLY EXIT: because the list is sorted by entry distance, the tile
    stops as soon as every ray's current best t (or its t_max) is <= the
    next cluster's entry-distance lower bound — no remaining cluster can
    produce a closer hit (reference analogue: hardware BVH traversal's
    ordered descent, src/acceleration_structure.hh); comparisons happen
    on raw IEEE-754 bits (order-preserving for the non-negative t values
    here) because Mosaic has no scalar bitcast;
  * any-hit (shadow) mode additionally stops once every ray has an
    OPAQUE hit (per-cluster opacity flag, a global SMEM table DMA'd once
    at grid step 0; scratch persists across the sequential grid).
    Alpha-capable hits still resolve closest-first so the alpha re-trace
    rounds in ops/trace_utils.py stay correct.

Only (t, id) are tracked in the loop; barycentrics are recomputed for
the single best triangle in a cheap XLA post-pass.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

TILE = int(_os.environ.get("TAURAY_PTILE", "32"))
# must match ops/cluster.CLUSTER (tris per cluster): the kernels' block
# shapes and id arithmetic are derived from it
CLUSTER = int(_os.environ.get("TAURAY_CLUSTER", "128"))
KB = int(_os.environ.get("TAURAY_PKB", "8"))  # clusters per loop iteration
BK = KB * CLUSTER
G = int(_os.environ.get("TAURAY_PG", "32"))   # ray tiles per grid step
NM = 4                    # meta ring slots
BIG = 3.0e38


def _kernel(counts_ref,             # scalar prefetch (n_tiles,)
            meta_ref,               # (n_tiles*cpad,) i32 HBM sorted keys
            o_ref,                  # (G, TILE, 3) VMEM block origins
            d_ref,                  # (G, TILE, 3) VMEM block directions
            mm_ref,                 # (G, TILE, 2) VMEM block [tmin, tmax]
            tris_ref,               # (C, 9, 1, CLUSTER) HBM
            opq_ref,                # (opad,) i32 HBM global cluster opacity
            out_ref,                # (G, TILE, 2) VMEM block [t, id bits]
            tri_scr, meta_scr, opq_scr, meta_sem, opq_sem, sem,
            *, n_clusters: int, cpad: int, idmask: int, any_hit: bool):
    b = pl.program_id(0)
    n_tiles = pl.num_programs(0) * G

    def meta_dma(gt):
        slot = jax.lax.rem(gt, NM)
        return pltpu.make_async_copy(
            meta_ref.at[pl.ds(gt * cpad, cpad)],
            meta_scr.at[pl.ds(slot * cpad, cpad)], meta_sem.at[slot])

    # the global opacity table is fetched once; SMEM scratch persists
    # across the sequential grid (grid iterations run sequentially on
    # the core)
    if any_hit:
        @pl.when(b == 0)
        def _():
            cp = pltpu.make_async_copy(opq_ref, opq_scr, opq_sem)
            cp.start()
            cp.wait()

    # prime the meta ring: rows 0..NM-2, wait row 0
    @pl.when(b == 0)
    def _():
        for gt0 in range(NM - 1):
            meta_dma(gt0).start()
        meta_dma(0).wait()

    def process_tile(g, _):
        gt = b * G + g
        # keep the ring NM-1 ahead; tile gt waits gt+1's row so each DMA
        # is waited exactly once (row 0 is waited in the b==0 priming)
        @pl.when(gt + NM - 1 < n_tiles)
        def _():
            meta_dma(gt + NM - 1).start()

        @pl.when(gt + 1 < n_tiles)
        def _():
            meta_dma(gt + 1).wait()

        base = jax.lax.rem(gt, NM) * cpad
        count = counts_ref[gt]
        steps = (count + KB - 1) // KB

        def key_at(k):
            return meta_scr[base + jnp.minimum(k, cpad - 1)]

        def order_at(k):
            return jnp.minimum(key_at(k) & idmask, n_clusters - 1)

        ox = o_ref[g, :, 0:1]
        oy = o_ref[g, :, 1:2]
        oz = o_ref[g, :, 2:3]
        dx = d_ref[g, :, 0:1]
        dy = d_ref[g, :, 1:2]
        dz = d_ref[g, :, 2:3]
        tmin = mm_ref[g, :, 0:1]
        tmax = mm_ref[g, :, 1:2]

        def get_dmas(buf, step):
            return [pltpu.make_async_copy(
                tris_ref.at[order_at(step * KB + j)],
                tri_scr.at[buf, :, :, pl.ds(j * CLUSTER, CLUSTER)],
                sem.at[buf, j]) for j in range(KB)]

        init_t = jnp.minimum(tmax, BIG)
        init_id = jnp.full((TILE, 1), -1, jnp.int32)
        init_opq = jnp.zeros((TILE, 1), jnp.int32)

        def cond(c):
            step, done = c[0], c[1]
            return (step < steps) & ~done

        def body(c):
            step, _, best_t, best_id, best_opq = c
            buf = jax.lax.rem(step, 2)

            # prefetch before compute so the DMA overlaps the MT block;
            # an over-prefetched batch is drained after the loop
            @pl.when(step + 1 < steps)
            def _():
                for dma in get_dmas(jax.lax.rem(step + 1, 2), step + 1):
                    dma.start()
            for dma in get_dmas(buf, step):
                dma.wait()

            # triangle components along lanes: (1, BK)
            v0x = tri_scr[buf, 0]
            v0y = tri_scr[buf, 1]
            v0z = tri_scr[buf, 2]
            e1x = tri_scr[buf, 3]
            e1y = tri_scr[buf, 4]
            e1z = tri_scr[buf, 5]
            e2x = tri_scr[buf, 6]
            e2y = tri_scr[buf, 7]
            e2z = tri_scr[buf, 8]

            # Möller–Trumbore, h = cross(d, e2): (TILE, BK)
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
            # global id: winning block's cluster id * CLUSTER + local
            cid_win = jnp.zeros((TILE, 1), jnp.int32)
            for j in range(KB):
                cid_win = jnp.where(arg // CLUSTER == j,
                                    order_at(step * KB + j), cid_win)
            if any_hit:
                opq_win = jnp.zeros((TILE, 1), jnp.int32)
                for j in range(KB):
                    opq_win = jnp.where(arg // CLUSTER == j,
                                        opq_scr[order_at(step * KB + j)],
                                        opq_win)
                best_opq = jnp.where(closer, opq_win, best_opq)
            best_t = jnp.where(closer, cand_t, best_t)
            best_id = jnp.where(closer, cid_win * CLUSTER + arg % CLUSTER,
                                best_id)

            # early exit on the front-to-back order (bit-space compare)
            next_tn_bits = key_at((step + 1) * KB) & ~idmask
            t_bits = jax.lax.bitcast_convert_type(best_t, jnp.int32)
            ray_done = t_bits <= next_tn_bits
            if any_hit:
                ray_done = ray_done | ((best_id >= 0) & (best_opq > 0))
            done = jnp.all(ray_done)
            return (step + 1, done, best_t, best_id, best_opq)

        @pl.when(steps > 0)
        def _():
            for dma in get_dmas(0, 0):
                dma.start()

        fs, fd, bt, bi, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), steps <= 0, init_t, init_id, init_opq))

        # drain the over-prefetched batch on early exit so no DMA
        # semaphore leaks into later tiles
        @pl.when(fd & (fs < steps) & (steps > 0))
        def _():
            for dma in get_dmas(jax.lax.rem(fs, 2), fs):
                dma.wait()

        out_ref[g, :, 0:1] = bt
        out_ref[g, :, 1:2] = jax.lax.bitcast_convert_type(bi, jnp.float32)
        return 0

    jax.lax.fori_loop(0, G, process_tile, 0)


@partial(jax.jit,
         static_argnames=("n_clusters", "cpad", "idmask", "any_hit",
                          "interpret"))
def pallas_trace_tiles(counts, keys, o3, d3, mm2, tris9, opaque,
                       n_clusters: int, cpad: int, idmask: int,
                       any_hit: bool = False, interpret: bool = False):
    """counts: (n_tiles,) i32 active-cluster counts; keys:
    (n_tiles, cpad) i32 sorted phase-1 keys ((tnear bits & ~idmask) | id);
    o3/d3: (n_tiles, TILE, 3) f32 origins/directions; mm2:
    (n_tiles, TILE, 2) f32 [tmin, tmax];
    tris9: (C, 9, 1, CLUSTER) f32 (v0/e1/e2 components in lanes);
    opaque: (opad,) i32 per-cluster opacity, opad a multiple of 1024.
    Returns (t (f32, inf=miss), tri_id (i32, -1=miss)), (n_tiles*TILE,)."""
    n_tiles = counts.shape[0]
    assert n_tiles % G == 0
    keys = keys.reshape(-1)
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
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec((G, TILE, 2), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 9, 1, BK), jnp.float32),
            pltpu.SMEM((NM * cpad,), jnp.int32),
            pltpu.SMEM((opaque.shape[0],), jnp.int32),
            pltpu.SemaphoreType.DMA((NM,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2, KB)),
        ])
    out_shape = jax.ShapeDtypeStruct((n_tiles, TILE, 2), jnp.float32)
    out = pl.pallas_call(
        partial(_kernel, n_clusters=n_clusters, cpad=cpad, idmask=idmask,
                any_hit=any_hit),
        out_shape=out_shape, grid_spec=grid_spec,
        interpret=interpret,
    )(counts, keys, o3, d3, mm2, tris9, opaque)
    t = out[:, :, 0].reshape(-1)
    tid = jax.lax.bitcast_convert_type(out[:, :, 1], jnp.int32).reshape(-1)
    t = jnp.where(tid < 0, jnp.inf, t)
    return t, tid


# ---------------------------------------------------------------------------
# Instanced variant: per-cluster-instance ray transforms (the TLAS path)
# ---------------------------------------------------------------------------

def _kernel_inst(counts_ref, kcl_ref, kin_ref, inv_ref,   # scalar prefetch
                 meta_ref, o_ref, d_ref, mm_ref, tris_ref, opq_ref,
                 out_ref,
                 tri_scr, ray_scr, meta_scr, opq_scr, meta_sem, opq_sem,
                 sem,
                 *, n_clusters: int, cpad: int, idmask: int, any_hit: bool):
    """The traversal kernel with object-space shared geometry: each key
    id is a CLUSTER-INSTANCE k; the DMA source is kcl[k]'s object block
    and the tile's rays are transformed into kin[k]'s instance space per
    128-lane block (direction unnormalized => t stays world-space).
    Reference: TLAS instance transform + shared BLAS
    (src/acceleration_structure.hh:90-112)."""
    b = pl.program_id(0)
    n_tiles = pl.num_programs(0) * G

    def meta_dma(gt):
        slot = jax.lax.rem(gt, NM)
        return pltpu.make_async_copy(
            meta_ref.at[pl.ds(gt * cpad, cpad)],
            meta_scr.at[pl.ds(slot * cpad, cpad)], meta_sem.at[slot])

    if any_hit:
        @pl.when(b == 0)
        def _():
            cp = pltpu.make_async_copy(opq_ref, opq_scr, opq_sem)
            cp.start()
            cp.wait()

    @pl.when(b == 0)
    def _():
        for gt0 in range(NM - 1):
            meta_dma(gt0).start()
        meta_dma(0).wait()

    def process_tile(g, _):
        gt = b * G + g

        @pl.when(gt + NM - 1 < n_tiles)
        def _():
            meta_dma(gt + NM - 1).start()

        @pl.when(gt + 1 < n_tiles)
        def _():
            meta_dma(gt + 1).wait()

        base = jax.lax.rem(gt, NM) * cpad
        count = counts_ref[gt]
        steps = (count + KB - 1) // KB

        def key_at(k):
            return meta_scr[base + jnp.minimum(k, cpad - 1)]

        def order_at(k):
            return jnp.minimum(key_at(k) & idmask, n_clusters - 1)

        ox = o_ref[g, :, 0:1]
        oy = o_ref[g, :, 1:2]
        oz = o_ref[g, :, 2:3]
        dx = d_ref[g, :, 0:1]
        dy = d_ref[g, :, 1:2]
        dz = d_ref[g, :, 2:3]
        tmin = mm_ref[g, :, 0:1]
        tmax = mm_ref[g, :, 1:2]

        def get_dmas(buf, step):
            return [pltpu.make_async_copy(
                tris_ref.at[kcl_ref[order_at(step * KB + j)]],
                tri_scr.at[buf, :, :, pl.ds(j * CLUSTER, CLUSTER)],
                sem.at[buf, j]) for j in range(KB)]

        init_t = jnp.minimum(tmax, BIG)
        init_id = jnp.full((TILE, 1), -1, jnp.int32)
        init_opq = jnp.zeros((TILE, 1), jnp.int32)

        def cond(c):
            step, done = c[0], c[1]
            return (step < steps) & ~done

        def body(c):
            step, _, best_t, best_id, best_opq = c
            buf = jax.lax.rem(step, 2)

            @pl.when(step + 1 < steps)
            def _():
                for dma in get_dmas(jax.lax.rem(step + 1, 2), step + 1):
                    dma.start()
            for dma in get_dmas(buf, step):
                dma.wait()

            # per-block instance-space rays: 12 scalar reads per block;
            # each block's transformed (TILE, 1) components broadcast
            # into that block's 128-lane slot of a VMEM staging buffer
            # (pltpu.repeat tiles rather than element-repeats, so the
            # lane expansion is done with strided stores instead)
            for j in range(KB):
                ij = kin_ref[order_at(step * KB + j)]
                iv = [inv_ref[ij * 12 + m] for m in range(12)]
                for r in range(3):
                    ov = (iv[r * 4 + 0] * ox + iv[r * 4 + 1] * oy +
                          iv[r * 4 + 2] * oz + iv[r * 4 + 3])
                    dv = (iv[r * 4 + 0] * dx + iv[r * 4 + 1] * dy +
                          iv[r * 4 + 2] * dz)
                    ray_scr[r, :, pl.ds(j * CLUSTER, CLUSTER)] = \
                        jnp.broadcast_to(ov, (TILE, CLUSTER))
                    ray_scr[3 + r, :, pl.ds(j * CLUSTER, CLUSTER)] = \
                        jnp.broadcast_to(dv, (TILE, CLUSTER))
            tox = ray_scr[0]
            toy = ray_scr[1]
            toz = ray_scr[2]
            tdx = ray_scr[3]
            tdy = ray_scr[4]
            tdz = ray_scr[5]

            v0x = tri_scr[buf, 0]
            v0y = tri_scr[buf, 1]
            v0z = tri_scr[buf, 2]
            e1x = tri_scr[buf, 3]
            e1y = tri_scr[buf, 4]
            e1z = tri_scr[buf, 5]
            e2x = tri_scr[buf, 6]
            e2y = tri_scr[buf, 7]
            e2z = tri_scr[buf, 8]

            hx = tdy * e2z - tdz * e2y
            hy = tdz * e2x - tdx * e2z
            hz = tdx * e2y - tdy * e2x
            a = e1x * hx + e1y * hy + e1z * hz
            f = jnp.where(a != 0, 1.0 / jnp.where(a == 0, 1.0, a), 0.0)
            sx = tox - v0x
            sy = toy - v0y
            sz = toz - v0z
            uu = f * (sx * hx + sy * hy + sz * hz)
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            vv = f * (tdx * qx + tdy * qy + tdz * qz)
            tt = f * (e2x * qx + e2y * qy + e2z * qz)
            lane_block = jax.lax.broadcasted_iota(
                jnp.int32, (TILE, BK), 1) // CLUSTER
            slot_ok = (step * KB + lane_block) < count
            hit = (a != 0) & (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & \
                (tt >= tmin) & (tt < best_t) & slot_ok
            tt = jnp.where(hit, tt, BIG)
            cand_t = jnp.min(tt, axis=1, keepdims=True)
            arg = jnp.argmin(tt, axis=1)[:, None]
            closer = cand_t < best_t
            cid_win = jnp.zeros((TILE, 1), jnp.int32)
            for j in range(KB):
                cid_win = jnp.where(arg // CLUSTER == j,
                                    order_at(step * KB + j), cid_win)
            if any_hit:
                opq_win = jnp.zeros((TILE, 1), jnp.int32)
                for j in range(KB):
                    opq_win = jnp.where(arg // CLUSTER == j,
                                        opq_scr[order_at(step * KB + j)],
                                        opq_win)
                best_opq = jnp.where(closer, opq_win, best_opq)
            best_t = jnp.where(closer, cand_t, best_t)
            best_id = jnp.where(closer, cid_win * CLUSTER + arg % CLUSTER,
                                best_id)

            next_tn_bits = key_at((step + 1) * KB) & ~idmask
            t_bits = jax.lax.bitcast_convert_type(best_t, jnp.int32)
            ray_done = t_bits <= next_tn_bits
            if any_hit:
                ray_done = ray_done | ((best_id >= 0) & (best_opq > 0))
            done = jnp.all(ray_done)
            return (step + 1, done, best_t, best_id, best_opq)

        @pl.when(steps > 0)
        def _():
            for dma in get_dmas(0, 0):
                dma.start()

        fs, fd, bt, bi, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), steps <= 0, init_t, init_id, init_opq))

        @pl.when(fd & (fs < steps) & (steps > 0))
        def _():
            for dma in get_dmas(jax.lax.rem(fs, 2), fs):
                dma.wait()

        out_ref[g, :, 0:1] = bt
        out_ref[g, :, 1:2] = jax.lax.bitcast_convert_type(bi, jnp.float32)
        return 0

    jax.lax.fori_loop(0, G, process_tile, 0)


@partial(jax.jit,
         static_argnames=("n_clusters", "cpad", "idmask", "any_hit",
                          "interpret"))
def pallas_trace_tiles_inst(counts, keys, o3, d3, mm2, tris9, opaque,
                            k_cluster, k_inst, inv12,
                            n_clusters: int, cpad: int, idmask: int,
                            any_hit: bool = False,
                            interpret: bool = False):
    """Instanced variant of pallas_trace_tiles: keys index
    cluster-INSTANCES; k_cluster/k_inst/inv12 ride as scalar-prefetch
    (SMEM) tables. Returns (t world-space, slot id)."""
    n_tiles = counts.shape[0]
    assert n_tiles % G == 0
    keys = keys.reshape(-1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles // G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                  pl.BlockSpec((G, TILE, 3), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((G, TILE, 3), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((G, TILE, 2), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec((G, TILE, 2), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 9, 1, BK), jnp.float32),
            pltpu.VMEM((6, TILE, BK), jnp.float32),
            pltpu.SMEM((NM * cpad,), jnp.int32),
            pltpu.SMEM((opaque.shape[0],), jnp.int32),
            pltpu.SemaphoreType.DMA((NM,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2, KB)),
        ])
    out_shape = jax.ShapeDtypeStruct((n_tiles, TILE, 2), jnp.float32)
    out = pl.pallas_call(
        partial(_kernel_inst, n_clusters=n_clusters, cpad=cpad,
                idmask=idmask, any_hit=any_hit),
        out_shape=out_shape, grid_spec=grid_spec,
        interpret=interpret,
    )(counts, k_cluster, k_inst, inv12, keys, o3, d3, mm2, tris9, opaque)
    t = out[:, :, 0].reshape(-1)
    tid = jax.lax.bitcast_convert_type(out[:, :, 1], jnp.int32).reshape(-1)
    t = jnp.where(tid < 0, jnp.inf, t)
    return t, tid


# ---------------------------------------------------------------------------
# VMEM-resident variant: the whole triangle table lives in VMEM
# ---------------------------------------------------------------------------

KBV = int(_os.environ.get("TAURAY_PKBV", "8"))   # clusters per step (vmem)
# (swept on TPU: TILE=32/KBV=8 beats 16/32-cluster steps and 8/16-ray
# tiles on camera, incoherent and shadow waves — scripts/trace_sweep.py)
BKV = KBV * CLUSTER
# VMEM budget for the resident triangle table: the Baldwin-Weber table
# is C * 12 * 128 * 4 B = 6 KB/cluster; rays/out/meta scratch need ~1 MB
# of the ~16 MB core VMEM.
VM_BUDGET_MB = float(_os.environ.get("TAURAY_PVMEM_MB", "13.5"))

# per-kernel scoped-VMEM limit: the resident table is ~VM_BUDGET_MB and
# the default 16 MB scoped limit occasionally trips on fusion-dependent
# block-buffer padding (observed: "16.40M vs 16.00M limit"); grant the
# kernels explicit headroom instead
_VM_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=int((VM_BUDGET_MB + 4.0) * 1e6))


def vm_fits(n_clusters: int) -> bool:
    """True when a scene's packed triangle table fits the VMEM-resident
    kernel's budget (Sponza-class 2116 clusters = 13 MB fits v5e's
    ~16 MB alongside the ray blocks)."""
    return n_clusters * 12 * CLUSTER * 4 <= VM_BUDGET_MB * 1e6


def _kernel_vm(counts_ref,            # scalar prefetch (n_tiles,)
               meta_ref,              # (n_tiles*cpad,) i32 HBM sorted keys
               o_ref, d_ref, mm_ref,  # (G, TILE, {3,3,2}) VMEM blocks
               tris_ref,              # (C, 9, 1, CLUSTER) VMEM — RESIDENT
               opq_ref,               # (opad,) i32 HBM cluster opacity
               out_ref,               # (G, TILE, 2) VMEM block
               meta_scr, opq_scr, meta_sem, opq_sem,
               *, n_clusters: int, cpad: int, idmask: int, any_hit: bool,
               debug_steps: bool = False):
    """Traversal with the WHOLE cluster table VMEM-resident: scenes up
    to ~10 MB of packed triangles (262k tris) skip the per-step DMA
    machinery entirely — no double buffering, no tri semaphores, and
    dynamic first-dim indexing of the resident table replaces each
    cluster fetch (measured +10%% at TILE=32 KB=8, and it makes KB=16
    profitable: scripts/kernel_lab3.py / kernel_lab4.py)."""
    b = pl.program_id(0)
    n_tiles = pl.num_programs(0) * G

    def meta_dma(gt):
        slot = jax.lax.rem(gt, NM)
        return pltpu.make_async_copy(
            meta_ref.at[pl.ds(gt * cpad, cpad)],
            meta_scr.at[pl.ds(slot * cpad, cpad)], meta_sem.at[slot])

    if any_hit:
        @pl.when(b == 0)
        def _():
            cp = pltpu.make_async_copy(opq_ref, opq_scr, opq_sem)
            cp.start()
            cp.wait()

    @pl.when(b == 0)
    def _():
        for gt0 in range(NM - 1):
            meta_dma(gt0).start()
        meta_dma(0).wait()

    def process_tile(g, _):
        gt = b * G + g

        @pl.when(gt + NM - 1 < n_tiles)
        def _():
            meta_dma(gt + NM - 1).start()

        @pl.when(gt + 1 < n_tiles)
        def _():
            meta_dma(gt + 1).wait()

        base = jax.lax.rem(gt, NM) * cpad
        count = counts_ref[gt]
        steps = (count + KBV - 1) // KBV

        def key_at(k):
            return meta_scr[base + jnp.minimum(k, cpad - 1)]

        def order_at(k):
            return jnp.minimum(key_at(k) & idmask, n_clusters - 1)

        ox = o_ref[g, :, 0:1]
        oy = o_ref[g, :, 1:2]
        oz = o_ref[g, :, 2:3]
        dx = d_ref[g, :, 0:1]
        dy = d_ref[g, :, 1:2]
        dz = d_ref[g, :, 2:3]
        tmin = mm_ref[g, :, 0:1]
        tmax = mm_ref[g, :, 1:2]

        init_t = jnp.minimum(tmax, BIG)
        init_id = jnp.full((TILE, 1), -1, jnp.int32)
        init_opq = jnp.zeros((TILE, 1), jnp.int32)

        def cond(c):
            step, done = c[0], c[1]
            return (step < steps) & ~done

        def body(c):
            step, _, best_t, best_id, best_opq = c
            orders = [order_at(step * KBV + j) for j in range(KBV)]
            ts = [tris_ref[o] for o in orders]
            tri = jnp.concatenate(ts, axis=-1) if KBV > 1 else ts[0]

            # Baldwin-Weber precomputed-transform intersection (rows
            # built in cluster.with_pallas_layout): ~27 VPU ops/test vs
            # Möller-Trumbore's ~40 (43 -> 54 G tests/s,
            # scripts/kernel_lab5.py)
            nx = tri[0]
            ny = tri[1]
            nz = tri[2]
            ndot = tri[3]
            r1x = tri[4]
            r1y = tri[5]
            r1z = tri[6]
            r1d = tri[7]
            r2x = tri[8]
            r2y = tri[9]
            r2z = tri[10]
            r2d = tri[11]

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
            lane_block = jax.lax.broadcasted_iota(
                jnp.int32, (TILE, BKV), 1) // CLUSTER
            slot_ok = (step * KBV + lane_block) < count
            hit = (den != 0) & (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & \
                (tt >= tmin) & (tt < best_t) & slot_ok
            tt = jnp.where(hit, tt, BIG)
            cand_t = jnp.min(tt, axis=1, keepdims=True)
            arg = jnp.argmin(tt, axis=1)[:, None]
            closer = cand_t < best_t
            # winner cluster id via per-block select chain, reusing the
            # step's `orders` scalars. The chain costs ~5% of kernel
            # time (kernel_lab4.py slot-vs-cid) — cheaper than the
            # alternative slot->id map in XLA, whose 1M-element gather
            # from the sorted-key table costs 17.5 ms/wave of pure HBM
            # latency.
            cid_win = jnp.zeros((TILE, 1), jnp.int32)
            for j in range(KBV):
                blk = arg // CLUSTER == j
                cid_win = jnp.where(blk, orders[j], cid_win)
            if any_hit:
                # any-hit also needs the winner's opacity IN-kernel
                # (early exit once every ray has an opaque hit)
                opq_win = jnp.zeros((TILE, 1), jnp.int32)
                for j in range(KBV):
                    opq_win = jnp.where(arg // CLUSTER == j,
                                        opq_scr[orders[j]], opq_win)
                best_opq = jnp.where(closer, opq_win, best_opq)
            win_id = cid_win * CLUSTER + arg % CLUSTER
            best_t = jnp.where(closer, cand_t, best_t)
            best_id = jnp.where(closer, win_id, best_id)

            next_tn_bits = key_at((step + 1) * KBV) & ~idmask
            t_bits = jax.lax.bitcast_convert_type(best_t, jnp.int32)
            ray_done = t_bits <= next_tn_bits
            if any_hit:
                ray_done = ray_done | ((best_id >= 0) & (best_opq > 0))
            done = jnp.all(ray_done)
            return (step + 1, done, best_t, best_id, best_opq)

        fs, _, bt, bi, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), steps <= 0, init_t, init_id, init_opq))

        if debug_steps:
            # diagnostic: (visited steps, active count) per tile
            out_ref[g, :, 0:1] = jnp.full((TILE, 1),
                                          fs.astype(jnp.float32))
            out_ref[g, :, 1:2] = jnp.full((TILE, 1),
                                          count.astype(jnp.float32))
        else:
            out_ref[g, :, 0:1] = bt
            out_ref[g, :, 1:2] = jax.lax.bitcast_convert_type(
                bi, jnp.float32)
        return 0

    jax.lax.fori_loop(0, G, process_tile, 0)


# ---------------------------------------------------------------------------
# v2 VMEM-resident kernel: grid-batched meta heads (the round-4 fixed-cost
# fix). The v1 kernel DMAs a 4 KB sorted-key row into SMEM PER TILE, which
# measures as ~1.2 us/tile of pure overhead (40 ms/wave at zero steps —
# scripts/kernel_lab6.py). v2 instead ships the first KC=128 keys of all G
# tiles of a grid step as ONE (G, KC) 16 KB DMA, double-buffered across
# grid steps, and falls back to the tile's full row only when its active
# count overflows KC (rare: signature-sorted waves have p95 unions < 16,
# scripts/sortsig_lab.py).
# ---------------------------------------------------------------------------

KC = 128   # per-tile key head length (i32 lanes, one HBM tile row)


def _kernel_vm2(counts_ref,            # scalar prefetch (n_tiles,)
                heads_ref,             # (n_tiles, KC) i32 HBM key heads
                full_ref,              # (n_tiles*cpad,) i32 HBM full rows
                o_ref, d_ref, mm_ref,  # (G, TILE, {3,3,2}) VMEM blocks
                tris_ref,              # (C, 12, 1, CLUSTER) VMEM resident
                opq_ref,               # (opad,) i32 HBM cluster opacity
                out_ref,               # (G, TILE, 2) VMEM block
                head_scr, ovf_scr, opq_scr, head_sem, ovf_sem, opq_sem,
                *, n_clusters: int, cpad: int, idmask: int, any_hit: bool,
                kbv: int, debug_steps: bool = False):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    bkv = kbv * CLUSTER

    def head_dma(bb):
        return pltpu.make_async_copy(
            heads_ref.at[pl.ds(bb * G, G), :],
            head_scr.at[jax.lax.rem(bb, 2)], head_sem.at[jax.lax.rem(bb, 2)])

    if any_hit:
        @pl.when(b == 0)
        def _():
            cp = pltpu.make_async_copy(opq_ref, opq_scr, opq_sem)
            cp.start()
            cp.wait()

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
        steps = (count + kbv - 1) // kbv
        # key reads go up to (steps+? ) * kbv <= count + kbv - 1; beyond
        # KC-1 the head is stale — fetch the tile's full sorted row
        use_ovf = count + kbv > KC

        @pl.when(use_ovf)
        def _():
            cp = pltpu.make_async_copy(
                full_ref.at[pl.ds((b * G + g) * cpad, cpad)],
                ovf_scr, ovf_sem)
            cp.start()
            cp.wait()

        def key_at(k):
            kk = jnp.minimum(k, cpad - 1)
            h = head_scr[slot, g, jnp.minimum(kk, KC - 1)]
            f = ovf_scr[kk]
            return jnp.where(use_ovf, f, h)

        def order_at(k):
            return jnp.minimum(key_at(k) & idmask, n_clusters - 1)

        ox = o_ref[g, :, 0:1]
        oy = o_ref[g, :, 1:2]
        oz = o_ref[g, :, 2:3]
        dx = d_ref[g, :, 0:1]
        dy = d_ref[g, :, 1:2]
        dz = d_ref[g, :, 2:3]
        tmin = mm_ref[g, :, 0:1]
        tmax = mm_ref[g, :, 1:2]

        init_t = jnp.minimum(tmax, BIG)
        init_id = jnp.full((TILE, 1), -1, jnp.int32)
        init_opq = jnp.zeros((TILE, 1), jnp.int32)

        def cond(c):
            step, done = c[0], c[1]
            return (step < steps) & ~done

        def body(c):
            step, _, best_t, best_id, best_opq = c
            orders = [order_at(step * kbv + j) for j in range(kbv)]
            ts = [tris_ref[o] for o in orders]
            tri = jnp.concatenate(ts, axis=-1) if kbv > 1 else ts[0]

            nx = tri[0]
            ny = tri[1]
            nz = tri[2]
            ndot = tri[3]
            r1x = tri[4]
            r1y = tri[5]
            r1z = tri[6]
            r1d = tri[7]
            r2x = tri[8]
            r2y = tri[9]
            r2z = tri[10]
            r2d = tri[11]

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
            lane_block = jax.lax.broadcasted_iota(
                jnp.int32, (TILE, bkv), 1) // CLUSTER
            slot_ok = (step * kbv + lane_block) < count
            hit = (den != 0) & (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & \
                (tt >= tmin) & (tt < best_t) & slot_ok
            tt = jnp.where(hit, tt, BIG)
            cand_t = jnp.min(tt, axis=1, keepdims=True)
            arg = jnp.argmin(tt, axis=1)[:, None]
            closer = cand_t < best_t
            cid_win = jnp.zeros((TILE, 1), jnp.int32)
            for j in range(kbv):
                blk = arg // CLUSTER == j
                cid_win = jnp.where(blk, orders[j], cid_win)
            if any_hit:
                opq_win = jnp.zeros((TILE, 1), jnp.int32)
                for j in range(kbv):
                    opq_win = jnp.where(arg // CLUSTER == j,
                                        opq_scr[orders[j]], opq_win)
                best_opq = jnp.where(closer, opq_win, best_opq)
            win_id = cid_win * CLUSTER + arg % CLUSTER
            best_t = jnp.where(closer, cand_t, best_t)
            best_id = jnp.where(closer, win_id, best_id)

            next_tn_bits = key_at((step + 1) * kbv) & ~idmask
            t_bits = jax.lax.bitcast_convert_type(best_t, jnp.int32)
            ray_done = t_bits <= next_tn_bits
            if any_hit:
                ray_done = ray_done | ((best_id >= 0) & (best_opq > 0))
            done = jnp.all(ray_done)
            return (step + 1, done, best_t, best_id, best_opq)

        fs, _, bt, bi, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), steps <= 0, init_t, init_id, init_opq))

        if debug_steps:
            out_ref[g, :, 0:1] = jnp.full((TILE, 1),
                                          fs.astype(jnp.float32))
            out_ref[g, :, 1:2] = jnp.full((TILE, 1),
                                          count.astype(jnp.float32))
        else:
            out_ref[g, :, 0:1] = bt
            out_ref[g, :, 1:2] = jax.lax.bitcast_convert_type(
                bi, jnp.float32)
        return 0

    jax.lax.fori_loop(0, G, process_tile, 0)


@partial(jax.jit,
         static_argnames=("n_clusters", "cpad", "idmask", "any_hit",
                          "kbv", "interpret", "debug_steps"))
def pallas_trace_tiles_vm2(counts, keys, o3, d3, mm2, tris12, opaque,
                           n_clusters: int, cpad: int, idmask: int,
                           any_hit: bool = False, kbv: int = KBV,
                           interpret: bool = False,
                           debug_steps: bool = False):
    """v2 of pallas_trace_tiles_vm (same contract): grid-batched KC-key
    meta heads + overflow fallback; kbv (clusters per step) is a static
    knob."""
    n_tiles = counts.shape[0]
    assert n_tiles % G == 0
    heads = keys[:, :KC]
    flat = keys.reshape(-1)
    C = tris12.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
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
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec((G, TILE, 2), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((2, G, KC), jnp.int32),
            pltpu.SMEM((cpad,), jnp.int32),
            pltpu.SMEM((opaque.shape[0],), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ])
    out_shape = jax.ShapeDtypeStruct((n_tiles, TILE, 2), jnp.float32)
    out = pl.pallas_call(
        partial(_kernel_vm2, n_clusters=n_clusters, cpad=cpad,
                idmask=idmask, any_hit=any_hit, kbv=kbv,
                debug_steps=debug_steps),
        out_shape=out_shape, grid_spec=grid_spec,
        compiler_params=_VM_PARAMS,
        interpret=interpret,
    )(counts, heads, flat, o3, d3, mm2, tris12, opaque)
    if debug_steps:
        return out[:, 0, 0], out[:, 0, 1]
    t = out[:, :, 0].reshape(-1)
    tid = jax.lax.bitcast_convert_type(out[:, :, 1], jnp.int32).reshape(-1)
    t = jnp.where(tid < 0, jnp.inf, t)
    return t, tid


# ---------------------------------------------------------------------------
# v3 VMEM-resident kernel: STREAMED tile*step iteration space.
#
# Measured anatomy (scripts/kernel_lab8.py / kernel_lab9.py): the per-tile
# while_loop boundary costs ~0.9 us of pipeline stall regardless of body,
# while a marginal traversal step costs only ~0.62 us — on
# signature-sorted waves (~1.2 steps/tile) the boundary is the majority
# of kernel time. v3 flattens all (tile, step) pairs of a grid step into
# ONE fori_loop whose trip count rides scalar prefetch, so the vector
# pipeline never breaks between tiles:
#   * per-tile results live in the loop carry; a tile's final (t, id) is
#     written when its last step retires (@pl.when(last));
#   * tiles with zero active clusters are pre-initialized as misses by a
#     vectorized pass and skipped by the stream;
#   * no in-kernel early exit: sorted walk lists are already near the
#     per-ray minimum (scripts/sortsig_lab.py), and dropping the exit
#     removes the vector->scalar `done` reduction; any-hit therefore
#     equals closest-hit and needs no opacity table at all.
# ---------------------------------------------------------------------------


def _kernel_vm3(counts_ref,            # scalar prefetch (n_tiles,)
                trips_ref,             # scalar prefetch (n_grid,)
                heads_ref,             # (n_tiles, KC) i32 HBM key heads
                full_ref,              # (n_tiles*cpad,) i32 HBM full rows
                rays_ref,              # (G, TILE, 8) VMEM packed rays
                tris_ref,              # (C, 12, 1, CLUSTER) VMEM resident
                                       # (or (C, 3, 4, CLUSTER) when mxu)
                out_ref,               # (G, TILE, 2) VMEM block
                head_scr, ovf_scr, head_sem, ovf_sem,
                *, n_clusters: int, cpad: int, idmask: int, kbv: int,
                mxu: bool = False):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    bkv = kbv * CLUSTER

    def head_dma(bb):
        return pltpu.make_async_copy(
            heads_ref.at[pl.ds(bb * G, G), :],
            head_scr.at[jax.lax.rem(bb, 2)], head_sem.at[jax.lax.rem(bb, 2)])

    @pl.when(b == 0)
    def _():
        head_dma(0).start()

    @pl.when(b + 1 < nb)
    def _():
        head_dma(b + 1).start()
    head_dma(b).wait()
    slot = jax.lax.rem(b, 2)

    # vectorized miss pre-init for every tile of the block (id -1 is
    # written via int bitcast so the NaN bit pattern survives exactly)
    out_ref[:, :, 0:1] = jnp.minimum(rays_ref[:, :, 7:8], BIG)
    out_ref[:, :, 1:2] = jax.lax.bitcast_convert_type(
        jnp.full((G, TILE, 1), -1, jnp.int32), jnp.float32)

    def steps_of(g):
        c = counts_ref[b * G + jnp.minimum(g, G - 1)]
        return jnp.where(g < G, (c + kbv - 1) // kbv, jnp.int32(1))

    def next_active(g):
        return jax.lax.while_loop(
            lambda x: (x < G) & (steps_of(x) == 0), lambda x: x + 1, g)

    trip = trips_ref[b]

    def key_at(g, k, use_ovf):
        kk = jnp.minimum(k, cpad - 1)
        h = head_scr[slot, g, jnp.minimum(kk, KC - 1)]
        f = ovf_scr[kk]
        return jnp.where(use_ovf, f, h)

    def body(i, c):
        g, ls, bt, bi = c
        count = counts_ref[b * G + g]
        steps = (count + kbv - 1) // kbv
        first = ls == 0
        last = ls + 1 >= steps
        use_ovf = count + kbv > KC

        # rare overflow: fetch the tile's full sorted row once
        @pl.when(use_ovf & first)
        def _():
            cp = pltpu.make_async_copy(
                full_ref.at[pl.ds((b * G + g) * cpad, cpad)],
                ovf_scr, ovf_sem)
            cp.start()
            cp.wait()

        orders = [jnp.minimum(key_at(g, ls * kbv + j, use_ovf) & idmask,
                              n_clusters - 1) for j in range(kbv)]
        ts = [tris_ref[o] for o in orders]
        tri = jnp.concatenate(ts, axis=-1) if kbv > 1 else ts[0]

        # ONE dynamic (TILE, 8) load per iteration; column extracts are
        # register ops (8 separate dynamic lane-slice loads measured
        # 0.55 us/tile — scripts/kernel_lab10.py)
        rays = rays_ref[g]
        ox = rays[:, 0:1]
        oy = rays[:, 1:2]
        oz = rays[:, 2:3]
        dx = rays[:, 3:4]
        dy = rays[:, 4:5]
        dz = rays[:, 5:6]
        tmin = rays[:, 6:7]
        tmax = rays[:, 7:8]
        bt = jnp.where(first, jnp.minimum(tmax, BIG), bt)
        bi = jnp.where(first, jnp.int32(-1), bi)

        if mxu:
            # MXU step: the Baldwin-Weber test as six dot products.
            # tri is (3, 4, bkv): [type(n,r1,r2), row(x,y,z,-dotv0),
            # lane]. o4 @ tri[t] gives (v.o - v.dotv0) for type v; d3 @
            # tri[t,0:3] gives v.d — the ~30-op per-lane arithmetic
            # moves to the otherwise-idle MXU, leaving a ~15-op VPU
            # epilogue.
            o4 = jnp.concatenate(
                [rays[:, 0:3], jnp.ones((TILE, 1), jnp.float32)], axis=1)
            d3 = rays[:, 3:6]

            def dot(a, bm):
                return jax.lax.dot_general(
                    a, bm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            on = dot(o4, tri[0])           # n.o - n.v0     (TILE, bkv)
            or1 = dot(o4, tri[1])          # r1.o - r1.v0
            or2 = dot(o4, tri[2])          # r2.o - r2.v0
            den = dot(d3, tri[0, 0:3])     # n.d
            dr1 = dot(d3, tri[1, 0:3])     # r1.d
            dr2 = dot(d3, tri[2, 0:3])     # r2.d
            f = jnp.where(den != 0, 1.0 / jnp.where(den == 0, 1.0, den),
                          0.0)
            tt = -on * f
            uu = or1 + tt * dr1
            vv = or2 + tt * dr2
        else:
            nx = tri[0]
            ny = tri[1]
            nz = tri[2]
            ndot = tri[3]
            r1x = tri[4]
            r1y = tri[5]
            r1z = tri[6]
            r1d = tri[7]
            r2x = tri[8]
            r2y = tri[9]
            r2z = tri[10]
            r2d = tri[11]

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
        lane_block = jax.lax.broadcasted_iota(
            jnp.int32, (TILE, bkv), 1) // CLUSTER
        slot_ok = (ls * kbv + lane_block) < count
        hit = (den != 0) & (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & \
            (tt >= tmin) & (tt < bt) & slot_ok
        tt = jnp.where(hit, tt, BIG)
        cand_t = jnp.min(tt, axis=1, keepdims=True)
        arg = jnp.argmin(tt, axis=1)[:, None]
        closer = cand_t < bt
        cid_win = jnp.zeros((TILE, 1), jnp.int32)
        for j in range(kbv):
            cid_win = jnp.where(arg // CLUSTER == j, orders[j], cid_win)
        bt = jnp.where(closer, cand_t, bt)
        bi = jnp.where(closer, cid_win * CLUSTER + arg % CLUSTER, bi)

        @pl.when(last)
        def _():
            # single combined (TILE, 2) write (two (TILE, 1) writes
            # measured 0.31 us/tile — scripts/kernel_lab10.py)
            out_ref[g] = jnp.concatenate(
                [bt, jax.lax.bitcast_convert_type(bi, jnp.float32)],
                axis=1)

        ng = jnp.where(last, next_active(g + 1), g)
        nls = jnp.where(last, 0, ls + 1)
        return (ng, nls, bt, bi)

    init = (next_active(jnp.int32(0)), jnp.int32(0),
            jnp.zeros((TILE, 1), jnp.float32),
            jnp.full((TILE, 1), -1, jnp.int32))
    jax.lax.fori_loop(0, trip, body, init)


@partial(jax.jit,
         static_argnames=("n_clusters", "cpad", "idmask", "kbv",
                          "interpret", "mxu"))
def pallas_trace_tiles_vm3(counts, keys, rays8, tris12,
                           n_clusters: int, cpad: int, idmask: int,
                           kbv: int = KBV, interpret: bool = False,
                           mxu: bool = False):
    """Streamed v3 of the VMEM-resident traversal (same contract as
    pallas_trace_tiles_vm, minus any_hit/opaque: without an in-kernel
    early exit any-hit equals closest-hit). rays8: (n_tiles, TILE, 8)
    packed [o|d|tmin|tmax] rows — callers pass their existing packed ray
    buffer straight through (the o3/d3/mm2 split + re-concat this
    replaces measured 35 ms/frame of pure HBM relayout)."""
    n_tiles = counts.shape[0]
    assert n_tiles % G == 0
    heads = keys[:, :KC]
    flat = keys.reshape(-1)
    steps = (counts + kbv - 1) // kbv
    trips = jnp.sum(steps.reshape(-1, G), axis=1)
    C = tris12.shape[0]
    if mxu:
        # (C, 12, 1, K) -> (C, 3, 4, K) is a pure reshape (tris12's row
        # order is already type-major: n|ndot|r1|r1d|r2|r2d); the MXU
        # form wants -dotv0 in the const row
        t = tris12.reshape(C, 3, 4, CLUSTER)
        tris12 = jnp.concatenate([t[:, :, 0:3], -t[:, :, 3:4]], axis=2)
    tri_block = (C, 3, 4, CLUSTER) if mxu else (C, 12, 1, CLUSTER)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles // G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                  pl.BlockSpec((G, TILE, 8), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(tri_block,
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
    out_shape = jax.ShapeDtypeStruct((n_tiles, TILE, 2), jnp.float32)
    out = pl.pallas_call(
        partial(_kernel_vm3, n_clusters=n_clusters, cpad=cpad,
                idmask=idmask, kbv=kbv, mxu=mxu),
        out_shape=out_shape, grid_spec=grid_spec,
        compiler_params=_VM_PARAMS,
        interpret=interpret,
    )(counts, trips, heads, flat, rays8, tris12)
    t = out[:, :, 0].reshape(-1)
    tid = jax.lax.bitcast_convert_type(out[:, :, 1], jnp.int32).reshape(-1)
    t = jnp.where(tid < 0, jnp.inf, t)
    return t, tid


@partial(jax.jit,
         static_argnames=("n_clusters", "cpad", "idmask", "any_hit",
                          "interpret", "debug_steps"))
def pallas_trace_tiles_vm(counts, keys, o3, d3, mm2, tris12, opaque,
                          n_clusters: int, cpad: int, idmask: int,
                          any_hit: bool = False, interpret: bool = False,
                          debug_steps: bool = False):
    """VMEM-resident counterpart of pallas_trace_tiles (same contract),
    taking Baldwin-Weber rows (C, 12, 1, CLUSTER) instead of [v0|e1|e2]
    component rows."""
    n_tiles = counts.shape[0]
    assert n_tiles % G == 0
    keys = keys.reshape(-1)
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
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec((G, TILE, 2), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((NM * cpad,), jnp.int32),
            pltpu.SMEM((opaque.shape[0],), jnp.int32),
            pltpu.SemaphoreType.DMA((NM,)),
            pltpu.SemaphoreType.DMA(()),
        ])
    out_shape = jax.ShapeDtypeStruct((n_tiles, TILE, 2), jnp.float32)
    out = pl.pallas_call(
        partial(_kernel_vm, n_clusters=n_clusters, cpad=cpad,
                idmask=idmask, any_hit=any_hit, debug_steps=debug_steps),
        out_shape=out_shape, grid_spec=grid_spec,
        compiler_params=_VM_PARAMS,
        interpret=interpret,
    )(counts, keys, o3, d3, mm2, tris12, opaque)
    if debug_steps:
        return out[:, 0, 0], out[:, 0, 1]      # (n_tiles,) steps, counts
    t = out[:, :, 0].reshape(-1)
    tid = jax.lax.bitcast_convert_type(out[:, :, 1], jnp.int32).reshape(-1)
    t = jnp.where(tid < 0, jnp.inf, t)
    return t, tid
