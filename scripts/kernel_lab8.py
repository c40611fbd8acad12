#!/usr/bin/env python
"""Bisect the ~1.2us/tile fixed cost of the traversal kernel: stripped
micro-kernels with components added one at a time, all at counts=0
(no triangle work)."""
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


def make_kernel(mode):
    def kern(counts_ref, heads_ref, o_ref, d_ref, mm_ref, out_ref,
             head_scr, head_sem):
        b = pl.program_id(0)
        nb = pl.num_programs(0)

        def head_dma(bb):
            return pltpu.make_async_copy(
                heads_ref.at[pl.ds(bb * G, G), :],
                head_scr.at[jax.lax.rem(bb, 2)],
                head_sem.at[jax.lax.rem(bb, 2)])

        if mode >= 2:
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
            if mode == 0:
                # write only
                out_ref[g, :, 0:1] = jnp.full((TILE, 1), 1.0)
                out_ref[g, :, 1:2] = jnp.full((TILE, 1), 2.0)
                return 0
            ox = o_ref[g, :, 0:1]
            oy = o_ref[g, :, 1:2]
            oz = o_ref[g, :, 2:3]
            dx = d_ref[g, :, 0:1]
            dy = d_ref[g, :, 1:2]
            dz = d_ref[g, :, 2:3]
            tmin = mm_ref[g, :, 0:1]
            tmax = mm_ref[g, :, 1:2]
            acc = ox + oy + oz + dx + dy + dz + tmin
            if mode >= 3:
                # trivial while loop over count steps
                def cond(c):
                    return c[0] < (count + 7) // 8

                def body(c):
                    step, a = c
                    k = head_scr[slot, g, jnp.minimum(step, KC - 1)]
                    return (step + 1, a + k.astype(jnp.float32))
                _, acc2 = jax.lax.while_loop(cond, body,
                                             (jnp.int32(0),
                                              jnp.zeros((TILE, 1))))
                acc = acc + acc2
            out_ref[g, :, 0:1] = acc
            out_ref[g, :, 1:2] = tmax
            return 0

        jax.lax.fori_loop(0, G, process_tile, 0)
    return kern


@partial(jax.jit, static_argnames=("mode",))
def run_mode(counts, heads, o3, d3, mm2, mode):
    n_tiles = counts.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles // G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                  pl.BlockSpec((G, TILE, 3), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((G, TILE, 3), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((G, TILE, 2), lambda b, *_: (b, 0, 0),
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
        grid_spec=grid_spec)(counts, heads, o3, d3, mm2)


def main():
    R = 1048576
    n_tiles = R // TILE
    rng = np.random.default_rng(0)
    o3 = jnp.asarray(rng.standard_normal((n_tiles, TILE, 3)), jnp.float32)
    d3 = jnp.asarray(rng.standard_normal((n_tiles, TILE, 3)), jnp.float32)
    mm2 = jnp.asarray(rng.standard_normal((n_tiles, TILE, 2)), jnp.float32)
    heads = jnp.zeros((n_tiles, KC), jnp.int32)

    def timeit(fn, n=5):
        fn()
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000

    names = {0: "write-only", 1: "+ray loads", 2: "+head DMA",
             3: "+while(count/8) smem reads"}
    for mode in (0, 1, 2, 3):
        for nact in ((0,) if mode < 3 else (0, 8, 16)):
            counts = jnp.full(n_tiles, nact, jnp.int32)

            def run():
                jax.block_until_ready(
                    run_mode(counts, heads, o3, d3, mm2, mode))
            ms = timeit(run)
            print(f"mode{mode} ({names[mode]}) counts={nact:3d}: "
                  f"{ms:7.1f} ms  {ms * 1000 / n_tiles:5.3f} us/tile",
                  flush=True)


if __name__ == "__main__":
    main()
