#!/usr/bin/env python
"""Gather-cost lab: how does a row gather's cost scale with row WIDTH,
dtype, and row count on this TPU?  Decides whether shrinking tri_packed
(81 f32 cols) or splitting it into f32/bf16 halves pays."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from honest_timing import scan_time

rng = np.random.default_rng(0)


def bench_gather(n_rows, n_cols, table_rows, dtype, n=16):
    table = jnp.asarray(rng.random((table_rows, n_cols)), dtype)
    idx = jnp.asarray(rng.integers(0, table_rows, n_rows, dtype=np.int32))

    @jax.jit
    def f(i):
        g = table[(idx + i) % table_rows]
        return jnp.sum(g.astype(jnp.float32))

    ms = scan_time(f, n=n)
    print(f"rows={n_rows//1000:5d}k cols={n_cols:3d} {dtype.__name__:9s}"
          f" table={table_rows//1000:4d}k: {ms:7.3f} ms "
          f"({n_rows/ms/1e6:6.1f} Mrows/s)", flush=True)
    return ms


def main():
    R = 1 << 20
    T = 81920
    for cols in (1, 8, 16, 32, 48, 81, 128):
        bench_gather(R, cols, T, np.float32)
    for cols in (16, 32, 81, 162):
        bench_gather(R, cols, T, jnp.bfloat16)
    # two half-width gathers vs one wide (split-table strategy)
    table_a = jnp.asarray(rng.random((T, 40), np.float32))
    table_b = jnp.asarray(rng.random((T, 41), np.float32))
    idx = jnp.asarray(rng.integers(0, T, R, dtype=np.int32))

    @jax.jit
    def two(i):
        j = (idx + i) % T
        return jnp.sum(table_a[j]) + jnp.sum(table_b[j])

    ms = scan_time(two, n=16)
    print(f"two 40/41-col f32 gathers: {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
