#!/usr/bin/env python
"""Phase-1 key sort alternatives, measured on the TPU.

The Sponza-class 1080p profile shows 488 ms/frame of `jnp.sort` on
(n_tiles, cpad~2176) i32 key rows — by far the biggest XLA-side line.
The kernel only reads the first KC=128 sorted keys (heads) plus the
full row for rare overflow tiles, so a top-k primitive could replace
the full sort. Candidates:
  * jnp.sort(width W)         — baseline, W = 2176 vs 384
  * lax.top_k(k=128)          — exact
  * lax.approx_min_k(k=128, recall_target=1.0) — TPU PartialReduce
"""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


def timeit(fn, *args, n=10):
    # axon block_until_ready appears to no-op; a device_get of a
    # reduction is the only reliable sync on this link
    def run():
        r = fn(*args)
        r = r[0] if isinstance(r, (tuple, list)) else r
        return float(np.asarray(jnp.sum(r[:, :1].astype(jnp.float32))))
    run()
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return min(times) * 1000


def main():
    n_tiles = 32768          # 1M-ray wave at TILE=32
    for W in (2176, 1152, 384):
        x = jnp.asarray(
            np.random.randint(0, 2**31 - 1, size=(n_tiles, W), dtype=np.int32))
        t_sort = timeit(jax.jit(lambda v: jnp.sort(v, axis=1)), x)
        t_topk = timeit(jax.jit(lambda v: jax.lax.top_k(-v, 128)), x)
        xf = x.astype(jnp.float32)
        t_apx = timeit(jax.jit(partial(
            jax.lax.approx_min_k, k=128, recall_target=1.0)), xf)
        t_apx9 = timeit(jax.jit(partial(
            jax.lax.approx_min_k, k=128, recall_target=0.95)), xf)
        print(f"W={W}: full sort {t_sort:7.2f} ms | top_k128 {t_topk:7.2f}"
              f" ms | approx_min_k(1.0) {t_apx:7.2f} ms |"
              f" approx_min_k(.95) {t_apx9:7.2f} ms")


if __name__ == "__main__":
    main()
