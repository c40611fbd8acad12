"""Honest device timing under the axon tunnel.

`block_until_ready` returns early on this backend and single dispatches
carry a ~26 ms bimodal round-trip artifact, so the only reliable
methodology is: run N iterations of the workload INSIDE one jitted
`lax.scan` (perturbing inputs per step so nothing can be value-cached),
reduce the output to one scalar, and force a real readback with
`device_get`. Device time per iteration = (total - harness) / N.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def scan_time(body, n: int = 16, warmup: bool = True) -> float:
    """body(i) -> pytree; returns ms per iteration.

    `body` should consume `i` (an int32 scalar) so every step differs.
    """

    @jax.jit
    def run():
        def step(carry, i):
            out = body(i + carry.astype(jnp.int32))
            s = jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(x).astype(jnp.float32),
                out, jnp.float32(0))
            return carry + s * 1e-30, None

        carry, _ = jax.lax.scan(step, jnp.float32(0),
                                jnp.arange(n, dtype=jnp.int32))
        return carry

    if warmup:
        float(jax.device_get(run()))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jax.device_get(run()))
        ts.append(time.perf_counter() - t0)
    return min(ts) / n * 1000.0
