"""Honest device timing under the axon tunnel.

`block_until_ready` returns early on this backend and each dispatched
execution carries a ~26 ms round-trip artifact, so wall-clock timing of
single dispatches is meaningless. Two usable methodologies:

* `scan_time(body, n)` — run n iterations of the workload INSIDE one
  jitted `lax.scan` (perturbing inputs per step so nothing is
  value-cached), reduce to one scalar, force a readback. The harness
  floor (empty-body scan, measured once and cached) is subtracted, and
  the residual fixed cost shrinks as 1/n — use n >= 32 for sub-ms
  workloads, or prefer `device_ms` below.
* `device_ms(f, *args)` — run f under jax.profiler.trace and sum the
  device-side op durations from the xplane. Slow (seconds per call) but
  exact; also returns the per-op breakdown.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

import jax
import jax.numpy as jnp

_FLOOR_MS = {}


def _harness_floor(n: int) -> float:
    """Per-iteration cost of an empty scan body, cached per n."""
    if n not in _FLOOR_MS:
        x = jnp.zeros((8, 128), jnp.float32)
        _FLOOR_MS[n] = _scan_time_raw(lambda i: x + i.astype(jnp.float32),
                                      n)
    return _FLOOR_MS[n]


def _scan_time_raw(body, n: int) -> float:
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

    float(jax.device_get(run()))          # warmup/compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jax.device_get(run()))
        ts.append(time.perf_counter() - t0)
    return min(ts) / n * 1000.0


def scan_time(body, n: int = 32, warmup: bool = True) -> float:
    """body(i) -> pytree; returns ms per iteration, harness floor
    subtracted. `body` should consume `i` (int32 scalar) so every step
    differs."""
    return max(_scan_time_raw(body, n) - _harness_floor(n), 0.0)


def device_ms(f, *args, tmpdir: str = "/tmp/honest_prof", reps: int = 1):
    """Run jitted f(*args) `reps` times under the profiler; returns
    (total_device_ms_per_rep, [(ms, op_name) sorted desc]).

    Parsing needs xprof; spawn cost ~seconds. Exact device truth."""
    g = jax.jit(f) if not hasattr(f, "lower") else f
    r = g(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, r)
    _force(r)
    shutil.rmtree(tmpdir, ignore_errors=True)
    with jax.profiler.trace(tmpdir):
        for _ in range(reps):
            _force(g(*args))
    return _parse_xplane(tmpdir, reps)


def _force(r):
    leaves = jax.tree_util.tree_leaves(r)
    for x in leaves:
        if hasattr(x, "addressable_data"):
            import numpy as np
            np.asarray(x)
            return


def _parse_xplane(tmpdir: str, reps: int = 1):
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION",
                          "python")
    files = glob.glob(tmpdir + "/plugins/profile/*/*.xplane.pb")
    from xprof.convert import raw_to_tool_data as rtd
    out, _ = rtd.xspace_to_tool_data(files, "framework_op_stats", {})
    d = json.loads(out if isinstance(out, str) else out.decode())
    rows = d[0]["rows"]
    ops = []
    for r in rows:
        c = [x.get("v") for x in r["c"]]
        if c[1] == "Device" and c[2] != "IDLE":
            ops.append((float(c[7] or 0) / 1000.0 / reps,
                        f"{c[2]} {c[3]}"))
    ops.sort(reverse=True)
    return sum(m for m, _ in ops), ops
