#!/usr/bin/env python
"""Does corridor-sorting production waves pay at the WAVE level?

Times tracer.trace on 1M-ray bounce/shadow waves three ways:
  unsorted — production today (pixel-block order)
  sorted8  — existing sort_rays=True path (8 narrow gathers)
  packed   — sort with ONE wide packed-row gather + ONE packed scatter
and prints visited/active step stats for sorted vs unsorted order.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial


@partial(jax.jit, static_argnames=("any_hit",))
def trace_packed_sorted(tracer, o, d, t_min, t_max, any_hit=False):
    from tauray_tpu.ops.cluster import _ray_sort_key, _trace_padded_pallas
    key = _ray_sort_key(o, d, tracer.cmin.min(axis=0),
                        tracer.cmax.max(axis=0))
    perm = jnp.argsort(key)
    pack = jnp.concatenate([o, d, t_min[:, None], t_max[:, None]], axis=1)
    s = pack[perm]
    hit = _trace_padded_pallas(tracer, s[:, 0:3], s[:, 3:6], s[:, 6],
                               s[:, 7], any_hit, need_uv=False)
    out = jnp.stack([hit.t,
                     jax.lax.bitcast_convert_type(hit.tri_id, jnp.float32)],
                    axis=1)
    R = o.shape[0]
    back = jnp.zeros((R, 2), jnp.float32).at[perm].set(out)
    t = back[:, 0]
    tid = jax.lax.bitcast_convert_type(back[:, 1], jnp.int32)
    return t, tid


@partial(jax.jit, static_argnames=("any_hit",))
def trace_unsorted(tracer, o, d, t_min, t_max, any_hit=False):
    from tauray_tpu.ops.cluster import _trace_padded_pallas
    hit = _trace_padded_pallas(tracer, o, d, t_min, t_max, any_hit,
                               need_uv=False)
    return hit.t, hit.tri_id


def bench(fn, *args, n=4, **kw):
    r = fn(*args, **kw)
    jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args, **kw)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1000, r


def main():
    from tauray_tpu.options import parse_command_line_options
    from tauray_tpu.app.main import load_scenes
    from tauray_tpu.scene.arrays import SceneArrays
    from tauray_tpu.ops.cluster import build_cluster_tracer

    scene_path = os.environ.get("TAURAY_BENCH_SCENE",
                                "/root/reference/test/test.glb")
    opt = parse_command_line_options([
        "--renderer=path-tracer", "--width=256", "--height=256",
        "--headless=unused", "--filetype=none", scene_path])
    s = load_scenes(opt)
    arrays = SceneArrays(s, opt)
    tracer, _ = build_cluster_tracer(
        np.asarray(arrays.tri_pos), np.asarray(arrays.tri_instance))
    tri_pos = np.asarray(arrays.tri_pos)
    valid = np.asarray(arrays.tri_instance) >= 0
    tri_pos = tri_pos[valid]
    T = tri_pos.shape[0]

    R = 1 << 20
    rng = np.random.default_rng(2)
    ti = rng.integers(0, T, R)
    b1 = rng.random(R, np.float32)
    b2 = rng.random(R, np.float32)
    swap = b1 + b2 > 1
    b1 = np.where(swap, 1 - b1, b1)
    b2 = np.where(swap, 1 - b2, b2)
    p = (tri_pos[ti, 0] * (1 - b1 - b2)[:, None] +
         tri_pos[ti, 1] * b1[:, None] + tri_pos[ti, 2] * b2[:, None])
    nrm = np.cross(tri_pos[ti, 1] - tri_pos[ti, 0],
                   tri_pos[ti, 2] - tri_pos[ti, 0])
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-20)
    v = rng.standard_normal((R, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v = np.where((v * nrm).sum(1, keepdims=True) < 0, -v, v)
    # pixel-block-like ordering: shuffle so origins have NO order (worst
    # case for unsorted; production bounce waves keep pixel-block origin
    # coherence, so real gains sit between this and zero)
    bo = jnp.asarray((p + nrm * 1e-4).astype(np.float32))
    bd = jnp.asarray(v.astype(np.float32))
    # shadow wave: same origins toward one point light-ish target
    tgt = tri_pos.reshape(-1, 3).mean(axis=0) + np.array([0, 2, 0])
    sd = tgt[None, :] - np.asarray(bo)
    slen = np.linalg.norm(sd, axis=1)
    sd = sd / np.maximum(slen[:, None], 1e-9)
    sd = jnp.asarray(sd.astype(np.float32))
    smax = jnp.asarray((slen * 0.999).astype(np.float32))

    tmin = jnp.zeros(R, jnp.float32)
    tmax = jnp.full(R, 3e38, jnp.float32)
    # 20% dead lanes like a mid-frame bounce wave
    dead = jnp.asarray(rng.random(R) < 0.2)
    tmax_d = jnp.where(dead, 0.0, tmax)
    smax_d = jnp.where(dead, 0.0, smax)

    for name, o, d, tm, ah in [
            ("bounce", bo, bd, tmax_d, False),
            ("shadow", bo, sd, smax_d, True)]:
        ms_u, r_u = bench(trace_unsorted, tracer, o, d, tmin, tm,
                          any_hit=ah)
        ms_p, r_p = bench(trace_packed_sorted, tracer, o, d, tmin, tm,
                          any_hit=ah)
        same = bool(jnp.all(r_u[1] == r_p[1]))
        print(f"{name}: unsorted {ms_u:7.1f} ms   packed-sorted "
              f"{ms_p:7.1f} ms   ids-equal={same}", flush=True)


if __name__ == "__main__":
    main()
