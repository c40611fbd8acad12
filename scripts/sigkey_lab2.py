#!/usr/bin/env python
"""Signature-key shootout on REAL captured waves (round 5).

visited_lab2 showed Sponza bounce waves have need/ray ~6 but 32-ray tile
unions of 41-58 clusters: the big-C key (two 16-bit class mins,
ops/cluster._sig_sort_key S>1023 branch) groups by only TWO active ids.
Candidates measured here, by resulting mean/p95 tile-union and kernel
steps (ceil(union/8)):

  cur      — production key (2x16-bit class mins for S>1023)
  lex4     — 64-bit lexicographic via two stable argsorts:
             (min of class 0..1) major, (min of class 2..3) minor
  lex6sc2  — two-pass with SC=2 supercluster ids: 3x10-bit major,
             3x10-bit minor (6 class mins)
  hash     — (first active id 11 bits) | (21-bit set hash)
  lex4h    — (min0 | min1) major, (min2 | set hash) minor
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


def _slab_act(tracer, o, d, t_min, t_max, sc=1):
    """(nb, S, TILE) active bools at supercluster granularity sc."""
    from tauray_tpu.ops.cluster import TILE, _slab_t_soa
    C = tracer.n_clusters
    R = o.shape[0]
    nb = R // TILE
    ro = o.reshape(nb, TILE, 3)
    rd = d.reshape(nb, TILE, 3)
    inv_d = jnp.where(rd == 0, jnp.float32(3e38),
                      1.0 / jnp.where(rd == 0, 1.0, rd))
    S = -(-C // sc)
    big = jnp.float32(3e38)
    cmin, cmax = tracer.cmin, tracer.cmax
    if sc > 1:
        pad = S * sc - C
        cmin = jnp.concatenate([cmin, jnp.full((pad, 3), big)]).reshape(
            S, sc, 3).min(axis=1)
        cmax = jnp.concatenate([cmax, jnp.full((pad, 3), -big)]).reshape(
            S, sc, 3).max(axis=1)
    tn, tf = _slab_t_soa(
        ro[:, None, :, 0], ro[:, None, :, 1], ro[:, None, :, 2],
        inv_d[:, None, :, 0], inv_d[:, None, :, 1], inv_d[:, None, :, 2],
        cmin, cmax)
    tn = jnp.maximum(tn, t_min.reshape(nb, TILE)[:, None, :])
    act = (tf >= tn) & (tn <= t_max.reshape(nb, TILE)[:, None, :])
    return act


def _class_mins(act, n_classes, width_bits):
    """Per-ray min active id in each residue class, clipped to the
    field; returns list of (R,) uint32."""
    nb, S, T = act.shape
    cid = jnp.arange(S, dtype=jnp.int32)[None, :, None]
    big = jnp.int32((1 << width_bits) - 1)
    outs = []
    for r in range(n_classes):
        m = jnp.min(jnp.where(act & (cid % n_classes == r),
                              jnp.minimum(cid, big), big),
                    axis=1).astype(jnp.uint32)
        outs.append(m.reshape(-1))
    return outs


def _set_hash(act, bits):
    nb, S, T = act.shape
    cid = jnp.arange(S, dtype=jnp.uint32)[None, :, None]
    h = jnp.sum(jnp.where(act, (cid * jnp.uint32(2654435761)) ^
                          (cid << jnp.uint32(7)), jnp.uint32(0)),
                axis=1, dtype=jnp.uint32)
    return (h.reshape(-1) % jnp.uint32(1 << bits))


@partial(jax.jit, static_argnames=("mode",))
def eval_key(tracer, o, d, t_min, t_max, mode):
    from tauray_tpu.ops.cluster import TILE, _sig_sort_key
    from tauray_tpu.ops.pallas_trace import TILE as PT
    R = o.shape[0]
    dead = (t_max <= 0)
    if mode == "cur":
        key = _sig_sort_key(tracer, o, d, t_min, t_max)
        perm = jnp.argsort(key)
    else:
        if mode == "lex4":
            act = _slab_act(tracer, o, d, t_min, t_max, sc=1)
            m = _class_mins(act, 4, 16)
            major = (m[0] << jnp.uint32(16)) | m[1]
            minor = (m[2] << jnp.uint32(16)) | m[3]
        elif mode == "lex6sc2":
            act = _slab_act(tracer, o, d, t_min, t_max, sc=2)
            m = _class_mins(act, 6, 10)
            major = (m[0] << jnp.uint32(20)) | (m[1] << jnp.uint32(10)) | m[2]
            minor = (m[3] << jnp.uint32(20)) | (m[4] << jnp.uint32(10)) | m[5]
        elif mode == "hash":
            act = _slab_act(tracer, o, d, t_min, t_max, sc=1)
            m = _class_mins(act, 1, 11)
            major = (m[0] << jnp.uint32(21)) | _set_hash(act, 21)
            minor = None
        elif mode == "lex4h":
            act = _slab_act(tracer, o, d, t_min, t_max, sc=1)
            m = _class_mins(act, 3, 16)
            major = (m[0] << jnp.uint32(16)) | m[1]
            minor = (m[2] << jnp.uint32(16)) | _set_hash(act, 16)
        else:
            raise ValueError(mode)
        major = jnp.where(dead, jnp.uint32(0xFFFFFFFF), major)
        if minor is None:
            perm = jnp.argsort(major)
        else:
            minor = jnp.where(dead, jnp.uint32(0xFFFFFFFF), minor)
            p1 = jnp.argsort(minor, stable=True)
            perm = p1[jnp.argsort(major[p1], stable=True)]
    o, d, t_min, t_max = (x[perm] for x in (o, d, t_min, t_max))
    # union stats at kernel-tile granularities 32/16/8 rays
    act = _slab_act(tracer, o, d, t_min, t_max, sc=1)
    nb, C, T = act.shape
    out = []
    for pt in (32, 16, 8):
        sub = T // pt
        tile_act = jnp.any(act.reshape(nb, C, sub, pt), axis=3)
        counts = jnp.sum(tile_act, axis=1).reshape(-1).astype(jnp.int32)
        live = counts > 0
        steps = (counts + 7) // 8
        out.append((jnp.sum(jnp.where(live, counts, 0)),
                    jnp.sum(jnp.where(live, steps, 0)),
                    jnp.sum(live), jnp.max(counts)))
    return out


def main():
    from tauray_tpu.options import parse_command_line_options
    from tauray_tpu.app.main import load_scenes, create_renderer

    scene = os.environ.get("SCENE", "proc://sponza?tris=196608")
    W, H = (int(x) for x in os.environ.get("SIZE", "960x540").split("x"))
    spp = int(os.environ.get("SPP", "1"))
    opt = parse_command_line_options([
        "--renderer=path-tracer", f"--width={W}", f"--height={H}",
        "--max-ray-depth=4", f"--samples-per-pixel={spp}",
        f"--samples-per-pass={spp}", "--headless=unused",
        "--filetype=none", scene])
    s = load_scenes(opt)
    rr = create_renderer(opt, s)
    rr.set_scene(s)
    waves = rr.capture_waves()
    print(f"C={rr.bvh.n_clusters}")
    for i in (2, 4, 3, 5):     # two bounce + two shadow waves
        kind, o, d, tmin, tmax = waves[i]
        pad = (-o.shape[0]) % (128 * 64)
        if pad:
            o = np.concatenate([o, np.zeros((pad, 3), o.dtype)])
            d = np.concatenate([d, np.ones((pad, 3), d.dtype)])
            tmin = np.concatenate([tmin, np.ones(pad, np.float32)])
            tmax = np.concatenate([tmax, np.zeros(pad, np.float32)])
        args = (rr.bvh, jnp.asarray(o), jnp.asarray(d),
                jnp.asarray(tmin), jnp.asarray(tmax))
        for mode in ("cur", "lex4", "lex6sc2"):
            res = eval_key(*args, mode=mode)
            line = f"w{i} {kind:6s} {mode:8s}"
            for pt, r in zip((32, 16, 8), res):
                cs, st, lv, mx = (float(np.asarray(x)) for x in r)
                # tests per live LANE-ray at this tile size, one step
                # tests pt*0 ... tests_total = steps*1024*pt over lv*pt
                line += (f" | pt{pt}: union={cs/lv:6.1f}"
                         f" tests/ray={st/lv*1024:6.0f}")
            print(line)


if __name__ == "__main__":
    main()
