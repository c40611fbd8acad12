#!/usr/bin/env python
"""Isolate why the pallas traversal kernel slows down 3-5x when other
work shares the jit program (round-2 perf investigation)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from honest_timing import scan_time
from tauray_tpu.options import parse_command_line_options
from tauray_tpu.app.main import load_scenes
from tauray_tpu.scene.arrays import SceneArrays
from tauray_tpu.scene.device import to_device_scene, to_camera_uniforms
from tauray_tpu.ops.cluster import build_cluster_tracer
from tauray_tpu.stages import path_tracer as pt
from tauray_tpu.ops import rng as rng_ops

opt = parse_command_line_options([
    '--renderer=path-tracer', '--width=256', '--height=256',
    '--max-ray-depth=4', '--headless=u', '--filetype=none',
    '/root/reference/test/test.glb'])
s = load_scenes(opt)
arrays = SceneArrays(s, opt)
scene = to_device_scene(arrays)
tracer, _ = build_cluster_tracer(arrays.tri_pos, arrays.tri_instance)
vps = [(e.camera, e.transform) for e in s.entities if e.camera is not None]
cam = to_camera_uniforms(arrays.camera_uniforms(vps))
R = 256 * 256
ys, xs = np.meshgrid(np.arange(256), np.arange(256), indexing='ij')
pix = jnp.asarray(np.stack([xs.reshape(-1), ys.reshape(-1)], -1)
                  .astype(np.int32))
vp = jnp.zeros(R, jnp.int32)
prev = jnp.zeros(R, jnp.uint32)
cfg = pt.PTConfig(width=256, height=256, n_views=1, max_bounces=4,
                  nee=pt.NEEWeights(0.25, 0.25, 0.25, 0.25),
                  has_envmap=False, has_point_lights=True)
seed, origin, d0, coord = jax.jit(
    pt._begin_sample, static_argnames=('cfg',))(cfg, cam, pix, vp, prev)
z = jnp.zeros(R, jnp.float32)
state = (seed, rng_ops.pcg4d(seed), origin, d0,
         jnp.ones((R, 3), jnp.float32), z, jnp.ones(R, jnp.float32),
         z, z, z, jnp.ones(R, jnp.float32), jnp.ones(R, bool),
         jnp.zeros((R, 4), jnp.float32), jnp.zeros((R, 4), jnp.float32))
state2, fh = pt._run_bounce(cfg, scene, tracer, state, 0, True, 4, coord)
pos1 = jnp.asarray(np.asarray(state2[2]))
view1 = jnp.asarray(np.asarray(state2[3]))
alive1 = jnp.asarray(np.asarray(state2[11]))
tmin = jnp.full(R, cfg.min_ray_dist, jnp.float32)
tmax = jnp.where(alive1, jnp.inf, 0.0)


def ptb(i):
    return pos1 + i.astype(jnp.float32) * 1e-7


def run(label, body, n=8):
    ms = scan_time(body, n=n)
    print(f'{label:42s} {ms:7.2f} ms')


run('trace only', lambda i: tracer.trace(ptb(i), view1, tmin, tmax).t)

# trivial consumer
run('trace + sum(t*t)',
    lambda i: jnp.sum(tracer.trace(ptb(i), view1, tmin, tmax).t ** 2))


# one big gather consumer
def g1(i):
    h = tracer.trace(ptb(i), view1, tmin, tmax)
    idx = jnp.maximum(h.tri_id, 0)
    return scene.tri_pos[idx].sum(-1).sum(-1)


run('trace + 1 gather(tri_pos)', g1)


# shade after a barrier
def barrier_shade(i):
    h = tracer.trace(ptb(i), view1, tmin, tmax)
    h = jax.tree_util.tree_map(
        lambda x: jax.lax.optimization_barrier(x), h)
    st, _ = pt._shade_bounce(cfg, scene, state2, h,
                             jnp.ones(R, jnp.float32), jnp.int32(1),
                             False, 4, coord, -1)
    return st[-2]


run('trace + barrier + shade', barrier_shade)


def with_shade(i):
    h = tracer.trace(ptb(i), view1, tmin, tmax)
    st, _ = pt._shade_bounce(cfg, scene, state2, h,
                             jnp.ones(R, jnp.float32), jnp.int32(1),
                             False, 4, coord, -1)
    return st[-2]


run('trace + shade', with_shade)


# shade alone (hit precomputed outside jit)
h0 = jax.jit(lambda: tracer.trace(pos1, view1, tmin, tmax))()
h0 = jax.tree_util.tree_map(jnp.asarray, h0)


def shade_only(i):
    hh = type(h0)(h0.t + i.astype(jnp.float32) * 0, h0.tri_id,
                  h0.u, h0.v)
    st, _ = pt._shade_bounce(cfg, scene, state2, hh,
                             jnp.ones(R, jnp.float32), jnp.int32(1),
                             False, 4, coord, -1)
    return st[-2]


run('shade only', shade_only)
