import numpy as np
import jax

from tauray_tpu.ops.bvh import build_device_bvh
from tauray_tpu.ops.intersect import (TriangleSoup, intersect_bruteforce,
                                      intersect_spheres)


def _random_scene(T=700, seed=0):
    rng = np.random.default_rng(seed)
    tri = rng.random((T, 3, 3)).astype(np.float32) * 2 - 1
    tri[:, 1:] = tri[:, 0:1] + (tri[:, 1:] - tri[:, 0:1]) * 0.2
    pad = (-T) % 256
    tri = np.concatenate([tri, np.zeros((pad, 3, 3), np.float32)])
    inst = np.concatenate([np.zeros(T, np.int32),
                           -np.ones(pad, np.int32)])
    return tri, inst


def _random_rays(R=1024, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.random((R, 3)).astype(np.float32) * 4 - 2
    d = rng.standard_normal((R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d, np.zeros(R, np.float32), np.full(R, np.inf, np.float32)


def test_bvh_matches_bruteforce():
    tri, inst = _random_scene()
    o, d, tmin, tmax = _random_rays()
    soup = TriangleSoup.from_corners(tri)
    hb = jax.tree.map(np.asarray, intersect_bruteforce(o, d, tmin, tmax, soup))
    bvh = build_device_bvh(tri, inst)
    hv = jax.tree.map(np.asarray, bvh.trace(o, d, tmin, tmax))
    assert (hb.tri_id == hv.tri_id).all()
    np.testing.assert_allclose(hb.t[hb.tri_id >= 0], hv.t[hv.tri_id >= 0],
                               rtol=1e-4)


def test_bvh_any_hit_shadow():
    tri, inst = _random_scene()
    o, d, tmin, tmax = _random_rays(seed=7)
    bvh = build_device_bvh(tri, inst)
    closest = np.asarray(bvh.trace(o, d, tmin, tmax).tri_id)
    any_hit = np.asarray(bvh.trace(o, d, tmin, tmax, any_hit=True).tri_id)
    # any-hit finds a hit iff closest-hit does
    assert ((closest >= 0) == (any_hit >= 0)).all()


def test_bvh_respects_t_range():
    tri, inst = _random_scene(seed=2)
    o, d, tmin, _ = _random_rays(seed=3)
    bvh = build_device_bvh(tri, inst)
    full = bvh.trace(o, d, tmin, np.full(len(o), np.inf, np.float32))
    t = np.asarray(full.t)
    hit = np.asarray(full.tri_id) >= 0
    # clamp t_max below each hit: ray must now miss or hit something closer
    restricted = bvh.trace(o, d, tmin, np.where(hit, t * 0.99, 1e9))
    rt = np.asarray(restricted.t)
    assert ((rt[hit] < t[hit] * 0.99) | (np.asarray(restricted.tri_id)[hit] < 0)).all()


def test_sphere_intersection():
    centers = np.array([[0, 0, -5], [0, 3, -5]], np.float32)
    radii = np.array([1.0, 0.5], np.float32)
    o = np.zeros((3, 3), np.float32)
    d = np.array([[0, 0, -1], [0, 0.514, -0.857], [0, 1, 0]], np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t, lid = intersect_spheres(o, d, np.zeros(3, np.float32),
                               np.full(3, np.inf, np.float32),
                               centers, radii)
    lid = np.asarray(lid)
    t = np.asarray(t)
    assert lid[0] == 0 and abs(t[0] - 4.0) < 1e-4
    assert lid[1] == 1
    assert lid[2] == -1


def test_refit_moves_with_geometry():
    from tauray_tpu.ops.bvh import refit_device_bvh
    tri, inst = _random_scene(seed=5)
    bvh = build_device_bvh(tri, inst)
    perm = np.asarray(bvh.to_orig)
    moved = tri + np.array([10.0, 0, 0], np.float32)
    bvh2 = refit_device_bvh(bvh, moved, perm)
    o = np.array([[10.0, 0, 5]], np.float32).repeat(64, 0)
    rng = np.random.default_rng(0)
    d = rng.standard_normal((64, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmin = np.zeros(64, np.float32)
    tmax = np.full(64, np.inf, np.float32)
    h_old_scene = build_device_bvh(moved, inst).trace(o, d, tmin, tmax)
    h_refit = bvh2.trace(o, d, tmin, tmax)
    assert (np.asarray(h_old_scene.t)[np.asarray(h_old_scene.tri_id) >= 0] ==
            np.asarray(h_refit.t)[np.asarray(h_refit.tri_id) >= 0]).all()
