"""Cascaded directional shadow maps (reference: src/shadow_map.cc
track_cameras + scene_stage.cc:528-567 cascade placement,
shader/shadow_mapping.glsl find_cascade)."""

import numpy as np
import jax.numpy as jnp
import pytest

SCENE = "/root/reference/test/test.glb"


@pytest.fixture(scope="module")
def maps_and_arrays():
    from tauray_tpu.options import parse_command_line_options
    from tauray_tpu.app.main import load_scenes
    from tauray_tpu.scene.arrays import SceneArrays
    from tauray_tpu.ops.cluster import build_cluster_tracer
    from tauray_tpu.stages.shadow_map import build_shadow_maps

    # radius 0.5 on a +-2 scene: most geometry is OUTSIDE the base map,
    # so shadow coverage there depends entirely on the cascades
    opt = parse_command_line_options([
        "--renderer=raster", "--shadow-map-resolution=128",
        "--shadow-map-radius=0.5", "--shadow-map-cascades=4",
        "--headless=unused", "--filetype=none", SCENE])
    s = load_scenes(opt)
    arrays = SceneArrays(s, opt)
    tracer, _ = build_cluster_tracer(arrays.tri_pos, arrays.tri_instance)
    center = arrays.tri_pos.reshape(-1, 3).mean(axis=0)
    maps = build_shadow_maps(arrays, tracer, opt, center, cam_pos=center)
    return maps, arrays


def test_cascade_layout(maps_and_arrays):
    maps, arrays = maps_and_arrays
    casc = np.asarray(maps.cascade_count)
    rx = np.asarray(maps.params)[:, 0]
    nd = int(arrays.dir_count)
    assert nd >= 1
    # per directional light: 4 layers with doubling extents and
    # descending remaining-cascade counts; texel-aligned same center
    assert list(casc[:4]) == [4, 3, 2, 1]
    assert np.allclose(rx[:4], [0.5, 1.0, 2.0, 4.0])
    # bias scales with sqrt(2^k) (reference scene_stage.cc:559)
    mb = np.asarray(maps.max_bias)[:4]
    assert np.allclose(mb / mb[0], np.sqrt([1, 2, 4, 8]), rtol=1e-5)


def test_find_cascade_recovers_out_of_base_points(maps_and_arrays):
    """Occluded points outside the base map are lit without cascades
    (out of range -> no shadow) and shadowed with them."""
    from tauray_tpu.stages.shadow_map import pcf_visibility
    maps, arrays = maps_and_arrays
    D = np.asarray(maps.depth)
    far = float(np.asarray(maps.params)[0, 3])
    k = 2                                 # rx = 2 cascade
    res = maps.resolution
    V = np.asarray(maps.view)[k]
    inv = np.linalg.inv(V)
    rx = float(np.asarray(maps.params)[k, 0])
    js, iis = np.nonzero(D[k] < far - 1)
    xs = ((iis + 0.5) / res * 2 - 1) * rx
    ys = -(((js + 0.5) / res * 2 - 1) * rx)
    m = np.abs(xs) > 0.7                  # outside base map (rx 0.5)
    assert m.sum() > 100
    idx = np.nonzero(m)[0][:8]
    sel = [(xs[i], ys[i], D[k, js[i], iis[i]]) for i in idx]
    pts = np.stack([np.array([x, y, -(d + 0.5)], np.float32)
                    @ inv[:3, :3].T + inv[:3, 3] for x, y, d in sel])
    pts = jnp.asarray(pts)
    mid = jnp.zeros(len(sel), jnp.int32)
    one = jnp.ones(len(sel))
    v4 = np.asarray(pcf_visibility(maps, mid, pts, 16, ndotl=one,
                                   cascades=4))
    v1 = np.asarray(pcf_visibility(maps, mid, pts, 16, ndotl=one,
                                   cascades=1))
    assert np.all(v1 == 1.0), v1          # base map can't see them
    assert np.all(v4 < 0.95), v4          # cascades shadow them
    assert v4.mean() < 0.6, v4


def test_in_base_points_identical_with_and_without_cascades(
        maps_and_arrays):
    """Points inside the base map (with margin) never switch layers."""
    from tauray_tpu.stages.shadow_map import pcf_visibility
    maps, arrays = maps_and_arrays
    V = np.asarray(maps.view)[0]
    inv = np.linalg.inv(V)
    rng = np.random.default_rng(0)
    lx = (rng.random((16, 2), np.float32) - 0.5) * 0.6   # |x|,|y| < 0.3
    pts = np.stack([np.array([x, y, -5.0], np.float32)
                    @ inv[:3, :3].T + inv[:3, 3] for x, y in lx])
    pts = jnp.asarray(pts)
    mid = jnp.zeros(16, jnp.int32)
    one = jnp.ones(16)
    v4 = np.asarray(pcf_visibility(maps, mid, pts, 16, ndotl=one,
                                   cascades=4))
    v1 = np.asarray(pcf_visibility(maps, mid, pts, 16, ndotl=one,
                                   cascades=1))
    assert np.allclose(v4, v1)
