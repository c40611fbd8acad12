"""Between-bounce dead-lane compaction (stages/path_tracer.py
_run_bounce_capped): a capped render must produce the same image as the
full-width render — compaction only re-orders WHERE lanes are computed,
never what. Also checks the exactness fallback: a cap smaller than the
actual live count must fall back to the full-width bounce inside
lax.cond (mispredicted schedules cost speed, never correctness)."""

import numpy as np

from tauray_tpu.options import Options
from tauray_tpu.scene.scene import Scene
from tauray_tpu.scene.mesh import Mesh, Model
from tauray_tpu.scene.material import Material
from tauray_tpu.scene.light import DirectionalLight
from tauray_tpu.scene.transformable import Transformable
from tauray_tpu.scene.camera import Camera


def _half_sky_scene():
    """Floor covering only the lower half of the view: many camera rays
    miss to the (black) sky and die after bounce 0 — the compaction
    regime."""
    s = Scene()
    s.textures = []
    s.texture_meta = []
    verts = np.array([[-50, 0, -50], [50, 0, -50], [50, 0, 50],
                      [-50, 0, 50]], np.float32)
    idx = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    model = Model()
    model.add_vertex_group(
        Material(albedo_factor=np.array([0.7, 0.6, 0.5, 1], np.float32),
                 metallic_factor=0.0, roughness_factor=0.8,
                 double_sided=True),
        Mesh(positions=verts, indices=idx))
    e = s.add("floor")
    e.transform = Transformable()
    e.model = model

    le = s.add("sun")
    le.transform = Transformable()
    le.light = DirectionalLight((2.0, 1.9, 1.7), 1.0)
    le.light.direction = np.asarray([0.2, -1.0, 0.1], np.float32)

    ce = s.add("cam")
    ce.transform = Transformable(position=(0.0, 2.0, 8.0))
    ce.camera = Camera()
    ce.camera.perspective(60, 1.0, 0.1, 100.0)
    ce.camera_enabled = True
    return s


def _pass_output(s, bounce_caps):
    from tauray_tpu.renderer.rt_renderer import PathTracerRenderer, \
        _render_pass
    from tauray_tpu.scene.device import to_camera_uniforms
    import jax.numpy as jnp
    opt = Options()
    opt.width = opt.height = 16
    opt.max_ray_depth = 4
    opt.samples_per_pixel = 4
    opt.samples_per_pass = 4
    rr = PathTracerRenderer(opt)
    rr.set_scene(s)
    rr.update_frame()
    cam = to_camera_uniforms(rr.arrays.camera_uniforms(rr.viewports()))
    scene = rr._slot_scene()
    n = rr.rays_per_call
    prev = jnp.zeros(n, jnp.uint32)
    out = _render_pass(rr.cfg, scene, rr.bvh, cam, cam, rr._pix[:n],
                       rr._vp[:n], prev, bounce_caps=bounce_caps)
    return np.asarray(out.color), np.asarray(out.live_counts)


def test_compacted_pass_matches_full():
    s = _half_sky_scene()
    full, lc = _pass_output(s, None)
    R = 16 * 16 * 4
    # entering bounce 1, only floor-hitting rays are alive
    assert 0 < lc[0] < R, lc
    cap = R // 2 if lc[0] <= R // 2 else R
    assert cap < R, f"scene not dead enough for the test: {lc}"
    capped, _ = _pass_output(s, (R, cap, cap, cap))
    assert np.allclose(full, capped, atol=1e-6), (
        np.abs(full - capped).max())


def test_undersized_cap_falls_back_to_full_width():
    s = _half_sky_scene()
    full, lc = _pass_output(s, None)
    R = 16 * 16 * 4
    # a cap guaranteed below the live count: lax.cond must take the
    # full-width branch and the image must be identical
    bad_cap = max(int(lc[0]) // 2 // 1 - 1, 1)
    # round to a pow2-ish tier the way the scheduler would not — any int
    # works, the fallback is what's under test
    capped, _ = _pass_output(s, (R, bad_cap, R, R))
    assert np.allclose(full, capped, atol=1e-6)


def test_renderer_schedule_converges():
    """Second frame picks up the first frame's live counts and renders
    with a compacted schedule; the accumulated image must stay correct
    (compare against a no-compaction run)."""
    import os
    from tauray_tpu.renderer.rt_renderer import PathTracerRenderer

    def run(compact):
        os.environ["TAURAY_COMPACT"] = "1" if compact else "0"
        try:
            opt = Options()
            opt.width = opt.height = 16
            opt.max_ray_depth = 4
            opt.samples_per_pixel = 4
            opt.accumulation = True
            rr = PathTracerRenderer(opt)
            rr.set_scene(_half_sky_scene())
            imgs = []
            for _ in range(3):
                imgs.append(rr.render()[0])
            caps = rr._bounce_cap_schedule()
            return np.asarray(imgs[-1]), caps, rr.last_dispatched_lanes
        finally:
            os.environ.pop("TAURAY_COMPACT", None)

    img_c, caps_c, lanes_c = run(True)
    img_f, _, lanes_f = run(False)
    assert caps_c is not None, "schedule never engaged"
    assert lanes_c < lanes_f, (lanes_c, lanes_f)
    assert np.allclose(img_c, img_f, atol=1e-5), np.abs(img_c - img_f).max()
