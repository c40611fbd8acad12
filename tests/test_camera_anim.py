"""Equirectangular cameras, depth of field, and animation replay E2E
(reference: src/camera.cc equirect, shader/camera.glsl:107-134 ray gen,
src/animation.hh keyframe playback)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tauray_tpu.options import Options
from tauray_tpu.scene.camera import Camera
from tauray_tpu.scene.transformable import Transformable

from test_pt_radiance import _floor_scene, _render


def _uniforms(cam, t=None):
    from tauray_tpu.scene.device import to_camera_uniforms
    t = t or Transformable()
    d = {k: np.stack([v]) for k, v in cam.get_uniform_data(t).items()}
    return to_camera_uniforms(d)


def test_equirect_ray_directions():
    from tauray_tpu.ops.shading import get_screen_camera_ray
    cam = Camera()
    cam.equirectangular(360.0, 180.0)
    u = _uniforms(cam)
    W = H = 64
    # center pixel, quarter-width pixel (yaw -90deg), top row (pitch +90)
    pix = jnp.array([[W // 2, H // 2], [0, H // 2], [W // 2, 0]],
                    jnp.int32)
    vp = jnp.zeros(3, jnp.int32)
    o, d = get_screen_camera_ray(u, vp, pix, (W, H))
    d = np.asarray(d)
    # straight ahead is -z (view convention), left edge wraps toward -x
    # side, top row looks straight up (+y)
    assert abs(d[0] @ np.array([0, 0, -1]) - 1) < 0.01, d[0]
    assert abs(d[2] @ np.array([0, 1, 0]) - 1) < 0.01, d[2]
    assert abs(np.linalg.norm(d, axis=1) - 1).max() < 1e-5


def test_equirect_render_env():
    """A 360 camera in a constant-envmap world: the upper image half
    (sky) must read exactly the env radiance."""
    from tauray_tpu.scene.environment_map import EnvironmentMap
    L = 1.25
    s = _floor_scene(intensity=0.0, albedo=0.5)
    s.entities[1].light = None
    e = s.add("env")
    e.environment_map = EnvironmentMap(
        image=np.full((8, 16, 3), L, np.float32))
    cam_e = [x for x in s.entities if x.camera is not None][0]
    cam_e.camera.equirectangular(360.0, 180.0)
    # level the camera: rows above the horizon then only see the env
    cam_e.transform.set_orientation(np.array([0, 0, 0, 1], np.float32))
    img = _render(s, samples_per_pixel=4, max_ray_depth=2)
    sky = img[:2, :, :3]
    assert np.isfinite(img).all()
    np.testing.assert_allclose(sky, L, rtol=0.02)


def test_depth_of_field_blurs_but_conserves_energy():
    L, albedo = 2.0, 0.8
    s = _floor_scene(intensity=L, albedo=albedo)
    img_pin = _render(s, samples_per_pixel=16)
    s2 = _floor_scene(intensity=L, albedo=albedo)
    cam_e = [x for x in s2.entities if x.camera is not None][0]
    cam_e.camera.set_focus(1.4, 5.0, 36.0, 0, 0.0)
    img_dof = _render(s2, samples_per_pixel=16)
    assert np.isfinite(img_dof).all()
    a, b = img_pin[..., :3].mean(), img_dof[..., :3].mean()
    assert abs(a - b) / a < 0.1, (a, b)


def test_animation_replay_e2e():
    """Keyframed translation drives the renderer across frames the way
    replay_viewer does (reference: src/tauray.cc:1017-1132)."""
    from tauray_tpu.scene import animation as anim
    from tauray_tpu.scene.animation import Animation, AnimationChannel
    from tauray_tpu.renderer.rt_renderer import PathTracerRenderer

    from tauray_tpu.scene.light import PointLight
    s = _floor_scene(intensity=0.0, albedo=0.8)
    s.entities[1].light = None
    pe = s.add("bulb")
    pe.transform = Transformable(position=(0, 4, 0))
    pe.light = PointLight((50.0, 50.0, 50.0), radius=0.05)
    floor = s.entities[0]
    a = Animation()
    a.add_channel("translation", AnimationChannel(
        times=np.array([0.0, 1.0], np.float32),
        values=np.array([[0, 0, 0], [0, -100, 0]], np.float32)))
    floor.animations = {"slide": a}

    anim.play(s, "slide", loop=False)
    assert anim.is_playing(s)

    opt = Options()
    opt.width = opt.height = 8
    opt.tonemap = "linear"
    opt.max_ray_depth = 2
    opt.samples_per_pixel = 4
    rr = PathTracerRenderer(opt)
    rr.set_scene(s)
    img0 = rr.render()[0]

    # halfway: floor dropped 50 units -> darker (inverse square on the
    # camera solid angle; really we just need the image to change and
    # the animation clock to advance deterministically)
    anim.update(s, 500_000)
    assert floor.transform.position[1] == pytest.approx(-50.0)
    rr.update_frame()
    rr.reset_accumulation()
    img1 = rr.render()[0]
    assert np.isfinite(img1).all()
    assert abs(float(img0.mean()) - float(img1.mean())) > 1e-4

    # past the end: clamps and stops
    anim.update(s, 600_000)
    assert not anim.is_playing(s)
    assert floor.transform.position[1] == pytest.approx(-100.0)
