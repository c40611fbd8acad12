"""Analytic radiance checks for the path tracer.

A Lambertian floor under a delta directional light must reflect
L * cos(theta) * albedo / pi — validates the NEE/MIS/modulation chain
end-to-end (no golden image needed)."""

import numpy as np
import pytest

from tauray_tpu.options import Options
from tauray_tpu.scene.scene import Scene
from tauray_tpu.scene.mesh import Mesh, Model
from tauray_tpu.scene.material import Material
from tauray_tpu.scene.light import DirectionalLight
from tauray_tpu.scene.transformable import Transformable
from tauray_tpu.scene.camera import Camera


def _floor_scene(light_dir=(0, -1, 0), intensity=2.0, albedo=0.8):
    s = Scene()
    s.textures = []
    s.texture_meta = []
    # big horizontal floor at y=0
    verts = np.array([[-50, 0, -50], [50, 0, -50], [50, 0, 50],
                      [-50, 0, 50]], np.float32)
    idx = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    mesh = Mesh(positions=verts, indices=idx)
    model = Model()
    model.add_vertex_group(
        Material(albedo_factor=np.array([albedo, albedo, albedo, 1],
                                        np.float32),
                 metallic_factor=0.0, roughness_factor=1.0,
                 double_sided=True), mesh)
    e = s.add("floor")
    e.transform = Transformable()
    e.model = model

    le = s.add("sun")
    t = Transformable()
    # orient -z axis toward light_dir
    d = np.asarray(light_dir, np.float32)
    d = d / np.linalg.norm(d)
    # rotation taking (0,0,-1) to d: simple cases only (straight down)
    if np.allclose(d, [0, -1, 0]):
        t.set_orientation(np.array([-np.sin(np.pi / 4), 0, 0,
                                    np.cos(np.pi / 4)], np.float32))
    le.transform = t
    le.light = DirectionalLight((intensity, intensity, intensity), 0.0)

    ce = s.add("cam")
    ce.transform = Transformable(position=(0, 5, 0))
    ce.transform.set_orientation(np.array([-np.sin(np.pi / 4), 0, 0,
                                           np.cos(np.pi / 4)], np.float32))
    ce.camera = Camera()
    ce.camera.perspective(30, 1.0, 0.1, 100.0)
    ce.camera_enabled = True
    return s


def _render(s, **overrides):
    from tauray_tpu.renderer.rt_renderer import PathTracerRenderer
    opt = Options()
    opt.width = opt.height = 8
    opt.tonemap = "linear"
    opt.max_ray_depth = 2
    opt.samples_per_pixel = 4
    for k, v in overrides.items():
        setattr(opt, k, v)
    rr = PathTracerRenderer(opt)
    rr.set_scene(s)
    return rr.render()[0]  # (H, W, 4)


def test_lambertian_direct_lighting():
    L = 2.0
    albedo = 0.8
    s = _floor_scene(intensity=L, albedo=albedo)
    img = _render(s)
    expected = L * 1.0 * albedo / np.pi  # cos(0) straight-down light
    got = img[..., :3].mean()
    assert abs(got - expected) / expected < 0.05, (got, expected)


def test_lambertian_no_nee_matches_nee():
    """NEE and BSDF-sampling estimators must agree (self-consistency).
    A delta directional light is invisible to BSDF rays, so compare using
    a wide-cone directional light instead."""
    L = 2.0
    albedo = 0.8
    s = _floor_scene(intensity=L, albedo=albedo)
    s.entities[1].light.angle = 30.0  # wide cone: hemisphere rays can hit
    img_nee = _render(s, samples_per_pixel=64)
    img_brute = _render(s, samples_per_pixel=512,
                        sample_point_lights=0.0,
                        sample_directional_lights=0.0,
                        sample_envmap=0.0, sample_emissive_triangles=0.0,
                        multiple_importance_sampling="off",
                        bounce_mode="hemisphere")
    a = img_nee[..., :3].mean()
    b = img_brute[..., :3].mean()
    assert abs(a - b) / max(a, 1e-9) < 0.15, (a, b)


def test_emissive_floor_seen_directly():
    s = Scene()
    s.textures = []
    s.texture_meta = []
    verts = np.array([[-50, 0, -50], [50, 0, -50], [50, 0, 50],
                      [-50, 0, 50]], np.float32)
    idx = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    mesh = Mesh(positions=verts, indices=idx)
    model = Model()
    model.add_vertex_group(
        Material(albedo_factor=np.array([0, 0, 0, 1], np.float32),
                 emission_factor=np.array([1.5, 1.5, 1.5], np.float32),
                 double_sided=True, metallic_factor=0.0), mesh)
    e = s.add("floor")
    e.transform = Transformable()
    e.model = model
    ce = s.add("cam")
    ce.transform = Transformable(position=(0, 5, 0))
    ce.transform.set_orientation(np.array([-np.sin(np.pi / 4), 0, 0,
                                           np.cos(np.pi / 4)], np.float32))
    ce.camera = Camera()
    ce.camera.perspective(30, 1.0, 0.1, 100.0)
    ce.camera_enabled = True
    # Directly-viewed emission must appear EXACTLY once. (A code read of
    # the reference suggests bounce-0 light lands both in the demodulated
    # reflection channel and in first_hit emission, but its actual golden
    # disagrees: validate_path-tracer.exr shows the emissive "O" of
    # test.glb at filmic(1.0) — single-counted — which our zero-init
    # primary lobes reproduce bit-close.)
    img = _render(s, sample_emissive_triangles=1.0)
    got = img[..., :3].mean()
    assert abs(got - 1.5) / 1.5 < 0.05, got


def test_point_light_inverse_square():
    from tauray_tpu.scene.light import PointLight
    L = 50.0
    albedo = 0.8
    h = 4.0
    s = _floor_scene(intensity=0.0, albedo=albedo)
    s.entities[1].light = None  # remove sun
    # light off to the side so the camera doesn't see the bulb itself
    lx = 2.0
    pe = s.add("bulb")
    pe.transform = Transformable(position=(lx, h, 0))
    pe.light = PointLight((L, L, L), radius=0.05)
    img = _render(s, samples_per_pixel=64)
    # floor point at origin: E = L cos / d^2, reflected * albedo / pi
    d2 = lx * lx + h * h
    cos = h / np.sqrt(d2)
    expected = L * cos / d2 * albedo / np.pi
    got = img[3:5, 3:5, :3].mean()
    assert abs(got - expected) / expected < 0.1, (got, expected)


def test_envmap_constant_furnace():
    """Constant-radiance envmap over a Lambertian floor: reflected radiance
    must equal albedo * L (white furnace; exercises envmap NEE + alias
    table sampling path)."""
    from tauray_tpu.scene.environment_map import EnvironmentMap
    L = 1.5
    albedo = 0.6
    s = _floor_scene(intensity=0.0, albedo=albedo)
    s.entities[1].light = None  # no sun
    e = s.add("env")
    e.environment_map = EnvironmentMap(
        image=np.full((8, 16, 3), L, np.float32))
    img = _render(s, samples_per_pixel=64, max_ray_depth=3)
    got = img[3:5, 3:5, :3].mean()
    # one-bounce estimate: direct env irradiance; multi-bounce adds
    # interreflection off the floor (small since floor only sees sky)
    expected = albedo * L
    assert abs(got - expected) / expected < 0.12, (got, expected)


def test_russian_roulette_unbiased():
    """RR must not change expected radiance: survivors are reweighted by
    1/qi (the reference divides a dead local instead,
    shader/path_tracer.glsl:489-496 — we keep the estimator unbiased)."""
    from tauray_tpu.scene.environment_map import EnvironmentMap
    L, albedo = 1.0, 0.9
    s = _floor_scene(intensity=0.0, albedo=albedo)
    s.entities[1].light = None
    e = s.add("env")
    e.environment_map = EnvironmentMap(
        image=np.full((8, 16, 3), L, np.float32))
    base = _render(s, samples_per_pixel=96, max_ray_depth=4)
    rr = _render(s, samples_per_pixel=512, max_ray_depth=4,
                 russian_roulette=2.0, rng_seed=7)
    got_b = base[2:6, 2:6, :3].mean()
    got_r = rr[2:6, 2:6, :3].mean()
    assert abs(got_r - got_b) / got_b < 0.05, (got_r, got_b)
