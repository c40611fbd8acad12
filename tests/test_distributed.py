"""Multi-device rendering on the virtual 8-CPU mesh — the TPU analogue of
the reference's `--fake-devices` testing pattern (SURVEY.md §4)."""

import numpy as np
import pytest

import jax


def _tiny_scene():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _tiny_scene as ts
    return ts(256)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs virtual mesh")
def test_distributed_matches_single_device():
    from tauray_tpu.options import Options
    from tauray_tpu.renderer.rt_renderer import PathTracerRenderer
    from tauray_tpu.renderer.distributed import DistributedPathTracerRenderer

    s, arrays, _ = _tiny_scene()
    opt = Options()
    opt.width = opt.height = 32
    opt.max_ray_depth = 2
    opt.tonemap = "linear"

    single = PathTracerRenderer(opt)
    single.set_scene(s)
    img_single = single.render()

    s2, _, _ = _tiny_scene()
    dist = DistributedPathTracerRenderer(opt)
    dist.set_scene(s2)
    img_dist = dist.render()

    assert img_dist.shape == img_single.shape
    # identical deterministic sampling per pixel -> identical images
    np.testing.assert_allclose(img_dist, img_single, atol=2e-3)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs virtual mesh")
def test_distributed_load_balancing_rebalance():
    from tauray_tpu.options import Options
    from tauray_tpu.renderer.distributed import DistributedPathTracerRenderer
    from tauray_tpu.parallel.load_balancer import LoadBalancer

    s, _, _ = _tiny_scene()
    opt = Options()
    opt.width = opt.height = 32
    opt.max_ray_depth = 2
    rr = DistributedPathTracerRenderer(opt)
    rr.set_scene(s)
    img0 = rr.render()
    n = rr.n_devices
    lb = LoadBalancer(n)
    # pretend device 0 is slow
    times = [0.3] + [0.1] * (n - 1)
    lb.update(rr, times=times)
    rr.reset_accumulation()
    img1 = rr.render()
    assert np.isfinite(img1).all()
    # workloads shifted away from device 0
    assert rr.workloads[0] < 1.0 / n
    # rebalanced frame still covers the full image (finite everywhere and
    # mean in the same ballpark)
    assert abs(float(np.nanmean(img1)) -
               float(np.nanmean(img0))) < 0.25 * max(
        float(np.nanmean(img0)), 1e-3)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs virtual mesh")
def test_fake_devices_multiplies_workloads():
    """--fake-devices=N: N logical workloads per physical device run the
    full distribution/stitch path (reference: SURVEY.md §4 fake-devices
    test mode) and still reproduce the single-device image."""
    from tauray_tpu.options import Options
    from tauray_tpu.renderer.rt_renderer import PathTracerRenderer
    from tauray_tpu.renderer.distributed import DistributedPathTracerRenderer

    s, arrays, _ = _tiny_scene()
    opt = Options()
    opt.width = opt.height = 32
    opt.max_ray_depth = 2
    opt.tonemap = "linear"
    opt.fake_devices = 2

    dist = DistributedPathTracerRenderer(opt)
    assert dist.n_devices == 2 * len(jax.devices())
    dist.set_scene(s)
    img_fake = dist.render()

    s2, _, _ = _tiny_scene()
    opt2 = Options()
    opt2.width = opt2.height = 32
    opt2.max_ray_depth = 2
    opt2.tonemap = "linear"
    single = PathTracerRenderer(opt2)
    single.set_scene(s2)
    img_single = single.render()
    np.testing.assert_allclose(img_fake, img_single, atol=2e-3)


def test_view_sharded_multiview_matches_single_device():
    """Camera-grid views shard across the mesh (reference:
    src/restir_renderer.cc:84-106 view->GPU mapping); the distributed
    result must match a single-device render of the same views."""
    import jax
    import numpy as np
    from tauray_tpu.options import Options
    from tauray_tpu.renderer.distributed import \
        DistributedPathTracerRenderer
    from tauray_tpu.renderer.rt_renderer import PathTracerRenderer
    from tauray_tpu.scene.camera import Camera
    from tauray_tpu.scene.transformable import Transformable
    from test_pt_radiance import _floor_scene

    s = _floor_scene()
    base = next(e for e in s.entities if e.camera is not None)
    for k in range(7):     # 8 views total
        e = s.add(f"cam{k}")
        e.transform = Transformable(
            position=np.asarray(base.transform.position) +
            np.array([0.05 * (k + 1), 0, 0], np.float32))
        e.camera = Camera()
        e.camera.perspective(60, 1.0, 0.1, 100.0)
        e.camera_enabled = True

    opt = Options()
    opt.width = opt.height = 16
    opt.tonemap = "linear"
    opt.max_ray_depth = 2
    opt.distribution_strategy = "shuffled-strips"

    rd = DistributedPathTracerRenderer(opt)
    rd.set_scene(s)
    assert rd.view_sharded, "8 views over the mesh must view-shard"
    img_d = rd.render()

    rs = PathTracerRenderer(opt)
    rs.set_scene(s)
    img_s = rs.render()
    got = np.asarray(img_d)
    want = np.asarray(img_s).reshape(got.shape)
    assert np.allclose(got, want, rtol=1e-4, atol=1e-4), \
        np.abs(got - want).max()


def test_load_balancer_converges_on_skew():
    """Effectiveness against a real skew (VERDICT r4 ask #8): device 0 is
    3x slower; the EMA balancer must drive the per-device times together
    (reference: src/load_balancer.cc:12-32 — workloads track speeds so
    measured times equalize). The device model is times_i = w_i / speed_i
    (time proportional to assigned pixels over throughput)."""
    from tauray_tpu.parallel.load_balancer import LoadBalancer

    n = 8
    speeds = [1.0] + [3.0] * (n - 1)

    class _R:
        workloads = None

        def set_device_workloads(self, w):
            self.workloads = list(w)

    rr = _R()
    lb = LoadBalancer(n)
    times = None
    for _ in range(60):   # EMA alpha=0.1 -> ~matches reference cadence
        times = [w / s for w, s in zip(lb.workloads, speeds)]
        lb.update(rr, times=times)
    times = [w / s for w, s in zip(lb.workloads, speeds)]
    assert max(times) / min(times) < 1.15, times
    # workloads ended proportional to speeds
    want = [s / sum(speeds) for s in speeds]
    for w, want_w in zip(lb.workloads, want):
        assert abs(w - want_w) / want_w < 0.15, (lb.workloads, want)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs virtual mesh")
def test_sh_bake_sharded_matches_single_device():
    """DSHGI probe bake sharded over the mesh (VERDICT r4 ask #6): the
    probe axis is embarrassingly parallel and seeds are keyed on
    (probe, sample, grid, frame), so the mesh bake must match the
    single-device bake exactly (reference analogue: per-device work
    mapping, src/restir_renderer.cc:84-106). Uses the tiny procedural
    scene with an SH grid attached so the CPU-mesh run stays fast."""
    from tauray_tpu.options import parse_command_line_options
    from tauray_tpu.renderer.rt_renderer import PathTracerRenderer
    from tauray_tpu.renderer.sh_renderer import SHRenderer
    from tauray_tpu.scene.sh_grid import SHGrid

    s, arrays, _ = _tiny_scene()
    opt = parse_command_line_options([
        "--renderer=dshgi", "--width=16", "--height=16",
        "--samples-per-probe=8", "--max-ray-depth=2",
        "--headless=unused", "--filetype=none", "unused.glb"])
    # attach a 2x2x2 probe grid (like the reference's TR_data volumes)
    from tauray_tpu.scene.transformable import Transformable
    ge = s.add("probes")
    ge.transform = Transformable()
    ge.sh_grid = SHGrid(resolution=(2, 2, 2), order=2)
    # any host renderer works: the bake only needs scene tables + tracer
    host = PathTracerRenderer(opt)
    host.set_scene(s)

    sh_multi = SHRenderer(opt)
    assert sh_multi.mesh is not None and sh_multi.mesh.devices.size > 1
    sh_multi.step(host)
    multi = [np.asarray(c) for c, _ in sh_multi.grid_payloads()]
    assert multi, "scene has no SH grids"

    sh_single = SHRenderer(opt)
    sh_single.mesh = None           # force the single-device bake
    sh_single.step(host)
    single = [np.asarray(c) for c, _ in sh_single.grid_payloads()]

    assert len(multi) == len(single)
    for m, sgl in zip(multi, single):
        np.testing.assert_allclose(m, sgl, rtol=1e-5, atol=1e-6)
