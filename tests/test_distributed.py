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
