import numpy as np
import pytest

from tauray_tpu.parallel import distribution as D


@pytest.mark.parametrize("strategy", [D.SCANLINE, D.SHUFFLED_STRIPS])
@pytest.mark.parametrize("n_dev", [2, 3, 8])
def test_full_frame_coverage(strategy, n_dev):
    """Union of all devices' pixels covers the frame exactly once
    (the permutation round-trip SURVEY.md §4 asks for)."""
    size = (64, 48)
    total = size[0] * size[1]
    max_count = D.get_distribution_max_count(size, strategy, n_dev)
    seen = np.zeros(total, np.int32)
    cumulative = 0.0
    for i in range(n_dev):
        ratio = 1.0 / n_dev
        p = D.get_device_distribution_params(size, strategy, cumulative,
                                             ratio, i, n_dev, i == 0)
        if strategy == D.SHUFFLED_STRIPS:
            cumulative += ratio
        pix, valid, lin = D.device_pixel_positions(p, max_count)
        np.add.at(seen, lin[valid], 1)
    assert (seen == 1).all()


def test_uneven_workloads_cover():
    size = (128, 128)
    total = size[0] * size[1]
    weights = [0.1, 0.55, 0.35]
    seen = np.zeros(total, np.int32)
    cumulative = 0.0
    for i, w in enumerate(weights):
        p = D.get_device_distribution_params(size, D.SHUFFLED_STRIPS,
                                             cumulative, w, i, 3, i == 0)
        cumulative += w
        pix, valid, lin = D.device_pixel_positions(p, total)
        np.add.at(seen, lin[valid], 1)
    assert (seen == 1).all()


def test_permute_region_bijective():
    size = (64, 64)
    b = D.calculate_shuffled_strips_b(size)
    i = np.arange(size[0] * size[1], dtype=np.uint32)
    j = np.asarray(D.permute_region_id(i, size, b))
    valid = j < size[0] * size[1]
    assert len(np.unique(j[valid])) == valid.sum()
    # all frame pixels are reachable
    assert valid.sum() == size[0] * size[1]


def test_stitch_scatter():
    import jax.numpy as jnp
    size = (8, 4)  # w, h
    total = 32
    chunks = np.arange(2 * 16 * 1, dtype=np.float32).reshape(2, 16, 1)
    lin = np.stack([np.arange(16), np.arange(16, 32)]).astype(np.int32)
    valid = np.ones((2, 16), bool)
    out = np.asarray(D.stitch((size[1], size[0]), jnp.asarray(chunks),
                              jnp.asarray(lin), jnp.asarray(valid)))
    assert out.shape == (4, 8, 1)
    assert (out.reshape(-1) == np.arange(32)).all()


def test_stitch_blend_ratio():
    import jax.numpy as jnp
    chunks = np.ones((1, 8, 1), np.float32)
    lin = np.arange(8, dtype=np.int32)[None]
    valid = np.ones((1, 8), bool)
    old = np.zeros((2, 4, 1), np.float32)
    out = np.asarray(D.stitch((2, 4), jnp.asarray(chunks), jnp.asarray(lin),
                              jnp.asarray(valid), jnp.asarray(old), 0.25))
    assert np.allclose(out, 0.25)


def test_load_balancer_ema():
    from tauray_tpu.parallel.load_balancer import LoadBalancer

    class _R:
        def set_device_workloads(self, w):
            self.w = w

    lb = LoadBalancer(2)
    r = _R()
    # device 0 twice as slow -> workload shifts toward device 1
    w = lb.update(r, times=[0.2, 0.1])
    assert w[1] > w[0]
    assert abs(sum(w) - 1.0) < 1e-6
