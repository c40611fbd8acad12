import numpy as np
import pytest

from tauray_tpu.stages.tonemap import tonemap
from tauray_tpu.ops import sh as sh_ops
from tauray_tpu.ops.sampling import sample_sphere


def test_tonemap_linear_identity():
    img = np.random.default_rng(0).random((4, 4, 4)).astype(np.float32) * 3
    out = np.asarray(tonemap(img, "linear", 1.0, 2.2))
    np.testing.assert_allclose(out, img, rtol=1e-6)


def test_tonemap_filmic_known_values():
    # Hejl filmic with the shared gamma pass (reference:
    # shader/tonemap_filmic.comp + tonemap.glsl)
    img = np.zeros((1, 1, 4), np.float32)
    img[0, 0] = [1.0, 0.0, 1000.0, 1.0]
    out = np.asarray(tonemap(img, "filmic", 1.0, 2.2))[0, 0]
    c = 1.0 - 0.004
    want_r = (((c * (6.2 * c + 0.5)) / (c * (6.2 * c + 1.7) + 0.06)) **
              2.2) ** (1 / 2.2)
    assert abs(out[0] - want_r) < 1e-4
    assert out[1] == 0.0
    assert out[2] < 1.0


def test_tonemap_exposure():
    img = np.full((1, 1, 4), 0.5, np.float32)
    out2 = np.asarray(tonemap(img, "linear", 2.0, 2.2))
    assert abs(out2[0, 0, 0] - 1.0) < 1e-6
    assert out2[0, 0, 3] == 0.5  # alpha untouched


def test_sh_basis_orthonormal():
    rng = np.random.default_rng(0)
    d = np.asarray(sample_sphere(rng.random((1 << 14, 2)).astype(np.float32)))
    B = np.asarray(sh_ops.sh_basis(d, 2))  # (N, 9)
    gram = B.T @ B * (4 * np.pi / len(d))
    np.testing.assert_allclose(gram, np.eye(9), atol=0.06)


def test_sh_constant_radiance_irradiance():
    # constant radiance L: only Y00 coefficient; irradiance/pi == L
    rng = np.random.default_rng(1)
    d = np.asarray(sample_sphere(rng.random((1 << 13, 2)).astype(np.float32)))
    L = np.full((len(d), 3), 2.0, np.float32)
    coef = np.asarray(sh_ops.project_radiance(d, L, 2))
    n = np.array([[0, 0, 1.0]], np.float32)
    E = np.asarray(sh_ops.eval_irradiance(coef, n, 2))[0]
    np.testing.assert_allclose(E, 2.0, rtol=0.05)


def test_alias_table_sampling_distribution():
    """Alias-table sampling reproduces the importance distribution
    (reference: src/environment_map.cc build + shader/rt.glsl sampling)."""
    from tauray_tpu.scene.environment_map import build_alias_table
    rng = np.random.default_rng(2)
    imp = rng.random(64) + 0.01
    norm = imp / imp.mean()
    alias_id, prob = build_alias_table(norm.copy())
    # sample like the shader: pick i uniform, use alias with prob
    N = 200000
    i = rng.integers(0, 64, N)
    take_alias = rng.integers(0, 2**32, N, dtype=np.uint64) > prob[i]
    picked = np.where(take_alias, alias_id[i], i)
    hist = np.bincount(picked, minlength=64) / N
    want = norm / norm.sum()
    np.testing.assert_allclose(hist, want, atol=0.01)


def test_taa_static_scene_converges():
    from tauray_tpu.stages.taa import taa
    rng = np.random.default_rng(0)
    clean = rng.random((16, 16, 3)).astype(np.float32)
    motion = np.zeros((16, 16, 2), np.float32)
    # static identity motion: uv = pixel center
    xs, ys = np.meshgrid(np.arange(16), np.arange(16))
    motion[..., 0] = (xs + 0.5) / 16
    motion[..., 1] = 1.0 - (ys + 0.5) / 16
    depth = np.ones((16, 16), np.float32)
    hist = clean.copy()
    out, hist2 = taa(clean, hist, motion, depth, alpha=0.25,
                     edge_dilation=False)
    np.testing.assert_allclose(np.asarray(out), clean, atol=1e-3)


def test_svgf_reduces_noise():
    from tauray_tpu.stages.svgf import (SVGFParams, SVGFState, svgf_denoise)
    rng = np.random.default_rng(0)
    H = W = 32
    base = np.full((H, W, 3), 0.5, np.float32)
    noisy = base + rng.standard_normal((H, W, 3)).astype(np.float32) * 0.2
    spec = np.zeros((H, W, 3), np.float32)
    motion = np.zeros((H, W, 2), np.float32)
    xs, ys = np.meshgrid(np.arange(W), np.arange(H))
    motion[..., 0] = (xs + 0.5) / W
    motion[..., 1] = 1.0 - (ys + 0.5) / H
    normal = np.tile(np.array([0, 0, 1.0], np.float32), (H, W, 1))
    pos = np.zeros((H, W, 3), np.float32)
    pos[..., 0] = xs * 0.01
    depth = np.ones((H, W), np.float32)
    params = SVGFParams(atrous_diffuse_iter=3, atrous_spec_iter=1)
    state = SVGFState.zeros(H, W)
    d, s, state = svgf_denoise(params, state, noisy, spec, motion, normal,
                               pos, depth)
    d = np.asarray(d)
    inner = (slice(8, 24), slice(8, 24))
    assert d[inner].std() < noisy[inner].std() * 0.5
    assert abs(d[inner].mean() - 0.5) < 0.05


def test_svgf_hit_dist_reconstruction_fills_holes():
    """Zero specular hit-distances are reconstructed from planar
    neighbors with similar lobes (reference:
    shader/svgf_hit_dist_reconstruction.comp)."""
    import jax.numpy as jnp
    import numpy as np
    from tauray_tpu.stages.svgf import svgf_hit_dist_reconstruction
    H = W = 8
    spec = np.ones((H, W, 4), np.float32) * 0.25
    spec[..., 3] = 2.0
    spec[4, 4, 3] = 0.0          # hole
    normal = np.zeros((H, W, 3), np.float32)
    normal[..., 2] = 1.0
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pos = np.stack([xs * 0.1, ys * 0.1, np.zeros_like(xs)],
                   -1).astype(np.float32)
    rough = np.full((H, W), 0.3, np.float32)
    out = np.asarray(svgf_hit_dist_reconstruction(
        jnp.asarray(spec), jnp.asarray(normal), jnp.asarray(pos),
        jnp.asarray(rough), jnp.asarray([0.4, 0.4, 5.0])))
    assert abs(out[4, 4, 3] - 2.0) < 1e-3, out[4, 4, 3]
    # rgb untouched
    assert np.allclose(out[..., :3], spec[..., :3])
