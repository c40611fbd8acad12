import numpy as np
import pytest

from tauray_tpu.ops import sampling as S


def _rand(n, d, seed=0):
    return np.random.default_rng(seed).random((n, d)).astype(np.float32)


def test_concentric_disk_in_unit_disk():
    d = np.asarray(S.sample_concentric_disk(_rand(4096, 2)))
    r = np.linalg.norm(d, axis=-1)
    assert (r <= 1.0 + 1e-6).all()
    # roughly uniform: mean radius of uniform disk = 2/3
    assert abs(r.mean() - 2 / 3) < 0.02


def test_cosine_hemisphere_distribution():
    d = np.asarray(S.sample_cosine_hemisphere(_rand(8192, 2)))
    assert (d[:, 2] >= 0).all()
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # E[cos theta] = 2/3 for cosine-weighted hemisphere
    assert abs(d[:, 2].mean() - 2 / 3) < 0.02


def test_sphere_uniform():
    d = np.asarray(S.sample_sphere(_rand(8192, 2)))
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    assert np.abs(d.mean(axis=0)).max() < 0.03


def test_cone_within_cutoff():
    dirs = np.tile(np.array([[0, 0, 1.0]], np.float32), (4096, 1))
    cutoff = np.full(4096, np.cos(0.3), np.float32)
    d = np.asarray(S.sample_cone(_rand(4096, 2), dirs, cutoff))
    cos = d[:, 2]
    assert (cos >= np.cos(0.3) - 1e-5).all()
    # uniform in cos within the cone
    assert abs(cos.mean() - (1 + np.cos(0.3)) / 2) < 0.01


def test_spherical_triangle_solid_angle_octant():
    # +x,+y,+z octant spans 4*pi/8 steradians
    A = np.array([[1.0, 0, 0]], np.float32)
    B = np.array([[0, 1.0, 0]], np.float32)
    C = np.array([[0, 0, 1.0]], np.float32)
    sa = float(np.asarray(S.spherical_triangle_solid_angle(A, B, C))[0])
    assert abs(sa - 4 * np.pi / 8) < 1e-5


def test_sample_spherical_triangle_pdf_consistency():
    A = np.tile(np.array([[2.0, 0.1, 0.1]], np.float32), (2048, 1))
    B = np.tile(np.array([[0.1, 2.0, 0.1]], np.float32), (2048, 1))
    C = np.tile(np.array([[0.1, 0.1, 2.0]], np.float32), (2048, 1))
    d, pdf = S.sample_spherical_triangle(_rand(2048, 2), A, B, C)
    d = np.asarray(d)
    pdf = np.asarray(pdf)
    sa = float(np.asarray(S.spherical_triangle_solid_angle(
        S.normalize(A[:1]), S.normalize(B[:1]), S.normalize(C[:1])))[0])
    assert np.allclose(pdf, 1.0 / sa, rtol=1e-4)
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
    # samples lie inside the spherical triangle: positive barycentric-ish
    # check via the plane normals of the great circles
    for P, Q in ((A, B), (B, C), (C, A)):
        n = np.cross(P[0], Q[0])
        n /= np.linalg.norm(n)
        assert (d @ n > -1e-3).all()


def test_blackman_harris_range():
    u = np.linspace(0.001, 0.999, 500, dtype=np.float32)
    s = np.asarray(S.sample_blackman_harris(u))
    assert (s > -0.05).all() and (s < 1.05).all()
    # symmetric around 0.5
    assert abs(float(s[250]) - 0.5) < 0.02


def test_tangent_space_orthonormal():
    n = np.asarray(S.normalize(_rand(256, 3) * 2 - 1))
    t, b, nn = S.create_tangent_space(n)
    t, b = np.asarray(t), np.asarray(b)
    assert np.abs((t * n).sum(-1)).max() < 1e-5
    assert np.abs((t * b).sum(-1)).max() < 1e-5
    assert np.allclose(np.linalg.norm(t, axis=-1), 1, atol=1e-5)


def test_barycentric_roundtrip():
    rng = np.random.default_rng(3)
    A, B, C = (rng.random((64, 3)).astype(np.float32) for _ in range(3))
    w = rng.random((64, 3)).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    p = w[:, 0:1] * A + w[:, 1:2] * B + w[:, 2:3] * C
    got = np.asarray(S.get_barycentric_coords(p, A, B, C))
    assert np.allclose(got, w, atol=1e-3)
