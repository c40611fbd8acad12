"""Sampling primitives (reference: shader/math.glsl:200-470).

Vectorized over (R, ...) batches; formulas match the reference exactly so
its deterministic RNG streams produce the same paths."""

from __future__ import annotations

import math

import jax.numpy as jnp

M_PI = math.pi
M_1_SQRT3 = 0.57735026918962576451


def normalize(v):
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def create_tangent(normal):
    """(reference: shader/math.glsl create_tangent)"""
    ax = jnp.abs(normal[..., 0:1])
    ay = jnp.abs(normal[..., 1:2])
    ex = jnp.array([1.0, 0, 0], normal.dtype)
    ey = jnp.array([0, 1.0, 0], normal.dtype)
    ez = jnp.array([0, 0, 1.0], normal.dtype)
    major = jnp.where(ax < M_1_SQRT3, ex, jnp.where(ay < M_1_SQRT3, ey, ez))
    return normalize(jnp.cross(normal, major))


def create_tangent_space(normal):
    """Returns (tangent, bitangent, normal) basis rows; tangent-space z is
    the normal (reference: shader/math.glsl create_tangent_space)."""
    t = create_tangent(normal)
    b = jnp.cross(normal, t)
    return t, b, normal


def to_tangent_space(v, t, b, n):
    """world -> tangent (v * tbn in GLSL)."""
    return jnp.stack([jnp.sum(v * t, -1), jnp.sum(v * b, -1),
                      jnp.sum(v * n, -1)], axis=-1)


def from_tangent_space(v, t, b, n):
    """tangent -> world (tbn * v in GLSL)."""
    return v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * n


def view_to_tangent_space(view, t, b, n):
    """(reference: shader/math.glsl view_to_tangent_space)"""
    tview = to_tangent_space(-view, t, b, n)
    z = jnp.maximum(tview[..., 2], 1e-5)
    tview = jnp.concatenate([tview[..., :2], z[..., None]], axis=-1)
    return normalize(tview)


def sample_concentric_disk(u):
    """(reference: shader/math.glsl sample_concentric_disk)"""
    uo = 2.0 * u - 1.0
    abs_uo = jnp.abs(uo)
    zero = jnp.all(abs_uo < 0.0001, axis=-1, keepdims=True)
    x_major = abs_uo[..., 0] > abs_uo[..., 1]
    safe = jnp.where(jnp.abs(uo) < 1e-12, 1e-12, uo)
    r = jnp.where(x_major, uo[..., 0], uo[..., 1])
    theta = jnp.where(x_major,
                      M_PI / 4 * (uo[..., 1] / safe[..., 0]),
                      M_PI / 2 - M_PI / 4 * (uo[..., 0] / safe[..., 1]))
    d = r[..., None] * jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    return jnp.where(zero, 0.0, d)


def sample_blackman_harris(u):
    """(reference: shader/math.glsl sample_blackman_harris) — polynomial
    approximation of the inverse CDF."""
    flip = u > 0.5
    u = jnp.where(flip, 1.0 - u, u)
    powers = jnp.stack([u ** 0.5, u ** (1.0 / 3.0), u ** 0.25, u ** 0.2],
                       axis=-1)
    coef = jnp.array([-0.33518669, -0.51620529, 1.87406934, -0.66315464])
    s = 0.29627329 * u + jnp.sum(powers * coef, axis=-1)
    return jnp.where(flip, 1.0 - s, s)


def sample_blackman_harris_concentric_disk(u):
    """(reference: shader/math.glsl sample_blackman_harris_concentric_disk)"""
    uo = 2.0 * u - 1.0
    abs_uo = jnp.abs(uo)
    zero = jnp.all(abs_uo < 0.0001, axis=-1, keepdims=True)
    x_major = abs_uo[..., 0] > abs_uo[..., 1]
    safe = jnp.where(jnp.abs(uo) < 1e-12, 1e-12, uo)
    rt_x = jnp.where(x_major, u[..., 0], u[..., 1])
    theta = jnp.where(x_major,
                      M_PI / 4 * (uo[..., 1] / safe[..., 0]),
                      M_PI / 2 - M_PI / 4 * (uo[..., 0] / safe[..., 1]))
    r = 2.0 * sample_blackman_harris(rt_x) - 1.0
    d = r[..., None] * jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    return jnp.where(zero, 0.0, d)


def sample_regular_polygon(u, angle, sides):
    """(reference: shader/math.glsl sample_regular_polygon). angle/sides
    may be per-ray arrays."""
    sides = jnp.maximum(sides, 3.0)
    side = jnp.floor(u[..., 0] * sides)
    ux = u[..., 0] * sides - side
    uy = u[..., 1]
    side_radians = (2.0 * M_PI) / sides
    a1 = side_radians * side + angle
    a2 = side_radians * (side + 1) + angle
    b = jnp.stack([jnp.sin(a1), jnp.cos(a1)], axis=-1)
    c = jnp.stack([jnp.sin(a2), jnp.cos(a2)], axis=-1)
    flip = (ux + uy > 1)[..., None]
    ux = jnp.where(flip[..., 0], 1 - ux, ux)
    uy = jnp.where(flip[..., 0], 1 - uy, uy)
    return b * ux[..., None] + c * uy[..., None]


def sample_cosine_hemisphere(u):
    d = sample_concentric_disk(u)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - jnp.sum(d * d, -1)))
    return jnp.concatenate([d, z[..., None]], axis=-1)


def pdf_cosine_hemisphere(dir):
    return jnp.maximum(dir[..., 2], 0.0) * (1.0 / M_PI)


def sample_sphere(u):
    cos_theta = 2 * u[..., 0] - 1
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = u[..., 1] * 2 * M_PI
    return jnp.stack([jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta,
                      cos_theta], axis=-1)


def sample_hemisphere(u):
    cos_theta = u[..., 0]
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = u[..., 1] * 2 * M_PI
    return jnp.stack([jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta,
                      cos_theta], axis=-1)


def sample_cone(u, dir, cos_theta_min):
    """(reference: shader/math.glsl sample_cone)"""
    cos_theta = 1.0 + (cos_theta_min - 1.0) * u[..., 0]
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = u[..., 1] * 2 * M_PI
    t, b, n = create_tangent_space(dir)
    local = jnp.stack([jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta,
                       cos_theta], axis=-1)
    o = from_tangent_space(local, t, b, n)
    bad = jnp.sum(o * dir, -1) <= cos_theta_min
    return jnp.where(bad[..., None], dir, o)


# -- triangle light sampling (reference: shader/math.glsl:360-460) ----------

def sample_triangle_area(u, A, B, C):
    alpha = u[..., 0]
    beta = u[..., 1]
    flip = alpha + beta > 1
    alpha = jnp.where(flip, 1 - alpha, alpha)
    beta = jnp.where(flip, 1 - beta, beta)
    gamma = 1 - beta - alpha
    return (alpha[..., None] * A + beta[..., None] * B + gamma[..., None] * C)


def triangle_area_pdf(p, a, b, c):
    normal = jnp.cross(a - b, a - c)
    p_dist2 = jnp.sum(p * p, -1)
    return 2.0 * p_dist2 * jnp.sqrt(p_dist2) / \
        jnp.abs(jnp.sum(normal * p, -1))


def spherical_triangle_solid_angle(nA, nB, nC):
    """(reference: shader/math.glsl determinant_accurate +
    spherical_triangle_solid_angle)"""
    div = 1.0 / jnp.sqrt(2.0 * jnp.abs(nB[..., 0]) + 2.0)
    e = jnp.where(nB[..., 0] > 0, div, -div)
    h = nB * div[..., None] + jnp.stack(
        [e, jnp.zeros_like(e), jnp.zeros_like(e)], axis=-1)
    a = nA - 2.0 * h * jnp.sum(h * nA, -1, keepdims=True)
    c = nC - 2.0 * h * jnp.sum(h * nC, -1, keepdims=True)
    det = jnp.abs(a[..., 1] * c[..., 2] - c[..., 1] * a[..., 2])
    return 2.0 * jnp.arctan2(
        det, 1.0 + jnp.sum(nA * nB, -1) + jnp.sum(nB * nC, -1) +
        jnp.sum(nA * nC, -1))


def sample_spherical_triangle(xi, A, B, C):
    """(reference: shader/math.glsl sample_spherical_triangle, after
    momentsingraphics.de/Siggraph2021). Returns (dir, pdf)."""
    nA = normalize(A)
    nB = normalize(B)
    nC = normalize(C)
    dAB = jnp.sum(nA * nB, -1)
    dBC = jnp.sum(nB * nC, -1)
    dAC = jnp.sum(nA * nC, -1)
    div = 1.0 / jnp.sqrt(2.0 * jnp.abs(nB[..., 0]) + 2.0)
    e = jnp.where(nB[..., 0] > 0, div, -div)
    h = nB * div[..., None] + jnp.stack(
        [e, jnp.zeros_like(e), jnp.zeros_like(e)], axis=-1)
    a = nA - 2.0 * h * (dAB * div + e * nA[..., 0])[..., None]
    c = nC - 2.0 * h * (dBC * div + e * nC[..., 0])[..., None]
    G0 = jnp.abs(a[..., 1] * c[..., 2] - c[..., 1] * a[..., 2])
    G1 = dAC + dBC
    G2 = 1.0 + dAB
    solid_angle = 2.0 * jnp.arctan2(G0, G1 + G2)
    pdf = 1.0 / solid_angle
    chosen_split = xi[..., 0] * solid_angle * 0.5
    r = ((G0 * jnp.cos(chosen_split) - G1 * jnp.sin(chosen_split))[..., None]
         * nA + (G2 * jnp.sin(chosen_split))[..., None] * nC)
    Ch = 2.0 * (jnp.sum(nA * r, -1) / jnp.sum(r * r, -1))[..., None] * r - nA
    d = jnp.sum(Ch * nB, -1)
    z = 1 - xi[..., 1] + d * xi[..., 1]
    st = jnp.sqrt(jnp.maximum((1.0 - z * z) / jnp.maximum(1.0 - d * d, 1e-20),
                              0.0))
    return (z - st * d)[..., None] * nB + st[..., None] * Ch, pdf


def ray_plane_intersection_dist(dir, A, B, C):
    """(reference: shader/math.glsl ray_plane_intersection_dist)"""
    n = normalize(jnp.cross(A - B, A - C))
    w = jnp.sum(A * n, -1)
    return jnp.abs(w / jnp.sum(n * dir, -1))


def get_barycentric_coords(p, A, B, C):
    ba = B - A
    ca = C - A
    pa = p - A
    bb = jnp.sum(ba * ba, -1)
    bc = jnp.sum(ba * ca, -1)
    cc = jnp.sum(ca * ca, -1)
    pb = jnp.sum(pa * ba, -1)
    pc = jnp.sum(pa * ca, -1)
    denom = 1.0 / (bb * cc - bc * bc)
    y = (cc * pb - bc * pc) * denom
    z = (bb * pc - bc * pb) * denom
    return jnp.stack([1.0 - y - z, y, z], axis=-1)
