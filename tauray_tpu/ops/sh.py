"""Real spherical harmonics basis, order <= 4
(reference: shader/spherical_harmonics.glsl, src/sh_grid.hh).

Used by the SH probe path tracer (probe radiance projection) and the
raster renderer's indirect lookup."""

from __future__ import annotations

import math

import jax.numpy as jnp


def sh_basis(dirs, order: int):
    """dirs: (..., 3) normalized. Returns (..., (order+1)^2) SH basis values
    in the standard real-SH ordering (l, m): (0,0), (1,-1), (1,0), (1,1)...
    """
    x = dirs[..., 0]
    y = dirs[..., 1]
    z = dirs[..., 2]
    out = [jnp.full(x.shape, 0.2820947917738781)]  # Y00
    if order >= 1:
        out += [-0.48860251190291987 * y,
                0.48860251190291987 * z,
                -0.48860251190291987 * x]
    if order >= 2:
        out += [1.0925484305920792 * x * y,
                -1.0925484305920792 * y * z,
                0.31539156525252005 * (3 * z * z - 1),
                -1.0925484305920792 * x * z,
                0.5462742152960396 * (x * x - y * y)]
    if order >= 3:
        out += [
            -0.5900435899266435 * y * (3 * x * x - y * y),
            2.890611442640554 * x * y * z,
            -0.4570457994644658 * y * (5 * z * z - 1),
            0.3731763325901154 * z * (5 * z * z - 3),
            -0.4570457994644658 * x * (5 * z * z - 1),
            1.445305721320277 * z * (x * x - y * y),
            -0.5900435899266435 * x * (x * x - 3 * y * y)]
    if order >= 4:
        x2, y2, z2 = x * x, y * y, z * z
        out += [
            2.5033429417967046 * x * y * (x2 - y2),
            -1.7701307697799304 * y * z * (3 * x2 - y2),
            0.9461746957575601 * x * y * (7 * z2 - 1),
            -0.6690465435572892 * y * z * (7 * z2 - 3),
            0.10578554691520431 * (35 * z2 * z2 - 30 * z2 + 3),
            -0.6690465435572892 * x * z * (7 * z2 - 3),
            0.47308734787878004 * (x2 - y2) * (7 * z2 - 1),
            -1.7701307697799304 * x * z * (x2 - y2),
            0.6258357354491761 * (x2 * x2 - 6 * x2 * y2 + y2 * y2)]
    return jnp.stack(out, axis=-1)


def project_radiance(dirs, radiance, order: int):
    """MC projection of sampled radiance onto SH: coefficients (..., C, 3).
    dirs (N, 3) uniform-sphere samples; radiance (N, 3)."""
    basis = sh_basis(dirs, order)                 # (N, C)
    w = 4.0 * math.pi / dirs.shape[0]
    return jnp.einsum("nc,nk->ck", basis, radiance) * w


def eval_irradiance(coefficients, normal, order: int):
    """Lambertian irradiance from SH radiance coefficients
    (standard cosine-lobe convolution weights A_l)."""
    A = [math.pi, 2.0 * math.pi / 3.0, math.pi / 4.0, 0.0, -math.pi / 24.0]
    basis = sh_basis(normal, order)              # (..., C)
    weights = []
    for l in range(order + 1):
        weights += [A[l]] * (2 * l + 1)
    w = jnp.asarray(weights)
    # coefficients: (..., C, 3), broadcast against (..., C)
    return jnp.sum(basis[..., None] * coefficients * w[:, None],
                   axis=-2) / math.pi
