"""Counter-based RNG matching the reference bit-for-bit.

pcg / pcg2d / pcg3d / pcg4d hashes (reference: shader/math.glsl:74-120,
from jcgt.org/published/0009/03/02) and the random_sampler seeding scheme
(reference: shader/random_sampler.glsl:11-43). Bit-exactness matters: the
reference's golden images are deterministic in these integer streams, and
its checkpoint/resume scheme relies on replayable per-sample seeds
(reference: shader/path_tracer.rgen:90-96).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INV_UINT32_MAX = 2.3283064365386963e-10  # (reference: shader/math.glsl:10)

_U = jnp.uint32


def _u32(x):
    return jnp.asarray(x, dtype=jnp.uint32)


def pcg(seed):
    """One PCG step; returns (new_seed, value) where value == new_seed."""
    seed = _u32(seed)
    seed = seed * _U(747796405) + _U(2891336453)
    seed = ((seed >> ((seed >> _U(28)) + _U(4))) ^ seed) * _U(277803737)
    seed = (seed >> _U(22)) ^ seed
    return seed


def pcg2d(seed):
    """seed: (..., 2) uint32."""
    seed = _u32(seed)
    seed = seed * _U(1664525) + _U(1013904223)
    seed = seed + seed[..., ::-1] * _U(1664525)
    seed = (seed >> _U(16)) ^ seed
    seed = seed + seed[..., ::-1] * _U(1664525)
    seed = (seed >> _U(16)) ^ seed
    return seed


def pcg3d(seed):
    """seed: (..., 3) uint32."""
    seed = _u32(seed)
    seed = seed * _U(1664525) + _U(1013904223)
    yzx = seed[..., (1, 2, 0)]
    zxy = seed[..., (2, 0, 1)]
    seed = seed + yzx * zxy
    seed = (seed >> _U(16)) ^ seed
    yzx = seed[..., (1, 2, 0)]
    zxy = seed[..., (2, 0, 1)]
    seed = seed + yzx * zxy
    return seed


def pcg4d(seed):
    """seed: (..., 4) uint32 -> hashed (..., 4) uint32."""
    seed = _u32(seed)
    seed = seed * _U(1664525) + _U(1013904223)
    seed = seed + seed[..., (1, 2, 0, 1)] * seed[..., (3, 0, 1, 2)]
    seed = (seed >> _U(16)) ^ seed
    seed = seed + seed[..., (1, 2, 0, 1)] * seed[..., (3, 0, 1, 2)]
    return seed


def init_random_sampler(coord):
    """coord: (..., 4) uint32 (pixel.xy, viewport+rng_seed, sample index)
    (reference: shader/random_sampler.glsl init_random_sampler)."""
    coord = _u32(coord)
    x = coord[..., 0]
    y = coord[..., 1] ^ pcg(x)
    z = coord[..., 2] ^ pcg(y)
    w = coord[..., 3] ^ pcg(z)
    return jnp.stack([x, y, z, w], axis=-1)


def generate_uniform_random_uint(seed):
    """Advance the sampler: returns (new_seed, uvec4). The reference's
    inout-seed pcg4d both mutates and returns; here new_seed == value."""
    v = pcg4d(seed)
    return v, v


def uint_to_float(u):
    return u.astype(jnp.float32) * jnp.float32(INV_UINT32_MAX)


def generate_uniform_random(seed):
    v, _ = generate_uniform_random_uint(seed)
    return v, uint_to_float(v)
