"""Alpha-tested ray traversal.

The reference handles alpha-masked/blended materials in any-hit shaders:
closest-hit queries skip texels with albedo.a <= cutoff (deterministic
1e-4 cutoff for feature/AOV rays, a per-ray uniform random cutoff for path
tracing — stochastic transparency; reference: shader/rt_feature.rahit,
shader/rt_common.rahit, shader/rt.glsl is_material_skippable).

TPU formulation: trace, evaluate alpha at hits on transparency-capable
instances, and re-trace skipped rays with t_min advanced past the hit.
Fixed round count keeps shapes static; rounds only cost when alpha
materials are actually hit.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..scene.device import DeviceScene
from .intersect import RAY_MAX_DIST, Hit


def _hit_alpha(scene: DeviceScene, tri_id, u, v, o=None, d=None,
               recompute_uv: bool = False):
    """albedo.a at a hit (reference: shader/rt.glsl is_material_skippable:
    albedo_factor.a * albedo_texture.a). Two row gathers + one texture
    block gather. recompute_uv: barycentrics from the gathered row + ray
    (pairs with need_uv=False traces)."""
    from ..scene.device import (IP_ALBEDO, IP_TEX, IP_TEXBLOCK,
                                IP_TEXSIZE, TP_IP, TP_UV)
    from .shading import bary_from_row, sample_texture_quad
    tid = jnp.maximum(tri_id, 0)
    g = scene.tri_packed[tid]
    if recompute_uv:
        u, v = bary_from_row(g, o, d)
    b0 = (1.0 - u - v)[:, None]
    uv = (g[:, TP_UV:TP_UV + 2] * b0 +
          g[:, TP_UV + 2:TP_UV + 4] * u[:, None] +
          g[:, TP_UV + 4:TP_UV + 6] * v[:, None])
    m = g[:, TP_IP:]
    a_factor = m[:, IP_ALBEDO + 3]
    tex_a = sample_texture_quad(
        scene, m[:, IP_TEX].astype(jnp.int32),
        m[:, IP_TEXSIZE:IP_TEXSIZE + 2], uv,
        block=m[:, IP_TEXBLOCK:IP_TEXBLOCK + 2])[:, 3]
    return a_factor * tex_a


def trace_alpha(scene: DeviceScene, tracer, origins, dirs, t_min, t_max,
                alpha_cutoff, has_alpha_materials: bool,
                any_hit: bool = False, rounds: int = 2,
                sort: bool = False, need_uv: bool = True) -> Hit:
    """Closest-hit (or shadow any-hit) trace with alpha skipping.

    alpha_cutoff: scalar or (R,) per-ray cutoff; hits with
    albedo.a <= cutoff are transparent and skipped. sort: reorder by the
    (direction, origin-morton) coherence key before tiling (incoherent
    bounce/shadow waves)."""
    hit = tracer.trace(origins, dirs, t_min, t_max, any_hit=any_hit,
                       sort_rays=sort, need_uv=need_uv)
    if not has_alpha_materials:
        return hit
    cutoff = jnp.broadcast_to(jnp.asarray(alpha_cutoff, jnp.float32),
                              hit.t.shape)
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), hit.t.shape)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), hit.t.shape)
    for _ in range(rounds):
        valid = hit.tri_id >= 0
        inst = jnp.maximum(scene.tri_instance[jnp.maximum(hit.tri_id, 0)], 0)
        may_skip = valid & scene.inst_has_alpha[inst]
        alpha = _hit_alpha(scene, hit.tri_id, hit.u, hit.v, origins, dirs,
                           recompute_uv=not need_uv)
        skip = may_skip & (alpha <= cutoff)
        # re-trace skipped rays past the transparent hit; everyone else
        # gets t_max=0 so the traversal kernel resolves them in 0 steps
        new_tmin = jnp.where(skip, hit.t * (1 + 1e-5) + 1e-6, t_min)
        new_tmax = jnp.where(skip, t_max, 0.0)
        rehit = tracer.trace(origins, dirs, new_tmin, new_tmax,
                             any_hit=any_hit, need_uv=need_uv)
        hit = Hit(
            t=jnp.where(skip, rehit.t, hit.t),
            tri_id=jnp.where(skip, rehit.tri_id, hit.tri_id),
            u=jnp.where(skip, rehit.u, hit.u),
            v=jnp.where(skip, rehit.v, hit.v))
    return hit


def shadow_visibility_alpha(scene: DeviceScene, tracer, origins, dirs,
                            t_min, t_max, alpha_cutoff,
                            has_alpha_materials: bool,
                            rounds: int = 2) -> jnp.ndarray:
    hit = trace_alpha(scene, tracer, origins, dirs, t_min, t_max,
                      alpha_cutoff, has_alpha_materials, any_hit=True,
                      rounds=rounds)
    return jnp.where(hit.tri_id < 0, 1.0, 0.0)
