"""ReSTIR GI: path-space reservoirs with the reference's three shift
mappings (reference: src/restir_stage.cc + shader/restir_core.glsl
shift_map() reconnection-shift restir_core.glsl:1514, random-replay
restir_core.glsl:1645, hybrid restir_core.glsl:1695,1880).

TPU-first design notes
----------------------
* A path sample is stored as (rng seed, reconnection vertex data): the
  seed alone reproduces the whole path (random replay shift is exact
  primary-sample-space reuse, Jacobian 1), while the reconnection data
  lets the reconnection shift re-evaluate a neighbor's path suffix with
  two BSDF evaluations + one geometric Jacobian — no retracing.
* The suffix light estimate at the reconnection vertex splits into a
  direction-independent part (emission + NEE with its own pdf folded in)
  and the BSDF factors at both reconnection endpoints, which are
  re-evaluated per receiving pixel (the reference exposes the analogous
  approximation as restir.assume-unchanged-reconnection-radiance,
  src/options.hh restir struct).
* Suffix estimator convention: NEE samples all enabled strategies; BSDF
  continuation rays carry only non-emissive transport (emission on
  suffix hits is dropped so NEE and BSDF techniques stay disjoint —
  deterministic technique choice, unbiased, no per-vertex MIS needed).
* Everything is one jitted program per frame; replay shifts batch all
  pixels' retraces into the same wavefront trace waves.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import rng as rng_ops
from ..ops.ggx import material_bsdf_pdf, material_bsdf_sample, modulate_bsdf
from ..ops.lights import environment_radiance
from ..ops.sampling import (create_tangent_space, from_tangent_space,
                            to_tangent_space)
from ..ops.shading import (SampledMaterial, interpolate_vertex,
                           rgb_to_luminance, sample_material)
from ..ops.trace_utils import trace_alpha
from ..scene.device import DeviceScene
from .restir import _eval_light_sample

M_PI = math.pi

RC_NONE = 0     # no valid path (absorbed / zero throughput)
RC_SURF = 1     # reconnection vertex is a surface hit
RC_ENV = 2      # first bounce escaped to the environment


class PathReservoir(NamedTuple):
    """Per-pixel path reservoir; (H, W, ...) arrays (reference packs the
    same data in ris_data/reconnection_data/reconnection_radiance/
    rng_seeds textures, restir_stage.hh:230-270)."""
    seed: jnp.ndarray       # (H, W, 4) u32 path seed (random replay)
    rc_kind: jnp.ndarray    # (H, W) i32 RC_*
    rc_pos: jnp.ndarray     # (H, W, 3) x1 position (or escape direction)
    rc_normal: jnp.ndarray  # (H, W, 3)
    rc_alb: jnp.ndarray     # (H, W, 4) albedo+alpha at x1
    rc_mr: jnp.ndarray      # (H, W, 2) metallic/roughness at x1
    rc_emit: jnp.ndarray    # (H, W, 3) Le(x1) (RC_SURF) or env radiance
    rc_nee_dir: jnp.ndarray  # (H, W, 3) NEE direction at x1
    rc_nee_L: jnp.ndarray    # (H, W, 3) NEE Le*vis/pdf at x1
    rc_in_dir: jnp.ndarray   # (H, W, 3) continuation direction at x1
    rc_in_L: jnp.ndarray     # (H, W, 3) suffix radiance / pdf from there
    w_sum: jnp.ndarray       # (H, W)
    M: jnp.ndarray           # (H, W)
    target_p: jnp.ndarray    # (H, W)

    @staticmethod
    def empty(H, W):
        z = jnp.zeros((H, W), jnp.float32)
        z3 = jnp.zeros((H, W, 3), jnp.float32)
        return PathReservoir(
            jnp.zeros((H, W, 4), jnp.uint32),
            jnp.zeros((H, W), jnp.int32), z3, z3,
            jnp.zeros((H, W, 4), jnp.float32),
            jnp.zeros((H, W, 2), jnp.float32),
            z3, z3, z3, z3, z3, z, z, z)

    @property
    def W(self):
        return jnp.where(self.target_p > 0,
                         self.w_sum / (jnp.maximum(self.M, 1e-6) *
                                       jnp.maximum(self.target_p, 1e-9)),
                         0.0)


def _mat_from_stored(alb, mr, shape):
    R = shape[0]
    ior = jnp.full(R, 1.45, jnp.float32)
    return SampledMaterial(
        albedo=alb.reshape(R, 4), metallic=mr.reshape(R, 2)[:, 0],
        roughness=mr.reshape(R, 2)[:, 1],
        emission=jnp.zeros((R, 3)), transmittance=jnp.zeros(R),
        ior_in=jnp.ones(R), ior_out=ior,
        f0=((ior - 1) / (ior + 1)) ** 2,
        double_sided=jnp.ones(R, bool),
        shadow_terminator_mul=jnp.ones(R))


def _eval_bsdf(mat, normal, view, out_dir, bounce_mode):
    """Modulated BSDF f(view->out) in world space; view points toward the
    surface (camera convention used throughout the framework)."""
    t, b, n = create_tangent_space(normal)
    sview = -to_tangent_space(view, t, b, n)
    sout = to_tangent_space(out_dir, t, b, n)
    lobes, pdf = material_bsdf_pdf(sout, sview, mat, bounce_mode)
    return modulate_bsdf(mat, lobes), pdf


def _sample_bsdf(mat, normal, view, rnd, bounce_mode):
    t, b, n = create_tangent_space(normal)
    sview = -to_tangent_space(view, t, b, n)
    sout, lobes, pdf = material_bsdf_sample(rnd, sview, mat, bounce_mode)
    return (from_tangent_space(sout, t, b, n),
            modulate_bsdf(mat, lobes), pdf)


def _nee_once(scene, tracer, nee, seed, pos, has_alpha, min_ray_dist):
    """One NEE light sample: (seed', dir, Le*vis/pdf). Strategy selection
    mirrors stages/restir._eval_light_sample storage format."""
    R = pos.shape[0]
    seed, rnd = rng_ops.generate_uniform_random(seed)
    weights = jnp.array([nee.point, nee.triangle, nee.envmap,
                         nee.directional], jnp.float32)
    total = jnp.sum(weights)
    cum = jnp.cumsum(weights)
    uw = rnd[:, 3] * jnp.maximum(total, 1e-9)
    strat = jnp.full(R, -1, jnp.int32)
    for si in range(4):
        lo = cum[si] - weights[si]
        strat = jnp.where((weights[si] > 0) & (uw >= lo) & (uw < cum[si]),
                          si, strat)
    counts = jnp.stack([jnp.maximum(scene.point_light_count, 1),
                        jnp.maximum(scene.tri_light_count, 1),
                        jnp.array(1, jnp.int32),
                        jnp.maximum(scene.directional_light_count, 1)])
    n_lights = counts[jnp.maximum(strat, 0)]
    lidx = jnp.clip((rnd[:, 2] * n_lights).astype(jnp.int32),
                    0, n_lights - 1)
    u2 = rnd[:, :2]
    color, dirs, dist, pdf = _eval_light_sample(
        scene, nee, strat, lidx, u2, pos)
    # strategy-selection pdf: weights[s]/total already folded by
    # _eval_light_sample's nee.* scaling; normalize by total here
    pdf = pdf / jnp.maximum(total, 1e-9)
    safe_d = jnp.where(jnp.abs(dirs).sum(-1, keepdims=True) < 1e-30,
                       jnp.array([0.0, 0.0, 1.0]), dirs)
    sh = trace_alpha(scene, tracer, pos, safe_d,
                     jnp.full(R, min_ray_dist),
                     jnp.minimum(dist, 1e30), 1e-4, has_alpha,
                     any_hit=True)
    vis = jnp.where(sh.tri_id < 0, 1.0, 0.0)
    L = color * (vis / jnp.maximum(jnp.abs(pdf), 1e-9))[:, None]
    L = jnp.where((strat >= 0)[:, None], L, 0.0)
    return seed, dirs, L


def _generate_path(scene, tracer, seed0, pos, normal, view, mat, nee,
                   depth, bounce_mode, min_ray_dist, has_alpha,
                   has_envmap):
    """Trace one GI path from the G-buffer vertex; returns
    (C (R,3) solid-angle-measure contribution, p1 (R,) first-bounce pdf,
    fields dict with the reconnection data). Deterministic in seed0."""
    R = pos.shape[0]
    seed = seed0
    seed, rnd = rng_ops.generate_uniform_random(seed)
    d1, f0, p1 = _sample_bsdf(mat, normal, view, rnd, bounce_mode)
    ok = p1 > 0
    safe_d1 = jnp.where(ok[:, None], d1, jnp.array([0.0, 0.0, 1.0]))
    hit = trace_alpha(scene, tracer, pos, safe_d1,
                      jnp.full(R, min_ray_dist), jnp.full(R, jnp.inf),
                      1e-4, has_alpha)
    missed = hit.tri_id < 0
    env_L, _ = environment_radiance(scene, safe_d1, has_envmap)

    v = interpolate_vertex(scene, hit.tri_id, hit.u, hit.v, safe_d1)
    mat1, v = sample_material(scene, v)
    x1 = v.pos
    n1 = v.mapped_normal

    # NEE at x1
    seed, nee_dir, nee_L = _nee_once(scene, tracer, nee, seed, x1,
                                     has_alpha, min_ray_dist)

    # continuation at x1 (+ suffix loop, same convention)
    seed, rnd2 = rng_ops.generate_uniform_random(seed)
    d2, f1c, p2 = _sample_bsdf(mat1, n1, safe_d1, rnd2, bounce_mode)
    in_L = jnp.zeros((R, 3), jnp.float32)
    if depth > 2:
        tau = jnp.where((p2 > 0)[:, None], 1.0 / jnp.maximum(
            p2, 1e-9)[:, None], 0.0)
        cur_pos, cur_dir = x1, d2
        cur_alive = (p2 > 0) & ~missed
        for b in range(depth - 2):
            h = trace_alpha(scene, tracer, cur_pos, cur_dir,
                            jnp.full(R, min_ray_dist),
                            jnp.full(R, jnp.inf), 1e-4, has_alpha)
            m = h.tri_id < 0
            if nee.envmap <= 0:
                eL, _ = environment_radiance(scene, cur_dir, has_envmap)
                in_L = in_L + jnp.where((cur_alive & m)[:, None],
                                        tau * eL, 0.0)
            vv = interpolate_vertex(scene, h.tri_id, h.u, h.v, cur_dir)
            mm, vv = sample_material(scene, vv)
            nn = vv.mapped_normal
            alive = cur_alive & ~m
            seed, nd, nL = _nee_once(scene, tracer, nee, seed, vv.pos,
                                     has_alpha, min_ray_dist)
            fn, _ = _eval_bsdf(mm, nn, cur_dir, nd, bounce_mode)
            in_L = in_L + jnp.where(alive[:, None], tau * fn * nL, 0.0)
            if b + 1 < depth - 2:
                seed, r3 = rng_ops.generate_uniform_random(seed)
                nd2, fc, pc = _sample_bsdf(mm, nn, cur_dir, r3,
                                           bounce_mode)
                tau = tau * jnp.where(
                    (alive & (pc > 0))[:, None],
                    fc / jnp.maximum(pc, 1e-9)[:, None], 0.0)
                cur_pos, cur_dir = vv.pos, nd2
                cur_alive = alive & (pc > 0)
    kind = jnp.where(ok, jnp.where(missed, RC_ENV, RC_SURF), RC_NONE)
    rc_pos = jnp.where(missed[:, None], safe_d1, x1)
    emit = jnp.where(missed[:, None], env_L, mat1.emission)
    nee_L = jnp.where(missed[:, None], 0.0, nee_L)
    in_L = jnp.where(missed[:, None], 0.0, in_L)

    fields = dict(
        seed=seed0, rc_kind=kind, rc_pos=rc_pos,
        rc_normal=jnp.where(missed[:, None], 0.0, n1),
        rc_alb=mat1.albedo,
        rc_mr=jnp.stack([mat1.metallic, mat1.roughness], -1),
        rc_emit=emit, rc_nee_dir=nee_dir, rc_nee_L=nee_L,
        rc_in_dir=d2, rc_in_L=in_L)
    C = _reconnect_eval(scene, fields, pos, normal, view, mat,
                        bounce_mode, nee)
    return C, jnp.maximum(p1, 1e-9), fields


def _reconnect_eval(scene, fields, pos, normal, view, mat, bounce_mode,
                    nee):
    """Contribution of a stored path re-rooted at (pos, normal, mat),
    solid-angle measure, visibility excluded (reference: restir_core.glsl
    reconnection_shift; visibility deferred to the final shade like
    restir.assume-unchanged-temporal-visibility).

    Transport split vs the DI reservoirs: light already integrated by DI
    at the primary vertex is excluded here — env escapes count only when
    envmap NEE is off, and first-vertex emission only when triangle NEE
    is off (deterministic technique choice, no double counting)."""
    kind = fields["rc_kind"]
    surf = kind == RC_SURF
    env = kind == RC_ENV
    delta = fields["rc_pos"] - pos
    dist = jnp.linalg.norm(delta, axis=-1)
    d01 = jnp.where(surf[:, None],
                    delta / jnp.maximum(dist, 1e-9)[:, None],
                    fields["rc_pos"])
    f0, p0 = _eval_bsdf(mat, normal, view, d01, bounce_mode)
    mat1 = _mat_from_stored(fields["rc_alb"], fields["rc_mr"],
                            (pos.shape[0],))
    f1n, _ = _eval_bsdf(mat1, fields["rc_normal"], d01,
                        fields["rc_nee_dir"], bounce_mode)
    f1i, _ = _eval_bsdf(mat1, fields["rc_normal"], d01,
                        fields["rc_in_dir"], bounce_mode)
    emit1 = fields["rc_emit"] if nee.triangle <= 0 else \
        jnp.zeros_like(fields["rc_emit"])
    Lout = emit1 + f1n * fields["rc_nee_L"] + f1i * fields["rc_in_L"]
    # env escapes: MIS against DI's env light sampling (balance
    # heuristic between the BSDF pdf here and the env NEE pdf) — on
    # glossy surfaces the light-sampled DI reservoirs alone cannot
    # capture the narrow lobe (reference: path_tracer.glsl bsdf_mis_pdf
    # applied to escaped rays)
    env_emit = fields["rc_emit"]
    if nee.envmap > 0:
        _, env_pdf = environment_radiance(scene, d01, True)
        wsum = nee.point + nee.triangle + nee.envmap + nee.directional
        p_nee = env_pdf * (nee.envmap / jnp.maximum(wsum, 1e-9))
        misw = p0 / jnp.maximum(p0 + p_nee, 1e-9)
        env_emit = env_emit * misw[:, None]
    Lout = jnp.where(surf[:, None], Lout, env_emit)
    C = f0 * Lout
    keep = surf | env
    return jnp.where(keep[:, None], C, 0.0)


def _geom_term(fields, pos):
    """|cos(psi)| / dist^2 at the reconnection vertex — the reconnection
    shift's Jacobian is the ratio of this between domains (reference:
    restir_core.glsl reconnection_shift jacobian)."""
    surf = fields["rc_kind"] == RC_SURF
    delta = fields["rc_pos"] - pos
    d2 = jnp.maximum(jnp.sum(delta * delta, -1), 1e-12)
    cos = jnp.abs(jnp.sum(fields["rc_normal"] *
                          delta / jnp.sqrt(d2)[:, None], -1))
    return jnp.where(surf, jnp.maximum(cos, 1e-6) / d2, 1.0)


def _merge(res: PathReservoir, cand, w, M_new, rand):
    take = (rand * jnp.maximum(res.w_sum + w, 1e-20)) < w
    t2 = take[..., None]
    return PathReservoir(
        seed=jnp.where(t2, cand["seed"], res.seed),
        rc_kind=jnp.where(take, cand["rc_kind"], res.rc_kind),
        rc_pos=jnp.where(t2, cand["rc_pos"], res.rc_pos),
        rc_normal=jnp.where(t2, cand["rc_normal"], res.rc_normal),
        rc_alb=jnp.where(t2, cand["rc_alb"], res.rc_alb),
        rc_mr=jnp.where(t2, cand["rc_mr"], res.rc_mr),
        rc_emit=jnp.where(t2, cand["rc_emit"], res.rc_emit),
        rc_nee_dir=jnp.where(t2, cand["rc_nee_dir"], res.rc_nee_dir),
        rc_nee_L=jnp.where(t2, cand["rc_nee_L"], res.rc_nee_L),
        rc_in_dir=jnp.where(t2, cand["rc_in_dir"], res.rc_in_dir),
        rc_in_L=jnp.where(t2, cand["rc_in_L"], res.rc_in_L),
        w_sum=res.w_sum + w,
        M=res.M + M_new,
        target_p=jnp.where(take, cand["target_p"], res.target_p))


def _fields_of(res: PathReservoir):
    return dict(seed=res.seed, rc_kind=res.rc_kind, rc_pos=res.rc_pos,
                rc_normal=res.rc_normal, rc_alb=res.rc_alb,
                rc_mr=res.rc_mr, rc_emit=res.rc_emit,
                rc_nee_dir=res.rc_nee_dir, rc_nee_L=res.rc_nee_L,
                rc_in_dir=res.rc_in_dir, rc_in_L=res.rc_in_L)


def _shift(scene, tracer, src_fields, src_pos, pos, normal, view, mat,
           cfg, gi_depth):
    """Shift a candidate path into the receiving pixel's domain.
    Returns (phat, |J|, fields') per the configured mapping."""
    (nee, shift, bounce_mode, min_ray_dist, has_alpha, has_envmap,
     reconnection_scale) = cfg
    R = pos.shape[0]

    def reconnect():
        C = _reconnect_eval(scene, src_fields, pos, normal, view, mat,
                            bounce_mode, nee)
        J = _geom_term(src_fields, pos) / _geom_term(src_fields, src_pos)
        return rgb_to_luminance(C), J, src_fields

    def replay():
        C, _, f2 = _generate_path(scene, tracer, src_fields["seed"], pos,
                                  normal, view, mat, nee, gi_depth,
                                  bounce_mode, min_ray_dist, has_alpha,
                                  has_envmap)
        return rgb_to_luminance(C), jnp.ones(R), f2

    if shift == "reconnection-shift":
        return reconnect()
    if shift == "random-replay-shift":
        return replay()
    # hybrid: reconnect when the vertex is far and rough enough
    # (reference: restir_core.glsl hybrid shift reconnection condition)
    pr, Jr, fr = reconnect()
    pp, Jp, fp = replay()
    dist = jnp.linalg.norm(src_fields["rc_pos"] - src_pos, axis=-1)
    rough = src_fields["rc_mr"][:, 1] > 0.25
    connectable = (src_fields["rc_kind"] == RC_ENV) | \
        ((src_fields["rc_kind"] == RC_SURF) & rough &
         (dist > reconnection_scale * min_ray_dist * 100.0))
    phat = jnp.where(connectable, pr, pp)
    J = jnp.where(connectable, Jr, Jp)
    fsel = {k: jnp.where(
        connectable.reshape(connectable.shape + (1,) * (fr[k].ndim - 1)),
        fr[k], fp[k]) for k in fr}
    return phat, J, fsel


class ReSTIRGIConfigKey(NamedTuple):
    nee: object
    shift: str               # reconnection-shift/random-replay-shift/hybrid
    gi_depth: int            # total path depth budget for the GI suffix
    canonical_samples: int
    spatial_samples: int
    passes: int
    max_confidence: float
    temporal: bool
    min_ray_dist: float
    bounce_mode: str
    max_radius: float
    has_alpha: bool
    has_envmap: bool
    reconnection_scale: float


@partial(jax.jit, static_argnames=("cfg_key",))
def restir_gi_pass(scene: DeviceScene, tracer, gbuf_pos, gbuf_normal,
                   gbuf_view, gbuf_albedo, gbuf_mr, gbuf_transmittance,
                   motion, prev_res: PathReservoir, prev_pos, frame_idx,
                   cfg_key: ReSTIRGIConfigKey, gbuf_inst=None,
                   prev_inst=None):
    """One ReSTIR GI frame: canonical path gen → temporal reuse →
    spatial reuse → final shade with one visibility wave. Returns
    (indirect color (H, W, 3), reservoir)."""
    k = cfg_key
    H, W = gbuf_pos.shape[:2]
    R = H * W
    shift_cfg = (k.nee, k.shift, k.bounce_mode, k.min_ray_dist,
                 k.has_alpha, k.has_envmap, k.reconnection_scale)

    pos = gbuf_pos.reshape(-1, 3)
    normal = gbuf_normal.reshape(-1, 3)
    view = gbuf_view.reshape(-1, 3)
    alb = gbuf_albedo.reshape(-1, 4)
    mr = gbuf_mr.reshape(-1, 2)
    mat = _mat_from_stored(alb, mr, (R,))
    mat = mat._replace(transmittance=gbuf_transmittance.reshape(-1))

    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    coord = jnp.stack([xs.reshape(-1).astype(jnp.uint32),
                       ys.reshape(-1).astype(jnp.uint32),
                       jnp.full(R, 7, jnp.uint32),
                       jnp.full(R, frame_idx, jnp.uint32)], axis=-1)
    seed = rng_ops.init_random_sampler(coord)

    def rsh(f):
        return {kk: v.reshape((H, W) + v.shape[1:]) for kk, v in f.items()}

    def rfl(f):
        return {kk: v.reshape((R,) + v.shape[2:]) for kk, v in f.items()}

    res = PathReservoir.empty(H, W)
    for c in range(k.canonical_samples):
        path_seed = rng_ops.pcg4d(seed + jnp.uint32(c))
        seed, _ = rng_ops.generate_uniform_random(seed)
        C, p1, fields = _generate_path(
            scene, tracer, path_seed, pos, normal, view, mat, k.nee,
            k.gi_depth, k.bounce_mode, k.min_ray_dist, k.has_alpha,
            k.has_envmap)
        phat = rgb_to_luminance(C)
        w = phat / p1
        cand = rsh(fields)
        cand["target_p"] = phat.reshape(H, W)
        seed, r2 = rng_ops.generate_uniform_random(seed)
        res = _merge(res, cand, w.reshape(H, W),
                     jnp.ones((H, W)), r2[:, 0].reshape(H, W))

    if k.temporal:
        mx = jnp.clip((motion[..., 0] * W - 0.5), 0, W - 1)
        my = jnp.clip(((1 - motion[..., 1]) * H - 0.5), 0, H - 1)
        px = jnp.round(mx).astype(jnp.int32)
        py = jnp.round(my).astype(jnp.int32)
        pr = PathReservoir(*(x[py, px] for x in prev_res))
        src_pos = prev_pos[py, px].reshape(-1, 3)
        dp = gbuf_pos - prev_pos[py, px]
        ok = (jnp.sum(dp * dp, -1) < 0.05).reshape(-1)
        if gbuf_inst is not None and prev_inst is not None:
            # prev<->cur instance id validity (reference:
            # src/scene_stage.hh:241-250 temporal tables)
            ok = ok & (prev_inst[py, px] == gbuf_inst).reshape(-1)
        capM = jnp.minimum(pr.M, k.max_confidence).reshape(-1)
        phat, J, f2 = _shift(scene, tracer, rfl(_fields_of(pr)), src_pos,
                             pos, normal, view, mat, shift_cfg,
                             k.gi_depth)
        Wsrc = pr.W.reshape(-1)
        w = jnp.where(ok & (phat > 0), phat * J * Wsrc * capM, 0.0)
        cand = rsh(f2)
        cand["target_p"] = phat.reshape(H, W)
        seed, r3 = rng_ops.generate_uniform_random(seed)
        res = _merge(res, cand, w.reshape(H, W),
                     jnp.where(ok, capM, 0.0).reshape(H, W),
                     r3[:, 0].reshape(H, W))

    for p in range(k.passes):
        for sI in range(k.spatial_samples):
            seed, r4 = rng_ops.generate_uniform_random(seed)
            ang = r4[:, 0].reshape(H, W) * (2 * M_PI)
            rad = jnp.sqrt(r4[:, 1].reshape(H, W)) * k.max_radius
            dx = jnp.round(jnp.cos(ang) * rad).astype(jnp.int32)
            dy = jnp.round(jnp.sin(ang) * rad).astype(jnp.int32)
            nx = jnp.clip(xs + dx, 0, W - 1)
            ny = jnp.clip(ys + dy, 0, H - 1)
            nb = PathReservoir(*(x[ny, nx] for x in res))
            src_pos = gbuf_pos[ny, nx].reshape(-1, 3)
            dpn = gbuf_pos - gbuf_pos[ny, nx]
            nrm_ok = jnp.sum(gbuf_normal * gbuf_normal[ny, nx], -1) > 0.9
            ok = ((jnp.sum(dpn * dpn, -1) < 0.05) & nrm_ok).reshape(-1)
            capM = jnp.minimum(nb.M, k.max_confidence).reshape(-1)
            phat, J, f2 = _shift(scene, tracer, rfl(_fields_of(nb)),
                                 src_pos, pos, normal, view, mat,
                                 shift_cfg, k.gi_depth)
            Wsrc = nb.W.reshape(-1)
            w = jnp.where(ok & (phat > 0), phat * J * Wsrc * capM, 0.0)
            cand = rsh(f2)
            cand["target_p"] = phat.reshape(H, W)
            seed, r5 = rng_ops.generate_uniform_random(seed)
            res = _merge(res, cand, w.reshape(H, W),
                         jnp.where(ok, capM, 0.0).reshape(H, W),
                         r5[:, 0].reshape(H, W))

    # final shade: re-evaluate at this pixel + one visibility wave
    fields = rfl(_fields_of(res))
    C = _reconnect_eval(scene, fields, pos, normal, view, mat,
                        k.bounce_mode, k.nee)
    phat = rgb_to_luminance(C)
    res = res._replace(target_p=phat.reshape(H, W))
    surf = fields["rc_kind"] == RC_SURF
    delta = fields["rc_pos"] - pos
    dist = jnp.linalg.norm(delta, axis=-1)
    d01 = jnp.where(surf[:, None],
                    delta / jnp.maximum(dist, 1e-9)[:, None],
                    fields["rc_pos"])
    safe_d = jnp.where(jnp.abs(d01).sum(-1, keepdims=True) < 1e-30,
                       jnp.array([0.0, 0.0, 1.0]), d01)
    vis_far = jnp.where(surf, dist - 2.0 * k.min_ray_dist, 1e30)
    sh = trace_alpha(scene, tracer, pos, safe_d,
                     jnp.full(R, k.min_ray_dist),
                     jnp.maximum(vis_far, k.min_ray_dist), 1e-4,
                     k.has_alpha, any_hit=True)
    vis = jnp.where(sh.tri_id < 0, 1.0, 0.0)
    out = C * (vis * res.W.reshape(-1))[:, None]
    return out.reshape(H, W, 3), res
