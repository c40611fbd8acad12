"""GGX metallic-roughness BSDF (reference: shader/ggx.glsl, 554 lines).

Tangent-space BSDF with three lobes (diffuse, dielectric+metallic
reflection, transmission), VNDF sampling (Heitz 2017), and the reference's
exact lobe-selection probabilities so deterministic RNG streams pick the
same lobes. All branches are evaluated vectorized and blended with
`jnp.where` — the TPU way of handling the reference's per-thread `if`s.

Convention: all directions in tangent space, normal == +z."""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax.numpy as jnp

from .sampling import (normalize, pdf_cosine_hemisphere,
                       sample_cosine_hemisphere, sample_hemisphere,
                       sample_sphere)

M_PI = math.pi

MATERIAL_LOBE_ALL = 0
MATERIAL_LOBE_DIFFUSE = 1
MATERIAL_LOBE_TRANSMISSION = 2
MATERIAL_LOBE_REFLECTION = 3

BOUNCE_MATERIAL = "material"
BOUNCE_HEMISPHERE = "hemisphere"
BOUNCE_COSINE = "cosine"


class BSDFLobes(NamedTuple):
    """(reference: shader/material.glsl bsdf_lobes)"""
    transmission: jnp.ndarray
    diffuse: jnp.ndarray
    dielectric_reflection: jnp.ndarray
    metallic_reflection: jnp.ndarray

    @staticmethod
    def zeros(shape):
        z = jnp.zeros(shape, jnp.float32)
        return BSDFLobes(z, z, z, z)

    def scale(self, s):
        return BSDFLobes(self.transmission * s, self.diffuse * s,
                         self.dielectric_reflection * s,
                         self.metallic_reflection * s)


def modulate_bsdf(mat, bsdf: BSDFLobes):
    """(reference: shader/material.glsl modulate_bsdf)"""
    return mat.albedo[..., :3] * (bsdf.metallic_reflection +
                                  bsdf.transmission + bsdf.diffuse)[..., None] \
        + bsdf.dielectric_reflection[..., None]


def modulate_color(mat, diffuse, reflected):
    """(reference: shader/material.glsl modulate_color)"""
    approx_fresnel = 0.02
    albedo = mat.albedo[..., :3]
    metallic = mat.metallic[..., None]
    d = diffuse * albedo * (1 - metallic)
    r = reflected * (approx_fresnel * (1 - metallic) + albedo * metallic) / \
        (approx_fresnel * (1 - metallic[..., 0]) + metallic[..., 0])[..., None]
    return d + r


def add_demodulated_color(primary: BSDFLobes, light_color, diffuse, reflected):
    """(reference: shader/material.glsl add_demodulated_color)"""
    diffuse = diffuse + light_color * (primary.diffuse +
                                       primary.transmission)[..., None]
    reflected = reflected + light_color * (
        primary.dielectric_reflection + primary.metallic_reflection)[..., None]
    return diffuse, reflected


# ---------------------------------------------------------------------------
# Fresnel / masking / distribution terms
# ---------------------------------------------------------------------------

def ggx_fresnel_schlick(cos_d, f0):
    return f0 + (1.0 - f0) * jnp.maximum(1.0 - cos_d, 0.0) ** 5


def ggx_fresnel(cos_d, mat):
    """(reference: shader/ggx.glsl ggx_fresnel) — handles TIR."""
    inv_eta = mat.ior_in / mat.ior_out
    sin2 = inv_eta * inv_eta * (1.0 - cos_d * cos_d)
    tir = (mat.ior_in > mat.ior_out) & (sin2 >= 1.0)
    cos_eff = jnp.where(mat.ior_in > mat.ior_out,
                        jnp.sqrt(jnp.maximum(1.0 - sin2, 0.0)), cos_d)
    f = ggx_fresnel_schlick(cos_eff, mat.f0)
    f = jnp.where(tir, 1.0, f)
    return jnp.where(mat.ior_in == mat.ior_out, 0.0, f)


def fresnel_importance(cos_d, mat):
    """(reference: shader/ggx.glsl fresnel_importance)"""
    inv_eta = mat.ior_in / mat.ior_out
    sin2 = inv_eta * inv_eta * (1.0 - cos_d * cos_d)
    tir = (mat.ior_in > mat.ior_out) & (sin2 >= 1.0)
    cos_eff = jnp.where(mat.ior_in > mat.ior_out,
                        jnp.sqrt(jnp.maximum(1.0 - sin2, 0.0)), cos_d)
    f = mat.f0 + (jnp.maximum(1.0 - mat.roughness, mat.f0) - mat.f0) * \
        jnp.maximum(1.0 - cos_eff, 0.0) ** 5
    f = jnp.where(tir, 1.0, f)
    return jnp.where(mat.ior_in == mat.ior_out, 0.0, f)


def fresnel_schlick_attenuated(cos_d, f0, roughness):
    """(reference: shader/ggx.glsl fresnel_schlick_attenuated) — grazing
    response damped by roughness, used for integrated (indirect) light."""
    return f0 + (jnp.maximum(1.0 - roughness, f0) - f0) * \
        jnp.maximum(1.0 - cos_d, 0.0) ** 5


def _step(edge, x):
    return jnp.where(x >= edge, 1.0, 0.0)


def ggx_masking(v_dot_n, v_dot_h, a):
    a2 = a * a
    return _step(0.0, v_dot_n * v_dot_h) * 2.0 / \
        (1.0 + jnp.sqrt(1.0 + a2 / jnp.maximum(v_dot_n * v_dot_n, 1e-18)
                        - a2))


def ggx_masking_shadowing(v_dot_n, v_dot_h, l_dot_n, l_dot_h, a):
    a2 = a * a
    return _step(0.0, v_dot_n * v_dot_h) * _step(0.0, l_dot_n * l_dot_h) * \
        4.0 / ((1.0 + jnp.sqrt(1.0 + a2 / jnp.maximum(v_dot_n ** 2, 1e-18)
                               - a2)) *
               (1.0 + jnp.sqrt(1.0 + a2 / jnp.maximum(l_dot_n ** 2, 1e-18)
                               - a2)))


def ggx_masking_shadowing_predivided(v_dot_n, v_dot_h, l_dot_n, l_dot_h, a):
    a2 = a * a
    denom1 = jnp.abs(l_dot_n) * jnp.sqrt(a2 + (1.0 - a2) * v_dot_n ** 2)
    denom2 = jnp.abs(v_dot_n) * jnp.sqrt(a2 + (1.0 - a2) * l_dot_n ** 2)
    return _step(0.0, v_dot_n * v_dot_h) * _step(0.0, l_dot_n * l_dot_h) * \
        0.5 / jnp.maximum(denom1 + denom2, 1e-20)


def ggx_distribution(h_dot_n, a):
    a2 = a * a
    denom = h_dot_n * h_dot_n * (a2 - 1.0) + 1.0
    return a2 / (M_PI * denom * denom)


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------


# --- colored metallic Fresnel (validation flag, docs/PT_DEFICIT.md) -----
# The shipped path-tracer golden predates the reference's current SCALAR
# metallic lobe (ggx.glsl:146); its metal pixels carry colored-Schlick-
# Fresnel light (F = albedo + (1-albedo)(1-cos_d)^5). This NON-DEFAULT
# flag reproduces that older model to PROVE the attribution: the colored
# term decomposes into an albedo-tinted part M(1-s) (stays in the
# metallic lobe) plus an UNtinted part M*s routed through the dielectric
# lobe, which modulate_bsdf passes through white — exact colored-F
# transport with the scalar lobe plumbing untouched.
import os as _os
_COLORED_FRESNEL = _os.environ.get("TAURAY_COLORED_FRESNEL", "0") == "1"


def _colored_fresnel_split(dielectric, metallic, cos_d):
    if not _COLORED_FRESNEL:
        return dielectric, metallic
    s = (1.0 - jnp.clip(cos_d, 0.0, 1.0)) ** 5
    return dielectric + metallic * s, metallic * (1.0 - s)


def _ggx_brdf_inner(out_dir, view_dir, h, fresnel, distribution, cos_d, mat):
    """(reference: shader/ggx.glsl ggx_brdf_inner) → BSDFLobes delta."""
    cos_l = out_dir[..., 2]
    cos_v = view_dir[..., 2]
    geometry = ggx_masking_shadowing_predivided(
        cos_v, cos_d, cos_l, jnp.sum(out_dir * h, -1), mat.roughness)
    kd = (1.0 - fresnel) * (1.0 - mat.metallic) * (1.0 - mat.transmittance)
    cos_l = jnp.maximum(cos_l, 0.0)
    diel, metal = _colored_fresnel_split(
        fresnel * geometry * distribution * cos_l * (1.0 - mat.metallic),
        geometry * distribution * cos_l * mat.metallic, cos_d)
    return BSDFLobes(
        transmission=jnp.zeros_like(cos_l),
        diffuse=kd * cos_l / M_PI,
        dielectric_reflection=diel,
        metallic_reflection=metal)


def ggx_bsdf(out_dir, view_dir, mat) -> BSDFLobes:
    """Full two-sided eval (reference: shader/ggx.glsl ggx_bsdf)."""
    cos_l = out_dir[..., 2]
    cos_v = view_dir[..., 2]
    h_refl = normalize(view_dir + out_dir)
    sgn = jnp.where(mat.ior_in > mat.ior_out, 1.0, -1.0)[..., None]
    h_refr = sgn * normalize(mat.ior_out[..., None] * out_dir +
                             mat.ior_in[..., None] * view_dir)
    h = jnp.where((cos_l > 0)[..., None], h_refl, h_refr)
    cos_h = h[..., 2]
    cos_d = jnp.sum(view_dir * h, -1)
    cos_o = jnp.sum(out_dir * h, -1)
    fresnel = ggx_fresnel(cos_d, mat)
    geometry = ggx_masking_shadowing_predivided(cos_v, cos_d, cos_l, cos_o,
                                                mat.roughness)
    zero_rough = mat.roughness < 0.001
    distribution = jnp.where(zero_rough, 0.0,
                             ggx_distribution(cos_h, mat.roughness))
    # BRDF side
    kd = (1.0 - fresnel) * (1.0 - mat.metallic) * (1.0 - mat.transmittance)
    diffuse = kd * jnp.maximum(cos_l, 0.0) / M_PI
    dielectric, metallic_r = _colored_fresnel_split(
        fresnel * geometry * distribution * cos_l * (1.0 - mat.metallic),
        geometry * distribution * cos_l * mat.metallic, cos_d)
    # BTDF side
    geometry4 = geometry * 4.0
    denom = mat.ior_in / mat.ior_out * cos_d + cos_o
    transmission = -cos_l * jnp.abs(cos_d * cos_o) * mat.transmittance * \
        (1.0 - mat.metallic) * (1.0 - fresnel) * geometry4 * distribution / \
        jnp.maximum(denom * denom, 1e-20)
    refl = cos_l > 0
    z = jnp.zeros_like(cos_l)
    return BSDFLobes(
        transmission=jnp.where(refl, z, transmission),
        diffuse=jnp.where(refl, diffuse, z),
        dielectric_reflection=jnp.where(refl, dielectric, z),
        metallic_reflection=jnp.where(refl, metallic_r, z))


def _lobe_probabilities(view_dir, mat):
    """(reference: shader/ggx.glsl specular/diffuse cutoffs)"""
    max_albedo = jnp.max(mat.albedo[..., :3], axis=-1)
    specular_cutoff = 1.0 + (fresnel_importance(view_dir[..., 2], mat) - 1.0) \
        * ((1 - mat.metallic) * max_albedo)
    diffuse_cutoff = 1.0 - mat.transmittance
    spec_p = specular_cutoff
    diff_p = (1.0 - specular_cutoff) * diffuse_cutoff
    trans_p = (1.0 - specular_cutoff) * (1.0 - diffuse_cutoff)
    return specular_cutoff, diffuse_cutoff, spec_p, diff_p, trans_p


def ggx_vndf_sample(view, roughness, u1, u2):
    """(reference: shader/ggx.glsl ggx_vndf_sample, Heitz 2017 VNDF)."""
    r = roughness[..., None]
    v = normalize(jnp.concatenate([r * view[..., :2], view[..., 2:3]],
                                  axis=-1))
    vz_ok = v[..., 2] < 0.9999
    t1_raw = jnp.cross(v, jnp.broadcast_to(
        jnp.array([0.0, 0, 1.0]), v.shape))
    t1 = jnp.where(vz_ok[..., None], normalize(
        jnp.where(jnp.linalg.norm(t1_raw, axis=-1, keepdims=True) < 1e-20,
                  jnp.array([1.0, 0, 0]), t1_raw)),
        jnp.array([1.0, 0, 0]))
    t2 = jnp.cross(t1, v)
    inv_a = 1.0 + v[..., 2]
    a = 1.0 / inv_a
    rr = jnp.sqrt(u1)
    lower = u2 < a
    phi = jnp.where(lower, u2 * inv_a * M_PI,
                    M_PI + (u2 - a) / jnp.maximum(1.0 - a, 1e-12) * M_PI)
    p1 = rr * jnp.cos(phi)
    p2 = rr * jnp.sin(phi) * jnp.where(lower, 1.0, v[..., 2])
    p3 = jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1 - p2 * p2))
    n = p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * v
    out = jnp.concatenate(
        [r * n[..., :2], jnp.maximum(0.0, n[..., 2])[..., None]], axis=-1)
    return normalize(out)


def _reflect(i, n):
    return i - 2.0 * jnp.sum(i * n, -1, keepdims=True) * n


def _refract(i, n, eta):
    """GLSL refract(); returns zero vector on TIR."""
    cos_i = jnp.sum(-i * n, -1)
    sin2_t = eta * eta * (1.0 - cos_i * cos_i)
    tir = sin2_t > 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    r = eta[..., None] * i + (eta * cos_i - cos_t)[..., None] * n
    return jnp.where(tir[..., None], 0.0, r), tir


def ggx_bsdf_sample(uniform_random, view_dir, mat
                    ) -> Tuple[jnp.ndarray, BSDFLobes, jnp.ndarray]:
    """Sample an outgoing direction; eval_all_lobes semantics
    (reference: shader/ggx.glsl ggx_bsdf_sample_core).

    Returns (out_dir, lobes, pdf). pdf == 0 flags delta lobes whose weight
    was pre-divided."""
    zero_rough = mat.roughness < 0.001
    h = ggx_vndf_sample(view_dir, mat.roughness,
                        uniform_random[..., 0], uniform_random[..., 1])
    h = jnp.where(zero_rough[..., None], jnp.array([0.0, 0, 1.0]), h)
    cos_d = jnp.sum(view_dir * h, -1)
    fresnel = ggx_fresnel(cos_d, mat)
    cos_v = view_dir[..., 2]
    spec_cut, diff_cut, spec_p, diff_p, trans_p = \
        _lobe_probabilities(view_dir, mat)
    u = uniform_random[..., 2]

    # --- branch 1: specular reflection -------------------------------
    out_s = _reflect(-view_dir, h)
    cos_l_s = out_s[..., 2]
    G1 = ggx_masking(cos_v, cos_d, mat.roughness)
    D_s = jnp.where(zero_rough, 4 * cos_l_s * cos_v,
                    ggx_distribution(h[..., 2], mat.roughness))
    pdf_s = G1 * D_s / (4 * jnp.abs(cos_v)) * spec_p
    diffuse_pdf_s = jnp.where(zero_rough, 0.0,
                              pdf_cosine_hemisphere(out_s) * diff_p)
    pdf_s_all = pdf_s + diffuse_pdf_s
    lobes_s = _ggx_brdf_inner(out_s, view_dir, h, fresnel, D_s, cos_d, mat)
    # zero-roughness: pre-divide by the (infinite) pdf
    inv_pdf_s = jnp.where(pdf_s > 0, 1.0 / jnp.maximum(pdf_s, 1e-30), 0.0)
    lobes_s = BSDFLobes(
        transmission=lobes_s.transmission,
        diffuse=jnp.where(zero_rough, 0.0, lobes_s.diffuse),
        dielectric_reflection=jnp.where(
            zero_rough, lobes_s.dielectric_reflection * inv_pdf_s,
            lobes_s.dielectric_reflection),
        metallic_reflection=jnp.where(
            zero_rough, lobes_s.metallic_reflection * inv_pdf_s,
            lobes_s.metallic_reflection))
    pdf_s_final = jnp.where(zero_rough, 0.0, pdf_s_all)

    # --- branch 2: diffuse -------------------------------------------
    u_renorm = jnp.clip((u - spec_cut) / jnp.maximum(1 - spec_cut, 1e-12),
                        0.0, 0.99999)
    u_diff = jnp.clip(u_renorm / jnp.maximum(diff_cut, 1e-12), 0.0, 0.99999)
    out_d = sample_cosine_hemisphere(
        jnp.stack([u_diff, uniform_random[..., 3]], axis=-1))
    h_d = normalize(view_dir + out_d)
    cos_d_d = jnp.sum(view_dir * h_d, -1)
    fres_d = ggx_fresnel_schlick(cos_d_d, mat.f0)
    G1_d = ggx_masking(cos_v, cos_d_d, mat.roughness)
    D_d = jnp.where(zero_rough, 0.0,
                    ggx_distribution(h_d[..., 2], mat.roughness))
    pdf_d = pdf_cosine_hemisphere(out_d) * diff_p
    spec_pdf_d = G1_d * D_d / (4 * jnp.abs(cos_v)) * spec_p
    pdf_d_all = pdf_d + spec_pdf_d
    lobes_d = _ggx_brdf_inner(out_d, view_dir, h_d, fres_d, D_d, cos_d_d, mat)
    lobes_d = lobes_d._replace(
        dielectric_reflection=jnp.where(zero_rough, 0.0,
                                        lobes_d.dielectric_reflection),
        metallic_reflection=jnp.where(zero_rough, 0.0,
                                      lobes_d.metallic_reflection))

    # --- branch 3: transmission --------------------------------------
    out_t, tir = _refract(-view_dir, h, mat.ior_in / mat.ior_out)
    out_t = normalize(jnp.where(jnp.abs(out_t) < 1e-30,
                                jnp.array([0.0, 0, -1.0]), out_t))
    bad_t = tir
    cos_l_t = out_t[..., 2]
    cos_o_t = jnp.sum(out_t * h, -1)
    G2_t = ggx_masking_shadowing(cos_v, cos_d, cos_l_t, cos_o_t,
                                 mat.roughness)
    G1_t = ggx_masking(cos_v, cos_d, mat.roughness)
    D_t = jnp.where(zero_rough, 4 * cos_l_t * cos_v,
                    ggx_distribution(h[..., 2], mat.roughness))
    denom_t = mat.ior_in / mat.ior_out * cos_d + cos_o_t
    denom2 = jnp.maximum(denom_t * denom_t, 1e-20)
    trans_val = jnp.abs(cos_d * cos_o_t) * mat.transmittance * \
        (1.0 - mat.metallic) * (1.0 - fresnel) * G2_t * D_t / \
        (denom2 * jnp.maximum(jnp.abs(cos_v), 1e-12))
    pdf_t = (jnp.abs(cos_d * cos_o_t) * G1_t * D_t) / \
        (denom2 * jnp.maximum(jnp.abs(cos_v), 1e-12)) * trans_p
    inv_pdf_t = jnp.where(pdf_t > 0, 1.0 / jnp.maximum(pdf_t, 1e-30), 0.0)
    trans_final = jnp.where(zero_rough, trans_val * inv_pdf_t, trans_val)
    pdf_t_final = jnp.where(zero_rough, 0.0, pdf_t)
    trans_final = jnp.where(bad_t, 0.0, trans_final)
    pdf_t_final = jnp.where(bad_t, 0.0, pdf_t_final)
    out_t = jnp.where(bad_t[..., None], 0.0, out_t)

    # --- select ------------------------------------------------------
    pick_s = u <= spec_cut
    pick_d = ~pick_s & (u_renorm <= diff_cut)
    pick_t = ~pick_s & ~pick_d

    out = jnp.where(pick_s[..., None], out_s,
                    jnp.where(pick_d[..., None], out_d, out_t))
    pdf = jnp.where(pick_s, pdf_s_final,
                    jnp.where(pick_d, pdf_d_all, pdf_t_final))
    z = jnp.zeros_like(u)
    lobes = BSDFLobes(
        transmission=jnp.where(pick_t, trans_final, z),
        diffuse=jnp.where(pick_s, lobes_s.diffuse,
                          jnp.where(pick_d, lobes_d.diffuse, z)),
        dielectric_reflection=jnp.where(
            pick_s, lobes_s.dielectric_reflection,
            jnp.where(pick_d, lobes_d.dielectric_reflection, z)),
        metallic_reflection=jnp.where(
            pick_s, lobes_s.metallic_reflection,
            jnp.where(pick_d, lobes_d.metallic_reflection, z)))
    return out, lobes, pdf


def ggx_bsdf_pdf(out_dir, view_dir, mat) -> Tuple[BSDFLobes, jnp.ndarray]:
    """Eval + pdf for a given direction (reference: shader/ggx.glsl
    ggx_bsdf_lobe_pdf with MATERIAL_LOBE_ALL). Returns (lobes, pdf)."""
    cos_l = out_dir[..., 2]
    cos_v = view_dir[..., 2]
    h_refl = normalize(view_dir + out_dir)
    sgn = jnp.where(mat.ior_in > mat.ior_out, 1.0, -1.0)[..., None]
    h_refr = sgn * normalize(mat.ior_out[..., None] * out_dir +
                             mat.ior_in[..., None] * view_dir)
    h = jnp.where((cos_l > 0)[..., None], h_refl, h_refr)
    cos_h = h[..., 2]
    cos_d = jnp.sum(view_dir * h, -1)
    cos_o = jnp.sum(out_dir * h, -1)
    fresnel = ggx_fresnel(cos_d, mat)
    geometry = ggx_masking_shadowing_predivided(cos_v, cos_d, cos_l, cos_o,
                                                mat.roughness)
    zero_rough = mat.roughness < 0.001
    distribution = jnp.where(zero_rough, 0.0,
                             ggx_distribution(cos_h, mat.roughness))
    spec_cut, diff_cut, spec_p, diff_p, trans_p = \
        _lobe_probabilities(view_dir, mat)
    G1 = ggx_masking(cos_v, cos_d, mat.roughness)

    z = jnp.zeros_like(cos_l)
    refl = cos_l > 0

    kd = (1.0 - fresnel) * (1.0 - mat.metallic) * (1.0 - mat.transmittance)
    diffuse_pdf = pdf_cosine_hemisphere(out_dir) * diff_p
    diff_ok = refl & jnp.isfinite(diffuse_pdf) & (diffuse_pdf > 0)
    diffuse = jnp.where(diff_ok, kd * cos_l / M_PI, z)

    specular_pdf = G1 * distribution / (4 * jnp.abs(cos_v)) * spec_p
    spec_ok = refl & jnp.isfinite(specular_pdf) & (specular_pdf > 0)
    diel_cf, metal_cf = _colored_fresnel_split(
        fresnel * geometry * distribution * cos_l * (1.0 - mat.metallic),
        geometry * distribution * cos_l * mat.metallic, cos_d)
    dielectric = jnp.where(spec_ok, diel_cf, z)
    metallic_r = jnp.where(spec_ok, metal_cf, z)

    denom = mat.ior_in / mat.ior_out * cos_d + cos_o
    denom2 = jnp.maximum(denom * denom, 1e-20)
    geometry4 = geometry * 4.0
    transmit_pdf = (jnp.abs(cos_d * cos_o) * G1 * distribution) / \
        (jnp.maximum(jnp.abs(cos_v), 1e-12) * denom2 * M_PI) * trans_p
    trans_ok = ~refl & jnp.isfinite(transmit_pdf) & (transmit_pdf > 0)
    transmission = jnp.where(
        trans_ok,
        -cos_l * jnp.abs(cos_d * cos_o) * mat.transmittance *
        (1.0 - mat.metallic) * (1.0 - fresnel) * geometry4 * distribution /
        denom2, z)

    pdf = jnp.where(diff_ok, diffuse_pdf, z) + \
        jnp.where(spec_ok, specular_pdf, z) + \
        jnp.where(trans_ok, transmit_pdf, z)
    return BSDFLobes(transmission, diffuse, dielectric, metallic_r), pdf


# ---------------------------------------------------------------------------
# Bounce-mode dispatch (reference: shader/ggx.glsl material_bsdf_sample/pdf)
# ---------------------------------------------------------------------------

def material_bsdf_sample(uniform_random, view_dir, mat, bounce_mode: str):
    if bounce_mode == BOUNCE_HEMISPHERE:
        transmissive = mat.transmittance > 0.0
        out_sph = sample_sphere(uniform_random[..., :2])
        out_hemi = sample_hemisphere(uniform_random[..., :2])
        out = jnp.where(transmissive[..., None], out_sph, out_hemi)
        pdf = jnp.where(transmissive, 0.25 / M_PI, 0.5 / M_PI)
        lobes, _ = ggx_bsdf_pdf(out, view_dir, mat)
        return out, lobes, pdf
    if bounce_mode == BOUNCE_COSINE:
        split = mat.transmittance * 0.5
        flip = uniform_random[..., 2] < split
        out = sample_cosine_hemisphere(uniform_random[..., :2])
        out = jnp.where(flip[..., None], -out, out)
        pdf = jnp.abs(out[..., 2] / M_PI) * jnp.where(flip, split, 1.0 - split)
        lobes, _ = ggx_bsdf_pdf(out, view_dir, mat)
        return out, lobes, pdf
    return ggx_bsdf_sample(uniform_random, view_dir, mat)


def material_bsdf_pdf(out_dir, view_dir, mat, bounce_mode: str):
    lobes, pdf = ggx_bsdf_pdf(out_dir, view_dir, mat)
    if bounce_mode == BOUNCE_HEMISPHERE:
        blocked = (mat.transmittance == 0) & (out_dir[..., 2] <= 0)
        p = jnp.where(mat.transmittance > 0.0, 0.25 / M_PI, 0.5 / M_PI)
        return lobes, jnp.where(blocked, 0.0, p)
    if bounce_mode == BOUNCE_COSINE:
        blocked = (mat.transmittance == 0) & (out_dir[..., 2] <= 0)
        split = mat.transmittance * 0.5
        p = jnp.abs(out_dir[..., 2] / M_PI) * \
            jnp.where(out_dir[..., 2] < 0, split, 1.0 - split)
        return lobes, jnp.where(blocked, 0.0, p)
    return lobes, pdf
