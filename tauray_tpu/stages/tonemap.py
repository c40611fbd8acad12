"""Tonemap stage (reference: src/tonemap_stage.cc +
shader/tonemap_filmic/gamma/reinhard/reinhard_luminance.comp).

Operators and their exact formulas match the reference shaders; `linear`
is the gamma shader with gamma forced to 1 (reference:
src/tonemap_stage.cc:159)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.shading import rgb_to_luminance

OPERATORS = ("filmic", "gamma-correction", "linear", "reinhard",
             "reinhard-luminance")


def _filmic(c):
    """(reference: shader/tonemap_filmic.comp) — Jim Hejl's filmic approx."""
    c = jnp.clip(c, 0.0, 1000.0)
    c = jnp.maximum(0.0, c - 0.004)
    return ((c * (6.2 * c + 0.5)) / (c * (6.2 * c + 1.7) + 0.06)) ** 2.2


def _reinhard(c):
    c = jnp.clip(c, 0.0, 1000.0)
    return c / (1.0 + c)


def _reinhard_luminance(c):
    lum = rgb_to_luminance(c)[..., None]
    return c / (1.0 + lum)


@partial(jax.jit, static_argnames=("operator", "exposure", "gamma"))
def tonemap(img: jnp.ndarray, operator: str = "filmic", exposure: float = 1.0,
            gamma: float = 2.2) -> jnp.ndarray:
    """img: (..., 4) RGBA linear; returns display-ready values."""
    rgb = img[..., :3] * exposure
    a = img[..., 3:4]
    if operator == "filmic":
        rgb = _filmic(rgb)
    elif operator == "reinhard":
        rgb = _reinhard(rgb)
    elif operator == "reinhard-luminance":
        rgb = _reinhard_luminance(rgb)
    elif operator not in ("gamma-correction", "linear"):
        raise ValueError(f"unknown tonemap operator {operator}")
    # shared gamma pass, skipped for `linear` (reference:
    # shader/tonemap.glsl main + src/tonemap_stage.cc:159)
    eff_gamma = 1.0 if operator == "linear" else gamma
    if eff_gamma != 1.0:
        rgb = rgb ** (1.0 / eff_gamma)
    return jnp.concatenate([rgb, a], axis=-1)
