"""BMFR denoiser — Blockwise Multi-Order Feature Regression
(reference: src/bmfr_stage.cc + shader/bmfr_preprocess.comp,
bmfr_fit.comp, bmfr_weighted_sum.comp, bmfr_accumulate_output.comp;
after Koskela et al. 2019).

Per 32x32 block, noisy (demodulated) radiance is least-squares-fitted
against a feature basis {1, n.xyz, p.xyz, p.xyz^2} and replaced by the
fit, then temporally accumulated along motion vectors. The reference's
per-block Householder QR on the GPU becomes one batched `lstsq` over all
blocks — an (B, N, F) batched matmul/solve, which is exactly what the
MXU wants."""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

BLOCK = 32
NOISE_EPS = 1e-2


class BMFRState(NamedTuple):
    history: jnp.ndarray      # (H, W, 6)
    history_len: jnp.ndarray  # (H, W)
    normal: jnp.ndarray
    pos: jnp.ndarray

    @staticmethod
    def zeros(H, W):
        return BMFRState(
            history=jnp.zeros((H, W, 6), jnp.float32),
            history_len=jnp.zeros((H, W), jnp.float32),
            normal=jnp.zeros((H, W, 3), jnp.float32),
            pos=jnp.zeros((H, W, 3), jnp.float32))


def _blockify(img, H, W):
    C = img.shape[-1]
    return (img.reshape(H // BLOCK, BLOCK, W // BLOCK, BLOCK, C)
            .transpose(0, 2, 1, 3, 4).reshape(-1, BLOCK * BLOCK, C))


def _unblockify(blocks, H, W):
    C = blocks.shape[-1]
    return (blocks.reshape(H // BLOCK, W // BLOCK, BLOCK, BLOCK, C)
            .transpose(0, 2, 1, 3, 4).reshape(H, W, C))


@jax.jit
def _fit_blocks(noisy, normal, pos):
    """noisy: (H, W, C) -> regression fit per 32x32 block."""
    H, W = noisy.shape[:2]
    padh = (-H) % BLOCK
    padw = (-W) % BLOCK
    if padh or padw:
        noisy = jnp.pad(noisy, ((0, padh), (0, padw), (0, 0)), mode="edge")
        normal = jnp.pad(normal, ((0, padh), (0, padw), (0, 0)), mode="edge")
        pos = jnp.pad(pos, ((0, padh), (0, padw), (0, 0)), mode="edge")
    Hp, Wp = noisy.shape[:2]
    y = _blockify(noisy, Hp, Wp)                        # (B, N, C)
    n = _blockify(normal, Hp, Wp)
    p = _blockify(pos, Hp, Wp)
    # normalize world positions per block (reference: bmfr_preprocess.comp)
    pmin = p.min(axis=1, keepdims=True)
    pmax = p.max(axis=1, keepdims=True)
    pn = (p - pmin) / jnp.maximum(pmax - pmin, 1e-3)
    ones = jnp.ones(y.shape[:2] + (1,), jnp.float32)
    X = jnp.concatenate([ones, n, pn, pn * pn], axis=-1)  # (B, N, 10)
    # ridge-regularized normal equations (batched, MXU-friendly)
    Xt = jnp.swapaxes(X, 1, 2)
    A = Xt @ X + NOISE_EPS * jnp.eye(X.shape[-1])
    b = Xt @ y
    coef = jnp.linalg.solve(A, b)                       # (B, 10, C)
    fit = jnp.maximum(X @ coef, 0.0)
    out = _unblockify(fit, Hp, Wp)
    return out[:H, :W]


def _reproject_history(state: BMFRState, motion, normal, pos):
    H, W = motion.shape[:2]
    mx = motion[..., 0] * W - 0.5
    my = (1.0 - motion[..., 1]) * H - 0.5
    x = jnp.clip(jnp.round(mx).astype(jnp.int32), 0, W - 1)
    y = jnp.clip(jnp.round(my).astype(jnp.int32), 0, H - 1)
    ph = state.history[y, x]
    pl = state.history_len[y, x]
    pn = state.normal[y, x]
    pp = state.pos[y, x]
    dp = pos - pp
    ok = (jnp.sum(pn * normal, -1) > 0.9) & (jnp.sum(dp * dp, -1) < 0.02)
    return ph, jnp.where(ok, pl, 0.0), ok


@jax.jit
def bmfr_denoise(state: BMFRState, diffuse, specular, motion, normal, pos,
                 albedo):
    """Returns (diffuse, specular, new_state)."""
    cur = jnp.concatenate([diffuse[..., :3], specular[..., :3]], axis=-1)
    fit = _fit_blocks(cur, normal, pos)
    ph, plen, ok = _reproject_history(state, motion, normal, pos)
    hist = plen + 1.0
    alpha = jnp.maximum(1.0 / hist, 0.05)[..., None]
    acc = jnp.where(ok[..., None], ph * (1 - alpha) + fit * alpha, fit)
    new_state = BMFRState(history=acc, history_len=hist, normal=normal,
                          pos=pos)
    return acc[..., :3], acc[..., 3:], new_state
