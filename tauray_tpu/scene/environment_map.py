"""Lat-long environment map with importance alias table.

The reference computes per-texel importance on GPU then builds the alias
table with a CPU sweep (reference: src/environment_map.cc:39-121,
shader/alias_table_importance.comp). Here importance is a numpy reduction
and the sweep is the same O(n) algorithm; the result is a flat array pytree
consumed by the NEE kernels.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import numpy as np


def load_hdr(path: str) -> np.ndarray:
    """Read a Radiance RGBE .hdr file to (H, W, 3) float32."""
    with open(path, "rb") as f:
        data = f.read()
    if not (data.startswith(b"#?RADIANCE") or data.startswith(b"#?RGBE")):
        raise ValueError(f"{path}: not a Radiance HDR file")
    pos = data.index(b"\n\n") + 2
    eol = data.index(b"\n", pos)
    dims = data[pos:eol].decode().split()
    if dims[0] != "-Y" or dims[2] != "+X":
        raise ValueError(f"unsupported HDR orientation {dims}")
    h, w = int(dims[1]), int(dims[3])
    pos = eol + 1
    rgbe = np.zeros((h, w, 4), dtype=np.uint8)
    raw = np.frombuffer(data, dtype=np.uint8, offset=pos)
    ri = 0
    for y in range(h):
        if w >= 8 and w < 32768 and raw[ri] == 2 and raw[ri + 1] == 2 and \
                (int(raw[ri + 2]) << 8 | int(raw[ri + 3])) == w:
            ri += 4  # new-style RLE scanline
            for c in range(4):
                x = 0
                while x < w:
                    count = int(raw[ri])
                    ri += 1
                    if count > 128:
                        rgbe[y, x:x + count - 128, c] = raw[ri]
                        ri += 1
                        x += count - 128
                    else:
                        rgbe[y, x:x + count, c] = raw[ri:ri + count]
                        ri += count
                        x += count
        else:  # flat scanline
            rgbe[y] = raw[ri:ri + w * 4].reshape(w, 4)
            ri += w * 4
    exp = rgbe[..., 3].astype(np.int32) - 136  # 128 + 8 mantissa bits
    scale = np.ldexp(1.0, exp).astype(np.float32)
    out = rgbe[..., :3].astype(np.float32) * scale[..., None]
    out[rgbe[..., 3] == 0] = 0
    return out


def latlong_texel_solid_angle(size: Tuple[int, int]) -> np.ndarray:
    """Per-texel solid angle of a (W, H) lat-long map, shape (H, W)
    (reference: shader/alias_table.glsl latlong_texel_solid_angle)."""
    w, h = size
    y = np.arange(h, dtype=np.float64)
    band = 2.0 * math.pi * (np.cos(math.pi * y / h) -
                            np.cos(math.pi * (y + 1) / h)) / w
    return np.repeat(band[:, None], w, axis=1)


def build_alias_table(importance: np.ndarray):
    """Sweeping alias table build (reference:
    src/environment_map.cc:77-121, after arXiv:1903.00227).

    importance: flat array, normalized so mean == 1.
    Returns (alias_id u32, probability u32, pdf f32-ready importances).
    """
    n = importance.size
    imp = importance.astype(np.float64)
    alias_id = np.arange(n, dtype=np.uint32)
    probability = np.full(n, 0xFFFFFFFF, dtype=np.uint32)

    def ldexp32(x):
        v = math.ldexp(max(x, 0.0), 32)
        return np.uint32(min(v, 0xFFFFFFFF))

    i = 0
    j = 0
    while i < n and imp[i] > 1.0:
        i += 1
    while j < n and imp[j] <= 1.0:
        j += 1
    weight = imp[j] if j < n else 0.0
    while j < n:
        if weight > 1.0:
            if i > n:
                break
            if i < n:
                probability[i] = ldexp32(imp[i])
                alias_id[i] = j
                weight = (weight + imp[i]) - 1.0
                i += 1
                while i < n and imp[i] > 1.0:
                    i += 1
            else:
                break
        else:
            probability[j] = ldexp32(weight)
            old_j = j
            j += 1
            while j < n and imp[j] <= 1.0:
                j += 1
            if j < n:
                alias_id[old_j] = j
                weight = (weight + imp[j]) - 1.0
    return alias_id, probability


class EnvironmentMap:
    """(reference: src/environment_map.hh)"""

    def __init__(self, path: str = "", image: Optional[np.ndarray] = None,
                 factor=(1.0, 1.0, 1.0)):
        self.factor = np.asarray(factor, dtype=np.float32)
        self.projection = 0  # 0 = lat-long; -1 means "no map" in shaders
        if image is not None:
            self.image = np.asarray(image, dtype=np.float32)
        elif path:
            ext = os.path.splitext(path)[1].lower()
            if ext == ".hdr":
                self.image = load_hdr(path)
            elif ext == ".exr":
                from ..io import exr
                self.image = exr.read_rgb(path)[..., :3]
            else:
                from PIL import Image
                img = np.asarray(Image.open(path).convert("RGB"),
                                 dtype=np.float32) / 255.0
                self.image = img ** 2.2
        else:
            raise ValueError("EnvironmentMap needs a path or an image")
        self._build_alias_table()

    def _build_alias_table(self):
        h, w = self.image.shape[:2]
        lum = (self.image[..., 0] * 0.2126 + self.image[..., 1] * 0.7152 +
               self.image[..., 2] * 0.0722).astype(np.float64)
        imp = lum * latlong_texel_solid_angle((w, h))
        flat = imp.reshape(-1)
        avg = flat.mean()
        self.average_luminance = float(flat.sum())
        norm = flat / max(avg, 1e-30)
        alias_id, probability = build_alias_table(norm)
        sin_theta = np.sin((np.arange(h) + 0.5) / h * math.pi)
        sin_map = np.repeat(sin_theta, w)
        pdf = (norm / (2.0 * math.pi ** 2 * sin_map)).astype(np.float32)
        self.alias_id = alias_id
        self.alias_probability = probability
        self.pdf = pdf
        self.alias_pdf = pdf[alias_id]
