"""Headless offline output (reference: src/headless.cc).

Saves frames as EXR (zip/zips/rle/piz/none compression; RGB(A) 16/32),
PNG/BMP via Pillow, Radiance HDR, or RAW float dumps; scans output for
NaNs with pixel coordinates logged (reference: src/headless.cc:325-335).
File naming: ${prefix}[<display>_][<frame>].<ext>
(reference: src/headless.cc:305-309)."""

from __future__ import annotations

import concurrent.futures
import os
from typing import Optional

import numpy as np

from ..io import exr
from ..log import TR_LOG, TR_WARN


def _rgbe_encode(img: np.ndarray) -> np.ndarray:
    """float RGB -> Radiance RGBE uint8."""
    maxc = img.max(axis=-1)
    e = np.zeros(maxc.shape, dtype=np.int32)
    valid = maxc >= 1e-32
    with np.errstate(divide="ignore"):
        _, e = np.frexp(np.where(valid, maxc, 1.0))
    scale = np.ldexp(1.0, -e) * 256.0
    rgbe = np.zeros(img.shape[:-1] + (4,), dtype=np.uint8)
    rgbe[..., :3] = np.clip(img * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(valid, e + 128, 0).astype(np.uint8)
    rgbe[~valid] = 0
    return rgbe


def write_hdr(path: str, img: np.ndarray) -> None:
    h, w = img.shape[:2]
    rgbe = _rgbe_encode(img[..., :3].astype(np.float32))
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())


class HeadlessOutput:
    def __init__(self, opt, size, display_count: int = 1):
        self.prefix = opt.headless
        self.compression = opt.compression
        self.format = opt.format
        self.filetype = opt.filetype
        self.size = size
        self.display_count = display_count
        self.single_frame = not opt.animation_flag and not opt.frames
        self.first_frame_index = opt.skip_frames
        self.skip_nan_check = False
        self.frame_counter = 0
        self._pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=max(os.cpu_count() or 1, 1))
        self._futures = []
        d = os.path.dirname(self.prefix)
        if d:
            os.makedirs(d, exist_ok=True)

    def nan_scan(self, img: np.ndarray, name: str):
        """(reference: src/headless.cc:325-335)"""
        nan_mask = ~np.isfinite(img) & np.isnan(img)
        if nan_mask.any():
            ys, xs = np.nonzero(nan_mask.any(axis=-1))
            TR_WARN(f"NaN detected in {name} at "
                    f"{[(int(x), int(y)) for x, y in zip(xs[:8], ys[:8])]}"
                    f"{' ...' if len(xs) > 8 else ''}")

    def save_frame(self, images: np.ndarray,
                   frame_number: Optional[int] = None) -> None:
        """images: (V, H, W, 4) float32."""
        if self.filetype == "none":
            self.frame_counter += 1
            return
        if frame_number is None:
            frame_number = self.first_frame_index + self.frame_counter
        self.frame_counter += 1
        for display in range(images.shape[0]):
            filename = self.prefix
            if self.display_count > 1:
                filename += f"{display}_"
            if not self.single_frame:
                filename += str(frame_number)
            img = np.asarray(images[display])
            if not self.skip_nan_check:
                self.nan_scan(img, filename)
            self._futures.append(
                self._pool.submit(self._write, filename, img))

    def _write(self, filename: str, img: np.ndarray) -> None:
        ft = self.filetype
        if ft == "exr":
            filename += ".exr"
            half = self.format in ("rgb16", "rgba16")
            nchan = 3 if self.format.startswith("rgb1") or \
                self.format == "rgb32" else 4
            exr.write_rgb(filename, img[..., :nchan],
                          compression=self.compression, half=half)
        elif ft in ("png", "bmp"):
            from PIL import Image
            filename += "." + ft
            arr = np.clip(img, 0, 1)
            if ft == "png":
                arr = (arr * 255 + 0.5).astype(np.uint8)
                Image.fromarray(arr, "RGBA").save(filename)
            else:
                arr = (arr[..., :3] * 255 + 0.5).astype(np.uint8)
                Image.fromarray(arr, "RGB").save(filename)
        elif ft == "hdr":
            filename += ".hdr"
            write_hdr(filename, img)
        elif ft == "raw":
            filename += ".raw"
            img.astype(np.float32).tofile(filename)
        TR_LOG("Saved", filename)

    def finish(self):
        for f in self._futures:
            f.result()
        self._futures.clear()
