#!/usr/bin/env python
"""PT golden-deficit PROOF runner (VERDICT r4 ask #4).

docs/PT_DEFICIT.md attributes the residual golden MSE to the golden's
pre-update shading model (colored Schlick metallic Fresnel, which the
current reference shader replaced with an albedo-tinted scalar lobe).
This script turns the attribution into a number: it renders the golden
comparison twice — stock model vs TAURAY_COLORED_FRESNEL=1 — and prints
whole-image MSE plus per-material-region mean error (segmented by the
albedo AOV, which matches the golden at MSE 0.000).

Run on the TPU: python scripts/pt_deficit_proof.py
(The flag is read at import time, so the two renders run as
subprocesses.)
"""
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SCENE = "/root/reference/test/test.glb"
GOLDEN = "/root/reference/test/references/validate_path-tracer.exr"
SPP = int(os.environ.get("PT_PROOF_SPP", "256"))
SIZE = int(os.environ.get("PT_PROOF_SIZE", "512"))

# (name, albedo rgb) from the test scene's materials (PT_DEFICIT.md)
REGIONS = [
    ("white", (1.0, 1.0, 1.0)),
    ("blue", (0.0, 0.0, 0.8)),
    ("red", (0.8, 0.08, 0.0)),
    ("glass", (0.48, 0.6, 0.28)),
    ("metal", (0.72, 0.22, 0.0)),
]


def render(out, colored: bool):
    env = dict(os.environ)
    env["TAURAY_COLORED_FRESNEL"] = "1" if colored else "0"
    cmd = [sys.executable, "-m", "tauray_tpu",
           "--renderer=path-tracer", f"--width={SIZE}",
           f"--height={SIZE}", f"--samples-per-pixel={SPP}",
           "--samples-per-pass=16", f"--headless={out}", SCENE]
    subprocess.run(cmd, check=True, env=env, cwd=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))


def render_albedo(out):
    cmd = [sys.executable, "-m", "tauray_tpu", "--renderer=albedo",
           f"--width={SIZE}", f"--height={SIZE}", f"--headless={out}",
           SCENE]
    subprocess.run(cmd, check=True, cwd=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))


def main():
    from tauray_tpu.io import exr
    golden = exr.read_rgb(GOLDEN)
    with tempfile.TemporaryDirectory(prefix="pt-proof") as td:
        render_albedo(f"{td}/alb")
        alb = exr.read_rgb(f"{td}/alb.exr")
        results = {}
        for tag, colored in (("stock", False), ("colored_fresnel", True)):
            render(f"{td}/{tag}", colored)
            img = exr.read_rgb(f"{td}/{tag}.exr")
            diff = np.nan_to_num(img - golden, nan=0.0, posinf=0.0,
                                 neginf=0.0)
            entry = {"mse_quantum": round(float(np.mean(diff ** 2)) *
                                          65535, 2)}
            for name, rgb in REGIONS:
                m = (np.abs(alb - np.array(rgb)).max(axis=-1) < 0.02)
                if not m.any():
                    continue
                ours = float(img[m].mean())
                gold = float(golden[m].mean())
                entry[name] = {
                    "pixels": int(m.sum()), "ours": round(ours, 4),
                    "golden": round(gold, 4),
                    "rel_err_pct": round((ours - gold) / max(gold, 1e-9)
                                         * 100, 2)}
            results[tag] = entry
            print(tag, json.dumps(entry))
        print(json.dumps(results))


if __name__ == "__main__":
    main()
