#!/usr/bin/env python
"""Capture real production waves from a bench frame to /tmp/waves.npz
for reuse by perf experiments (avoids re-rendering per experiment)."""
import os
import sys

os.environ["TAURAY_HOST_WAVEFRONT"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from tauray_tpu.options import parse_command_line_options
    from tauray_tpu.app.main import load_scenes, create_renderer
    from tauray_tpu.stages import path_tracer as pt
    from tauray_tpu.scene.arrays import SceneArrays

    scene_path = os.environ.get("TAURAY_BENCH_SCENE",
                                "/root/reference/test/test.glb")
    spp = int(os.environ.get("TAURAY_BENCH_SPP", "16"))
    opt = parse_command_line_options([
        "--renderer=path-tracer", "--width=256", "--height=256",
        "--max-ray-depth=4", f"--samples-per-pixel={spp}",
        f"--samples-per-pass={spp}", "--headless=unused",
        "--filetype=none", scene_path])
    s = load_scenes(opt)
    rr = create_renderer(opt, s)
    rr.set_scene(s)
    rr.reset_accumulation()
    rr.render()
    pt._WAVE_DUMP = []
    rr.reset_accumulation()
    rr.render()
    out = {}
    for i, (k, o, d, tmin, tm) in enumerate(pt._WAVE_DUMP):
        out[f"w{i}_kind"] = np.array(k)
        out[f"w{i}_o"] = np.asarray(o)
        out[f"w{i}_d"] = np.asarray(d)
        out[f"w{i}_tmin"] = np.broadcast_to(
            np.asarray(tmin, np.float32), np.asarray(tm).shape).copy()
        out[f"w{i}_tmax"] = np.asarray(tm)
    pt._WAVE_DUMP = None
    arrays = SceneArrays(s, opt)
    out["tri_pos"] = np.asarray(arrays.tri_pos)
    out["tri_instance"] = np.asarray(arrays.tri_instance)
    out["n_waves"] = np.array(len([k for k in out if k.endswith("_kind")]))
    path = os.environ.get("TAURAY_WAVE_FILE", "/tmp/waves.npz")
    np.savez_compressed(path, **out)
    print(f"saved {out['n_waves']} waves to {path}")


if __name__ == "__main__":
    main()
