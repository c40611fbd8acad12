#!/usr/bin/env python
"""Top device ops by self-time for one production PT frame on the real
TPU — names + ms, to see what hides inside bench.py's 'other' bucket."""
import glob
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    from tauray_tpu.options import parse_command_line_options
    from tauray_tpu.app.main import load_scenes, create_renderer

    W = H = int(os.environ.get("TAURAY_BENCH_SIZE", "256"))
    spp = int(os.environ.get("TAURAY_BENCH_SPP", "16"))
    scene = os.environ.get("TAURAY_BENCH_SCENE",
                           "/root/reference/test/test.glb")
    opt = parse_command_line_options([
        "--renderer=path-tracer", f"--width={W}", f"--height={H}",
        "--max-ray-depth=4", f"--samples-per-pixel={spp}",
        f"--samples-per-pass={spp}", "--headless=unused",
        "--filetype=none", scene])
    s = load_scenes(opt)
    rr = create_renderer(opt, s)
    rr.set_scene(s)
    rr.reset_accumulation()
    rr.render()

    prof_dir = "/tmp/tauray_op_top"
    shutil.rmtree(prof_dir, ignore_errors=True)
    rr.reset_accumulation()
    with jax.profiler.trace(prof_dir):
        rr.render()
        np.asarray(rr.accum_color)
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION",
                          "python")
    files = glob.glob(prof_dir + "/plugins/profile/*/*.xplane.pb")
    from xprof.convert import raw_to_tool_data as rtd
    out, _ = rtd.xspace_to_tool_data(files, "framework_op_stats", {})
    d = json.loads(out if isinstance(out, str) else out.decode())
    rows = []
    for r in d[0]["rows"]:
        c = [x.get("v") for x in r["c"]]
        if c[1] != "Device" or c[2] == "IDLE":
            continue
        rows.append((float(c[7] or 0) / 1000, str(c[2])))
    rows.sort(reverse=True)
    total = sum(t for t, _ in rows)
    print(f"total device ms: {total:.1f}")
    for t, name in rows[:25]:
        print(f"{t:9.2f}  {name[:110]}")


if __name__ == "__main__":
    main()
