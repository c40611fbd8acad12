#!/usr/bin/env python
"""Per-op device-time breakdown for the Sponza-class 1080p bench point.

Round-5 bisect tool for VERDICT r4 ask #1: where do the Sponza frame's
milliseconds go (trace kernel vs phase-1 slab/sort vs sig-sort pass vs
gathers), and how do TAURAY_SIG_SC / TAURAY_VM_KERNEL change it.
"""
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    import jax
    from tauray_tpu.options import parse_command_line_options
    from tauray_tpu.app.main import load_scenes, create_renderer

    W, H, depth, spp = 1920, 1080, 4, 1
    scene = os.environ.get("SCENE", "proc://sponza?tris=262144")
    opt = parse_command_line_options([
        "--renderer=path-tracer", f"--width={W}", f"--height={H}",
        f"--max-ray-depth={depth}", f"--samples-per-pixel={spp}",
        f"--samples-per-pass={spp}", "--headless=unused",
        "--filetype=none", scene])
    s = load_scenes(opt)
    rr = create_renderer(opt, s)
    rr.set_scene(s)
    rr.reset_accumulation()
    rr.render()
    np.asarray(rr.accum_color)

    times = []
    for _ in range(3):
        rr.reset_accumulation()
        t0 = time.perf_counter()
        rr.render()
        np.asarray(rr.accum_color)
        times.append(time.perf_counter() - t0)
    print("wall ms:", [round(t * 1000, 1) for t in times])

    prof_dir = "/tmp/tauray_sponza_prof"
    shutil.rmtree(prof_dir, ignore_errors=True)
    rr.reset_accumulation()
    with jax.profiler.trace(prof_dir):
        rr.render()
        np.asarray(rr.accum_color)
    os.environ.setdefault(
        "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    files = glob.glob(prof_dir + "/plugins/profile/*/*.xplane.pb")
    from xprof.convert import raw_to_tool_data as rtd
    out, _ = rtd.xspace_to_tool_data(files, "framework_op_stats", {})
    d = json.loads(out if isinstance(out, str) else out.decode())
    rows = []
    total = 0.0
    for r in d[0]["rows"]:
        c = [x.get("v") for x in r["c"]]
        if c[1] != "Device" or c[2] == "IDLE":
            continue
        ms = float(c[7] or 0) / 1000
        total += ms
        rows.append((ms, str(c[2])))
    rows.sort(reverse=True)
    print(f"device total: {total:.1f} ms")
    for ms, op in rows[:25]:
        print(f"  {ms:9.2f} ms  {op[:110]}")


if __name__ == "__main__":
    main()
