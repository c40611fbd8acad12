#!/usr/bin/env python3
"""Per-op device-time profile of one PT render pass on the real TPU.

Dumps the top ops by device self-time so throughput work targets the
actual hot spots instead of category guesses (bench.py only aggregates
into trace/gather/sort/other). Usage:

    python scripts/perf_probe.py [--spp 16] [--size 256] [--depth 4]
"""

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--scene", default="/root/reference/test/test.glb")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import numpy as np
    import jax
    from tauray_tpu.options import parse_command_line_options
    from tauray_tpu.app.main import load_scenes, create_renderer

    opt = parse_command_line_options([
        "--renderer=path-tracer", f"--width={args.size}",
        f"--height={args.size}", f"--max-ray-depth={args.depth}",
        f"--samples-per-pixel={args.spp}", f"--samples-per-pass={args.spp}",
        "--headless=unused", "--filetype=none", args.scene])
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
    dt = min(times)
    lanes = args.size * args.size * args.spp * (2 * args.depth - 1)
    print(f"frame: {dt*1000:.1f} ms  lanes {lanes/1e6:.2f}M  "
          f"=> {lanes/dt/1e6:.2f} Mrays/s")

    prof_dir = "/tmp/tauray_perf_probe"
    shutil.rmtree(prof_dir, ignore_errors=True)
    rr.reset_accumulation()
    with jax.profiler.trace(prof_dir):
        rr.render()
        np.asarray(rr.accum_color)
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
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
        rows.append((ms, str(c[2]), str(c[3] or "")))
    rows.sort(reverse=True)
    print(f"total device: {total:.1f} ms")
    for ms, op, extra in rows[:args.top]:
        print(f"{ms:9.2f} ms  {100*ms/total:5.1f}%  {op}  {extra[:80]}")


if __name__ == "__main__":
    main()
