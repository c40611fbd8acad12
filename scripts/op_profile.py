#!/usr/bin/env python
"""Top device ops for one bench frame (finer than bench.py's 4-bucket
breakdown): answers what exactly 'gather' and 'other' are."""
import glob
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    from bench import run_config
    W = H = int(os.environ.get("TAURAY_BENCH_SIZE", "256"))
    spp = int(os.environ.get("TAURAY_BENCH_SPP", "16"))
    dt, lanes, useful, rr = run_config(W, H, 4, spp, 2,
                                       os.environ.get(
                                           "TAURAY_BENCH_SCENE",
                                           "/root/reference/test/test.glb"))
    print(f"frame {dt*1e3:.1f} ms, {lanes/dt/1e6:.2f} Mrays/s")
    prof_dir = "/tmp/tauray_op_prof"
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
        rows.append((float(c[7] or 0) / 1000,
                     " | ".join(str(c[i])[:60] for i in (0, 2))))
    rows.sort(reverse=True)
    tot = sum(t for t, _ in rows)
    print(f"total device {tot:.1f} ms")
    for t, op in rows[:30]:
        print(f"  {t:8.2f} ms  {op[:130]}")


if __name__ == "__main__":
    main()
