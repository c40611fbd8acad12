#!/usr/bin/env python
"""Times unsorted vs packed-sorted traversal on REAL production waves
(captured from an actual bench-config frame via path_tracer._WAVE_DUMP),
which keep pixel-block coherence the synthetic labs lack."""
import os
import sys
import time

os.environ["TAURAY_HOST_WAVEFRONT"] = "1"   # concrete per-wave arrays

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sort_timing_lab import trace_packed_sorted, trace_unsorted, bench


def main():
    from tauray_tpu.options import parse_command_line_options
    from tauray_tpu.app.main import load_scenes, create_renderer
    from tauray_tpu.stages import path_tracer as pt
    from tauray_tpu.ops.cluster import build_cluster_tracer
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
    rr.render()                                   # compile
    pt._WAVE_DUMP = []
    rr.reset_accumulation()
    rr.render()
    waves = [(k, np.asarray(o), np.asarray(d),
              np.broadcast_to(np.asarray(tmin, np.float32),
                              np.asarray(tm).shape), np.asarray(tm))
             for k, o, d, tmin, tm in pt._WAVE_DUMP]
    pt._WAVE_DUMP = None
    arrays = SceneArrays(s, opt)
    tracer, _ = build_cluster_tracer(
        np.asarray(arrays.tri_pos), np.asarray(arrays.tri_instance))

    tot_u = tot_p = 0.0
    for i, (k, o, d, tmin, tm) in enumerate(waves):
        o = jnp.asarray(o)
        d = jnp.asarray(d)
        tm = jnp.asarray(tm)
        # production t_min captured with the wave (ADVICE r3 low #4)
        tmin = jnp.asarray(tmin)
        ah = k == "shadow"
        ms_u, r_u = bench(trace_unsorted, tracer, o, d, tmin, tm,
                          any_hit=ah, n=3)
        ms_p, r_p = bench(trace_packed_sorted, tracer, o, d, tmin, tm,
                          any_hit=ah, n=3)
        mism = float(jnp.mean((r_u[1] != r_p[1]).astype(jnp.float32)))
        live = float(jnp.mean((tm > 0).astype(jnp.float32)))
        tot_u += ms_u
        tot_p += ms_p
        print(f"{i}:{k:6s} live={live:4.2f} unsorted {ms_u:7.1f} ms  "
              f"packed-sorted {ms_p:7.1f} ms  id-mismatch={mism:.4f}",
              flush=True)
    print(f"TOTAL unsorted {tot_u:.0f} ms   packed-sorted {tot_p:.0f} ms")


if __name__ == "__main__":
    main()
