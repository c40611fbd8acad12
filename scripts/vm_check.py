#!/usr/bin/env python
"""A/B the VMEM-resident traversal kernel against the DMA-streaming
kernel on real camera rays from the bench scene: closest-hit results
must match bit-exactly (same MT arithmetic, same front-to-back order)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TAURAY_PALLAS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from tauray_tpu.options import parse_command_line_options
from tauray_tpu.app.main import load_scenes
from tauray_tpu.scene.arrays import SceneArrays
from tauray_tpu.ops import cluster as cl
from tauray_tpu.ops import pallas_trace as ptr


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/test/test.glb"
    opt = parse_command_line_options([
        "--renderer=path-tracer", "--width=256", "--height=256",
        "--headless=unused", "--filetype=none", scene_path])
    s = load_scenes(opt)
    arrays = SceneArrays(s, opt)
    tracer, _ = cl.build_cluster_tracer(arrays.tri_pos,
                                        arrays.tri_instance)
    C = tracer.n_clusters
    print(f"scene {scene_path}: {arrays.tri_pos.shape[0]} tris, "
          f"{C} clusters, BW table {C*12*128*4/1e6:.1f} MB, "
          f"vm_fits={ptr.vm_fits(C)}")

    rng = np.random.default_rng(0)
    R = 1 << 17
    tp = np.asarray(arrays.tri_pos).reshape(-1, 3)
    lo, hi = tp.min(0), tp.max(0)
    ctr, ext = (lo + hi) / 2, (hi - lo)
    o = (ctr + (rng.random((R, 3)) - 0.5) * ext * 1.5).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    tmin = jnp.full(R, 1e-3, jnp.float32)
    tmax = jnp.full(R, 3e38, jnp.float32)

    for any_hit in (False, True):
        outs = {}
        for name in ("dma", "vm"):
            ptr_orig = ptr.vm_fits
            ptr.vm_fits = (lambda c, _n=name: _n == "vm")
            cl._trace_padded_pallas.clear_cache()
            try:
                hit = cl._trace_padded_pallas(tracer, o, d, tmin, tmax,
                                              any_hit=any_hit,
                                              need_uv=True)
                jax.block_until_ready(hit.t)
                t0 = time.perf_counter()
                for _ in range(3):
                    hit = cl._trace_padded_pallas(tracer, o, d, tmin,
                                                  tmax, any_hit=any_hit,
                                                  need_uv=True)
                    jax.block_until_ready(hit.t)
                dt = (time.perf_counter() - t0) / 3
            finally:
                ptr.vm_fits = ptr_orig
            outs[name] = (np.asarray(hit.t), np.asarray(hit.tri_id), dt)
            print(f"  any_hit={any_hit} {name}: {dt*1e3:7.2f} ms "
                  f"({R/dt/1e6:6.1f} Mrays/s) hits="
                  f"{int((outs[name][1] >= 0).sum())}")
        td, idd, _ = outs["dma"]
        tv, idv, _ = outs["vm"]
        # the VM kernel uses Baldwin-Weber arithmetic, the DMA kernel
        # Möller-Trumbore: same roots up to fp rounding, so compare
        # with a small tolerance and allow winner flips only between
        # (near-)equidistant triangles
        t_match = np.allclose(np.where(np.isfinite(td), td, 0),
                              np.where(np.isfinite(tv), tv, 0),
                              rtol=3e-5, atol=1e-5)
        id_match = float((idd == idv).mean())
        print(f"  any_hit={any_hit}: t allclose={t_match}, "
              f"id agreement={id_match:.4f}")
        if not any_hit:
            assert t_match, "closest-hit t mismatch"
            mism = (idd != idv) & np.isfinite(td) & np.isfinite(tv)
            if mism.any():
                assert np.allclose(td[mism], tv[mism], rtol=1e-4), \
                    f"{int(mism.sum())} id mismatches with different t"
            assert (np.isfinite(td) == np.isfinite(tv)).mean() > 0.9999
    print("OK")


if __name__ == "__main__":
    main()
