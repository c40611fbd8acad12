"""tauray_tpu — a TPU-native real-time/offline path tracing framework.

A from-scratch reimplementation of the capabilities of vga-group/tauray
(C++17 + Vulkan multi-GPU path tracer) designed for TPUs: JAX/XLA for the
host-orchestrated compute graph, Pallas for hot kernels, and
``jax.sharding``/``shard_map`` over device meshes for the image-space
distribution strategies that tauray implements with multi-GPU Vulkan
(reference: /root/reference/src/distribution_strategy.cc).

Layer map (mirrors SURVEY.md §1):
  io/        — EXR/PNG/HDR codecs, glTF loading        (L2/L4 assets)
  scene/     — ECS-lite scene graph + flat GPU arrays  (L4)
  ops/       — Pallas/XLA kernels: RNG, BVH, BSDF, ... (L5 device code)
  stages/    — composable jitted render transforms     (L5)
  renderer/  — stage orchestration + distribution      (L6)
  parallel/  — device mesh, sharding strategies        (§2.7)
  app/       — CLI, run loop, headless output          (L7)
  net/       — DSHGI / frame streaming services        (out-of-process)
"""

__version__ = "0.1.0"

import os as _os


def _setup_compilation_cache():
    """Persist XLA compilations across processes; render programs are large
    and recompiling them dominates startup otherwise."""
    try:
        import jax
        cache_dir = _os.environ.get("TAURAY_TPU_CACHE",
                                    _os.path.expanduser("~/.tauray_tpu_cache"))
        # namespace by platform: remotely-compiled (axon) AOT blobs must not
        # be replayed on the local CPU backend
        platform = _os.environ.get("JAX_PLATFORMS", "default")
        cache_dir = _os.path.join(cache_dir, platform.replace(",", "_"))
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_setup_compilation_cache()

