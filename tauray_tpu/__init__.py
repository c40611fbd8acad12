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
