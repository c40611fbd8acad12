"""SH probe renderer (reference: src/sh_renderer.cc,
shader/sh_path_tracer.rgen + sh_compact.comp).

Per SH grid: path-trace `samples_per_probe` rays from each probe center,
project the sampled radiance onto the SH basis (the sh_compact reduction)
and temporally blend into the grid with `--dshgi-temporal-ratio`
(reference: src/sh_path_tracer_stage.hh temporal_ratio). Draws nothing
itself (reference: src/sh_renderer.hh:15-47) — the raster renderer
consumes the grids."""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rng as rng_ops
from ..ops import sh as sh_ops
from ..ops.lights import NEEWeights
from ..ops.sampling import sample_sphere
from ..stages.path_tracer import PTConfig, evaluate_ray, _finalize_sample


class SHRenderer:
    """Bakes all scene SH grids; acts as `sh_source` for RasterRenderer
    (reference: src/dshgi_renderer.hh local SH source)."""

    def __init__(self, opt):
        self.opt = opt
        self.frame = 0
        self._grids = None

    def current_grid_data(self) -> Optional[Tuple]:
        """Returns (coef_grid, world_to_local) of the first grid."""
        if not self._grids:
            return None
        return self._grids[0]

    def grid_payloads(self):
        """Serializable grid state for DSHGI streaming."""
        return self._grids or []

    def step(self, host_renderer):
        """Advance probe baking by one frame using the host renderer's
        device scene + tracer."""
        opt = self.opt
        arrays = host_renderer.arrays
        # slot-ordered tables when the host tracer runs in slot-id mode
        scene = (host_renderer._slot_scene()
                 if hasattr(host_renderer, "_slot_scene")
                 else host_renderer.device_scene)
        tracer = host_renderer.bvh
        grids = arrays.scene.sh_grids()
        if not grids:
            self._grids = None
            return
        out = []
        for gi, e in enumerate(grids):
            g = e.sh_grid
            g.set_order(opt.sh_order)
            probes = g.probe_positions(e.transform)      # (P, 3)
            P = probes.shape[0]
            S = min(opt.samples_per_probe, 512)
            cfg = PTConfig(
                width=1, height=1, n_views=1,
                max_bounces=max(opt.max_ray_depth, 1),
                nee=NEEWeights.from_options(opt, arrays),
                min_ray_dist=opt.min_ray_dist,
                mis_mode=opt.multiple_importance_sampling,
                bounce_mode=opt.bounce_mode,
                tri_light_mode=opt.tri_light_mode,
                indirect_clamping=opt.indirect_clamping,
                regularization_gamma=opt.regularization,
                has_envmap=arrays.environment_map is not None,
                has_point_lights=arrays.point_count > 0,
                has_alpha_materials=arrays.any_alpha_materials,
                rng_seed=opt.rng_seed)
            # deterministic per-(probe, sample, frame) seeds
            pid = np.repeat(np.arange(P, dtype=np.uint32), S)
            sid = np.tile(np.arange(S, dtype=np.uint32), P)
            coord = np.stack([pid, sid, np.full(P * S, gi, np.uint32),
                              np.full(P * S, self.frame, np.uint32)],
                             axis=-1)
            seed = rng_ops.init_random_sampler(jnp.asarray(coord))
            seed, u = rng_ops.generate_uniform_random(seed)
            dirs = sample_sphere(u[:, :2])
            origins = jnp.asarray(np.repeat(probes, S, axis=0))
            diffuse, refl, fh, _ = evaluate_ray(cfg, scene, tracer, seed,
                                                origins, dirs)
            from ..scene.device import to_camera_uniforms
            cam = to_camera_uniforms(
                arrays.camera_uniforms(host_renderer.viewports()))
            color, _ = _finalize_sample(
                cfg, cam, jnp.zeros(P * S, jnp.int32), diffuse, refl,
                fh["albedo"], fh["metallic"], fh["emission"],
                fh["vertex_prev_pos"])
            # probe visibility channel (reference:
            # shader/sh_path_tracer.rgen:88-95): w = first-hit distance in
            # VOXEL units, clamped to sqrt(3) — probes are never used
            # further than one voxel away. cell_scale mirrors
            # sh_path_tracer_stage.cc:132 (0.5*resolution/scale, here
            # folded into world_to_local's linear part).
            w2l = np.linalg.inv(
                e.transform.get_global_transform()).astype(np.float32)
            res_half = 0.5 * np.array(
                [g.resolution[0], g.resolution[1], g.resolution[2]],
                np.float32)
            dl = jnp.einsum("ij,rj->ri", jnp.asarray(w2l[:3, :3]), dirs) * \
                jnp.asarray(res_half)
            world_dist = jnp.linalg.norm(fh["vertex_pos"] - origins, axis=-1)
            hit_ok = fh["instance_id"] >= 0
            dist = jnp.where(
                hit_ok,
                jnp.clip(world_dist * jnp.linalg.norm(dl, axis=-1),
                         0.0, math.sqrt(3.0)),
                math.sqrt(3.0))
            color4 = jnp.concatenate([color, dist[:, None]], axis=-1)
            # project to SH per probe (sh_compact reduction)
            basis = sh_ops.sh_basis(dirs, g.order)       # (P*S, C)
            w = 4.0 * math.pi / S
            coef = jnp.einsum("psc,psk->pck",
                              basis.reshape(P, S, -1),
                              color4.reshape(P, S, 4)) * w
            rz, ry, rx = g.resolution[2], g.resolution[1], g.resolution[0]
            coef = np.asarray(coef).reshape(rx, ry, rz, -1, 4)
            coef = coef.transpose(2, 1, 0, 3, 4)  # (rz, ry, rx, C, 4)
            ratio = opt.dshgi_temporal_ratio
            if self.frame == 0:
                g.coefficients = coef.astype(np.float32)
            else:
                g.coefficients = (g.coefficients * (1 - ratio) +
                                  coef * ratio).astype(np.float32)
            world_to_local = np.linalg.inv(
                e.transform.get_global_transform()).astype(np.float32)
            out.append((jnp.asarray(g.coefficients),
                        jnp.asarray(world_to_local)))
        self._grids = out
        self.frame += 1
