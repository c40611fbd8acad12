"""Path-tracing renderer (reference: rt_renderer<path_tracer_stage> =
path_tracer_renderer, src/rt_renderer.cc).

Single-device orchestration: scene update → PT passes (samples_per_pixel /
samples_per_pass, reference: src/tauray.cc:396-400) → accumulation →
tonemap. Multi-device distribution lives in renderer/distributed.py."""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..log import TR_WARN
from ..ops.cluster import (build_cluster_tracer, refit_cluster_tracer,
                           tri_opacity)
from ..ops.lights import NEEWeights
from ..scene.device import to_camera_uniforms, to_device_scene
from ..stages.path_tracer import PTConfig, accumulate, pt_trace_pass
from ..stages.tonemap import tonemap
from .base import Renderer


import os as _os

# One fused XLA program per pass by default: the remote-TPU link costs
# milliseconds per dispatch, and the host-orchestrated wavefront makes
# 10+ dispatches per pass. TAURAY_HOST_WAVEFRONT=1 restores per-stage
# dispatch (useful for per-stage profiling/debugging).
_FUSE_PASS = _os.environ.get("TAURAY_HOST_WAVEFRONT", "0") != "1"


@partial(jax.jit, static_argnames=("cfg", "bounce_caps"))
def _render_pass_fused(cfg: PTConfig, scene, bvh, cam, prev_cam, pix, vp,
                       previous_samples, bounce_caps=None):
    return pt_trace_pass(cfg, scene, bvh, cam, prev_cam, pix, vp,
                         previous_samples, bounce_caps=bounce_caps)


def _render_pass(cfg: PTConfig, scene, bvh, cam, prev_cam, pix, vp,
                 previous_samples, bounce_caps=None):
    """Wavefront pass (reference: one vkCmdTraceRays dispatch,
    src/path_tracer_stage.cc)."""
    if _FUSE_PASS:
        return _render_pass_fused(cfg, scene, bvh, cam, prev_cam, pix, vp,
                                  previous_samples, bounce_caps=bounce_caps)
    return pt_trace_pass(cfg, scene, bvh, cam, prev_cam, pix, vp,
                         previous_samples, bounce_caps=bounce_caps)


class PathTracerRenderer(Renderer):
    def __init__(self, opt, direct_only: bool = False):
        super().__init__(opt)
        self.direct_only = direct_only
        self.accum_color: Optional[jnp.ndarray] = None
        self.samples_accumulated = 0
        self._prev_cam = None

    def _scene_changed(self):
        self.device_scene = to_device_scene(
            self.arrays, self.opt.transparent_background)
        # --as-strategy per-model / per-material: true TLAS instancing —
        # shared meshes keep ONE object-space cluster set, instances add
        # only a transform (reference: src/acceleration_structure.hh
        # TLAS over shared BLASes). Other strategies (and skinned
        # scenes) bake world-space clusters.
        self.bvh = None
        self._perm = None
        if self.opt.as_strategy in ("per-model", "per-material"):
            from ..ops.cluster import build_instanced_from_arrays
            self.bvh = build_instanced_from_arrays(self.arrays)
        if self.bvh is None:
            self.bvh, self._perm = build_cluster_tracer(
                self.arrays.tri_pos, self.arrays.tri_instance,
                tri_opaque=tri_opacity(self.arrays.tri_instance,
                                       self.arrays.inst_has_alpha),
                strategy=self.opt.as_strategy,
                inst_dynamic=self.arrays.inst_dynamic,
                inst_entity=self.arrays.inst_entity)
            # slot-id mode: traces return raw slot ids and the PT
            # pipeline reads SLOT-ORDERED triangle tables (_slot_scene),
            # removing the to_orig remap gather from every wave
            # (~7.5 ms/wave at 1M rays)
            self.bvh.slot_ids = True
            self._perm_dev = jnp.asarray(self._perm)
        self._prev_cam = None
        self.accum_color = None
        self.samples_accumulated = 0
        self.frame_counter = 0
        opt = self.opt
        spp = opt.samples_per_pixel
        sppass = min(opt.samples_per_pass, spp)
        spp = ((spp + sppass - 1) // sppass) * sppass
        self.samples_per_pixel = spp
        self.samples_per_pass = sppass
        self.cfg = PTConfig(
            width=opt.width, height=opt.height,
            n_views=len(self.viewports()),
            max_bounces=max(opt.max_ray_depth, 1),
            samples_per_pass=sppass,
            film=opt.film, film_radius=opt.film_radius,
            min_ray_dist=opt.min_ray_dist,
            mis_mode=opt.multiple_importance_sampling,
            bounce_mode=opt.bounce_mode,
            tri_light_mode=opt.tri_light_mode,
            russian_roulette_delta=opt.russian_roulette,
            indirect_clamping=opt.indirect_clamping,
            regularization_gamma=opt.regularization,
            nee=NEEWeights.from_options(opt, self.arrays),
            has_envmap=self.arrays.environment_map is not None,
            has_point_lights=self.arrays.point_count > 0,
            hide_lights=opt.hide_lights,
            use_dof=opt.depth_of_field.f_stop > 0,
            transparent_background=opt.transparent_background,
            use_white_albedo_on_first_bounce=(
                opt.use_white_albedo_on_first_bounce),
            direct_only=self.direct_only,
            rng_seed=opt.rng_seed,
            has_alpha_materials=self.arrays.any_alpha_materials,
            sampler=opt.sampler,
            count_rays=_os.environ.get("TAURAY_COUNT_RAYS", "0") == "1",
            tex_slots=tuple(
                bool((self.arrays.inst_tex[:, k] >= 0).any())
                for k in range(4)),
            tl_textured=bool((self.arrays.tl_tex >= 0).any()))
        V, H, W = self.cfg.n_views, opt.height, opt.width
        # sparse viewport rendering for light fields: only the viewports in
        # --spatial-reprojection are traced; the rest are reprojected
        # (reference: src/spatial_reprojection_stage.hh, options.hh:367-370)
        self.active_views = sorted(
            v for v in opt.spatial_reprojection if v < V) or list(range(V))
        self.use_spatial_reproj = len(self.active_views) < V
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        pix = np.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
        # trace rays in 8x4 PIXEL BLOCKS: a 32-ray traversal tile then
        # covers a compact screen footprint instead of a 32x1 scanline
        # sliver, roughly halving camera-wave cluster activations
        # (results are un-permuted once per frame before any reshape)
        if H % 4 == 0 and W % 8 == 0:
            block = (ys // 4) * (W // 8) + (xs // 8)
            within = (ys % 4) * 8 + (xs % 8)
            order = np.argsort((block * 32 + within).reshape(-1),
                               kind="stable")
            pix = pix[order]
            un = np.argsort(order, kind="stable")
            AVn = len(self.active_views)
            self._ray_unorder = jnp.asarray(
                (un[None, :] + (np.arange(AVn) * H * W)[:, None])
                .reshape(-1).astype(np.int32))
        else:
            self._ray_unorder = None
        pix = np.tile(pix, (len(self.active_views), 1)).astype(np.int32)
        vp = np.repeat(np.asarray(self.active_views, np.int32), H * W)
        # split the frame into multiple device calls: keeps each XLA
        # program short (the remote TPU watchdog kills long kernels) and
        # doubles as the reference's pass batching for progress reporting
        # (reference: src/rt_stage.hh max_passes_per_command_buffer).
        # samples_per_pass batches into the wave (pt_trace_pass), so the
        # pixel count per call shrinks to keep waves near the cap: big
        # enough to amortize fixed costs, small enough for HBM headroom.
        wave_cap = int(_os.environ.get("TAURAY_WAVE_CAP", str(1 << 20)))
        per_call = max(8192, (wave_cap // max(self.samples_per_pass, 1))
                       // 8192 * 8192)
        # pixels per device call: waves up to wave_cap rays. The old
        # 65536-pixel cap split a 1080p 1-spp frame into 32 dispatches,
        # each paying the remote-link dispatch latency and every
        # per-wave fixed cost (measured: Sponza-class 1080p frame wall
        # 4.2 s vs 2.55 s device — the gap was dispatch overhead).
        self.rays_per_call = min(per_call, pix.shape[0])
        R = pix.shape[0]
        padr = (-R) % self.rays_per_call
        if padr:
            pix = np.concatenate([pix, np.zeros((padr, 2), np.int32)])
            vp = np.concatenate([vp, np.zeros(padr, np.int32)])
        self._n_rays = R
        self._pix = jnp.asarray(pix)
        self._vp = jnp.asarray(vp)
        # post-processing pipeline (reprojection / denoiser / TAA / tonemap)
        from .post_processing import PostProcessingPipeline
        self.post = PostProcessingPipeline(opt, W, H, V)
        self.use_post = (self.post.use_svgf or self.post.use_bmfr or
                         self.post.use_taa or
                         self.post.use_temporal_reprojection or
                         self.use_spatial_reproj)

    def update_frame(self):
        self.bvh = self.device_update_frame(self.bvh, self._perm)

    # -- checkpoint/resume (SURVEY.md §5.4): the reference resumes via
    # deterministic seeds + --skip-frames; here the accumulation state is
    # additionally persistable as a true checkpoint --------------------
    def save_checkpoint(self, path: str):
        if self.accum_color is None:
            return
        # np.savez appends ".npz" to extension-less paths; pass an open
        # file object so the exact user-given path is written and
        # load_checkpoint's existence check matches.
        with open(path, "wb") as f:
            np.savez(f, accum_color=np.asarray(self.accum_color),
                     samples_accumulated=self.samples_accumulated,
                     frame_counter=self.frame_counter)

    def load_checkpoint(self, path: str) -> bool:
        import os
        if not os.path.exists(path):
            return False
        data = np.load(path)
        self.accum_color = jnp.asarray(data["accum_color"])
        self.samples_accumulated = int(data["samples_accumulated"])
        self.frame_counter = int(data["frame_counter"])
        return True

    def reset_accumulation(self, keep_samples: bool = False):
        if not keep_samples:
            if not self.opt.accumulation:
                self.accum_color = None
                self.samples_accumulated = 0
            # with --accumulation, offline frames keep accumulating
            # (reference: src/tauray.cc accumulation semantics)

    def _slot_scene(self):
        """Device scene with triangle tables permuted into traversal
        SLOT order (one small (T, 96) gather per frame, vs a 1M-row
        to_orig remap gather per wave)."""
        if self._perm is None or not getattr(self.bvh, "slot_ids", False):
            return self.device_scene
        p = self._perm_dev
        return self.device_scene._replace(
            tri_packed=self.device_scene.tri_packed[p],
            tri_instance=self.device_scene.tri_instance[p])

    def capture_waves(self):
        """Diagnostics: run ONE pass through the HOST-orchestrated
        wavefront (not the fused program) with the wave dump enabled and
        return [(kind, o, d, t_min, t_max)] as numpy arrays — feeds
        bench.py's tests_per_ray metric and the perf-lab scripts."""
        from ..stages import path_tracer as pt
        vps = self.viewports()
        cam = to_camera_uniforms(self.arrays.camera_uniforms(vps))
        scene = self._slot_scene()
        pt._WAVE_DUMP = []
        s = slice(0, self.rays_per_call)
        prev_arr = jnp.zeros(self.rays_per_call, jnp.uint32)
        pt.pt_trace_pass(self.cfg, scene, self.bvh, cam, cam,
                         self._pix[s], self._vp[s], prev_arr)
        waves = [(k, np.asarray(o), np.asarray(d),
                  np.broadcast_to(np.asarray(tmin, np.float32),
                                  np.asarray(tm).shape).copy(),
                  np.asarray(tm))
                 for k, o, d, tmin, tm in pt._WAVE_DUMP]
        pt._WAVE_DUMP = None
        return waves

    def _bounce_cap_schedule(self):
        """Static per-bounce compaction tiers from the PREVIOUS frame's
        live counts (already materialized — zero sync). Quantized to
        {R, R/2, R/4, R/8} with a 1.15 safety margin; correctness never
        depends on the prediction (lax.cond falls back to full width)."""
        if (_os.environ.get("TAURAY_COMPACT", "1") != "1"
                or getattr(self, "_last_live_counts", None) is None):
            return None
        R = self.rays_per_call * self.cfg.samples_per_pass
        counts = np.asarray(self._last_live_counts)
        caps = [R]  # bounce 0: camera rays, all live
        for c in counts:
            need = float(c) * 1.15
            cap = R
            for tier in (R // 8, R // 4, R // 2):
                if need <= tier:
                    cap = tier
                    break
            caps.append(cap)
        caps = tuple(caps)
        return None if all(c >= R for c in caps) else caps

    def render_device(self):
        cfg = self.cfg
        vps = self.viewports()
        cam = to_camera_uniforms(self.arrays.camera_uniforms(vps))
        prev_cam = self._prev_cam if self._prev_cam is not None else cam
        scene = self._slot_scene()

        n_passes = self.samples_per_pixel // self.samples_per_pass
        sample_base = self.samples_accumulated
        n_chunks = self._pix.shape[0] // self.rays_per_call
        color = None
        gchunks = []
        useful = None
        bounce_caps = self._bounce_cap_schedule()
        live_max = None
        for p in range(n_passes):
            prev = jnp.uint32(sample_base + p * self.samples_per_pass)
            chunks = []
            out = None
            for c in range(n_chunks):
                s = slice(c * self.rays_per_call, (c + 1) * self.rays_per_call)
                prev_arr = jnp.full(self.rays_per_call, prev, jnp.uint32)
                out = _render_pass(cfg, scene, self.bvh, cam,
                                   prev_cam, self._pix[s], self._vp[s],
                                   prev_arr, bounce_caps=bounce_caps)
                chunks.append(out.color)
                if out.live_counts is not None and out.live_counts.size:
                    live_max = out.live_counts if live_max is None \
                        else jnp.maximum(live_max, out.live_counts)
                if out.useful_rays is not None:
                    useful = out.useful_rays if useful is None \
                        else useful + out.useful_rays
                if self.use_post and p == n_passes - 1:
                    gchunks.append(out)
            pass_color = jnp.concatenate(chunks)[:self._n_rays]
            if color is None and sample_base == 0 and p == 0:
                color = pass_color
            else:
                base = self.accum_color if (p == 0) else color
                color = accumulate(pass_color, base,
                                   jnp.float32(self.samples_per_pass),
                                   jnp.float32(sample_base +
                                               p * self.samples_per_pass))
        self.accum_color = color
        self.samples_accumulated = sample_base + self.samples_per_pixel
        self._last_out = out
        self.last_useful_rays = useful  # device scalar or None
        self._last_live_counts = live_max  # device (max_bounces-1,) i32
        # dispatched-lane accounting (static — Python ints): camera wave
        # at full width + each bounce/shadow wave at its tier cap
        R = self.rays_per_call * cfg.samples_per_pass
        mb = 2 if cfg.direct_only else cfg.max_bounces
        lanes = R  # bounce 0 (includes its shadow wave at full width)
        if cfg.nee.any and mb > 1:
            lanes += R
        for b in range(1, mb):
            cap = R if bounce_caps is None else min(bounce_caps[b], R)
            lanes += cap
            if cfg.nee.any and b < mb - 1:
                lanes += cap
        self.last_dispatched_lanes = lanes * n_passes * n_chunks
        self._prev_cam = cam
        self.frame_counter += 1

        # accumulation stays in ray order across passes/frames; outputs
        # un-permute to scanline once per frame
        if self._ray_unorder is not None:
            color = color[self._ray_unorder]

        V, H, W = cfg.n_views, cfg.height, cfg.width
        AV = len(self.active_views)
        if self.use_post:
            def cat(field, C):
                x = jnp.concatenate([getattr(o, field) for o in gchunks])
                x = x[:self._n_rays]
                if self._ray_unorder is not None:
                    x = x[self._ray_unorder]
                x = x.reshape(AV, H, W, C)
                if AV == V:
                    return x
                full = jnp.zeros((V, H, W, C), x.dtype)
                return full.at[jnp.asarray(self.active_views)].set(x)
            pos = cat("first_pos", 3)
            view_z = jnp.einsum(
                "vhwj,vj->vhw", pos, jnp.asarray(cam.view[:, 2, :3])) + \
                jnp.asarray(cam.view[:, 2, 3])[:, None, None]
            if self.use_spatial_reproj:
                # fill inactive viewports from the rendered ones
                from ..stages.temporal import spatial_reprojection
                act = jnp.asarray(self.active_views)
                color_av = color.reshape(AV, H, W, 4)
                pos_av = jnp.concatenate(
                    [o.first_pos for o in gchunks])[:self._n_rays]
                inst_av = jnp.concatenate(
                    [o.first_instance for o in gchunks])[:self._n_rays]
                if self._ray_unorder is not None:
                    pos_av = pos_av[self._ray_unorder]
                    inst_av = inst_av[self._ray_unorder]
                pos_av = pos_av.reshape(AV, H, W, 3)
                inst_av = inst_av.reshape(AV, H, W)
                valid_av = inst_av >= 0
                color_full = jnp.zeros((V, H, W, 4), color.dtype)
                color_full = color_full.at[act].set(color_av)
                for v in range(V):
                    if v in self.active_views:
                        continue
                    vpm = jnp.asarray(cam.view_proj[v])
                    filled, mask = spatial_reprojection(
                        vpm, color_av, pos_av, valid_av)
                    color_full = color_full.at[v].set(filled)
                color = color_full.reshape(-1, 4)
            gbuf = dict(
                color=color.reshape(V, H, W, 4),
                diffuse=cat("diffuse", 4),
                reflection=cat("reflection", 4),
                albedo=cat("first_albedo", 4),
                normal=cat("first_normal", 3),
                pos=pos,
                screen_motion=cat("first_screen_motion", 3),
                metallic_roughness=cat("first_metallic_roughness", 2),
                emission=cat("first_emission", 3),
                view_z=-view_z)
            img = self.post.process(gbuf, cam_origin=np.asarray(cam.origin))
        else:
            img = color.reshape(V, H, W, 4)
            img = tonemap(img, self.opt.tonemap, self.opt.exposure,
                          self.opt.gamma)
        return img
