"""Multi-device distributed path tracing over a `jax.sharding.Mesh`.

This is the TPU counterpart of the reference's multi-GPU rt_renderer
(reference: src/rt_renderer.cc:84-183): each device renders its slice of
the frame per the distribution strategy; the reference's explicit
device→device transfers + stitch stage (reference: src/device_transfer.cc,
src/stitch_stage.cc) collapse into a sharded `shard_map` program whose
output is gathered over ICI and scattered back to frame positions.

Dynamic load balancing re-slices the shuffled-strips pixel ranges with
static max-size padding, so workload changes never recompile
(SURVEY.md §5.7: "pad-to-max strip counts"). When accumulation is active,
re-sliced devices restart their sample counters and are blended into the
existing accumulation with ratio 1/(frames+1)
(reference: src/rt_renderer.cc:164-183).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..log import TR_WARN
from ..parallel import distribution as dist_mod
from ..parallel.load_balancer import LoadBalancer
from ..parallel.mesh import make_mesh
from ..stages.path_tracer import (PTConfig, accumulate,
                                  pt_trace_pass_inline)
from ..stages.tonemap import tonemap
from .rt_renderer import PathTracerRenderer


class DistributedPathTracerRenderer(PathTracerRenderer):
    """Path tracer sharded over a device mesh.

    Scene arrays are replicated on every device (the reference replicates
    the scene + BLAS/TLAS per GPU too; reference: src/rt_renderer.cc:192);
    rays/pixels are sharded.
    """

    def __init__(self, opt, mesh: Optional[Mesh] = None,
                 direct_only: bool = False):
        self.mesh = mesh if mesh is not None else make_mesh(opt.mesh_shape)
        # --fake-devices=N: each physical device carries N logical
        # workloads, exercising the full distribution/stitch/balancing
        # path without the hardware (reference: src/context.cc fake device
        # multiplication, SURVEY.md §4 --fake-devices test mode)
        self.fake = max(int(getattr(opt, "fake_devices", 0)), 1)
        self.n_devices = self.mesh.devices.size * self.fake
        super().__init__(opt, direct_only=direct_only)

    # ------------------------------------------------------------------
    def _scene_changed(self):
        super()._scene_changed()
        opt = self.opt
        D = self.n_devices
        strategy = opt.distribution_strategy
        if D <= 1:
            strategy = dist_mod.DUPLICATE  # (reference: tauray.cc:520-521)
        self.strategy = strategy
        # static per-device ray budget across rebalances
        self.max_count = dist_mod.get_distribution_max_count(
            (opt.width, opt.height), strategy, D)
        # pad to ray-call granularity
        self.max_count = -(-self.max_count // 128) * 128
        if strategy == dist_mod.SHUFFLED_STRIPS:
            # cap the per-device budget: load balancing may not exceed
            # this fraction of the frame on one device
            cap = min(self.max_count,
                      -(-(4 * opt.width * opt.height) // (128 * D)) * 128)
            self.max_count = cap
        # --workload: initial per-device ratios (reference: options.hh
        # workload + rt_renderer.cc initial distribution); normalized,
        # padded with the mean for missing devices
        wl = list(getattr(opt, "workload", []) or [])[:D]
        if wl and any(w > 0 for w in wl):
            wl = [max(float(w), 0.0) for w in wl]
            wl += [sum(wl) / len(wl)] * (D - len(wl))
            tot = sum(wl)
            self.workloads = [w / tot for w in wl]
        else:
            self.workloads = [1.0 / D] * D
        self.accumulated_frames = 0
        self._stitch_blend = 1.0
        self._refresh_distribution()
        self._build_sharded_fn()

    def _refresh_distribution(self):
        opt = self.opt
        D = self.n_devices
        pixs, valids, lins = [], [], []
        cumulative = 0.0
        self.dist_params = []
        for i in range(D):
            ratio = min(max(self.workloads[i], 0.0), 1.0 - cumulative)
            p = dist_mod.get_device_distribution_params(
                (opt.width, opt.height), self.strategy, cumulative, ratio,
                i, D, i == 0)
            if self.strategy == dist_mod.SHUFFLED_STRIPS:
                cumulative += ratio
            self.dist_params.append(p)
            pix, valid, lin = dist_mod.device_pixel_positions(p,
                                                              self.max_count)
            if p.strategy == dist_mod.SHUFFLED_STRIPS and \
                    p.count > self.max_count:
                TR_WARN(f"device {i} workload clamped "
                        f"({p.count} > {self.max_count} rays)")
                valid[self.max_count:] = False
            pixs.append(pix)
            valids.append(valid)
            lins.append(lin)
        shard = NamedSharding(self.mesh, P("dev"))
        self._pix_d = jax.device_put(np.stack(pixs), shard)
        self._valid_d = jax.device_put(np.stack(valids), shard)
        self._lin = np.stack(lins)
        self._lin_d = jnp.asarray(self._lin.astype(np.int32))
        self._valid_host = np.stack(valids)

    def _build_sharded_fn(self):
        cfg = self.cfg
        mesh = self.mesh
        V = cfg.n_views
        F = self.fake
        D = self.n_devices
        # multi-view renders (camera grids / Looking Glass quilts) shard
        # the VIEW axis across devices instead of pixels (reference:
        # src/restir_renderer.cc:84-106 maps views to GPUs); each device
        # renders whole frames for its view subset and the "stitch" is a
        # concatenation
        self.view_sharded = V >= D > 1 and self.fake == 1 and \
            self.strategy != dist_mod.DUPLICATE
        if self.view_sharded:
            self._build_view_sharded_fn()
            return

        def per_device(scene, bvh, cam, prev_cam, pix, valid, prev_samples):
            # local block shapes: pix (F, N, 2), valid (F, N) — one row
            # per logical workload mapped to this physical device
            outs_f = []
            for f in range(F):
                pix_f = pix[f]
                valid_f = valid[f]
                N = pix_f.shape[0]
                outs = []
                for v in range(V):
                    vp = jnp.full(N, v, jnp.int32)
                    outs.append(pt_trace_pass_inline(
                        cfg, scene, bvh, cam, prev_cam, pix_f, vp,
                        jnp.full(N, prev_samples[f], jnp.uint32)))
                color = jnp.stack(outs)          # (V, N, 4)
                outs_f.append(
                    jnp.where(valid_f[None, :, None], color, 0.0))
            return jnp.stack(outs_f)             # (F, V, N, 4)

        try:
            from jax import shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map
        specs = dict(mesh=mesh,
                     in_specs=(P(), P(), P(), P(), P("dev"), P("dev"),
                               P("dev")),
                     out_specs=P("dev"))
        try:
            smapped = shard_map(per_device, check_vma=False, **specs)
        except TypeError:
            smapped = shard_map(per_device, check_rep=False, **specs)
        self._sharded_render = jax.jit(smapped)

    def _build_view_sharded_fn(self):
        cfg = self.cfg
        mesh = self.mesh
        V = cfg.n_views
        D = self.n_devices
        W, H = cfg.width, cfg.height
        self._vpad = -(-V // D) * D
        vids = np.arange(self._vpad, dtype=np.int32).reshape(D, -1)
        vids = np.minimum(vids, V - 1)
        self._view_ids = jax.device_put(
            vids, NamedSharding(self.mesh, P("dev")))
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        pixf = np.stack([xs.reshape(-1), ys.reshape(-1)],
                        axis=-1).astype(np.int32)
        self._pix_full = jnp.asarray(pixf)

        def per_device(scene, bvh, cam, prev_cam, vids_local, prev):
            outs = []
            N = H * W
            for k in range(vids_local.shape[1]):
                vp = jnp.full(N, vids_local[0, k], jnp.int32)
                outs.append(pt_trace_pass_inline(
                    cfg, scene, bvh, cam, prev_cam, self._pix_full, vp,
                    jnp.full(N, prev[0], jnp.uint32)))
            return jnp.stack(outs)[None]        # (1, V_local, N, 4)

        try:
            from jax import shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map
        specs = dict(mesh=mesh,
                     in_specs=(P(), P(), P(), P(), P("dev"), P("dev")),
                     out_specs=P("dev"))
        try:
            smapped = shard_map(per_device, check_vma=False, **specs)
        except TypeError:
            smapped = shard_map(per_device, check_rep=False, **specs)
        self._view_render = jax.jit(smapped)

    # ------------------------------------------------------------------
    def set_device_workloads(self, ratios: List[float]):
        """(reference: src/rt_renderer.cc set_device_workloads)"""
        if self.strategy in (dist_mod.DUPLICATE, dist_mod.SCANLINE):
            return
        self.workloads = list(ratios)
        self._refresh_distribution()
        if self.opt.accumulation:
            self._stitch_blend = 1.0 / (self.accumulated_frames + 1)

    def render_device(self):
        cfg = self.cfg
        opt = self.opt
        vps = self.viewports()
        from ..scene.device import to_camera_uniforms
        cam = to_camera_uniforms(self.arrays.camera_uniforms(vps))
        prev_cam = self._prev_cam if self._prev_cam is not None else cam
        # slot-ordered triangle tables matching the tracer's slot-id
        # mode (see PathTracerRenderer._slot_scene)
        scene_slots = self._slot_scene()

        n_passes = self.samples_per_pixel // self.samples_per_pass
        sample_base = self.samples_accumulated
        W, H, V = cfg.width, cfg.height, cfg.n_views
        # stitch + accumulation stay on-device: partial frames move over
        # ICI inside the jitted scatter (reference: src/stitch_stage.cc
        # composes on the display GPU; rt_renderer.cc:164-183 blends
        # across rebalances). The host only sees the final tonemapped
        # frame.
        color_full = self.accum_color
        if color_full is None or not hasattr(color_full, "shape") or \
                tuple(color_full.shape) != (V, H, W, 4):
            color_full = jnp.zeros((V, H, W, 4), jnp.float32)
        if getattr(self, "view_sharded", False):
            for p in range(n_passes):
                prev_n = sample_base + p * self.samples_per_pass
                prev = jax.device_put(
                    np.full((self.n_devices,), prev_n, np.uint32),
                    NamedSharding(self.mesh, P("dev")))
                chunks = self._view_render(
                    scene_slots, self.bvh, cam, prev_cam,
                    self._view_ids, prev)        # (D, V_local, N, 4)
                frame = chunks.reshape(self._vpad, H, W, 4)[:V]
                t = 0.0 if prev_n == 0 else \
                    prev_n / (prev_n + self.samples_per_pass)
                color_full = color_full * t + frame * (1.0 - t)
            self.accum_color = color_full
            self.samples_accumulated = sample_base + self.samples_per_pixel
            self.accumulated_frames += 1
            self._prev_cam = cam
            return tonemap(color_full, opt.tonemap, opt.exposure,
                           opt.gamma)
        lin_d = self._lin_d
        valid_d = self._valid_d
        for p in range(n_passes):
            prev = np.full((self.n_devices,),
                           sample_base + p * self.samples_per_pass,
                           np.uint32)
            prev = jax.device_put(prev, NamedSharding(self.mesh, P("dev")))
            chunks = self._sharded_render(
                scene_slots, self.bvh, cam, prev_cam,
                self._pix_d, self._valid_d, prev)          # (D, V, N, 4)
            prev_n = sample_base + p * self.samples_per_pass
            if p == 0 and self._stitch_blend < 1.0:
                t = 1.0 - self._stitch_blend
            elif prev_n == 0:
                t = 0.0
            else:
                t = prev_n / (prev_n + self.samples_per_pass)
            color_full = dist_mod.stitch_accumulate(
                (H, W), chunks, lin_d, valid_d, color_full,
                jnp.float32(t))
        self._stitch_blend = 1.0
        self.accum_color = color_full
        self.samples_accumulated = sample_base + self.samples_per_pixel
        self.accumulated_frames += 1
        self._prev_cam = cam
        return tonemap(color_full, opt.tonemap, opt.exposure, opt.gamma)
