"""Raster renderer (reference: src/raster_renderer.cc: shadow maps →
z-pass → forward raster → post-processing)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cluster import (build_cluster_tracer, refit_cluster_tracer,
                           tri_opacity)
from ..scene.device import to_camera_uniforms, to_device_scene
from ..stages.raster import render_raster
from ..stages.shadow_map import build_shadow_maps
from ..stages.tonemap import tonemap
from .base import Renderer
from .post_processing import PostProcessingPipeline


class RasterRenderer(Renderer):
    def __init__(self, opt, sh_source=None):
        super().__init__(opt)
        self._prev_cam = None
        self.sh_source = sh_source  # SHRenderer / DSHGIClient or None

    def _scene_changed(self):
        self.device_scene = to_device_scene(
            self.arrays, self.opt.transparent_background)
        self.bvh, self._perm = build_cluster_tracer(
            self.arrays.tri_pos, self.arrays.tri_instance,
            tri_opaque=tri_opacity(self.arrays.tri_instance,
                                   self.arrays.inst_has_alpha),
            strategy=self.opt.as_strategy,
            inst_dynamic=self.arrays.inst_dynamic,
            inst_entity=self.arrays.inst_entity)
        self._prev_cam = None
        opt = self.opt
        self.post = PostProcessingPipeline(opt, opt.width, opt.height,
                                           len(self.viewports()))
        self._build_shadow_maps()

    def _build_shadow_maps(self):
        opt = self.opt
        center = self.arrays.tri_pos.reshape(-1, 3).mean(axis=0)
        # cascades center on the mean camera position (reference:
        # shadow_map.cc track_cameras)
        vps = self.viewports()
        cam_pos = None
        if vps:
            cam_pos = np.mean([np.asarray(t.get_global_position(),
                                          np.float32)
                               for _, t in vps], axis=0)
        self.shadow_maps = build_shadow_maps(
            self.arrays, self.bvh, opt, center,
            device_scene=getattr(self, "device_scene", None),
            cam_pos=cam_pos)
        # host-side light -> map-id table
        if self.shadow_maps is not None:
            idx = np.asarray(self.shadow_maps.light_index)
            dir_ids = np.zeros(max(self.arrays.dir_count, 1), np.int32)
            for i in range(self.arrays.dir_count):
                m = np.nonzero(idx == -(i + 1))[0]
                dir_ids[i] = m[0] if len(m) else 0
            pt_base = np.zeros(max(self.arrays.point_count, 1), np.int32)
            pt_nfaces = np.ones(max(self.arrays.point_count, 1), np.int32)
            for i in range(self.arrays.point_count):
                m = np.nonzero(idx == i)[0]
                if len(m):
                    pt_base[i] = m[0]
                    pt_nfaces[i] = len(m)
            self.map_table = (jnp.asarray(dir_ids), jnp.asarray(pt_base),
                              jnp.asarray(pt_nfaces))
        else:
            self.map_table = (jnp.zeros(1, jnp.int32),
                              jnp.zeros(1, jnp.int32),
                              jnp.ones(1, jnp.int32))

    def update_frame(self):
        self.bvh = self.device_update_frame(self.bvh, self._perm)
        self._build_shadow_maps()

    def _sh_data(self):
        if self.sh_source is None:
            return None
        return self.sh_source.current_grid_data()

    def render_device(self):
        opt = self.opt
        if self.sh_source is not None:
            self.sh_source.step(self)
        vps = self.viewports()
        cam = to_camera_uniforms(self.arrays.camera_uniforms(vps))
        prev_cam = self._prev_cam if self._prev_cam is not None else cam
        sh = self._sh_data()
        from ..ops.brdf_lut import load_brdf_lut
        from ..stages.raster import MSAA_LOCATIONS, raster_coverage

        def run_pass(sample_offset=None):
            return render_raster(
                self.device_scene, self.bvh, cam, prev_cam,
                self.shadow_maps, self.map_table, sh, load_brdf_lut(),
                opt.width, opt.height, len(vps),
                np.asarray(opt.ambient, np.float32), opt.min_ray_dist,
                self.shadow_maps is not None, opt.pcf,
                self.arrays.any_alpha_materials, opt.sh_order,
                sh is not None,
                self.arrays.environment_map is not None,
                getattr(self.arrays, "any_blend_materials", False),
                int(opt.pcss), float(opt.pcss_minimum_radius),
                bool(opt.use_probe_visibility), sample_offset,
                max(int(opt.shadow_map_cascades), 1))

        # MSAA (reference: rr_opt.msaa_samples = opt.samples_per_pixel,
        # src/tauray.cc:571): sample count from --samples-per-pixel at
        # the Vulkan standard sample locations. --sample-shading shades
        # every sample (supersampling); otherwise shading stays
        # per-pixel and the samples only resolve geometric coverage
        # against the background, like MSAA's edge-only antialiasing.
        # --tonemap-post-resolve moves the tonemap after the resolve
        # (reference: tonemap_stage.cc POST_RESOLVE).
        S = opt.samples_per_pixel if opt.samples_per_pixel in (2, 4, 8, 16) \
            else 1

        def tm(img):
            return tonemap(img, opt.tonemap, opt.exposure, opt.gamma)

        if S > 1 and opt.sample_shading:
            locs = MSAA_LOCATIONS[S]
            acc = None
            gbuf = None
            for (lx, ly) in locs:
                off = jnp.asarray([lx * 2 - 1, ly * 2 - 1], jnp.float32)
                g = run_pass(off)
                if gbuf is None:
                    gbuf = g
                c = g["color"] if opt.tonemap_post_resolve else tm(g["color"])
                acc = c if acc is None else acc + c
            resolved = acc / S
            if opt.tonemap_post_resolve:
                resolved = tm(resolved)
            gbuf["color"] = resolved
            tonemapped = True
        elif S > 1:
            from ..stages.raster import raster_background
            gbuf = run_pass()
            cov = jnp.zeros(gbuf["color"].shape[:3], jnp.float32)
            for (lx, ly) in MSAA_LOCATIONS[S]:
                off = jnp.asarray([lx * 2 - 1, ly * 2 - 1], jnp.float32)
                cov = cov + raster_coverage(
                    self.device_scene, self.bvh, cam, off, opt.width,
                    opt.height, len(vps), opt.min_ray_dist,
                    self.arrays.any_alpha_materials)
            cov = cov / S
            # per-pixel shading + per-sample coverage: blend the shaded
            # surface against the skybox along silhouettes (pixels whose
            # center ray missed keep their background color, with alpha
            # from the sample coverage)
            bg = raster_background(
                self.device_scene, cam, opt.width, opt.height, len(vps),
                self.arrays.environment_map is not None)
            center_hit = gbuf["color"][..., 3] > 0
            surf = gbuf["color"][..., :3]
            if not opt.tonemap_post_resolve:
                surf = tm(gbuf["color"])[..., :3]
                bg = tm(jnp.concatenate(
                    [bg, jnp.ones_like(bg[..., :1])], -1))[..., :3]
                tonemapped = True
            else:
                tonemapped = False
            col = jnp.where(center_hit[..., None],
                            cov[..., None] * surf +
                            (1 - cov[..., None]) * bg,
                            bg)
            gbuf["color"] = jnp.concatenate(
                [col, cov[..., None]], -1)
        else:
            gbuf = run_pass()
            tonemapped = False

        self._prev_cam = cam
        self.last_gbuf = gbuf   # scripts/raster_deficit.py introspection
        if (self.post.use_svgf or self.post.use_bmfr or self.post.use_taa or
                self.post.use_temporal_reprojection):
            img = self.post.process(gbuf, cam_origin=np.asarray(cam.origin))
        elif not tonemapped:
            img = tonemap(gbuf["color"], opt.tonemap, opt.exposure,
                          opt.gamma)
        else:
            img = gbuf["color"]
        return img
