"""ReSTIR renderer (reference: src/restir_renderer.cc: per view
envmap → G-buffer raster → restir → svgf → tonemap → taa)."""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cluster import (build_cluster_tracer, refit_cluster_tracer,
                           tri_opacity)
from ..ops.lights import NEEWeights
from ..ops.shading import (get_camera_projection, get_screen_camera_ray,
                           interpolate_vertex, sample_material)
from ..scene.device import to_camera_uniforms, to_device_scene
from ..stages.restir import Reservoir, ReSTIRConfigKey, restir_di_pass
from ..stages.tonemap import tonemap
from .base import Renderer
from .post_processing import PostProcessingPipeline
from .sh_renderer import SHRenderer


@partial(jax.jit, static_argnames=("width", "height", "has_alpha"))
def _gbuffer_pass(scene, bvh, cam, prev_cam, width, height, min_ray_dist,
                  has_alpha):
    """Primary-visibility G-buffer (reference: the raster G-buffer pass of
    restir_renderer, src/restir_renderer.cc:8-160)."""
    from ..ops.trace_utils import trace_alpha
    H, W = height, width
    R = H * W
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    pix = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
    vp = jnp.zeros(R, jnp.int32)
    size = jnp.array([W, H], jnp.float32)
    origin, d = get_screen_camera_ray(cam, vp, pix, size)
    hit = trace_alpha(scene, bvh, origin, d,
                      jnp.full(R, min_ray_dist), jnp.full(R, jnp.inf),
                      1e-4, has_alpha)
    miss = hit.tri_id < 0
    v = interpolate_vertex(scene, hit.tri_id, hit.u, hit.v, d)
    mat, v = sample_material(scene, v)
    motion = get_camera_projection(prev_cam, vp, v.prev_pos)
    r = lambda x, C: x.reshape(H, W, C)
    inst = jnp.where(miss, -1, v.instance_id)
    return dict(
        pos=r(v.pos, 3), normal=r(v.mapped_normal, 3), view=r(d, 3),
        albedo=r(mat.albedo, 4),
        mr=r(jnp.stack([mat.metallic, mat.roughness], -1), 2),
        transmittance=mat.transmittance.reshape(H, W),
        emission=r(mat.emission, 3),
        motion=r(motion, 3)[..., :2], miss=miss.reshape(H, W),
        inst=inst.reshape(H, W))


class ReSTIRRenderer(Renderer):
    def __init__(self, opt, hybrid: bool = False):
        super().__init__(opt)
        self.hybrid = hybrid
        self._prev_cam = None
        self.sh_source = SHRenderer(opt) if hybrid else None

    def _scene_changed(self):
        opt = self.opt
        self.device_scene = to_device_scene(self.arrays,
                                            opt.transparent_background)
        self.bvh, self._perm = build_cluster_tracer(
            self.arrays.tri_pos, self.arrays.tri_instance,
            tri_opaque=tri_opacity(self.arrays.tri_instance,
                                   self.arrays.inst_has_alpha),
            strategy=self.opt.as_strategy,
            inst_dynamic=self.arrays.inst_dynamic,
            inst_entity=self.arrays.inst_entity)
        self._prev_cam = None
        self.frame_idx = 0
        nee = NEEWeights.from_options(opt, self.arrays)
        r = opt.restir
        # hybrid mode drops tri/env light reservoirs
        # (reference: restir-hybrid preset sample-emissive-triangles 0)
        self.cfg_key = ReSTIRConfigKey(
            nee=nee, canonical_samples=r.canonical_samples,
            spatial_samples=r.spatial_samples, passes=r.passes,
            max_confidence=r.max_confidence,
            temporal=r.temporal_reuse,
            min_ray_dist=opt.min_ray_dist,
            bounce_mode=opt.bounce_mode,
            max_radius=r.max_search_radius,
            temporal_visibility=not r.assume_unchanged_temporal_visibility)
        # GI path reservoirs (reference: restir path tracing with shift
        # mappings, restir_core.glsl; DI above covers the primary-vertex
        # direct term, GI covers bounces >= 1)
        self.gi_cfg = None
        if opt.max_ray_depth >= 2 and not self.hybrid:
            from ..stages.restir_gi import ReSTIRGIConfigKey
            self.gi_cfg = ReSTIRGIConfigKey(
                nee=nee, shift=r.shift_mapping_type,
                gi_depth=opt.max_ray_depth,
                canonical_samples=r.canonical_samples,
                spatial_samples=r.spatial_samples, passes=r.passes,
                max_confidence=r.max_confidence,
                temporal=r.temporal_reuse,
                min_ray_dist=opt.min_ray_dist,
                bounce_mode=opt.bounce_mode,
                max_radius=r.max_search_radius,
                has_alpha=self.arrays.any_alpha_materials,
                has_envmap=self.arrays.environment_map is not None,
                reconnection_scale=r.reconnection_scale)
        self.prev_gi = None
        self.prev_res: Optional[Reservoir] = None
        self.prev_pos = None
        self.post = PostProcessingPipeline(opt, opt.width, opt.height,
                                           len(self.viewports()))

    def update_frame(self):
        self.bvh = self.device_update_frame(self.bvh, self._perm)

    def render_device(self):
        opt = self.opt
        H, W = opt.height, opt.width
        vps = self.viewports()
        cam = to_camera_uniforms(self.arrays.camera_uniforms(vps))
        prev_cam = self._prev_cam if self._prev_cam is not None else cam
        if self.sh_source is not None:
            self.sh_source.step(self)

        gbuf = _gbuffer_pass(self.device_scene, self.bvh, cam, prev_cam,
                             W, H, opt.min_ray_dist,
                             self.arrays.any_alpha_materials)
        if self.prev_res is None:
            self.prev_res = Reservoir.empty(H, W)
            self.prev_pos = gbuf["pos"]
            self.prev_inst = gbuf["inst"]
        di, res = restir_di_pass(
            self.device_scene, self.bvh, gbuf["pos"], gbuf["normal"],
            gbuf["view"], gbuf["albedo"], gbuf["mr"],
            gbuf["transmittance"], gbuf["motion"], self.prev_res,
            self.prev_pos, jnp.uint32(self.frame_idx), self.cfg_key,
            gbuf_inst=gbuf["inst"], prev_inst=self.prev_inst)
        color = di + gbuf["emission"]
        if self.gi_cfg is not None:
            from ..stages.restir_gi import PathReservoir, restir_gi_pass
            if self.prev_gi is None:
                self.prev_gi = PathReservoir.empty(H, W)
            gi, gres = restir_gi_pass(
                self.device_scene, self.bvh, gbuf["pos"], gbuf["normal"],
                gbuf["view"], gbuf["albedo"], gbuf["mr"],
                gbuf["transmittance"], gbuf["motion"], self.prev_gi,
                self.prev_pos, jnp.uint32(self.frame_idx), self.gi_cfg,
                gbuf_inst=gbuf["inst"], prev_inst=self.prev_inst)
            self.prev_gi = gres
            color = color + gi
        self.prev_res = res
        self.prev_pos = gbuf["pos"]
        self.prev_inst = gbuf["inst"]
        self.frame_idx += 1
        if self.sh_source is not None:
            sh = self.sh_source.current_grid_data()
            if sh is not None:
                # "fake indirect" via SH probes (reference:
                # restir_stage.hh hybrid mode)
                from ..ops.sh import eval_irradiance
                coef, w2l = sh
                local = jnp.einsum("ij,hwj->hwi", w2l[:3, :3],
                                   gbuf["pos"]) + w2l[:3, 3]
                # nearest-probe lookup
                rz, ry, rx = coef.shape[:3]
                g = jnp.clip(((local * 0.5 + 0.5) *
                              jnp.array([rx, ry, rz])).astype(jnp.int32),
                             0, jnp.array([rx - 1, ry - 1, rz - 1]))
                c = coef[g[..., 2], g[..., 1], g[..., 0]]
                E = eval_irradiance(c, gbuf["normal"], opt.sh_order)
                color = color + jnp.maximum(E, 0.0) * \
                    gbuf["albedo"][..., :3] / jnp.pi
        bg = jnp.broadcast_to(self.device_scene.env_factor[None, None, :3],
                              (H, W, 3))
        color = jnp.where(gbuf["miss"][..., None], bg, color)
        img = jnp.concatenate(
            [color, jnp.ones((H, W, 1), jnp.float32)], axis=-1)[None]

        self._prev_cam = cam
        if (self.post.use_svgf or self.post.use_bmfr or self.post.use_taa or
                self.post.use_temporal_reprojection):
            view_z = -(jnp.einsum("hwj,j->hw", gbuf["pos"],
                                  cam.view[0, 2, :3]) + cam.view[0, 2, 3])
            # DI is already albedo-modulated, so feed the denoiser a white
            # albedo to avoid double modulation (full demodulated-channel
            # ReSTIR is the round-2 path)
            pp = dict(color=img,
                      diffuse=jnp.concatenate(
                          [di, jnp.ones((H, W, 1))], -1)[None],
                      reflection=jnp.zeros((1, H, W, 4)),
                      albedo=jnp.ones((1, H, W, 4)),
                      normal=gbuf["normal"][None],
                      pos=gbuf["pos"][None],
                      screen_motion=jnp.concatenate(
                          [gbuf["motion"], jnp.zeros((H, W, 1))], -1)[None],
                      metallic_roughness=gbuf["mr"][None],
                      emission=gbuf["emission"][None],
                      view_z=view_z[None])
            out = self.post.process(pp, cam_origin=np.asarray(cam.origin))
        else:
            out = tonemap(img, opt.tonemap, opt.exposure, opt.gamma)
        return out
