"""Post-processing pipeline (reference: src/post_processing_renderer.cc).

Stage order mirrors the reference (reference:
src/post_processing_renderer.hh:59-71): temporal reprojection → denoiser
(SVGF/BMFR) → TAA → tonemap (always last). Previous-frame G-buffers are
held here, standing in for the reference's frame_delay_stage
(reference: src/frame_delay_stage.*)."""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..stages import taa as taa_mod
from ..stages import temporal as temporal_mod
from ..stages.svgf import SVGFParams, SVGFState, svgf_denoise
from ..stages.tonemap import tonemap
from ..ops.ggx import modulate_color


class _Mat:
    pass


class PostProcessingPipeline:
    def __init__(self, opt, width: int, height: int, n_views: int):
        self.opt = opt
        self.W = width
        self.H = height
        self.V = n_views
        self.use_temporal_reprojection = opt.temporal_reprojection > 0
        self.use_svgf = opt.denoiser == "svgf"
        self.use_bmfr = opt.denoiser == "bmfr"
        self.use_taa = opt.taa.sequence_length > 0
        self.svgf_params = SVGFParams.from_options(opt)
        self.reset()

    def reset(self):
        self.prev_color: Optional[np.ndarray] = None
        self.prev_normal = None
        self.prev_pos = None
        self.taa_history = None
        self.svgf_state = [SVGFState.zeros(self.H, self.W)
                           for _ in range(self.V)]
        from ..stages.bmfr import BMFRState
        self.bmfr_state = [BMFRState.zeros(self.H, self.W)
                           for _ in range(self.V)]

    # ------------------------------------------------------------------
    def process(self, gbuf: Dict[str, jnp.ndarray],
                cam_origin=None) -> np.ndarray:
        """gbuf fields, all (V, H, W, C): color, diffuse, reflection,
        albedo, normal, pos, screen_motion, metallic_roughness, view_z.
        Returns tonemapped (V, H, W, 4)."""
        opt = self.opt
        color = gbuf["color"]
        out_views = []
        for v in range(self.V):
            c = color[v]
            normal = gbuf["normal"][v]
            pos = gbuf["pos"][v]
            motion = gbuf["screen_motion"][v][..., :2]
            depth = gbuf["view_z"][v]

            if self.use_svgf or self.use_bmfr:
                diffuse = gbuf["diffuse"][v]
                refl = gbuf["reflection"][v]
                if self.use_svgf:
                    co = (jnp.asarray(cam_origin[v][:3])
                          if cam_origin is not None else None)
                    d, s, st = svgf_denoise(
                        self.svgf_params, self.svgf_state[v], diffuse, refl,
                        motion, normal, pos, depth, cam_origin=co,
                        roughness=gbuf["metallic_roughness"][v][..., 1])
                    self.svgf_state[v] = st
                else:
                    from ..stages.bmfr import bmfr_denoise
                    d, s, st = bmfr_denoise(
                        self.bmfr_state[v], diffuse, refl, motion, normal,
                        pos, gbuf["albedo"][v])
                    self.bmfr_state[v] = st
                m = _Mat()
                m.albedo = gbuf["albedo"][v]
                m.metallic = gbuf["metallic_roughness"][v][..., 0]
                rgb = gbuf["emission"][v] + modulate_color(m, d, s)
                c = jnp.concatenate([rgb, c[..., 3:]], axis=-1)

            if self.use_temporal_reprojection and self.prev_color is not None:
                c = temporal_mod.temporal_reprojection(
                    c, normal, pos, gbuf["screen_motion"][v],
                    self.prev_color[v], self.prev_normal[v],
                    self.prev_pos[v], opt.temporal_reprojection)

            if self.use_taa:
                hist = (self.taa_history[v] if self.taa_history is not None
                        else c)
                c, new_hist = taa_mod.taa(
                    c, hist, motion, depth,
                    alpha=1.0 / opt.taa.sequence_length,
                    gamma=opt.gamma,
                    edge_dilation=opt.taa.edge_dilation,
                    anti_shimmer=opt.taa.anti_shimmer)
                if self.taa_history is None:
                    self.taa_history = [None] * self.V
                self.taa_history[v] = new_hist
            out_views.append(c)

        out = jnp.stack(out_views)
        self.prev_color = out
        self.prev_normal = gbuf["normal"]
        self.prev_pos = gbuf["pos"]
        return tonemap(out, opt.tonemap, opt.exposure, opt.gamma)
