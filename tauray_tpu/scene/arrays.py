"""Scene → flat device arrays: the TPU-native `scene_stage`.

The reference's scene_stage uploads instances/materials/lights/cameras to
every GPU each frame and runs skinning / triangle-light extraction /
pre-transform kernels (reference: src/scene_stage.cc:1026-1496,
shader/skinning.comp, shader/extract_tri_lights.comp,
shader/pre_transform.comp). Here the same data becomes one pytree of jnp
arrays with static shapes:

  * geometry is merged into a single world-space triangle soup
    (the ALL_MERGED strategy, reference: src/scene_stage.hh:20-26) with
    per-triangle instance ids; skinning is an einsum before the transform.
  * per-instance material/emission tables mirror the `instance` struct
    (reference: shader/scene.glsl:43-53).
  * triangle lights are extracted from emissive instances.
  * cameras are stacked per viewport with current+previous matrices
    (reference: src/scene_stage.cc camera pair upload).

Building is numpy (host) for the static topology; per-frame transform
updates touch only the world-space vertex arrays.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .light import DirectionalLight, PointLight, Spotlight
from .material import Material
from .scene import Scene

TRI_PAD = 256  # pad triangle count: keeps pallas tile shapes static


def _normal_matrix(m: np.ndarray) -> np.ndarray:
    return np.linalg.inv(m[:3, :3]).T.astype(np.float32)


@dataclass
class InstanceGeom:
    """Object-space geometry of one instance (static per topology)."""
    positions: np.ndarray  # (N, 3)
    normals: np.ndarray    # (N, 3)
    uvs: np.ndarray        # (N, 2)
    tangents: np.ndarray   # (N, 4)
    indices: np.ndarray    # (M, 3)
    joints: Optional[np.ndarray]
    weights: Optional[np.ndarray]
    entity_index: int
    material: Material
    shadow_terminator_mul: float


class SceneArrays:
    """Flat, static-shape scene arrays + per-frame update.

    All arrays are numpy here; renderers move them to device (and shard
    them) as jnp arrays. Attributes ending in `_prev` hold last frame's
    values for temporal algorithms (reference: src/scene_stage.hh:241-250).
    """

    def __init__(self, scene: Scene, opt: Any = None):
        self.scene = scene
        self.force_double_sided = bool(opt and opt.force_double_sided)
        self.force_single_sided = bool(opt and opt.force_single_sided)
        self.alpha_to_transmittance = bool(opt and opt.alpha_to_transmittance)
        self.transmittance_to_alpha = float(
            opt.transmittance_to_alpha) if opt is not None else -1.0
        self.gather_emissive = True
        if opt is not None and opt.sample_emissive_triangles <= 0:
            self.gather_emissive = False
        self.shadow_terminator_fix = bool(
            opt.shadow_terminator_fix) if opt is not None else True
        self._collect_instances()
        self._build_static()
        self.update()
        # initialize prev == current
        self.tri_pos_prev = self.tri_pos.copy()
        self.inst_model_prev = self.inst_model.copy()

    # ------------------------------------------------------------------
    def _collect_instances(self):
        self.instances: List[InstanceGeom] = []
        for ei, e in enumerate(self.scene.entities):
            if e.model is None:
                continue
            st_mul = 1.0
            if self.shadow_terminator_fix and \
                    e.model.shadow_terminator_offset > 0.0:
                # (reference: src/scene_stage.cc shadow_terminator_mul calc)
                st_mul = 1.0 / (1.0 - 0.5 * e.model.shadow_terminator_offset)
            for vg in e.model.groups:
                m = vg.mesh
                self.instances.append(InstanceGeom(
                    positions=m.positions, normals=m.normals, uvs=m.uvs,
                    tangents=m.tangents, indices=m.indices,
                    joints=m.joints, weights=m.weights,
                    entity_index=ei, material=vg.mat,
                    shadow_terminator_mul=st_mul))
        # (I,) entity per instance — per-model AS grouping merges
        # instances (vertex groups) of the same entity (reference:
        # src/scene_stage.cc:886-895 PER_MODEL hash-combines consecutive
        # same-object instances into one BLAS)
        self.inst_entity = np.asarray(
            [ig.entity_index for ig in self.instances], np.int64)

    def _effective_material(self, mat: Material) -> Material:
        import copy
        m = copy.copy(mat)
        if self.force_double_sided:
            m.double_sided = True
        elif self.force_single_sided and m.transmittance <= 0:
            m.double_sided = False
        # --alpha-to-transmittance / --transmittance-to-alpha material
        # rewrites (reference: src/tauray.cc:154-177)
        if self.alpha_to_transmittance:
            a = float(np.asarray(m.albedo_factor).reshape(-1)[3])
            if a < 1.0:
                m.albedo_factor = np.array(m.albedo_factor, np.float32)
                m.transmittance = 1.0 - a
                m.albedo_factor[3] = 1.0
        elif self.transmittance_to_alpha >= 0.0:
            mixf = 1.0 + (self.transmittance_to_alpha - 1.0) * \
                float(m.transmittance)
            m.albedo_factor = np.asarray(
                m.albedo_factor, np.float32) * np.float32(mixf)
        return m

    def _build_static(self):
        insts = self.instances
        I = max(len(insts), 1)
        self.num_instances = len(insts)

        # --- per-instance material tables (reference: shader/scene.glsl) ---
        self.inst_albedo = np.ones((I, 4), dtype=np.float32)
        self.inst_metallic = np.zeros(I, dtype=np.float32)
        self.inst_roughness = np.ones(I, dtype=np.float32)
        self.inst_emission = np.zeros((I, 3), dtype=np.float32)
        self.inst_transmittance = np.zeros(I, dtype=np.float32)
        self.inst_ior = np.full(I, 1.45, dtype=np.float32)
        self.inst_normal_factor = np.ones(I, dtype=np.float32)
        self.inst_double_sided = np.zeros(I, dtype=np.bool_)
        self.inst_alpha_cutoff = np.full(I, -1.0, dtype=np.float32)
        self.inst_tex = np.full((I, 4), -1, dtype=np.int32)  # albedo, mr, normal, emission
        self.inst_st_mul = np.ones(I, dtype=np.float32)
        self.inst_light_base = np.full(I, -1, dtype=np.int32)
        self.inst_has_alpha = np.zeros(I, dtype=np.bool_)
        self.inst_blend = np.zeros(I, dtype=np.bool_)
        self.inst_model = np.tile(np.eye(4, dtype=np.float32), (I, 1, 1))

        mats = []
        for i, ig in enumerate(insts):
            mat = self._effective_material(ig.material)
            mats.append(mat)
            self.inst_albedo[i] = mat.albedo_factor
            self.inst_metallic[i] = mat.metallic_factor
            self.inst_roughness[i] = mat.roughness_factor
            self.inst_emission[i] = mat.emission_factor
            self.inst_transmittance[i] = mat.transmittance
            self.inst_ior[i] = mat.ior
            self.inst_normal_factor[i] = mat.normal_factor
            self.inst_double_sided[i] = mat.double_sided
            self.inst_alpha_cutoff[i] = mat.alpha_cutoff
            self.inst_tex[i] = [mat.albedo_tex, mat.metallic_roughness_tex,
                                mat.normal_tex, mat.emission_tex]
            self.inst_st_mul[i] = ig.shadow_terminator_mul
            # transparency-capable: constant alpha < 1 or an albedo texture
            # with a non-opaque alpha channel (drives alpha-tested traversal)
            has_alpha = mat.albedo_factor[3] < 1.0
            texs = getattr(self.scene, "textures", [])
            if 0 <= mat.albedo_tex < len(texs):
                if (texs[mat.albedo_tex][..., 3] < 255).any():
                    has_alpha = True
            self.inst_has_alpha[i] = has_alpha
            self.inst_blend[i] = getattr(mat, "blend", False)
        self.any_alpha_materials = bool(self.inst_has_alpha.any())
        self.any_blend_materials = bool(self.inst_blend.any())
        self._materials = mats

        # --- merged object-space soup, gathered per-corner -----------------
        tri_inst, opos, onorm, ouv, otan = [], [], [], [], []
        tri_light_count = 0
        for i, ig in enumerate(insts):
            idx = ig.indices
            tri_inst.append(np.full(len(idx), i, dtype=np.int32))
            opos.append(ig.positions[idx])      # (M, 3, 3)
            onorm.append(ig.normals[idx])
            ouv.append(ig.uvs[idx])
            otan.append(ig.tangents[idx])
            if self.gather_emissive and mats[i].is_emissive():
                self.inst_light_base[i] = tri_light_count
                tri_light_count += len(idx)

        if insts:
            self.obj_pos = np.concatenate(opos)
            self.obj_normal = np.concatenate(onorm)
            self.obj_uv = np.concatenate(ouv)
            self.obj_tangent = np.concatenate(otan)
            self.tri_instance = np.concatenate(tri_inst)
        else:
            self.obj_pos = np.zeros((0, 3, 3), dtype=np.float32)
            self.obj_normal = np.zeros((0, 3, 3), dtype=np.float32)
            self.obj_uv = np.zeros((0, 3, 2), dtype=np.float32)
            self.obj_tangent = np.zeros((0, 3, 4), dtype=np.float32)
            self.tri_instance = np.zeros(0, dtype=np.int32)

        # pad to TRI_PAD multiple with degenerate triangles
        T = len(self.tri_instance)
        self.num_triangles = T
        pad = (-T) % TRI_PAD if T else TRI_PAD
        if pad:
            self.obj_pos = np.concatenate(
                [self.obj_pos, np.zeros((pad, 3, 3), dtype=np.float32)])
            self.obj_normal = np.concatenate(
                [self.obj_normal, np.zeros((pad, 3, 3), dtype=np.float32)])
            self.obj_uv = np.concatenate(
                [self.obj_uv, np.zeros((pad, 3, 2), dtype=np.float32)])
            self.obj_tangent = np.concatenate(
                [self.obj_tangent, np.zeros((pad, 3, 4), dtype=np.float32)])
            self.tri_instance = np.concatenate(
                [self.tri_instance, np.full(pad, -1, dtype=np.int32)])
        self.padded_triangles = len(self.tri_instance)

        # --- skinning tables ------------------------------------------------
        self._skinned = [ig.joints is not None for ig in insts]
        # dynamic instances (animated transform chain or skinned) drive
        # --as-strategy grouping (reference: src/scene_stage.hh:20-26)
        animated_tf = set()
        for e in self.scene.entities:
            if e.animations and e.transform is not None:
                animated_tf.add(id(e.transform))
        dyn = []
        for ig in insts:
            e = self.scene.entities[ig.entity_index]
            d = ig.joints is not None
            t = e.transform
            while t is not None and not d:
                if id(t) in animated_tf:
                    d = True
                t = getattr(t, "parent", None)
            dyn.append(d)
        self.inst_dynamic = np.asarray(dyn, bool) if dyn else \
            np.zeros(0, bool)

        # --- lights ----------------------------------------------------------
        self._build_lights()
        self._build_textures()
        self.environment_map = None
        envs = self.scene.environment_maps()
        if envs:
            self.environment_map = envs[0].environment_map

    def _build_lights(self):
        s = self.scene
        pls = s.point_lights()
        P = max(len(pls), 1)
        self.point_count = len(pls)
        self.pl_color = np.zeros((P, 3), dtype=np.float32)
        self.pl_pos = np.zeros((P, 3), dtype=np.float32)
        self.pl_dir = np.zeros((P, 3), dtype=np.float32)
        self.pl_radius = np.zeros(P, dtype=np.float32)
        self.pl_dir_cutoff = np.zeros(P, dtype=np.float32)
        self.pl_dir_falloff = np.zeros(P, dtype=np.float32)
        self.pl_cutoff_radius = np.zeros(P, dtype=np.float32)
        self.pl_spot_radius = np.full(P, -1.0, dtype=np.float32)
        self._pl_entities = pls

        dls = s.directional_lights()
        # exclude spotlights (subclass of PointLight, not directional)
        D = max(len(dls), 1)
        self.dir_count = len(dls)
        self.dl_color = np.zeros((D, 3), dtype=np.float32)
        self.dl_dir = np.zeros((D, 3), dtype=np.float32)
        self.dl_dir_cutoff = np.zeros(D, dtype=np.float32)
        self._dl_entities = dls

    def _build_textures(self):
        from .device import build_tex_atlas
        texs = getattr(self.scene, "textures", [])
        if not texs:
            texs = [np.zeros((1, 1, 4), np.uint8)]
        sizes = np.zeros((len(texs), 2), dtype=np.int32)
        for i, t in enumerate(texs):
            sizes[i] = [t.shape[1], t.shape[0]]  # (w, h)
        self.texture_size = sizes
        # mip-mapped 4x4-block atlas (built once; textures are static):
        # HBM scales with total texel count, not count x max-size
        self.tex_atlas, self.tex_meta, self.tex_nmips = \
            build_tex_atlas(texs, sizes)

    # ------------------------------------------------------------------
    def update(self, keep_prev: bool = False):
        """Per-frame: recompute world-space soup + light params from the
        transform hierarchy (the scene_stage 'update' pass)."""
        if keep_prev:
            self.tri_pos_prev = self.tri_pos
            self.inst_model_prev = self.inst_model.copy()

        insts = self.instances
        I = max(len(insts), 1)
        models = np.tile(np.eye(4, dtype=np.float32), (I, 1, 1))
        normal_ms = np.tile(np.eye(3, dtype=np.float32), (I, 1, 1))
        for i, ig in enumerate(insts):
            t = self.scene.entities[ig.entity_index].transform
            m = t.get_global_transform() if t is not None else np.eye(4, np.float32)
            models[i] = m
            normal_ms[i] = _normal_matrix(m)
        self.inst_model = models
        self.inst_normal_matrix = normal_ms

        # skinning (einsum over joint matrices), then world transform
        pos = self.obj_pos
        nrm = self.obj_normal
        tan = self.obj_tangent[..., :3]
        if any(self._skinned):
            pos = pos.copy()
            nrm = nrm.copy()
            tan = tan.copy()
            self._apply_skinning(pos, nrm, tan)

        inst_of_tri = np.maximum(self.tri_instance, 0)
        m = models[inst_of_tri]            # (T, 4, 4)
        nm = normal_ms[inst_of_tri]        # (T, 3, 3)
        world_pos = np.einsum("tij,tcj->tci", m[:, :3, :3], pos) + m[:, None, :3, 3]
        world_n = np.einsum("tij,tcj->tci", nm, nrm)
        world_t = np.einsum("tij,tcj->tci", nm, tan)
        # geometric (hard) normal: object-space cross transformed by the
        # normal matrix, matching rt.glsl get_interpolated_vertex (handles
        # mirrored instances correctly, unlike a world-space edge cross)
        hard = np.cross(pos[:, 1] - pos[:, 0], pos[:, 2] - pos[:, 0])
        hard = np.einsum("tij,tj->ti", nm, hard)
        ln = np.linalg.norm(hard, axis=-1, keepdims=True)
        self.tri_hard_normal = (hard / np.maximum(ln, 1e-30)).astype(np.float32)
        self.tri_pos = world_pos.astype(np.float32)
        self.tri_normal = world_n.astype(np.float32)
        self.tri_tangent = np.concatenate(
            [world_t.astype(np.float32), self.obj_tangent[..., 3:]], axis=-1)
        self.tri_uv = self.obj_uv
        if not keep_prev:
            self.tri_pos_prev = self.tri_pos
            self.inst_model_prev = self.inst_model.copy()

        self._update_lights()
        self._extract_tri_lights()

    def _apply_skinning(self, pos, nrm, tan):
        """Linear blend skinning (reference: shader/skinning.comp)."""
        tri_offset = 0
        for i, ig in enumerate(self.instances):
            ntri = len(ig.indices)
            if ig.joints is None:
                tri_offset += ntri
                continue
            e = self.scene.entities[ig.entity_index]
            model = e.model
            joints = np.stack([j.get_global_transform()
                               for j in model.joint_nodes])
            if model.inverse_bind_matrices is not None:
                joints = np.einsum("jab,jbc->jac", joints,
                                   model.inverse_bind_matrices)
            # undo the instance's own model matrix: skinning matrices are
            # world-space, but the soup is re-transformed by inst_model later
            t = e.transform
            inv_m = np.linalg.inv(t.get_global_transform()) if t else np.eye(4)
            joints = np.einsum("ab,jbc->jac", inv_m, joints).astype(np.float32)

            jw = ig.weights  # (N, 4)
            ji = ig.joints   # (N, 4)
            vm = np.einsum("nk,nkab->nab", jw, joints[ji])  # (N, 4, 4)
            p = np.einsum("nab,nb->na",
                          vm[:, :3, :3], ig.positions) + vm[:, :3, 3]
            nmat = vm[:, :3, :3]
            n = np.einsum("nab,nb->na", nmat, ig.normals)
            tg = np.einsum("nab,nb->na", nmat, ig.tangents[:, :3])
            idx = ig.indices
            pos[tri_offset:tri_offset + ntri] = p[idx]
            nrm[tri_offset:tri_offset + ntri] = n[idx]
            tan[tri_offset:tri_offset + ntri] = tg[idx]
            tri_offset += ntri

    def _update_lights(self):
        for i, e in enumerate(self._pl_entities):
            l: PointLight = e.light
            t = e.transform
            self.pl_color[i] = l.color
            self.pl_pos[i] = t.get_global_position() if t is not None else 0
            self.pl_radius[i] = l.radius
            self.pl_cutoff_radius[i] = l.get_cutoff_radius()
            if isinstance(l, Spotlight):
                self.pl_dir[i] = (t.get_global_direction()
                                  if t is not None else (0, 0, -1))
                self.pl_dir_cutoff[i] = np.cos(np.radians(l.cutoff_angle))
                self.pl_dir_falloff[i] = l.falloff_exponent
                self.pl_spot_radius[i] = l.get_cutoff_radius() * \
                    np.tan(np.radians(l.cutoff_angle))
            else:
                self.pl_dir[i] = 0
                self.pl_dir_cutoff[i] = 0.0
                self.pl_dir_falloff[i] = 0.0
                self.pl_spot_radius[i] = -1.0
        for i, e in enumerate(self._dl_entities):
            l: DirectionalLight = e.light
            t = e.transform
            self.dl_color[i] = l.color
            self.dl_dir[i] = (t.get_global_direction()
                              if t is not None else (0, 0, -1))
            self.dl_dir_cutoff[i] = np.cos(np.radians(l.angle))

    def _extract_tri_lights(self):
        """Emissive-triangle lights (reference:
        shader/extract_tri_lights.comp). World-space corners + emission."""
        sel = []
        for i in range(self.num_instances):
            if self.inst_light_base[i] >= 0:
                sel.append(i)
        if not sel:
            self.tri_light_count = 0
            self.tl_pos = np.zeros((1, 3, 3), dtype=np.float32)
            self.tl_emission = np.zeros((1, 3), dtype=np.float32)
            self.tl_uv = np.zeros((1, 3, 2), dtype=np.float32)
            self.tl_tex = np.full(1, -1, dtype=np.int32)
            self.tl_tri_index = np.zeros(1, dtype=np.int32)
            return
        masks = np.isin(self.tri_instance, np.array(sel, dtype=np.int32))
        idx = np.nonzero(masks)[0]
        self.tri_light_count = len(idx)
        self.tl_pos = self.tri_pos[idx]
        inst = self.tri_instance[idx]
        self.tl_emission = self.inst_emission[inst]
        self.tl_uv = self.tri_uv[idx]
        self.tl_tex = self.inst_tex[inst, 3]
        self.tl_tri_index = idx.astype(np.int32)

    # ------------------------------------------------------------------
    def camera_uniforms(self, viewports: List, prev: Optional[Dict] = None
                        ) -> Dict[str, np.ndarray]:
        """Stack camera_data for a list of (Camera, Transformable) pairs."""
        cur = {}
        datas = [cam.get_uniform_data(t) for cam, t in viewports]
        for key in datas[0]:
            cur[key] = np.stack([d[key] for d in datas]).astype(np.float32)
        return cur
