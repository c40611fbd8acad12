"""Device-side scene pytree: jnp arrays consumed by jitted render stages.

The boundary between the host scene_stage (scene/arrays.py, numpy) and the
jitted stages. Everything here has static shapes; per-frame animation only
changes array *values*, so render functions stay compiled.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .arrays import SceneArrays


class DeviceScene(NamedTuple):
    # geometry (world space)
    tri_pos: Any            # (T, 3, 3)
    tri_normal: Any         # (T, 3, 3)
    tri_uv: Any             # (T, 3, 2)
    tri_tangent: Any        # (T, 3, 4)
    tri_hard_normal: Any    # (T, 3)
    tri_instance: Any       # (T,) i32
    tri_pos_prev: Any       # (T, 3, 3)
    # per-instance tables
    inst_albedo: Any        # (I, 4)
    inst_metallic: Any      # (I,)
    inst_roughness: Any     # (I,)
    inst_emission: Any      # (I, 3)
    inst_transmittance: Any
    inst_ior: Any
    inst_normal_factor: Any
    inst_double_sided: Any  # (I,) bool
    inst_alpha_cutoff: Any  # (I,)
    inst_tex: Any           # (I, 4) i32
    inst_st_mul: Any        # (I,)
    inst_light_base: Any    # (I,) i32
    inst_has_alpha: Any     # (I,) bool
    inst_blend: Any         # (I,) bool (glTF alphaMode BLEND)
    # lights
    pl_color: Any
    pl_pos: Any
    pl_dir: Any
    pl_radius: Any
    pl_dir_cutoff: Any
    pl_dir_falloff: Any
    pl_cutoff_radius: Any
    pl_spot_radius: Any
    point_light_count: Any  # () i32
    dl_color: Any
    dl_dir: Any
    dl_dir_cutoff: Any
    directional_light_count: Any  # () i32
    tl_pos: Any             # (L, 3, 3)
    tl_emission: Any        # (L, 3)
    tl_uv: Any              # (L, 3, 2)
    tl_tex: Any             # (L,) i32
    tl_tri_index: Any       # (L,) i32
    tri_light_count: Any    # () i32
    # environment
    env_factor: Any         # (4,)
    env_proj: Any           # () i32; -1 = constant color only
    env_map: Any            # (H, W, 3) f32 (1x1 if none)
    env_alias_id: Any       # (H*W,) u32
    env_alias_prob: Any     # (H*W,) u32
    env_pdf: Any            # (H*W,)
    env_alias_pdf: Any      # (H*W,)
    # textures
    textures: Any           # (N, H, W, 4) u8
    texture_size: Any       # (N, 2) i32
    ambient: Any            # (3,)


def to_device_scene(sa: SceneArrays, transparent_background: bool = False
                    ) -> DeviceScene:
    env = sa.environment_map
    if env is not None:
        env_factor = np.append(env.factor, 0.0 if transparent_background else 1.0)
        env_proj = np.int32(0)
        env_map = env.image.astype(np.float32)
        env_alias_id = env.alias_id
        env_alias_prob = env.alias_probability
        env_pdf = env.pdf
        env_alias_pdf = env.alias_pdf
    else:
        env_factor = np.array([0, 0, 0, 0 if transparent_background else 1],
                              dtype=np.float32)
        env_proj = np.int32(-1)
        env_map = np.zeros((1, 1, 3), dtype=np.float32)
        env_alias_id = np.zeros(1, dtype=np.uint32)
        env_alias_prob = np.zeros(1, dtype=np.uint32)
        env_pdf = np.zeros(1, dtype=np.float32)
        env_alias_pdf = np.zeros(1, dtype=np.float32)

    return DeviceScene(
        tri_pos=jnp.asarray(sa.tri_pos),
        tri_normal=jnp.asarray(sa.tri_normal),
        tri_uv=jnp.asarray(sa.tri_uv),
        tri_tangent=jnp.asarray(sa.tri_tangent),
        tri_hard_normal=jnp.asarray(sa.tri_hard_normal),
        tri_instance=jnp.asarray(sa.tri_instance),
        tri_pos_prev=jnp.asarray(sa.tri_pos_prev),
        inst_albedo=jnp.asarray(sa.inst_albedo),
        inst_metallic=jnp.asarray(sa.inst_metallic),
        inst_roughness=jnp.asarray(sa.inst_roughness),
        inst_emission=jnp.asarray(sa.inst_emission),
        inst_transmittance=jnp.asarray(sa.inst_transmittance),
        inst_ior=jnp.asarray(sa.inst_ior),
        inst_normal_factor=jnp.asarray(sa.inst_normal_factor),
        inst_double_sided=jnp.asarray(sa.inst_double_sided),
        inst_alpha_cutoff=jnp.asarray(sa.inst_alpha_cutoff),
        inst_tex=jnp.asarray(sa.inst_tex),
        inst_st_mul=jnp.asarray(sa.inst_st_mul),
        inst_light_base=jnp.asarray(sa.inst_light_base),
        inst_has_alpha=jnp.asarray(sa.inst_has_alpha),
        inst_blend=jnp.asarray(getattr(sa, "inst_blend",
                                       np.zeros_like(sa.inst_has_alpha))),
        pl_color=jnp.asarray(sa.pl_color),
        pl_pos=jnp.asarray(sa.pl_pos),
        pl_dir=jnp.asarray(sa.pl_dir),
        pl_radius=jnp.asarray(sa.pl_radius),
        pl_dir_cutoff=jnp.asarray(sa.pl_dir_cutoff),
        pl_dir_falloff=jnp.asarray(sa.pl_dir_falloff),
        pl_cutoff_radius=jnp.asarray(sa.pl_cutoff_radius),
        pl_spot_radius=jnp.asarray(sa.pl_spot_radius),
        point_light_count=jnp.int32(sa.point_count),
        dl_color=jnp.asarray(sa.dl_color),
        dl_dir=jnp.asarray(sa.dl_dir),
        dl_dir_cutoff=jnp.asarray(sa.dl_dir_cutoff),
        directional_light_count=jnp.int32(sa.dir_count),
        tl_pos=jnp.asarray(sa.tl_pos),
        tl_emission=jnp.asarray(sa.tl_emission),
        tl_uv=jnp.asarray(sa.tl_uv),
        tl_tex=jnp.asarray(sa.tl_tex),
        tl_tri_index=jnp.asarray(sa.tl_tri_index),
        tri_light_count=jnp.int32(sa.tri_light_count),
        env_factor=jnp.asarray(env_factor),
        env_proj=jnp.asarray(env_proj),
        env_map=jnp.asarray(env_map),
        env_alias_id=jnp.asarray(env_alias_id),
        env_alias_prob=jnp.asarray(env_alias_prob),
        env_pdf=jnp.asarray(env_pdf),
        env_alias_pdf=jnp.asarray(env_alias_pdf),
        textures=jnp.asarray(sa.textures),
        texture_size=jnp.asarray(sa.texture_size),
        ambient=jnp.asarray(sa.scene.ambient),
    )


class CameraUniforms(NamedTuple):
    """Stacked per-viewport camera_data (shader/camera.glsl camera_data)."""
    view: Any          # (V, 4, 4)
    view_inverse: Any
    view_proj: Any
    proj_inverse: Any
    origin: Any        # (V, 4)
    dof_params: Any    # (V, 4)
    projection_info: Any
    pan: Any
    proj_type: Any     # (V,) i32: 0 perspective, 1 ortho, 2 equirect


def to_camera_uniforms(d: Dict[str, np.ndarray]) -> CameraUniforms:
    n_vp = d["view"].shape[0]
    proj_type = d.get("proj_type", np.zeros(n_vp, np.float32))
    return CameraUniforms(
        view=jnp.asarray(d["view"]),
        view_inverse=jnp.asarray(d["view_inverse"]),
        view_proj=jnp.asarray(d["view_proj"]),
        proj_inverse=jnp.asarray(d["proj_inverse"]),
        origin=jnp.asarray(d["origin"]),
        dof_params=jnp.asarray(d["dof_params"]),
        projection_info=jnp.asarray(d["projection_info"]),
        pan=jnp.asarray(d["pan"]),
        proj_type=jnp.asarray(proj_type).astype(jnp.int32).reshape(-1),
    )
