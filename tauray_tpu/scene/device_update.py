"""On-device per-frame scene update (reference: shader/skinning.comp +
shader/pre_transform.comp + shader/extract_tri_lights.comp, dispatched by
src/scene_stage.cc record_skinning/record_pre_transform/
record_tri_light_extraction).

The reference re-runs skinning and world-transforms on the GPU every
frame; the host only walks the transform hierarchy. This module mirrors
that split for the TPU build: object-space geometry and skinning tables
upload ONCE (GeomStatic); each frame the host supplies per-instance and
per-joint matrices (small) and one jitted program produces the world-space
triangle soup, the packed shading table and the refreshed tri-light rows
— so animated scenes never run per-triangle host numpy or re-upload the
soup."""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .arrays import SceneArrays, _normal_matrix
from .device import TL_COLS, TL_POS, TP_COLS, TP_HARDN, TP_INST, TP_NORMAL, \
    TP_POS, TP_PREV, TP_TANGENT, TP_UV


class GeomStatic(NamedTuple):
    """Uploaded once per topology change."""
    obj_pos: Any        # (T, 3, 3) f32 object-space corners
    obj_normal: Any     # (T, 3, 3)
    obj_tangent: Any    # (T, 3, 4)
    uv_flat: Any        # (T, 6)
    tri_instance: Any   # (T,) i32
    corner_joint: Any   # (T, 3, 4) i32 into the global joint table
    corner_weight: Any  # (T, 3, 4) f32 (all-zero rows = unskinned)
    tl_tri_index: Any   # (L,) i32
    tl_static: Any      # (L, TL_COLS) f32 with emission/uv/tex prefilled


def build_geom_static(sa: SceneArrays) -> Tuple[GeomStatic, bool]:
    """Host-side one-time build. Returns (static tables, has_skinning)."""
    T = sa.obj_pos.shape[0]
    cj = np.zeros((T, 3, 4), np.int32)
    cw = np.zeros((T, 3, 4), np.float32)
    joint_base = 0
    has_skin = False
    tri_offset = 0
    for ig in sa.instances:
        ntri = len(ig.indices)
        if ig.joints is not None:
            has_skin = True
            idx = ig.indices                       # (ntri, 3)
            cj[tri_offset:tri_offset + ntri] = ig.joints[idx] + joint_base
            cw[tri_offset:tri_offset + ntri] = ig.weights[idx]
            e = sa.scene.entities[ig.entity_index]
            joint_base += len(e.model.joint_nodes)
        tri_offset += ntri

    L = sa.tl_pos.shape[0]
    tls = np.zeros((L, TL_COLS), np.float32)
    from .device import TL_EMISSION, TL_TEX, TL_TEXBLOCK, TL_TEXSIZE, TL_UV
    tls[:, TL_EMISSION:TL_EMISSION + 3] = sa.tl_emission
    tls[:, TL_UV:TL_UV + 6] = sa.tl_uv.reshape(L, 6)
    tls[:, TL_TEX] = sa.tl_tex
    sz = sa.texture_size[np.maximum(sa.tl_tex, 0)]
    tls[:, TL_TEXSIZE:TL_TEXSIZE + 2] = np.where(sa.tl_tex[:, None] >= 0,
                                                 sz, 1)
    blk = sa.tex_meta[np.maximum(sa.tl_tex, 0), 0, :2]
    tls[:, TL_TEXBLOCK:TL_TEXBLOCK + 2] = np.where(
        sa.tl_tex[:, None] >= 0, blk, 0)

    gs = GeomStatic(
        obj_pos=jnp.asarray(sa.obj_pos),
        obj_normal=jnp.asarray(sa.obj_normal),
        obj_tangent=jnp.asarray(sa.obj_tangent),
        uv_flat=jnp.asarray(sa.obj_uv.reshape(T, 6)),
        tri_instance=jnp.asarray(sa.tri_instance),
        corner_joint=jnp.asarray(cj),
        corner_weight=jnp.asarray(cw),
        tl_tri_index=jnp.asarray(sa.tl_tri_index),
        tl_static=jnp.asarray(tls))
    return gs, has_skin


def host_frame_inputs(sa: SceneArrays):
    """Per-frame host work: walk the transform hierarchy only.
    Returns (inst_model (I,4,4), inst_normal (I,3,3), joints (J,4,4))."""
    insts = sa.instances
    I = max(len(insts), 1)
    models = np.tile(np.eye(4, dtype=np.float32), (I, 1, 1))
    normal_ms = np.tile(np.eye(3, dtype=np.float32), (I, 1, 1))
    joints_l = []
    for i, ig in enumerate(insts):
        e = sa.scene.entities[ig.entity_index]
        t = e.transform
        m = t.get_global_transform() if t is not None else np.eye(
            4, dtype=np.float32)
        models[i] = m
        normal_ms[i] = _normal_matrix(m)
        if ig.joints is not None:
            model = e.model
            jm = np.stack([j.get_global_transform()
                           for j in model.joint_nodes])
            if model.inverse_bind_matrices is not None:
                jm = np.einsum("jab,jbc->jac", jm,
                               model.inverse_bind_matrices)
            inv_m = np.linalg.inv(m) if t is not None else np.eye(4)
            jm = np.einsum("ab,jbc->jac", inv_m, jm)
            joints_l.append(jm.astype(np.float32))
    if joints_l:
        joints = np.concatenate(joints_l)
    else:
        joints = np.eye(4, dtype=np.float32)[None]
    return models, normal_ms, joints


class GeomFrame(NamedTuple):
    tri_pos: Any        # (T, 3, 3) world-space
    tri_normal: Any
    tri_tangent: Any    # (T, 3, 4)
    tri_hard_normal: Any  # (T, 3)


@partial(jax.jit, static_argnames=("has_skin",))
def update_geometry(gs: GeomStatic, inst_model, inst_normal, joints,
                    has_skin: bool) -> GeomFrame:
    """Skinning + world transform, one fused program (reference:
    shader/skinning.comp + shader/pre_transform.comp)."""
    pos = gs.obj_pos
    nrm = gs.obj_normal
    tan3 = gs.obj_tangent[..., :3]
    if has_skin:
        # linear blend skinning per corner (reference: shader/skinning.comp)
        jm = joints[gs.corner_joint]                    # (T, 3, 4, 4, 4)
        vm = jnp.einsum("tck,tckab->tcab", gs.corner_weight, jm)
        p_skin = jnp.einsum("tcab,tcb->tca", vm[..., :3, :3], pos) + \
            vm[..., :3, 3]
        n_skin = jnp.einsum("tcab,tcb->tca", vm[..., :3, :3], nrm)
        t_skin = jnp.einsum("tcab,tcb->tca", vm[..., :3, :3], tan3)
        skinned = (gs.corner_weight.sum(-1) > 0)[..., None]
        pos = jnp.where(skinned, p_skin, pos)
        nrm = jnp.where(skinned, n_skin, nrm)
        tan3 = jnp.where(skinned, t_skin, tan3)

    inst = jnp.maximum(gs.tri_instance, 0)
    m = inst_model[inst]                                # (T, 4, 4)
    nm = inst_normal[inst]                              # (T, 3, 3)
    world_pos = jnp.einsum("tij,tcj->tci", m[:, :3, :3], pos) + \
        m[:, None, :3, 3]
    world_n = jnp.einsum("tij,tcj->tci", nm, nrm)
    world_t = jnp.einsum("tij,tcj->tci", nm, tan3)
    # hard normal from the OBJECT-space cross transformed by the normal
    # matrix (handles mirrored instances; reference: rt.glsl
    # get_interpolated_vertex)
    hard = jnp.cross(pos[:, 1] - pos[:, 0], pos[:, 2] - pos[:, 0])
    hard = jnp.einsum("tij,tj->ti", nm, hard)
    hard = hard / jnp.maximum(
        jnp.linalg.norm(hard, axis=-1, keepdims=True), 1e-30)
    tri_tangent = jnp.concatenate([world_t, gs.obj_tangent[..., 3:]],
                                  axis=-1)
    return GeomFrame(world_pos, world_n, tri_tangent, hard)


@jax.jit
def pack_frame(gs: GeomStatic, g: GeomFrame, prev_pos,
               inst_packed) -> Tuple[Any, Any]:
    """tri_packed + tl_packed rows from the frame geometry (device)."""
    T = g.tri_pos.shape[0]
    inst = jnp.maximum(gs.tri_instance, 0)
    from .device import IP_COLS, TP_IP
    tri_packed = jnp.concatenate([
        g.tri_pos.reshape(T, 9),
        prev_pos.reshape(T, 9),
        g.tri_normal.reshape(T, 9),
        gs.uv_flat,
        g.tri_tangent.reshape(T, 12),
        g.tri_hard_normal,
        gs.tri_instance[:, None].astype(jnp.float32),
        inst_packed[inst],
        # sublane-alignment padding up to TP_COLS (see device.py)
        jnp.zeros((T, TP_COLS - TP_IP - IP_COLS), jnp.float32),
    ], axis=1)
    tl_pos = g.tri_pos[gs.tl_tri_index]                 # (L, 3, 3)
    L = tl_pos.shape[0]
    tl_packed = gs.tl_static.at[:, TL_POS:TL_POS + 9].set(
        tl_pos.reshape(L, 9))
    return tri_packed, tl_packed, tl_pos


def apply_frame_update(device_scene, gs: GeomStatic, g: GeomFrame,
                       prev: Optional[GeomFrame], sa: SceneArrays):
    """Patch the per-frame fields of a DeviceScene (device arrays; static
    tables untouched). Light parameter tables are rebuilt host-side (they
    are tiny) so animated lights stay correct."""
    from .device import _pack_lights
    prev_pos = prev.tri_pos if prev is not None else g.tri_pos
    tri_packed, tl_packed, tl_pos = pack_frame(gs, g, prev_pos,
                                               device_scene.inst_packed)
    pl_packed, dl_packed, _ = _pack_lights(sa)
    return device_scene._replace(
        tri_pos=g.tri_pos,
        tri_normal=g.tri_normal,
        tri_tangent=g.tri_tangent,
        tri_hard_normal=g.tri_hard_normal,
        tri_pos_prev=prev_pos,
        tri_packed=tri_packed,
        tl_packed=tl_packed,
        tl_pos=tl_pos,
        pl_packed=jnp.asarray(pl_packed),
        dl_packed=jnp.asarray(dl_packed),
        pl_color=jnp.asarray(sa.pl_color),
        pl_pos=jnp.asarray(sa.pl_pos),
        pl_dir=jnp.asarray(sa.pl_dir),
        dl_color=jnp.asarray(sa.dl_color),
        dl_dir=jnp.asarray(sa.dl_dir))
