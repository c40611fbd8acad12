"""glTF 2.0 / GLB loader (reference: src/gltf.cc, using tiny_gltf).

Pure-Python parser producing `tauray_tpu.scene.Scene`. Supported, matching
the reference's feature set (reference: src/gltf.cc:517-796):
cameras, punctual lights (KHR_lights_punctual), skins, animations,
materials with KHR_materials_emissive_strength / _transmission / _ior,
and tauray's own TR_data extension (per-node SH probe volumes, light
radius/angle metadata, per-mesh shadow terminator offsets;
reference: src/gltf.cc:230-473).
"""

from __future__ import annotations

import base64
import io as _io
import json
import math
import os
import struct
from typing import Dict, List, Optional

import numpy as np

from ..log import TR_WARN
from ..scene.animation import Animation, AnimationChannel
from ..scene.camera import Camera
from ..scene.environment_map import EnvironmentMap
from ..scene.light import DirectionalLight, PointLight, Spotlight
from ..scene.material import Material
from ..scene.mesh import Mesh, Model
from ..scene.scene import Scene
from ..scene.sh_grid import SHGrid
from ..scene.transformable import Transformable

_COMPONENT_DTYPES = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16,
    5123: np.uint16, 5125: np.uint32, 5126: np.float32,
}
_TYPE_COUNTS = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4,
                "MAT2": 4, "MAT3": 9, "MAT4": 16}


class _GLTF:
    def __init__(self, path: str):
        self.dir = os.path.dirname(path)
        with open(path, "rb") as f:
            head = f.read(4)
            f.seek(0)
            if head == b"glTF":
                self._load_glb(f.read())
            else:
                self.json = json.load(f)
                self.bin = None
        self._buffers: Dict[int, bytes] = {}

    def _load_glb(self, data: bytes):
        magic, version, length = struct.unpack("<III", data[:12])
        off = 12
        self.json = None
        self.bin = None
        while off < length:
            clen, ctype = struct.unpack("<II", data[off:off + 8])
            chunk = data[off + 8:off + 8 + clen]
            if ctype == 0x4E4F534A:  # JSON
                self.json = json.loads(chunk)
            elif ctype == 0x004E4942:  # BIN
                self.bin = chunk
            off += 8 + clen

    def buffer(self, index: int) -> bytes:
        if index in self._buffers:
            return self._buffers[index]
        buf = self.json["buffers"][index]
        uri = buf.get("uri")
        if uri is None:
            data = self.bin
        elif uri.startswith("data:"):
            data = base64.b64decode(uri.split(",", 1)[1])
        else:
            with open(os.path.join(self.dir, uri), "rb") as f:
                data = f.read()
        self._buffers[index] = data
        return data

    def accessor(self, index: int) -> np.ndarray:
        acc = self.json["accessors"][index]
        count = acc["count"]
        ncomp = _TYPE_COUNTS[acc["type"]]
        dtype = _COMPONENT_DTYPES[acc["componentType"]]
        itemsize = np.dtype(dtype).itemsize
        if "bufferView" not in acc:
            out = np.zeros((count, ncomp), dtype=dtype)
        else:
            bv = self.json["bufferViews"][acc["bufferView"]]
            data = self.buffer(bv["buffer"])
            start = bv.get("byteOffset", 0) + acc.get("byteOffset", 0)
            stride = bv.get("byteStride", itemsize * ncomp)
            if stride == itemsize * ncomp:
                out = np.frombuffer(data, dtype=dtype, count=count * ncomp,
                                    offset=start).reshape(count, ncomp)
            else:
                raw = np.frombuffer(data, dtype=np.uint8)
                idx = start + stride * np.arange(count)[:, None] + \
                    np.arange(itemsize * ncomp)[None, :]
                out = raw[idx].view(dtype).reshape(count, ncomp)
        if acc.get("normalized"):
            info = np.iinfo(dtype)
            out = out.astype(np.float32) / info.max
        if acc["type"] == "SCALAR":
            out = out.reshape(-1)
        return out

    def image(self, index: int) -> np.ndarray:
        """Decode an image to (H, W, 4) uint8."""
        from PIL import Image
        img = self.json["images"][index]
        if "bufferView" in img:
            bv = self.json["bufferViews"][img["bufferView"]]
            data = self.buffer(bv["buffer"])
            start = bv.get("byteOffset", 0)
            raw = data[start:start + bv["byteLength"]]
            pil = Image.open(_io.BytesIO(raw))
        else:
            uri = img["uri"]
            if uri.startswith("data:"):
                pil = Image.open(_io.BytesIO(base64.b64decode(uri.split(",", 1)[1])))
            else:
                pil = Image.open(os.path.join(self.dir, uri))
        pil = pil.convert("RGBA")
        return np.asarray(pil, dtype=np.uint8)


def _get_tr_data(obj: dict) -> dict:
    return obj.get("extensions", {}).get("TR_data", {})


def load_gltf(path: str, scene: Optional[Scene] = None) -> Scene:
    g = _GLTF(path)
    j = g.json
    s = scene if scene is not None else Scene()

    # --- textures -------------------------------------------------------
    # Texture images are stored on the scene for the flattening stage.
    textures: List[np.ndarray] = []
    tex_meta: List[dict] = []
    for tex in j.get("textures", []):
        textures.append(g.image(tex["source"]))
        smp = j.get("samplers", [{}])[tex.get("sampler", 0)] if j.get("samplers") else {}
        tex_meta.append(dict(
            wrap_s=smp.get("wrapS", 10497), wrap_t=smp.get("wrapT", 10497)))
    base = getattr(s, "textures", None)
    if base is None:
        s.textures = []
        s.texture_meta = []
    tex_offset = len(s.textures)
    s.textures.extend(textures)
    s.texture_meta.extend(tex_meta)

    # --- materials ------------------------------------------------------
    def load_material(mi: Optional[int]) -> Material:
        if mi is None:
            return Material(name="<default>", double_sided=True,
                            metallic_factor=0.0, roughness_factor=1.0)
        m = j["materials"][mi]
        mat = Material(name=m.get("name", ""))
        pbr = m.get("pbrMetallicRoughness", {})
        mat.albedo_factor = np.array(
            pbr.get("baseColorFactor", [1, 1, 1, 1]), dtype=np.float32)
        mat.metallic_factor = pbr.get("metallicFactor", 1.0)
        mat.roughness_factor = pbr.get("roughnessFactor", 1.0)
        if "baseColorTexture" in pbr:
            mat.albedo_tex = tex_offset + pbr["baseColorTexture"]["index"]
        if "metallicRoughnessTexture" in pbr:
            mat.metallic_roughness_tex = \
                tex_offset + pbr["metallicRoughnessTexture"]["index"]
        if "normalTexture" in m:
            mat.normal_tex = tex_offset + m["normalTexture"]["index"]
            mat.normal_factor = m["normalTexture"].get("scale", 1.0)
        if "emissiveTexture" in m:
            mat.emission_tex = tex_offset + m["emissiveTexture"]["index"]
        mat.emission_factor = np.array(
            m.get("emissiveFactor", [0, 0, 0]), dtype=np.float32)
        exts = m.get("extensions", {})
        if "KHR_materials_emissive_strength" in exts:
            mat.emission_factor = mat.emission_factor * \
                exts["KHR_materials_emissive_strength"].get("emissiveStrength", 1.0)
        trd = _get_tr_data(pbr)
        if "transmission" in trd:
            mat.transmittance = trd["transmission"]
        if "ior" in trd:
            mat.ior = trd["ior"]
        if "KHR_materials_transmission" in exts:
            mat.transmittance = exts["KHR_materials_transmission"].get(
                "transmissionFactor", mat.transmittance)
        if "KHR_materials_ior" in exts:
            mat.ior = exts["KHR_materials_ior"].get("ior", mat.ior)
        mat.double_sided = m.get("doubleSided", False)
        if m.get("alphaMode", "OPAQUE") == "MASK":
            mat.alpha_cutoff = m.get("alphaCutoff", 0.5)
        elif m.get("alphaMode", "OPAQUE") == "BLEND":
            mat.blend = True
        return mat

    materials = [load_material(i) for i in range(len(j.get("materials", [])))]

    # --- meshes → models --------------------------------------------------
    def load_model(mi: int) -> Model:
        gm = j["meshes"][mi]
        model = Model(name=gm.get("name", ""))
        for prim in gm["primitives"]:
            attrs = prim["attributes"]
            positions = g.accessor(attrs["POSITION"])
            indices = (g.accessor(prim["indices"]).astype(np.int32)
                       if "indices" in prim
                       else np.arange(len(positions), dtype=np.int32))
            mesh = Mesh(
                positions=positions,
                indices=indices,
                normals=g.accessor(attrs["NORMAL"]) if "NORMAL" in attrs else None,
                uvs=g.accessor(attrs["TEXCOORD_0"]) if "TEXCOORD_0" in attrs else None,
                tangents=g.accessor(attrs["TANGENT"]) if "TANGENT" in attrs else None,
                joints=g.accessor(attrs["JOINTS_0"]).astype(np.int32)
                if "JOINTS_0" in attrs else None,
                weights=g.accessor(attrs["WEIGHTS_0"]) if "WEIGHTS_0" in attrs else None,
                name=gm.get("name", ""),
            )
            mat = (materials[prim["material"]] if "material" in prim
                   else load_material(None))
            model.add_vertex_group(mat, mesh)
        return model

    models = [load_model(i) for i in range(len(j.get("meshes", [])))]

    # --- animations -------------------------------------------------------
    # channels keyed by target node; attached to entities below.
    node_anims: Dict[int, Dict[str, Animation]] = {}
    for anim in j.get("animations", []):
        name = anim.get("name", f"anim{len(node_anims)}")
        for ch in anim["channels"]:
            smp = anim["samplers"][ch["sampler"]]
            node = ch["target"]["node"]
            times = g.accessor(smp["input"]).astype(np.float32)
            values = g.accessor(smp["output"]).astype(np.float32)
            interp = smp.get("interpolation", "LINEAR")
            a = node_anims.setdefault(node, {}).setdefault(name, Animation())
            a.add_channel(ch["target"]["path"],
                          AnimationChannel(times, values, interp))

    # --- nodes -------------------------------------------------------------
    node_entities: List[Optional[object]] = [None] * len(j.get("nodes", []))

    def load_node(ni: int, parent: Optional[Transformable], static_lock: bool,
                  meta: dict):
        node = j["nodes"][ni]
        trd = _get_tr_data(node)
        if "light" in trd:
            ld = trd["light"]
            if "angle" in ld:
                meta["light_angle"] = ld["angle"]
            if "radius" in ld:
                meta["light_radius"] = ld["radius"]

        e = s.add(node.get("name", f"node{ni}"))
        node_entities[ni] = e
        t = Transformable(parent=parent)
        if "matrix" in node:
            t.set_transform(np.array(node["matrix"],
                                     dtype=np.float32).reshape(4, 4).T)
        else:
            if "translation" in node:
                t.set_position(node["translation"])
            if "scale" in node:
                t.set_scaling(node["scale"])
            if "rotation" in node:
                t.set_orientation(np.array(node["rotation"], dtype=np.float32))
        e.transform = t

        if ni in node_anims:
            e.animations = node_anims[ni]
            t.static = False
        else:
            t.static = static_lock

        if "mesh" in node:
            e.model = models[node["mesh"]]
            mesh_trd = trd.get("mesh", {})
            e.model.shadow_terminator_offset = mesh_trd.get(
                "shadow_terminator_offset", 0.0)
            if "skin" in node:
                skin = j["skins"][node["skin"]]
                e.skin_joints = skin["joints"]
                e.skin_ibm = (g.accessor(skin["inverseBindMatrices"])
                              .reshape(-1, 4, 4).transpose(0, 2, 1)
                              if "inverseBindMatrices" in skin else None)

        if "camera" in node:
            c = j["cameras"][node["camera"]]
            cam = Camera()
            if c["type"] == "perspective":
                p = c["perspective"]
                cam.perspective(math.degrees(p["yfov"]),
                                p.get("aspectRatio", 1.0),
                                p.get("znear", 0.1), p.get("zfar", float("inf")))
            else:
                o = c["orthographic"]
                cam.ortho(-o["xmag"], o["xmag"], -o["ymag"], o["ymag"],
                          o.get("znear", 0.0), o.get("zfar", 100.0))
            e.camera = cam
            e.camera_enabled = True

        if "KHR_lights_punctual" in node.get("extensions", {}):
            l = j["extensions"]["KHR_lights_punctual"]["lights"][
                node["extensions"]["KHR_lights_punctual"]["light"]]
            color = np.array(l.get("color", [1, 1, 1]), dtype=np.float32) * \
                l.get("intensity", 1.0)
            # Blender glTF intensity magic matches the reference
            # (reference: src/gltf.cc:433-460)
            if l["type"] == "directional":
                e.light = DirectionalLight(
                    color, math.degrees(meta.get("light_angle", 0.0)))
            elif l["type"] == "point":
                e.light = PointLight(color / (4 * math.pi),
                                     meta.get("light_radius", 0.0))
            elif l["type"] == "spot":
                sl = Spotlight(color / (4 * math.pi),
                               math.degrees(l["spot"].get("outerConeAngle",
                                                          math.pi / 4)),
                               radius=meta.get("light_radius", 0.0))
                sl.set_inner_angle(
                    math.degrees(l["spot"].get("innerConeAngle", 0.0)), 4 / 255.0)
                e.light = sl

        if "light_probe" in trd:
            lp = trd["light_probe"]
            if lp.get("type") == "GRID":
                grid = SHGrid(resolution=(lp.get("resolution_x", 1),
                                          lp.get("resolution_y", 1),
                                          lp.get("resolution_z", 1)))
                grid.radius = lp.get("radius", 0.0)
                e.sh_grid = grid

        for child in node.get("children", []):
            load_node(child, t, static_lock, dict(meta))

    scene_idx = j.get("scene", 0)
    scene_nodes = j["scenes"][scene_idx]["nodes"] if j.get("scenes") else []
    for ni in scene_nodes:
        load_node(ni, None, True, {})

    # resolve skin joint node indices to transformables
    for e in s.entities:
        if hasattr(e, "skin_joints"):
            e.model.joint_nodes = [node_entities[ji].transform
                                   for ji in e.skin_joints]
            e.model.inverse_bind_matrices = e.skin_ibm

    return s


def load_scene(path: str, scene: Optional[Scene] = None) -> Scene:
    if path.startswith("proc://"):
        from .procedural import load_procedural
        from ..scene.scene import Scene as _S
        return load_procedural(path, scene if scene is not None else _S())
    ext = os.path.splitext(path)[1].lower()
    if ext in (".glb", ".gltf"):
        return load_gltf(path, scene)
    from .assimp_like import load_other
    return load_other(path, scene)
