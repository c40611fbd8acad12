"""Non-glTF mesh loading fallback (reference: src/assimp.cc uses Assimp).

Assimp is not available here, so OBJ (+MTL) and PLY are parsed directly —
these cover the formats the reference documentation mentions
(reference: src/tauray.cc:137-146).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from ..log import TR_WARN
from ..scene.material import Material
from ..scene.mesh import Mesh, Model
from ..scene.scene import Scene
from ..scene.transformable import Transformable


def _load_mtl(path: str) -> Dict[str, Material]:
    mats: Dict[str, Material] = {}
    cur: Optional[Material] = None
    if not os.path.exists(path):
        return mats
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "newmtl":
                cur = Material(name=parts[1], double_sided=False)
                mats[parts[1]] = cur
            elif cur is None:
                continue
            elif key == "Kd":
                cur.albedo_factor = np.array(
                    [float(parts[1]), float(parts[2]), float(parts[3]), 1.0],
                    dtype=np.float32)
            elif key == "Ke":
                cur.emission_factor = np.array(
                    [float(p) for p in parts[1:4]], dtype=np.float32)
            elif key == "Ns":
                # crude shininess -> roughness conversion
                ns = float(parts[1])
                cur.roughness_factor = float(np.clip((2.0 / (ns + 2.0)) ** 0.25, 0, 1))
            elif key == "Ni":
                cur.ior = float(parts[1])
            elif key == "d":
                cur.albedo_factor[3] = float(parts[1])
    return mats


def load_obj(path: str, scene: Optional[Scene] = None) -> Scene:
    s = scene if scene is not None else Scene()
    if not hasattr(s, "textures"):
        s.textures = []
        s.texture_meta = []
    positions, normals, uvs = [], [], []
    mats: Dict[str, Material] = {}
    groups: Dict[str, list] = {}
    cur_mat = ""
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "v":
                positions.append([float(p) for p in parts[1:4]])
            elif key == "vn":
                normals.append([float(p) for p in parts[1:4]])
            elif key == "vt":
                uvs.append([float(parts[1]), float(parts[2])])
            elif key == "mtllib":
                mats.update(_load_mtl(os.path.join(os.path.dirname(path), parts[1])))
            elif key == "usemtl":
                cur_mat = parts[1]
            elif key == "f":
                verts = []
                for vspec in parts[1:]:
                    comps = vspec.split("/")
                    vi = int(comps[0])
                    ti = int(comps[1]) if len(comps) > 1 and comps[1] else 0
                    ni = int(comps[2]) if len(comps) > 2 and comps[2] else 0
                    verts.append((vi, ti, ni))
                for k in range(1, len(verts) - 1):  # fan triangulation
                    groups.setdefault(cur_mat, []).append(
                        (verts[0], verts[k], verts[k + 1]))

    positions = np.asarray(positions, dtype=np.float32)
    normals = np.asarray(normals, dtype=np.float32) if normals else None
    uvs = np.asarray(uvs, dtype=np.float32) if uvs else None

    model = Model(name=os.path.basename(path))
    for mat_name, faces in groups.items():
        # expand to unindexed vertices (OBJ has split index spaces)
        vpos, vnorm, vuv, idx = [], [], [], []
        for tri in faces:
            for vi, ti, ni in tri:
                vpos.append(positions[vi - 1 if vi > 0 else vi])
                if normals is not None and ni:
                    vnorm.append(normals[ni - 1 if ni > 0 else ni])
                if uvs is not None and ti:
                    vuv.append(uvs[ti - 1 if ti > 0 else ti])
            idx.append([len(vpos) - 3, len(vpos) - 2, len(vpos) - 1])
        mesh = Mesh(
            positions=np.asarray(vpos, dtype=np.float32),
            indices=np.asarray(idx, dtype=np.int32),
            normals=np.asarray(vnorm, dtype=np.float32) if len(vnorm) == len(vpos) else None,
            uvs=np.asarray(vuv, dtype=np.float32) if len(vuv) == len(vpos) else None,
            name=mat_name)
        model.add_vertex_group(
            mats.get(mat_name, Material(name=mat_name)), mesh)

    e = s.add(os.path.basename(path))
    e.transform = Transformable()
    e.transform.static = True
    e.model = model
    return s


def load_ply(path: str, scene: Optional[Scene] = None) -> Scene:
    s = scene if scene is not None else Scene()
    if not hasattr(s, "textures"):
        s.textures = []
        s.texture_meta = []
    with open(path, "rb") as f:
        data = f.read()
    header_end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:header_end].decode("ascii")
    lines = header.splitlines()
    fmt = "ascii"
    elements = []  # (name, count, [props])
    for line in lines:
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            elements.append((parts[1], int(parts[2]), []))
        elif parts[0] == "property":
            elements[-1][2].append(parts[1:])
    _PLY_TYPES = {
        "char": "i1", "int8": "i1", "uchar": "u1", "uint8": "u1",
        "short": "i2", "int16": "i2", "ushort": "u2", "uint16": "u2",
        "int": "i4", "int32": "i4", "uint": "u4", "uint32": "u4",
        "float": "f4", "float32": "f4", "double": "f8", "float64": "f8"}
    verts = None
    faces = []
    if fmt == "ascii":
        body = data[header_end:].decode("ascii").split()
        pos = 0
        for name, count, props in elements:
            if name == "vertex":
                width = len(props)
                arr = np.array(body[pos:pos + count * width],
                               dtype=np.float32)
                arr = arr.reshape(count, width)
                pos += count * width
                names = [p[-1] for p in props]
                verts = arr[:, [names.index("x"), names.index("y"),
                                names.index("z")]]
            elif name == "face":
                for _ in range(count):
                    n = int(body[pos])
                    idx = [int(x) for x in body[pos + 1:pos + 1 + n]]
                    pos += 1 + n
                    for k in range(1, n - 1):
                        faces.append([idx[0], idx[k], idx[k + 1]])
            else:
                TR_WARN(f"PLY: skipping element {name}")
    else:
        # binary_little_endian / binary_big_endian (reference: the
        # assimp fallback reads these via tinyply, src/assimp.cc)
        bo = "<" if "little" in fmt else ">"
        off = header_end
        for name, count, props in elements:
            if name == "vertex" and all(p[0] != "list" for p in props):
                dt = np.dtype([(p[-1], bo + _PLY_TYPES[p[0]])
                               for p in props])
                arr = np.frombuffer(data, dtype=dt, count=count,
                                    offset=off)
                off += dt.itemsize * count
                verts = np.stack([arr["x"], arr["y"], arr["z"]],
                                 axis=-1).astype(np.float32)
            elif name == "face":
                # per-face list property (count + indices)
                cnt_t = np.dtype(bo + _PLY_TYPES[props[0][1]])
                idx_t = np.dtype(bo + _PLY_TYPES[props[0][2]])
                for _ in range(count):
                    n = int(np.frombuffer(data, cnt_t, 1, off)[0])
                    off += cnt_t.itemsize
                    idx = np.frombuffer(data, idx_t, n, off)
                    off += idx_t.itemsize * n
                    for k in range(1, n - 1):
                        faces.append([int(idx[0]), int(idx[k]),
                                      int(idx[k + 1])])
            else:
                # skip fixed-width elements; list-typed others unsupported
                if any(p[0] == "list" for p in props):
                    TR_WARN(f"PLY: cannot skip list element {name}")
                    break
                w = sum(np.dtype(_PLY_TYPES[p[0]]).itemsize for p in props)
                off += w * count
                TR_WARN(f"PLY: skipping element {name}")
    mesh = Mesh(positions=verts, indices=np.asarray(faces, dtype=np.int32),
                name=os.path.basename(path))
    model = Model(name=os.path.basename(path))
    model.add_vertex_group(Material(name="<default>"), mesh)
    e = s.add(os.path.basename(path))
    e.transform = Transformable()
    e.transform.static = True
    e.model = model
    return s


def load_other(path: str, scene: Optional[Scene] = None) -> Scene:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".obj":
        return load_obj(path, scene)
    if ext == ".ply":
        return load_ply(path, scene)
    raise ValueError(f"Unsupported scene format: {ext}")
