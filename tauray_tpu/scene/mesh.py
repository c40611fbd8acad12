"""Meshes and models (reference: src/mesh.hh, src/model.hh).

Fixed vertex layout {pos, normal, uv, tangent4} (reference: src/mesh.hh:19-25)
kept as SoA numpy arrays; skinning data optional.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from .material import Material


class Mesh:
    def __init__(self, positions, indices, normals=None, uvs=None,
                 tangents=None, joints=None, weights=None, name=""):
        self.name = name
        self.positions = np.asarray(positions, dtype=np.float32).reshape(-1, 3)
        n = len(self.positions)
        self.indices = np.asarray(indices, dtype=np.int32).reshape(-1, 3)
        self.normals = (np.asarray(normals, dtype=np.float32).reshape(-1, 3)
                        if normals is not None else self._flat_normals())
        self.uvs = (np.asarray(uvs, dtype=np.float32).reshape(-1, 2)
                    if uvs is not None else np.zeros((n, 2), dtype=np.float32))
        if tangents is not None:
            self.tangents = np.asarray(tangents, dtype=np.float32).reshape(-1, 4)
        else:
            self.tangents = np.concatenate(
                [self._default_tangents(), np.ones((n, 1), dtype=np.float32)], axis=1)
        self.joints = (np.asarray(joints, dtype=np.int32).reshape(-1, 4)
                       if joints is not None else None)
        self.weights = (np.asarray(weights, dtype=np.float32).reshape(-1, 4)
                        if weights is not None else None)

    def _flat_normals(self) -> np.ndarray:
        """Area-weighted vertex normals when the asset provides none."""
        v = self.positions
        i = self.indices
        fn = np.cross(v[i[:, 1]] - v[i[:, 0]], v[i[:, 2]] - v[i[:, 0]])
        n = np.zeros_like(v)
        for k in range(3):
            np.add.at(n, i[:, k], fn)
        ln = np.linalg.norm(n, axis=1, keepdims=True)
        return (n / np.maximum(ln, 1e-20)).astype(np.float32)

    def _default_tangents(self) -> np.ndarray:
        """Arbitrary tangents orthogonal to the normal."""
        n = self.normals
        a = np.where(np.abs(n[:, 0:1]) < 0.9,
                     np.array([[1, 0, 0]], dtype=np.float32),
                     np.array([[0, 1, 0]], dtype=np.float32))
        t = np.cross(a, n)
        ln = np.linalg.norm(t, axis=1, keepdims=True)
        return (t / np.maximum(ln, 1e-20)).astype(np.float32)

    @property
    def num_triangles(self) -> int:
        return len(self.indices)

    def is_skinned(self) -> bool:
        return self.joints is not None


@dataclass
class VertexGroup:
    mat: Material
    mesh: Mesh


class Model:
    """A model is a list of (material, mesh) vertex groups
    (reference: src/model.hh)."""

    def __init__(self, groups: Optional[List[VertexGroup]] = None, name=""):
        self.name = name
        self.groups: List[VertexGroup] = groups or []
        self.joint_nodes: List = []          # transformables for skinning
        self.inverse_bind_matrices: Optional[np.ndarray] = None
        self.shadow_terminator_offset = 0.0

    def add_vertex_group(self, mat: Material, mesh: Mesh):
        self.groups.append(VertexGroup(mat, mesh))

    def __iter__(self):
        return iter(self.groups)

    def num_triangles(self) -> int:
        return sum(g.mesh.num_triangles for g in self.groups)
