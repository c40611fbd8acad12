"""Parented TRS transform hierarchy (reference: src/transformable.hh)."""

from __future__ import annotations

from typing import Optional

import numpy as np


def quat_to_mat3(q: np.ndarray) -> np.ndarray:
    """Quaternion [x, y, z, w] -> 3x3 rotation matrix."""
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ], dtype=np.float32)


def mat3_to_quat(m: np.ndarray) -> np.ndarray:
    t = np.trace(m)
    if t > 0:
        s = 0.5 / np.sqrt(t + 1.0)
        return np.array([(m[2, 1] - m[1, 2]) * s, (m[0, 2] - m[2, 0]) * s,
                         (m[1, 0] - m[0, 1]) * s, 0.25 / s], dtype=np.float32)
    i = int(np.argmax(np.diag(m)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(m[i, i] - m[j, j] - m[k, k] + 1.0, 0.0)) * 2
    q = np.zeros(4, dtype=np.float32)
    q[i] = 0.25 * s
    q[j] = (m[j, i] + m[i, j]) / s
    q[k] = (m[k, i] + m[i, k]) / s
    q[3] = (m[k, j] - m[j, k]) / s
    return q


def euler_to_quat(pitch: float, yaw: float, roll: float) -> np.ndarray:
    """Degrees, applied as yaw (Y), pitch (X), roll (Z), GLM-style."""
    hp, hy, hr = np.radians([pitch, yaw, roll]) * 0.5
    cp, sp = np.cos(hp), np.sin(hp)
    cy, sy = np.cos(hy), np.sin(hy)
    cr, sr = np.cos(hr), np.sin(hr)
    # q = qy * qx * qz
    qx = np.array([sp, 0, 0, cp])
    qy = np.array([0, sy, 0, cy])
    qz = np.array([0, 0, sr, cr])
    return quat_mul(quat_mul(qy, qx), qz).astype(np.float32)


def quat_mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return np.array([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ])


class Transformable:
    def __init__(self, position=(0, 0, 0), orientation=(0, 0, 0, 1),
                 scaling=(1, 1, 1), parent: Optional["Transformable"] = None,
                 static: bool = False):
        self.position = np.asarray(position, dtype=np.float32)
        self.orientation = np.asarray(orientation, dtype=np.float32)
        self.scaling = np.asarray(scaling, dtype=np.float32)
        self.parent = parent
        self.static = static
        self._cached_global: Optional[np.ndarray] = None
        self._revision = 0

    # -- mutation -------------------------------------------------------
    def _dirty(self):
        self._cached_global = None
        self._revision += 1

    def set_position(self, p):
        self.position = np.asarray(p, dtype=np.float32)
        self._dirty()

    def set_orientation(self, *args):
        if len(args) == 1:
            self.orientation = np.asarray(args[0], dtype=np.float32)
        else:
            pitch, yaw = args[0], args[1]
            roll = args[2] if len(args) > 2 else 0.0
            self.orientation = euler_to_quat(pitch, yaw, roll)
        self._dirty()

    def set_scaling(self, s):
        s = np.asarray(s, dtype=np.float32)
        if s.ndim == 0:
            s = np.full(3, float(s), dtype=np.float32)
        self.scaling = s
        self._dirty()

    def set_parent(self, parent: Optional["Transformable"]):
        self.parent = parent
        self._dirty()

    def set_transform(self, m: np.ndarray):
        """Decompose a 4x4 column-vector matrix into TRS."""
        m = np.asarray(m, dtype=np.float32)
        self.position = m[:3, 3].copy()
        rs = m[:3, :3]
        sx = np.linalg.norm(rs[:, 0])
        sy = np.linalg.norm(rs[:, 1])
        sz = np.linalg.norm(rs[:, 2])
        if np.linalg.det(rs) < 0:
            sx = -sx
        self.scaling = np.array([sx, sy, sz], dtype=np.float32)
        r = rs / np.array([sx, sy, sz])
        self.orientation = mat3_to_quat(r)
        self._dirty()

    # -- queries --------------------------------------------------------
    def get_transform(self) -> np.ndarray:
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = quat_to_mat3(self.orientation) * self.scaling[None, :]
        m[:3, 3] = self.position
        return m

    def get_global_transform(self) -> np.ndarray:
        local = self.get_transform()
        if self.parent is not None:
            return (self.parent.get_global_transform() @ local).astype(np.float32)
        return local

    def get_global_position(self) -> np.ndarray:
        return self.get_global_transform()[:3, 3]

    def get_global_direction(self, ref=(0, 0, -1)) -> np.ndarray:
        d = self.get_global_transform()[:3, :3] @ np.asarray(ref, dtype=np.float32)
        return d / np.linalg.norm(d)

    def translate(self, offset):
        self.set_position(self.position + np.asarray(offset, dtype=np.float32))

    def rotate_local(self, q):
        self.set_orientation(quat_mul(self.orientation, q))
