"""Cameras with GLM-compatible matrices (reference: src/camera.cc).

Matrix conventions match the reference exactly so golden images line up:
column-vector matrices, right-handed view space looking down -Z, and
`glm::perspectiveRH_ZO` projection (GLM_FORCE_DEPTH_ZERO_TO_ONE, reference:
src/math.hh:10). Camera rays are generated shader-side from `proj_inverse`
and `view_inverse` (reference: shader/camera.glsl get_camera_ray).
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np

from .transformable import Transformable

PERSPECTIVE = 0
ORTHOGRAPHIC = 1
EQUIRECTANGULAR = 2


def perspective_rh_zo(fovy_rad: float, aspect: float, near: float,
                      far: float) -> np.ndarray:
    """glm::perspectiveRH_ZO; column-vector convention."""
    f = 1.0 / math.tan(fovy_rad / 2.0)
    m = np.zeros((4, 4), dtype=np.float32)
    m[0, 0] = f / aspect
    m[1, 1] = f
    if math.isinf(far):
        # glm::infinitePerspective (ZO)
        m[2, 2] = -1.0
        m[2, 3] = -near
    else:
        m[2, 2] = far / (near - far)
        m[2, 3] = -(far * near) / (far - near)
    m[3, 2] = -1.0
    return m


def ortho_rh_zo(left, right, bottom, top, near, far) -> np.ndarray:
    m = np.eye(4, dtype=np.float32)
    m[0, 0] = 2.0 / (right - left)
    m[1, 1] = 2.0 / (top - bottom)
    m[2, 2] = -1.0 / (far - near)
    m[0, 3] = -(right + left) / (right - left)
    m[1, 3] = -(top + bottom) / (top - bottom)
    m[2, 3] = -near / (far - near)
    return m


class Camera:
    def __init__(self):
        self.type = PERSPECTIVE
        self.fov = 90.0          # vertical fov, degrees
        self.aspect = 1.0
        self.near = 0.1
        self.far = 100.0
        self.fov_offset = np.zeros(2, dtype=np.float32)  # pan / lens shift
        self.focus = np.array([1, 0, 0, 0], dtype=np.float32)  # dof params
        # ortho params
        self.left = -1.0
        self.right = 1.0
        self.bottom = -1.0
        self.top = 1.0
        # equirect
        self.eq_fov = np.array([360.0, 180.0], dtype=np.float32)
        self.jitter_sequence: List[np.ndarray] = []
        self.jitter_index = 0

    # -- setup ---------------------------------------------------------
    def perspective(self, fov, aspect, near, far):
        self.type = PERSPECTIVE
        self.fov, self.aspect, self.near, self.far = fov, aspect, near, far
        self.fov_offset = np.zeros(2, dtype=np.float32)
        self.focus = np.array([1, 0, 0, 0], dtype=np.float32)

    def ortho(self, left, right, bottom, top, near=0.0, far=1.0):
        self.type = ORTHOGRAPHIC
        self.left, self.right, self.bottom, self.top = left, right, bottom, top
        self.near, self.far = near, far

    def equirectangular(self, fov_x=360.0, fov_y=180.0):
        self.type = EQUIRECTANGULAR
        self.eq_fov = np.array([fov_x, fov_y], dtype=np.float32)

    def set_aspect(self, aspect):
        self.aspect = aspect

    def set_fov(self, fov):
        self.fov = fov

    def set_near(self, near):
        self.near = near

    def set_far(self, far):
        self.far = far

    def set_pan(self, offset):
        self.fov_offset = np.asarray(offset, dtype=np.float32)

    def set_focus(self, f_stop: float, distance: float, sensor_size: float,
                  sides: int, angle_deg: float):
        """DoF parameters (reference: src/camera.cc:143-160).

        focus = (focus_distance, aperture_radius, polygon angle, sides)
        """
        aperture = 0.0
        if f_stop > 0:
            focal_length = 0.5 * sensor_size / math.tan(math.radians(self.fov) * 0.5)
            aperture = focal_length / (2.0 * f_stop)
        self.focus = np.array(
            [distance, aperture, math.radians(angle_deg), float(sides)],
            dtype=np.float32)

    def set_jitter_sequence(self, seq: List[np.ndarray]):
        self.jitter_sequence = [np.asarray(j, dtype=np.float32) for j in seq]
        self.jitter_index = 0

    def step_jitter(self):
        if self.jitter_sequence:
            self.jitter_index = (self.jitter_index + 1) % len(self.jitter_sequence)

    # -- matrices ------------------------------------------------------
    def get_projection_matrix(self) -> np.ndarray:
        if self.type == PERSPECTIVE:
            proj = perspective_rh_zo(math.radians(self.fov), self.aspect,
                                     self.near, self.far)
            proj[0, 2] += self.fov_offset[0]
            proj[1, 2] += self.fov_offset[1]
            if self.jitter_sequence:
                j = self.jitter_sequence[self.jitter_index]
                proj[0, 2] += j[0]
                proj[1, 2] += j[1]
            return proj
        if self.type == ORTHOGRAPHIC:
            return ortho_rh_zo(self.left, self.right, self.bottom, self.top,
                               self.near, self.far)
        raise ValueError("equirectangular camera has no projection matrix")

    def get_projection_info(self) -> np.ndarray:
        """(reference: src/camera.cc:323-360)."""
        if self.type == PERSPECTIVE:
            rad_fov = math.radians(self.fov)
            w = 2.0 * math.tan(rad_fov * 0.5)
            z = w * self.aspect
            if math.isinf(self.far):
                x, y = -self.near, -1.0
            else:
                x = self.near * self.far / (self.near - self.far)
                y = (self.near + self.far) / (self.near - self.far)
            return np.array([x, y, z, w], dtype=np.float32)
        if self.type == ORTHOGRAPHIC:
            return np.array([self.far - self.near, -self.far,
                             self.right - self.left, self.top - self.bottom],
                            dtype=np.float32)
        return np.zeros(4, dtype=np.float32)

    def get_uniform_data(self, t: Transformable) -> dict:
        """Matches the shader-side camera_data struct (shader/camera.glsl)."""
        inv_view = t.get_global_transform()
        view = np.linalg.inv(inv_view).astype(np.float32)
        origin = inv_view[:, 3].copy()
        if self.type == EQUIRECTANGULAR:
            # half-fov radians in pan.xy (reference: src/camera.cc:474
            # equirectangular_camera_data_buffer.fov)
            pan = np.zeros(4, dtype=np.float32)
            pan[:2] = np.radians(self.eq_fov) * 0.5
            eye = np.eye(4, dtype=np.float32)
            return dict(
                view=view, view_inverse=inv_view, view_proj=view,
                proj_inverse=eye, origin=origin,
                dof_params=np.zeros(4, np.float32),
                projection_info=np.zeros(4, np.float32), pan=pan,
                proj_type=np.array(float(EQUIRECTANGULAR), np.float32))
        proj = self.get_projection_matrix()
        inv_proj = np.linalg.inv(proj).astype(np.float32)
        pan = np.zeros(4, dtype=np.float32)
        if self.type == PERSPECTIVE:
            pan[:2] = self.fov_offset
        if self.jitter_sequence:
            j = self.jitter_sequence[self.jitter_index]
            pan += np.array([j[0], j[1], j[0], j[1]], dtype=np.float32)
        return dict(
            view=view, view_inverse=inv_view,
            view_proj=(proj @ view).astype(np.float32),
            proj_inverse=inv_proj, origin=origin,
            dof_params=self.focus if self.type == PERSPECTIVE else np.zeros(4, np.float32),
            projection_info=self.get_projection_info(), pan=pan,
            proj_type=np.array(float(self.type), np.float32))


class CameraLog:
    """Per-frame camera parameter log, exported as JSON
    (reference: src/camera.hh:103-120 camera_log, src/tauray.cc:1119-1128).
    """

    def __init__(self, transform: Transformable, camera: "Camera"):
        self.transform = transform
        self.camera = camera
        self.frames = []

    def frame(self, dt_ticks: int):
        view = np.linalg.inv(self.transform.get_global_transform())
        self.frames.append(dict(
            time_ticks=dt_ticks,
            view=[float(x) for x in view.T.reshape(-1)]))  # column-major

    def write(self, path: str):
        import json
        proj = (self.camera.get_projection_matrix()
                if self.camera.type != EQUIRECTANGULAR else np.eye(4))
        data = dict(
            projection=[float(x) for x in np.asarray(proj).T.reshape(-1)],
            frames=self.frames)
        with open(path, "w") as f:
            json.dump(data, f)


def get_camera_jitter_sequence(length: int, size) -> List[np.ndarray]:
    """Halton(2,3)-based TAA jitter in NDC units (reference:
    src/tauray.cc get_camera_jitter_sequence)."""
    if length <= 0:
        return []

    def halton(i, b):
        f, r = 1.0, 0.0
        while i > 0:
            f /= b
            r += f * (i % b)
            i //= b
        return r

    w, h = size
    seq = []
    for i in range(1, length + 1):
        x = halton(i, 2) * 2 - 1
        y = halton(i, 3) * 2 - 1
        seq.append(np.array([x / w, y / h], dtype=np.float32))
    return seq
