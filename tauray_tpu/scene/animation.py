"""Keyframed TRS animation (reference: src/animation.hh:24-29).

Time is in microseconds (`time_ticks`), interpolation LINEAR / STEP /
CUBICSPLINE, matching glTF sampler semantics.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np


@dataclass
class AnimationChannel:
    times: np.ndarray      # (K,) seconds
    values: np.ndarray     # (K, C) or (3K, C) for cubic
    interpolation: str = "LINEAR"

    def duration_ticks(self) -> int:
        return int(self.times[-1] * 1e6) if len(self.times) else 0

    def sample(self, t_sec: float) -> np.ndarray:
        times = self.times
        k = len(times)
        if k == 0:
            raise ValueError("empty animation channel")
        if self.interpolation == "CUBICSPLINE":
            vals = self.values.reshape(k, 3, -1)
        else:
            vals = self.values
        if t_sec <= times[0]:
            return vals[0, 1] if self.interpolation == "CUBICSPLINE" else vals[0]
        if t_sec >= times[-1]:
            return vals[-1, 1] if self.interpolation == "CUBICSPLINE" else vals[-1]
        i = int(np.searchsorted(times, t_sec, side="right")) - 1
        t0, t1 = times[i], times[i + 1]
        u = (t_sec - t0) / max(t1 - t0, 1e-12)
        if self.interpolation == "STEP":
            return vals[i]
        if self.interpolation == "CUBICSPLINE":
            dt = t1 - t0
            p0, m0 = vals[i, 1], vals[i, 2] * dt
            p1, m1 = vals[i + 1, 1], vals[i + 1, 0] * dt
            u2, u3 = u * u, u * u * u
            return ((2 * u3 - 3 * u2 + 1) * p0 + (u3 - 2 * u2 + u) * m0 +
                    (-2 * u3 + 3 * u2) * p1 + (u3 - u2) * m1)
        v = (1 - u) * vals[i] + u * vals[i + 1]
        return v


class Animation:
    """Per-node animation: channels for translation/rotation/scale/weights."""

    def __init__(self):
        self.channels: Dict[str, AnimationChannel] = {}

    def add_channel(self, path: str, ch: AnimationChannel):
        self.channels[path] = ch

    def duration_ticks(self) -> int:
        return max((c.duration_ticks() for c in self.channels.values()),
                   default=0)

    def apply(self, transform, t_ticks: int):
        t_sec = t_ticks * 1e-6
        if "translation" in self.channels:
            transform.set_position(self.channels["translation"].sample(t_sec))
        if "rotation" in self.channels:
            q = self.channels["rotation"].sample(t_sec)
            q = q / np.linalg.norm(q)
            transform.set_orientation(q.astype(np.float32))
        if "scale" in self.channels:
            transform.set_scaling(self.channels["scale"].sample(t_sec))


class AnimationState:
    """Playback state attached to the scene (reference: src/scene.hh
    play/update/is_playing)."""

    def __init__(self):
        self.playing = False
        self.name = ""
        self.loop = False
        self.time_ticks = 0

    def duration(self, scene) -> int:
        dur = 0
        for e in scene.entities:
            for name, anim in e.animations.items():
                if self.name in ("", name):
                    dur = max(dur, anim.duration_ticks())
        return dur


def play(scene, name: str = "", loop: bool = False, use_first: bool = True):
    st = getattr(scene, "animation_state", None)
    if st is None:
        st = AnimationState()
        scene.animation_state = st
    st.playing = True
    st.name = name
    st.loop = loop
    st.time_ticks = 0


def is_playing(scene) -> bool:
    st = getattr(scene, "animation_state", None)
    return bool(st and st.playing)


def update(scene, dt_ticks: int, force: bool = False):
    """Advance animation time and drive node transforms."""
    st = getattr(scene, "animation_state", None)
    if st is None or not st.playing:
        return
    st.time_ticks += dt_ticks
    dur = st.duration(scene)
    if dur > 0 and st.time_ticks >= dur:
        if st.loop:
            st.time_ticks %= dur
        else:
            st.time_ticks = dur
            st.playing = False
    for e in scene.entities:
        for name, anim in e.animations.items():
            if st.name in ("", name) and e.transform is not None:
                anim.apply(e.transform, st.time_ticks)
