"""Renderers: orchestration of stages + multi-device distribution
(reference: src/renderer.hh, src/rt_renderer.cc)."""

from .base import Renderer
