"""Render stages: composable jitted transforms.

Each stage mirrors one of the reference's `*_stage` classes (reference:
src/stage.hh discipline: `run(state) -> state`); here a stage is a function
from arrays to arrays, jitted and fused by XLA, so the reference's
command-buffer/semaphore machinery disappears into program order.
"""
