"""Offline-render progress bar with ETA
(reference: src/progress_tracker.cc, src/progress_tracker.hh:15-54).

The reference polls stage timeline-semaphore counters from a background
thread; here progress is reported by the render loop after each pass —
the wavefront orchestrator's per-pass granularity plays the role of the
reference's >= 100 command-buffer chunks (reference: src/tauray.cc:409-415).
"""

from __future__ import annotations

import sys
import time


class ProgressTracker:
    def __init__(self, expected_steps: int, enabled: bool = True,
                 stream=None):
        self.expected = max(expected_steps, 1)
        self.enabled = enabled
        self.done = 0
        self.start = time.perf_counter()
        self.stream = stream or sys.stderr
        self._last_draw = 0.0

    def step(self, n: int = 1):
        self.done += n
        if not self.enabled:
            return
        now = time.perf_counter()
        if now - self._last_draw < 0.1 and self.done < self.expected:
            return
        self._last_draw = now
        frac = min(self.done / self.expected, 1.0)
        elapsed = now - self.start
        eta = elapsed / max(frac, 1e-9) * (1 - frac)
        bar_w = 40
        filled = int(bar_w * frac)
        bar = "=" * filled + ">" + " " * (bar_w - filled)
        self.stream.write(
            f"\r[{bar[:bar_w]}] {frac * 100:5.1f}%  "
            f"elapsed {elapsed:6.1f}s  eta {eta:6.1f}s")
        self.stream.flush()
        if self.done >= self.expected:
            self.stream.write("\n")

    def finish(self):
        if self.enabled and self.done < self.expected:
            self.step(self.expected - self.done)
