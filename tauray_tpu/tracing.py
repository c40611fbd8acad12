"""Frame timing / profiling (reference: src/tracing.cc, src/tracing.hh:22-86).

Collects named per-stage durations per frame and prints them in the
reference's SIMPLE text format (example: docs/MANUAL.md:371-411):

    FRAME 42:
      [device 0] path tracing  1.55ms
      HOST: 3.64ms

or Chrome Trace Event Format JSON (`--trace=trace-event-format`), optionally
redirected to a file (`--timing-output`). Durations are queryable by name,
feeding the load balancer (reference: src/load_balancer.cc:17)."""

from __future__ import annotations

import json
import time
from typing import Dict, List, Optional, Tuple

from .log import TR_TIME


class TracingRecord:
    def __init__(self, opt=None):
        self.format = opt.trace if opt is not None else "simple"
        self.frames: List[Dict] = []
        self._frame_start = None
        self.frame_counter = 0
        self._trace_events: List[Dict] = []

    def begin_frame(self):
        self._frame_start = time.perf_counter()

    def end_frame(self, stage_times: Optional[Dict] = None):
        """stage_times: {(device_id, name): seconds} or {name: seconds}."""
        host = time.perf_counter() - self._frame_start
        norm: Dict[Tuple[int, str], float] = {}
        for k, v in (stage_times or {}).items():
            if isinstance(k, tuple):
                norm[k] = v
            else:
                norm[(0, k)] = v
        self.frames.append(dict(index=self.frame_counter, host=host,
                                stages=norm))
        if self.format == "trace-event-format":
            t0 = self._frame_start * 1e6
            self._trace_events.append(dict(
                name="frame", ph="X", pid=0, tid=0, ts=t0, dur=host * 1e6))
            for (dev, name), dur in norm.items():
                self._trace_events.append(dict(
                    name=name, ph="X", pid=0, tid=dev + 1, ts=t0,
                    dur=dur * 1e6))
        self.frame_counter += 1

    def get_duration(self, device_id: int, name: str) -> float:
        """Latest duration of a named stage, seconds (0 if unknown)."""
        if not self.frames:
            return 0.0
        return self.frames[-1]["stages"].get((device_id, name), 0.0)

    def print_last_trace(self):
        if not self.frames:
            return
        f = self.frames[-1]
        if self.format == "simple":
            TR_TIME(f"FRAME {f['index']}:")
            for (dev, name), dur in sorted(f["stages"].items()):
                TR_TIME(f"  [device {dev}] {name} {dur * 1000:.2f}ms")
            TR_TIME(f"  HOST: {f['host'] * 1000:.2f}ms")

    def finish(self):
        if self.format == "trace-event-format" and self._trace_events:
            TR_TIME(json.dumps({"traceEvents": self._trace_events}))

    def host_frame_times(self) -> List[float]:
        return [f["host"] for f in self.frames]
