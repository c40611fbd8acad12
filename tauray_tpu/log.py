"""Logging with per-type enable flags and redirectable streams.

TPU-native equivalent of the reference's macro logger
(reference: src/log.hh:25-28, src/main.cc:16-26): message types
GENERAL/WARNING/ERROR/TIMING/DEBUG, each independently toggleable and
redirectable, used by the CLI (`--silent` disables GENERAL only,
`--timing-output` redirects TIMING to a file).
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass, field
from typing import IO, Optional


@dataclass
class _LogType:
    name: str
    enabled: bool = True
    stream: Optional[IO] = None  # None -> default stream


@dataclass
class Logger:
    general: _LogType = field(default_factory=lambda: _LogType("GENERAL"))
    warning: _LogType = field(default_factory=lambda: _LogType("WARNING"))
    error: _LogType = field(default_factory=lambda: _LogType("ERROR"))
    timing: _LogType = field(default_factory=lambda: _LogType("TIMING"))
    debug: _LogType = field(default_factory=lambda: _LogType("DEBUG", enabled=False))

    def _emit(self, t: _LogType, msg: str, default_stream: IO) -> None:
        if not t.enabled:
            return
        stream = t.stream if t.stream is not None else default_stream
        print(msg, file=stream)
        stream.flush()

    def log(self, *args) -> None:
        self._emit(self.general, " ".join(str(a) for a in args), sys.stdout)

    def warn(self, *args) -> None:
        self._emit(self.warning, "WARNING: " + " ".join(str(a) for a in args), sys.stderr)

    def err(self, *args) -> None:
        self._emit(self.error, "ERROR: " + " ".join(str(a) for a in args), sys.stderr)

    def time(self, *args) -> None:
        self._emit(self.timing, " ".join(str(a) for a in args), sys.stdout)

    def dbg(self, *args) -> None:
        self._emit(self.debug, "DEBUG: " + " ".join(str(a) for a in args), sys.stderr)


logger = Logger()

TR_LOG = logger.log
TR_WARN = logger.warn
TR_ERR = logger.err
TR_TIME = logger.time
TR_DEBUG = logger.dbg


class TimedScope:
    """`TR_TIME`-style wall-clock scope timer for host-side phases."""

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = (time.perf_counter() - self.t0) * 1000.0
        TR_TIME(f"[{self.name}] {dt:.2f} ms")
        return False
