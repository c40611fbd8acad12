"""DSHGI probe streaming (reference: src/dshgi_server.cc:171-280,
src/dshgi_client.cc).

Message schema mirrors the reference's ZMQ stream: a `timestamp`, a
`sh_grid_count`, then per-grid messages carrying {index, order, radius,
transform, resolution, payload}; here the payload is the raw float32 SH
coefficient grid instead of a Vulkan texel buffer. Transport is ZeroMQ
PUB/SUB over DCN; the server counts subscribers and idles when nobody
listens (reference: dshgi_server.cc:144-167)."""

from __future__ import annotations

import struct
import threading
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..log import TR_LOG, TR_WARN

RATE_LIMIT_BITS_PER_S = 1_000_000_000  # 1 Gbps (reference: dshgi_server.cc:175)


def _grid_message(index: int, order: int, radius: float,
                  transform: np.ndarray, coef: np.ndarray) -> bytes:
    rz, ry, rx = coef.shape[:3]
    header = struct.pack(
        "<iiifiii", index, order, 0, radius, rx, ry, rz)
    return (b"sh_grid" + struct.pack("<i", len(header)) + header +
            transform.astype(np.float32).tobytes() +
            coef.astype(np.float32).tobytes())


def _parse_grid_message(data: bytes):
    assert data[:7] == b"sh_grid"
    (hlen,) = struct.unpack_from("<i", data, 7)
    off = 11
    index, order, _, radius, rx, ry, rz = struct.unpack_from("<iiifiii",
                                                             data, off)
    off += hlen
    transform = np.frombuffer(data, np.float32, 16, off).reshape(4, 4)
    off += 64
    C = (order + 1) ** 2
    coef = np.frombuffer(data, np.float32, rz * ry * rx * C * 3,
                         off).reshape(rz, ry, rx, C, 3)
    return index, order, radius, transform, coef


class DSHGIServerTransport:
    """ZMQ publisher side."""

    def __init__(self, port: int):
        import zmq
        self.ctx = zmq.Context.instance()
        self.sock = self.ctx.socket(zmq.XPUB)
        self.sock.bind(f"tcp://*:{port}")
        self.subscribers = 0
        self._budget = RATE_LIMIT_BITS_PER_S / 8.0
        self._last = time.monotonic()

    def poll_subscribers(self):
        import zmq
        while self.sock.poll(0):
            msg = self.sock.recv()
            if msg and msg[0] == 1:
                self.subscribers += 1
            elif msg and msg[0] == 0:
                self.subscribers = max(self.subscribers - 1, 0)

    def publish(self, grids: List[Tuple]):
        """grids: list of (coef jnp/np, world_to_local)."""
        self.poll_subscribers()
        if self.subscribers == 0:
            return False
        now = time.monotonic()
        self._budget = min(self._budget + (now - self._last) *
                           RATE_LIMIT_BITS_PER_S / 8.0,
                           RATE_LIMIT_BITS_PER_S / 8.0)
        self._last = now
        msgs = [b"timestamp" + struct.pack("<q", time.time_ns() // 1000),
                b"sh_grid_count" + struct.pack("<i", len(grids))]
        for i, (coef, w2l) in enumerate(grids):
            coef = np.asarray(coef)
            order = int(np.sqrt(coef.shape[3])) - 1
            msgs.append(_grid_message(i, order, 0.0, np.asarray(w2l), coef))
        total = sum(len(m) for m in msgs)
        if total > self._budget:
            return False  # rate limited this frame
        self._budget -= total
        for m in msgs:
            self.sock.send(m)
        return True

    def close(self):
        self.sock.close(0)


class DSHGIClient:
    """Receiver thread + `sh_source` interface for RasterRenderer
    (reference: src/dshgi_client.hh:37-71)."""

    def __init__(self, connect: str):
        import zmq
        if "://" not in connect:
            connect = f"tcp://{connect}"
        self.ctx = zmq.Context.instance()
        self.sock = self.ctx.socket(zmq.SUB)
        self.sock.connect(connect)
        self.sock.setsockopt(zmq.SUBSCRIBE, b"")
        self._lock = threading.Lock()
        self._grids: Dict[int, Tuple] = {}
        self._running = True
        self._thread = threading.Thread(target=self._recv_loop, daemon=True)
        self._thread.start()

    def _recv_loop(self):
        while self._running:
            if not self.sock.poll(100):
                continue
            data = self.sock.recv()
            if data.startswith(b"sh_grid") and not \
                    data.startswith(b"sh_grid_count"):
                try:
                    index, order, radius, transform, coef = \
                        _parse_grid_message(data)
                    with self._lock:
                        self._grids[index] = (coef.copy(), transform.copy())
                except Exception as e:  # tolerate malformed packets
                    TR_WARN(f"dshgi client: bad grid message: {e}")

    # sh_source interface --------------------------------------------------
    def step(self, host_renderer):
        pass  # grids arrive asynchronously

    def current_grid_data(self) -> Optional[Tuple]:
        import jax.numpy as jnp
        with self._lock:
            if 0 not in self._grids:
                return None
            coef, w2l = self._grids[0]
        return jnp.asarray(coef), jnp.asarray(w2l)

    def close(self):
        self._running = False
        self._thread.join(timeout=1)
        self.sock.close(0)
